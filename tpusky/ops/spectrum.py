"""Color / spectral pipeline: CIE 1931 tables, luminance, sRGB conversion,
stratified wavelength sampling.

The CIE tables (standard colorimetric data, 360..830nm at 5nm) live in
``data/cie1931.npz``; interpolation and normalisation semantics follow the
standard definitions also used by the reference
(`include/mitsuba/core/spectrum.h:236-434`).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

CIE_MIN = 360.0
CIE_MAX = 830.0
CIE_SAMPLES = 95
# Normalisation so that a unit-valued spectrum has luminance 1.
CIE_Y_NORMALIZATION = 1.0 / 106.7502593994140625
CIE_D65_NORMALIZATION = 1.0 / 98.99741751876255

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")

# ITU-R Rec. BT.709 matrices
XYZ_TO_SRGB = np.array([[3.240479, -1.537150, -0.498535],
                        [-0.969256, 1.875991, 0.041556],
                        [0.055648, -0.204043, 1.057311]])
SRGB_TO_XYZ = np.array([[0.412453, 0.357580, 0.180423],
                        [0.212671, 0.715160, 0.072169],
                        [0.019334, 0.119193, 0.950227]])
LUMINANCE_WEIGHTS_RGB = np.array([0.212671, 0.715160, 0.072169])


@lru_cache(maxsize=None)
def _cie_tables():
    with np.load(os.path.join(_DATA_DIR, "cie1931.npz")) as z:
        return (np.array(z["x"]), np.array(z["y"]), np.array(z["z"]),
                np.array(z["d65"]))


def _cie_interp_multi(tables, wavelengths):
    """Lerp all F stacked tables at once -> (..., F).

    Per-lane `tbl[i0]` gathers lower to scalar loops on TPU (26x slower,
    see ops/gather.py); instead both lerp endpoints come from ONE one-hot
    MXU matmul against the (95, F) stacked table.
    """
    t = ((wavelengths - CIE_MIN) * ((CIE_SAMPLES - 1) / (CIE_MAX - CIE_MIN)))
    active = (wavelengths >= CIE_MIN) & (wavelengths <= CIE_MAX)
    i0 = jnp.clip(t.astype(jnp.int32), 0, CIE_SAMPLES - 2)
    w1 = (t - i0)[..., None]
    tbl = jnp.asarray(tables)                       # (95, F)
    onehot = (i0[..., None]
              == jnp.arange(CIE_SAMPLES - 1)).astype(wavelengths.dtype)
    # lerp of adjacent rows == one matmul against pre-lerped pairs:
    # val = (1-w) tbl[i0] + w tbl[i0+1]
    import jax
    lo = jnp.einsum("...k,kf->...f", onehot, tbl[:-1],
                    precision=jax.lax.Precision.HIGHEST)
    hi = jnp.einsum("...k,kf->...f", onehot, tbl[1:],
                    precision=jax.lax.Precision.HIGHEST)
    val = (1.0 - w1) * lo + w1 * hi
    return jnp.where(active[..., None], val, 0.0)


def cie1931_xyz(wavelengths):
    """CIE XYZ color-matching values at the given wavelengths -> (..., 3)."""
    x, y, z, _ = _cie_tables()
    return _cie_interp_multi(np.stack([x, y, z], -1), wavelengths)


def cie1931_y(wavelengths):
    _, y, _, _ = _cie_tables()
    return _cie_interp_multi(y[:, None], wavelengths)[..., 0]


def cie_d65(wavelengths):
    *_, d65 = _cie_tables()
    return (_cie_interp_multi(d65[:, None], wavelengths)[..., 0]
            * CIE_D65_NORMALIZATION)


def luminance_rgb(rgb):
    import jax
    return jnp.einsum("...c,c->...", rgb,
                      jnp.asarray(LUMINANCE_WEIGHTS_RGB),
                      precision=jax.lax.Precision.HIGHEST)


def luminance_spectral(values, wavelengths):
    """mean over hero wavelengths of CIE-Y-weighted spectral values."""
    return jnp.mean(cie1931_y(wavelengths) * values, axis=-1)


def spectrum_to_xyz(values, wavelengths):
    """Monte-Carlo spectral samples -> XYZ (values already divided by pdf)."""
    xyz = cie1931_xyz(wavelengths)
    return jnp.mean(xyz * values[..., None], axis=-2) * CIE_Y_NORMALIZATION


def xyz_to_srgb(xyz):
    import jax
    return jnp.einsum("rc,...c->...r", jnp.asarray(XYZ_TO_SRGB), xyz,
                      precision=jax.lax.Precision.HIGHEST)


def srgb_to_xyz(rgb):
    import jax
    return jnp.einsum("rc,...c->...r", jnp.asarray(SRGB_TO_XYZ), rgb,
                      precision=jax.lax.Precision.HIGHEST)


def spectrum_to_srgb(values, wavelengths):
    return xyz_to_srgb(spectrum_to_xyz(values, wavelengths))


def sample_shifted(sample, n: int = 4):
    """Stratify one uniform sample into n shifted hero-wavelength samples.

    sample: (...,) -> (..., n) with sample_k = frac(u + k/n)
    (cf. reference `include/mitsuba/core/math.h` `sample_shifted`).
    """
    shifts = jnp.arange(n) / n
    return jnp.mod(sample[..., None] + shifts, 1.0)


def sample_rgb_spectrum(sample):
    """Importance-sample wavelengths concentrated where RGB sensors respond.

    Radziszewski, Boryczko & Alda, "An Improved Technique for Full Spectral
    Rendering" (the same strategy the reference uses for spectral rendering
    with RGB output, `spectrum.h:445-455`). Returns (wavelength_nm,
    1/pdf weight).
    """
    wavelengths = (538.0 - jnp.arctanh(0.8569106254698279
                                       - 1.8275019724092267 * sample)
                   * 138.88888888888889)
    tmp = jnp.cosh(0.0072 * (wavelengths - 538.0))
    weight = 253.82 * tmp * tmp
    return wavelengths, weight


def pdf_rgb_spectrum(wavelengths):
    """Pdf of `sample_rgb_spectrum` per wavelength."""
    tmp = 1.0 / jnp.cosh(0.0072 * (wavelengths - 538.0))
    return jnp.where((wavelengths >= CIE_MIN) & (wavelengths <= CIE_MAX),
                     0.003939804229326285 * tmp * tmp, 0.0)


def srgb_gamma(x):
    """Linear -> sRGB gamma encoding."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055)
