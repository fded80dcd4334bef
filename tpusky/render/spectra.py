"""Sensor response functions (SRFs) for the spectral band film.

Reference: `src/films/specfilm.cpp` — each named nested spectrum plugin
becomes one output channel; the film importance-samples wavelengths from
the COMBINED (summed) SRF (`compute_srf_sampling`, specfilm.cpp:201-241)
and weights every hero-wavelength sample by each channel's SRF over the
sampling density (`prepare_sample`, :290-313):

    channel_j = E[ srf_j(lambda) * L(lambda) / p(lambda) ],
    p(lambda) proportional to sum_k srf_k(lambda)

which estimates the unnormalised integral of srf_j * L.

SRFs here are static (hashable) regular spectra — `(lambda_min,
lambda_max, values_tuple)` — so they live in the Film NamedTuple (a jit
static argument) and compile to constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def parse_srf(desc):
    """Spectrum description -> static SRF tuple (lmin, lmax, values).

    Accepts the reference's `regular` and `irregular` spectrum dicts
    (`src/spectra/{regular,irregular}.cpp`) and a plain list of values
    over [360, 830] nm.
    """
    if isinstance(desc, (list, tuple)):
        vals = tuple(float(v) for v in desc)
        return (360.0, 830.0, vals)
    if not isinstance(desc, dict):
        raise ValueError(f"cannot parse SRF {desc!r}")
    t = desc.get("type")
    if t == "regular":
        lo = float(desc.get("lambda_min", desc.get("wavelength_min", 360.0)))
        hi = float(desc.get("lambda_max", desc.get("wavelength_max", 830.0)))
        v = desc["values"]
        if isinstance(v, str):
            v = [float(x) for x in v.replace(",", " ").split()]
        return (lo, hi, tuple(float(x) for x in v))
    if t == "irregular":
        w = desc["wavelengths"]
        v = desc["values"]
        if isinstance(w, str):
            w = [float(x) for x in w.replace(",", " ").split()]
        if isinstance(v, str):
            v = [float(x) for x in v.replace(",", " ").split()]
        w = np.asarray(w, np.float64)
        v = np.asarray(v, np.float64)
        # resample to a regular grid at the native resolution
        n = max(len(w), 2)
        grid = np.linspace(w[0], w[-1], n)
        return (float(w[0]), float(w[-1]),
                tuple(np.interp(grid, w, v).tolist()))
    raise ValueError(f"cannot parse SRF {desc!r}")


def srf_eval(srf, wavelengths):
    """Evaluate a static SRF tuple at (...,) wavelengths (nm); zero
    outside its support (regular.cpp semantics)."""
    lo, hi, vals = srf
    v = jnp.asarray(vals, jnp.float32)
    n = v.shape[0]
    x = (wavelengths - lo) / (hi - lo) * (n - 1)
    idx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    f = jnp.clip(x - idx, 0.0, 1.0)
    val = v[idx] * (1.0 - f) + v[idx + 1] * f
    inside = (wavelengths >= lo) & (wavelengths <= hi)
    return jnp.where(inside, val, 0.0)


def srf_range(srfs):
    """(lambda_min, lambda_max) of the union support."""
    return (min(s[0] for s in srfs), max(s[1] for s in srfs))


def srf_combined_distribution(srfs, n_points: int = 256):
    """ContinuousDistribution over the summed SRF (the film's wavelength
    importance distribution, `compute_srf_sampling`)."""
    from ..ops.distr import make_continuous
    lo, hi = srf_range(srfs)
    grid = jnp.linspace(lo, hi, n_points)
    total = sum(srf_eval(s, grid) for s in srfs)
    total = jnp.maximum(total, 1e-9)     # keep the cdf invertible
    return make_continuous(total, lo, hi)


def srf_sample_wavelengths(srfs, u, n_hero: int = 4):
    """Sample hero wavelengths from the combined SRF -> (wl, pdf)."""
    from ..ops.distr import continuous_sample_pdf
    from ..ops.spectrum import sample_shifted
    shifted = sample_shifted(u, n_hero)
    return continuous_sample_pdf(srf_combined_distribution(srfs), shifted)


def srf_accumulate(srfs, wavelengths, values_over_pdf):
    """Per-channel SRF weighting (`prepare_sample`): values_over_pdf
    (..., W) spectral samples already divided by the sampling pdf ->
    (..., n_channels) channel means."""
    chans = [jnp.mean(srf_eval(s, wavelengths) * values_over_pdf, axis=-1)
             for s in srfs]
    return jnp.stack(chans, axis=-1)
