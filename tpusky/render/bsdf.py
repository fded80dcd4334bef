"""BSDFs (SoA tables over scene materials).

Minimal set matching the sunsky workloads (SURVEY.md H7): smooth diffuse
(used by every sunsky test scene; reference `src/bsdfs/diffuse.cpp`) with
per-shape albedo, treated two-sided or one-sided. Rough conductor follows
in a later milestone.

Directions here are in the *local shading frame* (+z = normal). Functions
return spectra weighted per the Mitsuba convention: `sample` returns the
weight value/pdf including the cosine foreshortening.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import warp


class DiffuseTable(NamedTuple):
    albedo: jnp.ndarray       # (M, C) per-material reflectance (RGB mode)
    twosided: jnp.ndarray     # (M,) bool
    albedo_spec: jnp.ndarray = None  # (M, 11) reflectance at 320..720nm/40


def make_diffuse_table(albedos, twosided=None,
                       spectral_albedos=None) -> DiffuseTable:
    """Build the material table. `spectral_albedos` holds per-material
    reflectance sampled at the 11 model wavelengths (320..720nm step 40);
    hero-wavelength rendering interpolates it linearly (clamped at the
    ends, the convention of the reference's `regular` spectrum plugin)."""
    import numpy as np
    a = jnp.asarray(np.asarray(albedos, np.float32))
    if twosided is None:
        ts = jnp.zeros((a.shape[0],), bool)
    else:
        ts = jnp.asarray(np.asarray(twosided, bool))
    sa = (None if spectral_albedos is None
          else jnp.asarray(np.asarray(spectral_albedos, np.float32)))
    return DiffuseTable(a, ts, sa)


def _reflectance(table: DiffuseTable, mat_idx, wavelengths):
    """Per-lane reflectance: (..., C) RGB or (..., W) at hero wavelengths."""
    if wavelengths is None:
        return table.albedo[mat_idx]
    spec = table.albedo_spec[mat_idx]                  # (..., 11)
    norm = jnp.clip((wavelengths - 320.0) / 40.0, 0.0, 10.0)
    lo = jnp.clip(jnp.floor(norm).astype(jnp.int32), 0, 9)
    t = norm - lo
    v_lo = jnp.take_along_axis(spec, lo, axis=-1)
    v_hi = jnp.take_along_axis(spec, lo + 1, axis=-1)
    return (1.0 - t) * v_lo + t * v_hi


def _flip(wi, twosided):
    """Two-sided adapter: mirror the frame when hit from below."""
    flip = twosided & (wi[..., 2] < 0.0)
    sign = jnp.where(flip, -1.0, 1.0)
    return sign


def diffuse_eval_pdf(table: DiffuseTable, mat_idx, wi, wo, wavelengths=None):
    """(f * cos(theta_o), pdf) for local directions wi (toward viewer) and
    wo (sampled)."""
    albedo = _reflectance(table, mat_idx, wavelengths)
    sign = _flip(wi, table.twosided[mat_idx])
    cos_i = wi[..., 2] * sign
    cos_o = wo[..., 2] * sign
    active = (cos_i > 0.0) & (cos_o > 0.0)
    value = albedo * (warp.INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
    pdf = warp.INV_PI * jnp.maximum(cos_o, 0.0)
    value = jnp.where(active[..., None], value, 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    return value, pdf


def diffuse_sample(table: DiffuseTable, mat_idx, wi, sample2,
                   wavelengths=None):
    """Cosine-hemisphere sample. Returns (wo, weight=value/pdf, pdf)."""
    albedo = _reflectance(table, mat_idx, wavelengths)
    sign = _flip(wi, table.twosided[mat_idx])
    wo = warp.square_to_cosine_hemisphere(sample2)
    wo = wo * jnp.stack([jnp.ones_like(sign), jnp.ones_like(sign), sign],
                        axis=-1)
    cos_i = wi[..., 2] * sign
    active = cos_i > 0.0
    pdf = warp.square_to_cosine_hemisphere_pdf(wo * jnp.stack(
        [jnp.ones_like(sign), jnp.ones_like(sign), sign], axis=-1))
    weight = jnp.where(active[..., None], albedo, 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    return wo, weight, pdf
