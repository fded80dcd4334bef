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
    albedo: jnp.ndarray       # (M, C) per-material reflectance
    twosided: jnp.ndarray     # (M,) bool


def make_diffuse_table(albedos, twosided=None) -> DiffuseTable:
    import numpy as np
    a = jnp.asarray(np.asarray(albedos, np.float32))
    if twosided is None:
        ts = jnp.zeros((a.shape[0],), bool)
    else:
        ts = jnp.asarray(np.asarray(twosided, bool))
    return DiffuseTable(a, ts)


def _flip(wi, twosided):
    """Two-sided adapter: mirror the frame when hit from below."""
    flip = twosided & (wi[..., 2] < 0.0)
    sign = jnp.where(flip, -1.0, 1.0)
    return sign


def diffuse_eval_pdf(table: DiffuseTable, mat_idx, wi, wo):
    """(f * cos(theta_o), pdf) for local directions wi (toward viewer) and
    wo (sampled)."""
    albedo = table.albedo[mat_idx]
    sign = _flip(wi, table.twosided[mat_idx])
    cos_i = wi[..., 2] * sign
    cos_o = wo[..., 2] * sign
    active = (cos_i > 0.0) & (cos_o > 0.0)
    value = albedo * (warp.INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
    pdf = warp.INV_PI * jnp.maximum(cos_o, 0.0)
    value = jnp.where(active[..., None], value, 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    return value, pdf


def diffuse_sample(table: DiffuseTable, mat_idx, wi, sample2):
    """Cosine-hemisphere sample. Returns (wo, weight=value/pdf, pdf)."""
    albedo = table.albedo[mat_idx]
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
