"""AOV integrators: depth, geometric normals, albedo, position.

Counterpart of the reference's `aov` / `depth` integrator plugins
(SURVEY.md H4; `src/integrators/{aov,depth}.cpp`): deterministic
single-sample-per-pixel feature channels used for denoisers and
diagnostics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.gather import take_ints, take_rows
from . import sensors as sensors_mod
from .mesh import mesh_intersect
from .shapes import ray_intersect


def render_aovs(scene, sensor, height: int, width: int):
    """Render feature channels at pixel centres.

    Returns a dict with 'depth' (H, W), 'normal' (H, W, 3),
    'position' (H, W, 3), 'albedo' (H, W, 3), 'shape_idx' (H, W).
    """
    y, x = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    uv = jnp.stack([(x.ravel() + 0.5) / width,
                    (y.ravel() + 0.5) / height], axis=-1)
    o, d = sensors_mod.sample_ray(sensor, uv)

    t, p, n, _uv2, shape_idx, hit = ray_intersect(scene.shapes, o, d)
    mat = take_ints(scene.shapes.bsdf_idx, jnp.maximum(shape_idx, 0))
    if scene.mesh is not None:
        tm, nm, matm, _b1, _b2, _tri, hitm = mesh_intersect(scene.mesh, o, d)
        use_mesh = hitm & (tm < t)
        t = jnp.where(use_mesh, tm, t)
        p = jnp.where(use_mesh[..., None], o + tm[..., None] * d, p)
        n = jnp.where(use_mesh[..., None], nm, n)
        mat = jnp.where(use_mesh, matm, mat)
        shape_idx = jnp.where(use_mesh, -2, shape_idx)
        hit = hit | hitm
    if scene.sdf is not None:
        from .sdf import sdf_intersect
        ts_, ns_, hs_ = sdf_intersect(scene.sdf, o, d)
        use_sdf = hs_ & (ts_ < t)
        t = jnp.where(use_sdf, ts_, t)
        p = jnp.where(use_sdf[..., None], o + ts_[..., None] * d, p)
        n = jnp.where(use_sdf[..., None], ns_, n)
        mat = jnp.where(use_sdf, scene.sdf.bsdf_idx, mat)
        shape_idx = jnp.where(use_sdf, -3, shape_idx)
        hit = hit | use_sdf
    if scene.curve is not None:
        from .curve import curve_intersect
        tc_, nc_, matc_, hc_, _tg_ = curve_intersect(scene.curve, o, d)
        use_cv = hc_ & (tc_ < t)
        t = jnp.where(use_cv, tc_, t)
        p = jnp.where(use_cv[..., None], o + tc_[..., None] * d, p)
        n = jnp.where(use_cv[..., None], nc_, n)
        mat = jnp.where(use_cv, matc_, mat)
        shape_idx = jnp.where(use_cv, -4, shape_idx)
        hit = hit | use_cv

    albedo = take_rows(scene.bsdfs.albedo, mat)
    shape = (height, width)
    return {
        "depth": jnp.where(hit, t, 0.0).reshape(shape),
        "normal": jnp.where(hit[..., None], n, 0.0).reshape(shape + (3,)),
        "position": jnp.where(hit[..., None], p, 0.0).reshape(shape + (3,)),
        "albedo": jnp.where(hit[..., None], albedo, 0.0).reshape(
            shape + (3,)),
        "shape_idx": shape_idx.reshape(shape),
    }
