"""AOV integrators: depth, normals, uv, prim index, albedo, position.

Counterpart of the reference's `aov` / `depth` integrator plugins
(SURVEY.md H4; `src/integrators/{aov,depth}.cpp`): deterministic
single-sample-per-pixel feature channels used for denoisers and
diagnostics. Like the reference, the `aov` integrator can NEST a child
sampling integrator (`aov.cpp:126-137` wraps e.g. `path` and emits its
RGBA alongside the feature channels — `render_aovs(child=...)`), and
accepts the reference's `aovs` spec string `"name:type,..."`
(`aov.cpp:111`; types depth / position / uv / prim_index / shape_index /
geo_normal / sh_normal / albedo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.gather import take_ints, take_rows
from . import sensors as sensors_mod
from .mesh import mesh_intersect
from .shapes import ray_intersect


def render_aovs(scene, sensor, height: int, width: int, aovs=None,
                child=None, child_kwargs=None):
    """Render feature channels at pixel centres.

    Returns a dict with 'depth' (H, W), 'normal'/'sh_normal'/'geo_normal'
    (H, W, 3), 'position' (H, W, 3), 'albedo' (H, W, 3),
    'shape_idx' (H, W), 'uv' (H, W, 2), 'prim_index' (H, W).

    aovs: optional reference-style spec string "name:type,..."
    (`aov.cpp:111`) — the result then maps each requested NAME to its
    channel. child: optional nested integrator ("path"/"direct"/callable)
    whose RGB image is emitted under the child's name (`aov.cpp:126`,
    channels <name>.R/G/B as one (H, W, 3) entry).
    """
    y, x = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    uv = jnp.stack([(x.ravel() + 0.5) / width,
                    (y.ravel() + 0.5) / height], axis=-1)
    o, d = sensors_mod.sample_ray(sensor, uv)

    t, p, n, uv_surf, shape_idx, hit = ray_intersect(scene.shapes, o, d)
    geo_n = n
    prim = jnp.full(shape_idx.shape, -1, jnp.int32)
    mat = take_ints(scene.shapes.bsdf_idx, jnp.maximum(shape_idx, 0))
    if scene.mesh is not None:
        from .mesh import mesh_interp_uv
        tm, nm, matm, _b1, _b2, _tri, hitm = mesh_intersect(scene.mesh, o, d)
        use_mesh = hitm & (tm < t)
        t = jnp.where(use_mesh, tm, t)
        p = jnp.where(use_mesh[..., None], o + tm[..., None] * d, p)
        n = jnp.where(use_mesh[..., None], nm, n)
        # geometric normal of the winning triangle (cross of edges)
        tri_c = jnp.maximum(_tri, 0)
        gn = jnp.cross(scene.mesh.e1[tri_c], scene.mesh.e2[tri_c])
        gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                              1e-12)
        geo_n = jnp.where(use_mesh[..., None], gn, geo_n)
        uv_surf = jnp.where(use_mesh[..., None],
                            mesh_interp_uv(scene.mesh, _tri, _b1, _b2),
                            uv_surf)
        prim = jnp.where(use_mesh, _tri, prim)
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
    out = {
        "depth": jnp.where(hit, t, 0.0).reshape(shape),
        "normal": jnp.where(hit[..., None], n, 0.0).reshape(shape + (3,)),
        "sh_normal": jnp.where(hit[..., None], n,
                               0.0).reshape(shape + (3,)),
        "geo_normal": jnp.where(hit[..., None], geo_n,
                                0.0).reshape(shape + (3,)),
        "position": jnp.where(hit[..., None], p, 0.0).reshape(shape + (3,)),
        "albedo": jnp.where(hit[..., None], albedo, 0.0).reshape(
            shape + (3,)),
        "shape_idx": shape_idx.reshape(shape),
        "uv": jnp.where(hit[..., None], uv_surf, 0.0).reshape(
            shape + (2,)),
        "prim_index": jnp.where(hit, prim, -1).reshape(shape),
    }

    if child is not None:
        from . import integrator as integrator_mod
        from .film import Film
        kw = dict(spp=16, max_depth=2, mode="rgb")
        kw.update(child_kwargs or {})
        if callable(child):
            img = child(scene, sensor, height, width)
            name = getattr(child, "__name__", "child")
        else:
            name = str(child)
            film = Film(height, width, 3)
            md = kw["max_depth"] if name != "direct" else 2
            img = integrator_mod.render(scene, sensor, film,
                                        jax.random.PRNGKey(0),
                                        spp=kw["spp"], max_depth=md,
                                        mode=kw["mode"])
        out[name] = img

    if aovs:
        # reference spec "name:type,..." (`aov.cpp:111-147`)
        alias = {"dd": "depth", "depth": "depth", "position": "position",
                 "uv": "uv", "prim_index": "prim_index",
                 "shape_index": "shape_idx", "geo_normal": "geo_normal",
                 "sh_normal": "sh_normal", "nn": "sh_normal",
                 "albedo": "albedo"}
        sel = {}
        for tok in str(aovs).split(","):
            tok = tok.strip()
            if not tok:
                continue
            name, _, typ = tok.partition(":")
            typ = (typ or name).strip().split(".")[0]
            sel[name.strip()] = out[alias.get(typ, typ)]
        if child is not None:
            cname = child if isinstance(child, str) else getattr(
                child, "__name__", "child")
            sel[cname] = out[cname]
        return sel
    return out
