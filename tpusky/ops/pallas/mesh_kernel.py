"""Pallas TPU triangle-mesh intersection: VMEM-resident tiled
Möller–Trumbore with in-kernel AABB tile culling.

The TPU-native answer to the reference's BVH role (`scene_embree.inl`,
SURVEY.md H3) without a BVH: triangles are Morton-ordered at build time
(render/mesh.py) so each 128-triangle tile is spatially compact, the
whole mesh (v0/e1/e2 as component-major (n_tiles, 128) planes, ~36 B per
triangle) lives in VMEM, and each kernel instance marches the tile list
with a cheap per-ray slab test against the tile AABB first — the full
Möller–Trumbore block runs under a `@pl.when` scalar predicate only when
ANY ray in the block enters the tile's box closer than its current best
hit. Coherent blocks skip ~90+% of tiles; fully incoherent blocks
degrade to dense-but-VMEM-resident testing, which is still orders of
magnitude faster than the XLA scan path on TPU (which at 82k triangles
ran at 0.04 M rays/s — pure O(N) HBM streaming).

Ray layout: component-major (8, B/8) planes so an 8-ray × 128-triangle
Möller–Trumbore block is a natural (8, 128) VPU tile with zero
relayouts: ray components broadcast from (8, 1) columns, triangle
components from (1, 128) rows.

The XLA scan implementation in render/mesh.py remains the CPU and
interpret-mode path; dispatch in `mesh.mesh_intersect`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_SUPER = 16                  # tiles per supertile (2048 triangles)
RAYB = 2048                  # rays per kernel instance
_G = RAYB // 8               # lane extent of the (8, _G) ray planes
_RAY_EPS = 1e-4


def _ray_planes(o, d):
    """(N, 3) rays -> six (8, N/8) component planes (+ padding)."""
    n = o.shape[0]
    n_pad = -(-n // RAYB) * RAYB
    o = jnp.pad(o, ((0, n_pad - n), (0, 0)))
    d = jnp.pad(d, ((0, n_pad - n), (0, 0)),
                constant_values=1.0)     # padded rays: direction (1,1,1)
    # lane-major grouping: ray r -> (block, sublane, lane) with
    # sublane-major order INSIDE the block so un-flattening is a reshape
    comps = []
    for arr in (o, d):
        for c in range(3):
            comps.append(arr[:, c].reshape(n_pad // RAYB, 8, _G)
                         .reshape(-1, _G))
    return comps, n_pad


@functools.partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _mesh_isect_pallas(n_tiles, ox, oy, oz, dx, dy, dz,
                       tv, lo, hi, slo, shi, interpret=False):
    """Closest hit. tv: (9, n_tiles, 128) triangle component planes
    (v0, e1, e2); lo/hi: (n_tiles, 8) padded AABB bounds (first 3 lanes
    used). Returns (t, b1, b2, tri) as (8*n_blocks, _G) planes."""
    n_blocks = ox.shape[0] // 8

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tv_ref, lo_ref, hi_ref, slo_ref, shi_ref, out_ref):
        oxv = ox_ref[...]
        oyv = oy_ref[...]
        ozv = oz_ref[...]
        dxv = dx_ref[...]
        dyv = dy_ref[...]
        dzv = dz_ref[...]
        inf = jnp.float32(jnp.inf)
        ix = 1.0 / jnp.where(dxv == 0.0, 1e-20, dxv)
        iy = 1.0 / jnp.where(dyv == 0.0, 1e-20, dyv)
        iz = 1.0 / jnp.where(dzv == 0.0, 1e-20, dzv)

        def slab_any(lo_r, hi_r, i, bt):
            lx = lo_r[i, 0]
            ly = lo_r[i, 1]
            lz = lo_r[i, 2]
            hx = hi_r[i, 0]
            hy = hi_r[i, 1]
            hz = hi_r[i, 2]
            t0x = (lx - oxv) * ix
            t1x = (hx - oxv) * ix
            t0y = (ly - oyv) * iy
            t1y = (hy - oyv) * iy
            t0z = (lz - ozv) * iz
            t1z = (hz - ozv) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            return jnp.any((tf >= jnp.maximum(tn, 0.0)) & (tn < bt))

        def body(tile, carry):
            bt, bb1, bb2, btri = carry
            # ---- per-ray slab test against the tile AABB ----
            lx = lo_ref[tile, 0]
            ly = lo_ref[tile, 1]
            lz = lo_ref[tile, 2]
            hx = hi_ref[tile, 0]
            hy = hi_ref[tile, 1]
            hz = hi_ref[tile, 2]
            t0x = (lx - oxv) * ix
            t1x = (hx - oxv) * ix
            t0y = (ly - oyv) * iy
            t1y = (hy - oyv) * iy
            t0z = (lz - ozv) * iz
            t1z = (hz - ozv) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            enter = (tf >= jnp.maximum(tn, 0.0)) & (tn < bt)
            hit_any = jnp.any(enter)

            def mt(args):
                bt, bb1, bb2, btri = args
                # one triangle vs ALL rays per step: scalar reads
                # broadcast against the (8, _G) ray planes — no dynamic
                # lane indexing (Mosaic requires 128-aligned dynamic
                # lane slices) and no 2-D (1,1)-tile broadcasts (Mosaic:
                # "Broadcast in both sublanes and lanes" unimplemented)
                for t in range(_TILE):
                    v0x = tv_ref[0, tile, t]
                    v0y = tv_ref[1, tile, t]
                    v0z = tv_ref[2, tile, t]
                    e1x = tv_ref[3, tile, t]
                    e1y = tv_ref[4, tile, t]
                    e1z = tv_ref[5, tile, t]
                    e2x = tv_ref[6, tile, t]
                    e2y = tv_ref[7, tile, t]
                    e2z = tv_ref[8, tile, t]
                    px = dyv * e2z - dzv * e2y
                    py = dzv * e2x - dxv * e2z
                    pz = dxv * e2y - dyv * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                                           1e-12, det)
                    tx = oxv - v0x
                    ty = oyv - v0y
                    tz = ozv - v0z
                    u = (tx * px + ty * py + tz * pz) * idet
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    v = (dxv * qx + dyv * qy + dzv * qz) * idet
                    tt = (e2x * qx + e2y * qy + e2z * qz) * idet
                    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0)
                          & (v >= 0.0) & (u + v <= 1.0)
                          & (tt > _RAY_EPS) & (tt < bt))
                    bt = jnp.where(ok, tt, bt)
                    bb1 = jnp.where(ok, u, bb1)
                    bb2 = jnp.where(ok, v, bb2)
                    btri = jnp.where(
                        ok, (tile * _TILE + t).astype(jnp.float32), btri)
                return bt, bb1, bb2, btri

            return jax.lax.cond(hit_any, mt, lambda a: a,
                                (bt, bb1, bb2, btri))

        def super_body(sp, carry):
            # ---- supertile level: one slab sweep skips 16 tiles ----
            def descend(c):
                return jax.lax.fori_loop(sp * _SUPER, (sp + 1) * _SUPER,
                                         body, c)
            pred = slab_any(slo_ref, shi_ref, sp, carry[0])
            return jax.lax.cond(pred, descend, lambda c: c, carry)

        init = (jnp.full((8, _G), inf), jnp.zeros((8, _G)),
                jnp.zeros((8, _G)), jnp.full((8, _G), -1.0))
        bt, bb1, bb2, btri = jax.lax.fori_loop(0, n_tiles // _SUPER,
                                               super_body, init)
        out_ref[0:8, :] = bt
        out_ref[8:16, :] = bb1
        out_ref[16:24, :] = bb2
        out_ref[24:32, :] = btri

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((8, _G), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((9, n_tiles, _TILE), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((n_tiles, 8), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((n_tiles, 8), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((n_tiles // _SUPER, 8), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((n_tiles // _SUPER, 8), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, _G), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32 * n_blocks, _G), jnp.float32),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tv, lo, hi, slo, shi)
    return out


def mesh_tables_pallas(mesh):
    """MeshTable -> (tv (9, n_tiles, 128), lo/hi (n_tiles, 8),
    slo/shi (n_super, 8)) planes; n_tiles padded to a _SUPER multiple
    (padding tiles carry inverted never-hit AABBs).

    Pure jnp (trace-safe): the mesh is part of the traced scene pytree,
    so this runs inside the render program; XLA hoists it as a
    loop/iteration-invariant (O(T) elementwise work)."""
    valid = mesh.valid[:, None]
    v0 = jnp.where(valid, mesh.v0, 3e4)
    e1 = jnp.where(valid, mesh.e1, 0.0)
    e2 = jnp.where(valid, mesh.e2, 0.0)
    t = v0.shape[0]
    n_tiles = t // _TILE
    tv = jnp.stack([v0[:, 0], v0[:, 1], v0[:, 2],
                    e1[:, 0], e1[:, 1], e1[:, 2],
                    e2[:, 0], e2[:, 1], e2[:, 2]], 0)
    tv = tv.reshape(9, n_tiles, _TILE).astype(jnp.float32)
    va = jnp.stack([v0, v0 + e1, v0 + e2], 0)
    big = jnp.where(mesh.valid[:, None], 0.0, jnp.inf)
    lo3 = jnp.min(va + big[None], axis=0).reshape(n_tiles, _TILE, 3) \
        .min(1)
    hi3 = jnp.max(va - big[None], axis=0).reshape(n_tiles, _TILE, 3) \
        .max(1)
    lo3 = jnp.where(jnp.isfinite(lo3), lo3, 3e4)
    hi3 = jnp.where(jnp.isfinite(hi3), hi3, 3e4 - 1.0)
    # pad tile count to a supertile multiple; padding tiles never hit
    n_pad_t = -(-n_tiles // _SUPER) * _SUPER
    if n_pad_t != n_tiles:
        tvp = jnp.full((9, n_pad_t, _TILE), 3e4, jnp.float32)
        tvp = tvp.at[3:9].set(0.0)
        tv = tvp.at[:, :n_tiles].set(tv)
        lo3 = jnp.concatenate(
            [lo3, jnp.full((n_pad_t - n_tiles, 3), 3e4)], 0)
        hi3 = jnp.concatenate(
            [hi3, jnp.full((n_pad_t - n_tiles, 3), 3e4 - 1.0)], 0)
        n_tiles = n_pad_t
    n_super = n_tiles // _SUPER
    slo3 = lo3.reshape(n_super, _SUPER, 3).min(1)
    shi3 = hi3.reshape(n_super, _SUPER, 3).max(1)

    def pad8(x, fill):
        out = jnp.full((x.shape[0], 8), fill, jnp.float32)
        return out.at[:, :3].set(x)

    return (tv, pad8(lo3, 3e4), pad8(hi3, 3e4 - 1.0),
            pad8(slo3, 3e4), pad8(shi3, 3e4 - 1.0))


def mesh_intersect_pallas(mesh, o, d, tables=None, interpret=False):
    """Closest-hit query -> (t, b1, b2, tri (int32), hit) flat over rays."""
    n = o.shape[0]
    if tables is None:
        tables = mesh_tables_pallas(mesh)
    tv, lo, hi, slo, shi = tables
    comps, n_pad = _ray_planes(o, d)
    out = _mesh_isect_pallas(tv.shape[1], *comps, tv, lo, hi, slo, shi,
                             interpret=interpret)
    nb = n_pad // RAYB
    out = out.reshape(nb, 4, 8, _G)

    def unplane(x):            # (nb, 8, _G) -> (n,)
        return x.reshape(nb * RAYB)[:n]

    t = unplane(out[:, 0])
    b1 = unplane(out[:, 1])
    b2 = unplane(out[:, 2])
    tri = unplane(out[:, 3]).astype(jnp.int32)
    hit = jnp.isfinite(t) & (tri >= 0)
    return t, b1, b2, tri, hit
