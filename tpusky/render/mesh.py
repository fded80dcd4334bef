"""Triangle meshes: SoA tables + tiled Moller-Trumbore intersection.

TPU-first counterpart of the reference's `Mesh` shapes (SURVEY.md H20):
triangles are intersected in dense 128-wide tiles (the VPU lane width) by
a `lax.scan` carrying the running closest hit — no BVH pointer chasing,
fully regular compute. Suitable for the small/medium meshes of the test
scenes; grid acceleration can subdivide the tile list later without
changing this kernel.

World-space vertices are baked at build time (`to_world` applied on the
host), so the inner loop is free of per-mesh transforms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 128
_RAY_EPS = 1e-4


class MeshTable(NamedTuple):
    """All scene triangles, concatenated and padded to a tile multiple."""
    v0: jnp.ndarray         # (T, 3)
    e1: jnp.ndarray         # (T, 3) v1 - v0
    e2: jnp.ndarray         # (T, 3) v2 - v0
    n0: jnp.ndarray         # (T, 3) vertex normals for shading (v0)
    n1: jnp.ndarray         # (T, 3)
    n2: jnp.ndarray         # (T, 3)
    bsdf_idx: jnp.ndarray   # (T,) int32
    valid: jnp.ndarray      # (T,) bool (False on padding)
    uv: jnp.ndarray = None  # (T, 3, 2) per-corner texture coordinates
    col: jnp.ndarray = None  # (T, 3, 3) per-corner vertex colors (the
    #                           `mesh_attribute.cpp` "vertex_color" data;
    #                           zeros when the mesh carries none)


def make_mesh_table(meshes) -> MeshTable:
    """meshes: list of dicts {positions (V,3), indices (T,3),
    normals (V,3) optional, uvs (V,2) optional, to_world (4,4) optional,
    bsdf_idx int}."""
    v0s, e1s, e2s, n0s, n1s, n2s, mats, uvs = [], [], [], [], [], [], [], []
    cols, any_cols = [], False
    for m in meshes:
        pos = np.asarray(m["positions"], np.float32)
        idx = np.asarray(m["indices"], np.int32)
        t2w = np.asarray(m.get("to_world", np.eye(4)), np.float32)
        pos_w = pos @ t2w[:3, :3].T + t2w[:3, 3]
        nrm = np.asarray(m.get("normals", np.zeros_like(pos)), np.float32)
        inv_t = np.linalg.inv(t2w[:3, :3]).T
        nrm_w = nrm @ inv_t.T
        tri = pos_w[idx]                      # (T, 3, 3)
        tn = nrm_w[idx]
        # faces without vertex normals fall back to the geometric normal
        geo_n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        geo_n /= np.maximum(np.linalg.norm(geo_n, axis=-1, keepdims=True),
                            1e-12)
        missing = np.linalg.norm(tn, axis=-1) < 1e-6   # (T, 3)
        for c in range(3):
            tn[:, c][missing[:, c]] = geo_n[missing[:, c]]
        v0s.append(tri[:, 0])
        e1s.append(tri[:, 1] - tri[:, 0])
        e2s.append(tri[:, 2] - tri[:, 0])
        n0s.append(tn[:, 0])
        n1s.append(tn[:, 1])
        n2s.append(tn[:, 2])
        mats.append(np.full((len(idx),), m.get("bsdf_idx", 0), np.int32))
        uv_v = m.get("uvs")
        uv_v = (np.zeros((len(pos), 2), np.float32) if uv_v is None
                else np.asarray(uv_v, np.float32))
        uvs.append(uv_v[idx])                 # (T, 3, 2)
        col_v = m.get("colors")
        if col_v is not None:
            any_cols = True
            cols.append(np.asarray(col_v, np.float32)[idx])
        else:
            cols.append(np.zeros((len(idx), 3, 3), np.float32))

    v0 = np.concatenate(v0s) if v0s else np.zeros((0, 3), np.float32)
    e1 = np.concatenate(e1s) if e1s else np.zeros((0, 3), np.float32)
    e2 = np.concatenate(e2s) if e2s else np.zeros((0, 3), np.float32)
    n0 = np.concatenate(n0s) if n0s else np.zeros((0, 3), np.float32)
    n1 = np.concatenate(n1s) if n1s else np.zeros((0, 3), np.float32)
    n2 = np.concatenate(n2s) if n2s else np.zeros((0, 3), np.float32)
    mat = np.concatenate(mats) if mats else np.zeros((0,), np.int32)
    uv = np.concatenate(uvs) if uvs else np.zeros((0, 3, 2), np.float32)
    col = np.concatenate(cols) if cols else np.zeros((0, 3, 3), np.float32)

    # Morton-order triangles by centroid so each 128-tri tile is
    # spatially compact — this is what makes the per-tile AABBs tight
    # enough for the ray-block culling in `_mesh_intersect_culled` to
    # skip most tiles (the sort replaces a BVH's spatial hierarchy).
    if len(v0) > _TILE:
        order = _morton_order(v0 + (e1 + e2) / 3.0)
        v0, e1, e2 = v0[order], e1[order], e2[order]
        n0, n1, n2 = n0[order], n1[order], n2[order]
        mat, uv, col = mat[order], uv[order], col[order]

    t = len(v0)
    pad = (-t) % _TILE
    zpad3 = np.zeros((pad, 3), np.float32)
    valid = np.concatenate([np.ones((t,), bool), np.zeros((pad,), bool)])
    cat = lambda a: np.concatenate([a, zpad3])
    return MeshTable(jnp.asarray(cat(v0)), jnp.asarray(cat(e1)),
                     jnp.asarray(cat(e2)), jnp.asarray(cat(n0)),
                     jnp.asarray(cat(n1)), jnp.asarray(cat(n2)),
                     jnp.asarray(np.concatenate(
                         [mat, np.zeros((pad,), np.int32)])),
                     jnp.asarray(valid),
                     jnp.asarray(np.concatenate(
                         [uv, np.zeros((pad, 3, 2), np.float32)])),
                     jnp.asarray(np.concatenate(
                         [col, np.zeros((pad, 3, 3), np.float32)]))
                     if any_cols else None)


def _morton_order(c):
    """Argsort by 30-bit Morton code of points quantised to 1024^3 over
    their bounds (host-side numpy, build time only)."""
    lo = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip(((c - lo) / ext * 1023.0).astype(np.uint32), 0, 1023)

    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def _tile_hits(mesh: MeshTable, tile: int, o, d):
    """Moller-Trumbore for one 128-triangle tile -> per-lane best within
    the tile: (t, b1, b2, tri_local, hit)."""
    sl = slice(tile * _TILE, (tile + 1) * _TILE)
    v0 = jax.lax.dynamic_slice_in_dim(mesh.v0, tile * _TILE, _TILE)
    e1 = jax.lax.dynamic_slice_in_dim(mesh.e1, tile * _TILE, _TILE)
    e2 = jax.lax.dynamic_slice_in_dim(mesh.e2, tile * _TILE, _TILE)
    valid = jax.lax.dynamic_slice_in_dim(mesh.valid, tile * _TILE, _TILE)

    # (N, 1, 3) x (TILE, 3) -> (N, TILE)
    d_b = d[..., None, :]
    o_b = o[..., None, :]
    pvec = jnp.cross(d_b, e2[None])
    det = jnp.sum(e1[None] * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = o_b - v0[None]
    b1 = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None])
    b2 = jnp.sum(d_b * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (b1 >= 0.0) & (b2 >= 0.0)
           & (b1 + b2 <= 1.0) & (t > _RAY_EPS) & valid[None])
    t = jnp.where(hit, t, jnp.inf)
    arg = jnp.argmin(t, axis=-1)
    take = lambda a: jnp.take_along_axis(a, arg[..., None], axis=-1)[..., 0]
    return take(t), take(b1), take(b2), arg, jnp.isfinite(take(t))


def mesh_interp_uv(mesh: MeshTable, tri, b1, b2):
    """Barycentric texture coordinates at a hit -> (..., 2)."""
    tri_c = jnp.maximum(tri, 0)
    corner = mesh.uv[tri_c]                   # (..., 3, 2)
    return ((1.0 - b1 - b2)[..., None] * corner[..., 0, :]
            + b1[..., None] * corner[..., 1, :]
            + b2[..., None] * corner[..., 2, :])


def mesh_interp_color(mesh: MeshTable, tri, b1, b2):
    """Barycentric vertex-color interpolation at a hit -> (..., 3)
    (the `mesh_attribute.cpp` eval path for per-vertex data)."""
    tri_c = jnp.maximum(tri, 0)
    corner = mesh.col[tri_c]                  # (..., 3, 3)
    return ((1.0 - b1 - b2)[..., None] * corner[..., 0, :]
            + b1[..., None] * corner[..., 1, :]
            + b2[..., None] * corner[..., 2, :])


_RAY_BLOCK = 8192        # coherent wavefront slice per culling decision
_CULL_MIN_TRIS = 512


def _cull_enabled() -> bool:
    """Tile culling is always on for the CPU backend; on TPU it is
    opt-in (TPUSKY_MESH_CULL=1) because this terminal's TPU compile
    service hangs on the nested map/scan/cond program (2026-08, same
    class of bug as the 2-D-grid Pallas hang recorded in BASELINE.md)."""
    import os
    if os.environ.get("TPUSKY_MESH_CULL") == "1":
        return True
    if os.environ.get("TPUSKY_MESH_CULL") == "0":
        return False
    return jax.default_backend() != "tpu"


def _mesh_intersect_culled(mesh: MeshTable, o, d):
    """Ray-block x triangle-tile culled closest hit (see mesh_intersect)."""
    lo, hi = _tile_aabbs(mesh)
    n_tiles = mesh.v0.shape[0] // _TILE
    B = _RAY_BLOCK

    def one_block(od):
        o_b, d_b = od

        def tile_step(carry, tile):
            bt, bb1, bb2, btri = carry
            far = jnp.max(bt)

            def hit_fn(c):
                bt, bb1, bb2, btri = c
                t, b1, b2, local, _h = _tile_hits(mesh, tile, o_b, d_b)
                closer = t < bt
                return (jnp.where(closer, t, bt),
                        jnp.where(closer, b1, bb1),
                        jnp.where(closer, b2, bb2),
                        jnp.where(closer, tile * _TILE + local, btri))

            pred = _block_hits_aabb(o_b, d_b, lo[tile], hi[tile], far)
            return jax.lax.cond(pred, hit_fn, lambda c: c, carry), None

        init = (jnp.full((B,), jnp.inf), jnp.zeros((B,)),
                jnp.zeros((B,)), jnp.full((B,), -1, jnp.int32))
        out, _ = jax.lax.scan(tile_step, init, jnp.arange(n_tiles))
        return out

    nb = o.shape[0] // B
    t, b1, b2, tri = jax.lax.map(
        one_block, (o.reshape(nb, B, 3), d.reshape(nb, B, 3)))
    t = t.reshape(-1)
    b1 = b1.reshape(-1)
    b2 = b2.reshape(-1)
    tri = tri.reshape(-1)
    hit = jnp.isfinite(t)
    tri_c = jnp.maximum(tri, 0)
    n = ((1.0 - b1 - b2)[..., None] * mesh.n0[tri_c]
         + b1[..., None] * mesh.n1[tri_c] + b2[..., None] * mesh.n2[tri_c])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return t, n, mesh.bsdf_idx[tri_c], b1, b2, tri, hit


def _mesh_test_culled(mesh: MeshTable, o, d, maxt):
    lo, hi = _tile_aabbs(mesh)
    n_tiles = mesh.v0.shape[0] // _TILE
    B = _RAY_BLOCK
    maxt_b = jnp.broadcast_to(jnp.asarray(maxt, o.dtype), o.shape[:-1])

    def one_block(odm):
        o_b, d_b, mt_b = odm

        def tile_step(occ, tile):
            def hit_fn(occ):
                t, _, _, _, hit = _tile_hits(mesh, tile, o_b, d_b)
                return occ | (hit & (t < mt_b))

            pred = (~jnp.all(occ)) & _block_hits_aabb(
                o_b, d_b, lo[tile], hi[tile], jnp.max(mt_b))
            return jax.lax.cond(pred, hit_fn, lambda c: c, occ), None

        occ, _ = jax.lax.scan(tile_step, jnp.zeros((B,), bool),
                              jnp.arange(n_tiles))
        return occ

    nb = o.shape[0] // B
    occ = jax.lax.map(one_block, (o.reshape(nb, B, 3),
                                  d.reshape(nb, B, 3),
                                  maxt_b.reshape(nb, B)))
    return occ.reshape(-1)


def _tile_aabbs(mesh: MeshTable):
    """(n_tiles, 6) [lo, hi] bounds per 128-triangle tile (tight over
    valid triangles; padding tris are degenerate at the last vertex)."""
    T = mesh.v0.shape[0]
    v0, v1, v2 = mesh.v0, mesh.v0 + mesh.e1, mesh.v0 + mesh.e2
    big = jnp.where(mesh.valid[:, None], 0.0, jnp.inf)
    lo = jnp.minimum(jnp.minimum(v0 + big, v1 + big), v2 + big)
    hi = jnp.maximum(jnp.maximum(v0 - big, v1 - big), v2 - big)
    lo = lo.reshape(T // _TILE, _TILE, 3).min(axis=1)
    hi = hi.reshape(T // _TILE, _TILE, 3).max(axis=1)
    return lo, hi


def _block_hits_aabb(o, d, lo, hi, maxt):
    """Does ANY ray in the block enter the AABB within (0, maxt)?
    Branch-free slab test -> a single scalar predicate."""
    inv = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    t0 = (lo[None, :] - o) * inv
    t1 = (hi[None, :] - o) * inv
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < maxt)
    return jnp.any(hit)


def _ray_sort_order(mesh: MeshTable, o, d):
    """Coherence-extracting permutation of a ray wavefront.

    Sort key: direction octant (3 bits, major) then 27-bit Morton code of
    the origin quantised over the mesh bounds (minor). Secondary/bounce
    wavefronts arrive in pixel order but with scattered origins and
    directions — the per-ray-block AABB culling in the Pallas kernel then
    degenerates to dense Moller-Trumbore (round-3 measurement: 0.31 M
    rays/s at 327k tris vs 5.2 M coherent). Grouping rays by octant +
    origin locality restores tight per-block bounds. This is the BVH's
    coherence-extraction role (`scene_embree.inl` packet traversal)
    recast as one argsort + gathers — both cheap, regular TPU ops.

    The sort is stable, so already-coherent camera wavefronts (equal
    keys within a block) keep their raster order. Returns (order,
    inverse) permutations.
    """
    lo = jnp.min(mesh.v0, axis=0)
    hi = jnp.max(mesh.v0 + jnp.maximum(mesh.e1, mesh.e2), axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((o - lo) / ext * 511.0, 0.0, 511.0).astype(jnp.uint32)

    def spread(x):                       # 9 bits -> every 3rd bit
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
              | (spread(q[..., 2]) << 2))
    octant = (((d[..., 0] < 0).astype(jnp.uint32) << 2)
              | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
              | (d[..., 2] < 0).astype(jnp.uint32))
    key = (octant << 27) | morton
    order = jnp.argsort(key, stable=True)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return order, inv


# Above this triangle count the Morton sort pays for itself even on
# raster-coherent camera wavefronts (origin reordering tightens the
# per-block AABBs): measured coherent 82k tris 13.4 M sorted vs 10.3 M
# skipped, 327k 8.1 vs 5.2 — while below it the sort overhead dominates
# (5k tris: 34.0 M skipped vs 22.6 M sorted).
_ADAPTIVE_SORT_MAX_TRIS = 32768


def _wavefront_coherent(d):
    """Cheap coherence proxy (VERDICT r4 item 7): mean direction-octant
    run length >= 64. Camera and shadow wavefronts (same octant in long
    pixel-ordered runs, origins already raster-coherent) skip the Morton
    sort — its overhead cost the small-mesh coherent case 33 -> 22 M
    rays/s in round 4 — while bounce wavefronts (octants scrambled
    per lane by BSDF sampling) keep it. Applied only below
    _ADAPTIVE_SORT_MAX_TRIS (static)."""
    octant = (((d[..., 0] < 0).astype(jnp.uint32) << 2)
              | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
              | (d[..., 2] < 0).astype(jnp.uint32))
    changes = jnp.sum((octant[1:] != octant[:-1]).astype(jnp.uint32))
    return changes * jnp.uint32(64) < jnp.uint32(octant.shape[0])


def _reorder_enabled() -> bool:
    import os
    return os.environ.get("TPUSKY_MESH_REORDER", "1") != "0"


def mesh_intersect(mesh: MeshTable, o, d):
    """Closest hit against all triangles -> (t, n_shading, mat_idx, b1, b2,
    tri_idx, hit). t = inf on miss.

    TPU-native acceleration without a BVH: triangles are Morton-ordered
    into 128-tri tiles at load (`make_mesh_table`), and the ray wavefront
    is processed in coherent blocks; for each (ray block, tile) pair a
    scalar any-ray-enters-AABB predicate drives a `lax.cond`, so whole
    tiles of Möller–Trumbore work are SKIPPED at runtime (TPU executes
    cond as a real branch). Ray blocks are pixel-ordered by construction,
    which is exactly the coherence the culling needs — the ray-packet
    idea recast for a 1D wavefront."""
    batch = o.shape[:-1]
    T = mesh.v0.shape[0]

    if o.ndim == 2 and _mesh_pallas_enabled():
        from ..ops.pallas.mesh_kernel import (mesh_intersect_pallas,
                                              mesh_tables_pallas)
        tables = mesh_tables_pallas(mesh)
        if _reorder_enabled():
            def _sorted(o_, d_):
                order, inv = _ray_sort_order(mesh, o_, d_)
                t, b1, b2, tri, hit = mesh_intersect_pallas(
                    mesh, o_[order], d_[order], tables=tables)
                return (t[inv], b1[inv], b2[inv], tri[inv], hit[inv])

            def _direct(o_, d_):
                return mesh_intersect_pallas(mesh, o_, d_, tables=tables)

            if T <= _ADAPTIVE_SORT_MAX_TRIS:
                # adaptive: TPU executes lax.cond as a real branch, so
                # the sort/gather cost is only paid on incoherent
                # wavefronts
                t, b1, b2, tri, hit = jax.lax.cond(
                    _wavefront_coherent(d), _direct, _sorted, o, d)
            else:
                t, b1, b2, tri, hit = _sorted(o, d)
        else:
            t, b1, b2, tri, hit = mesh_intersect_pallas(
                mesh, o, d, tables=tables)
        return (t,) + _shade_at_hit(mesh, b1, b2, tri) + (b1, b2, tri, hit)

    if T > _CULL_MIN_TRIS and o.ndim == 2 \
            and o.shape[0] % _RAY_BLOCK == 0 and _cull_enabled():
        return _mesh_intersect_culled(mesh, o, d)

    n_tiles = T // _TILE

    def body(carry, tile):
        bt, bb1, bb2, btri = carry
        t, b1, b2, local, hit = _tile_hits(mesh, tile, o, d)
        closer = t < bt
        bt = jnp.where(closer, t, bt)
        bb1 = jnp.where(closer, b1, bb1)
        bb2 = jnp.where(closer, b2, bb2)
        btri = jnp.where(closer, tile * _TILE + local, btri)
        return (bt, bb1, bb2, btri), None

    # init derived from `o` so shard_map varying axes are inherited
    zero = jnp.zeros_like(o[..., 0])
    init = (zero + jnp.inf, zero, zero,
            zero.astype(jnp.int32) - 1)
    (t, b1, b2, tri), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    hit = jnp.isfinite(t)
    return (t,) + _shade_at_hit(mesh, b1, b2, tri) + (b1, b2, tri, hit)


def _shade_at_hit(mesh: MeshTable, b1, b2, tri):
    """(shading normal, material idx) at barycentric (b1, b2) of tri."""
    tri_c = jnp.maximum(tri, 0)
    n = ((1.0 - b1 - b2)[..., None] * mesh.n0[tri_c]
         + b1[..., None] * mesh.n1[tri_c] + b2[..., None] * mesh.n2[tri_c])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n, mesh.bsdf_idx[tri_c]


def _mesh_pallas_enabled() -> bool:
    """Pallas VMEM-resident mesh intersection: default ON for the TPU
    backend (see ops/pallas/mesh_kernel.py; 150-500x the XLA scan path
    at 82k-327k triangles, sub-linear for coherent wavefronts)."""
    import os
    if os.environ.get("TPUSKY_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("TPUSKY_MESH_PALLAS") == "0":
        return False
    return jax.default_backend() == "tpu"


def mesh_test(mesh: MeshTable, o, d, maxt):
    """Any-hit within (eps, maxt)."""
    T = mesh.v0.shape[0]
    if o.ndim == 2 and _mesh_pallas_enabled():
        from ..ops.pallas.mesh_kernel import (mesh_intersect_pallas,
                                              mesh_tables_pallas)
        tables = mesh_tables_pallas(mesh)
        if _reorder_enabled():
            def _sorted(o_, d_):
                order, inv = _ray_sort_order(mesh, o_, d_)
                t, _, _, _, hit = mesh_intersect_pallas(
                    mesh, o_[order], d_[order], tables=tables)
                return t[inv], hit[inv]

            def _direct(o_, d_):
                t, _, _, _, hit = mesh_intersect_pallas(mesh, o_, d_,
                                                        tables=tables)
                return t, hit

            if T <= _ADAPTIVE_SORT_MAX_TRIS:
                t, hit = jax.lax.cond(_wavefront_coherent(d), _direct,
                                      _sorted, o, d)
            else:
                t, hit = _sorted(o, d)
            return hit & (t < maxt)             # maxt may be scalar
        t, _, _, _, hit = mesh_intersect_pallas(
            mesh, o, d, tables=tables)
        return hit & (t < maxt)
    if T > _CULL_MIN_TRIS and o.ndim == 2 \
            and o.shape[0] % _RAY_BLOCK == 0 and _cull_enabled():
        return _mesh_test_culled(mesh, o, d, maxt)
    n_tiles = T // _TILE

    def body(occ, tile):
        t, _, _, _, hit = _tile_hits(mesh, tile, o, d)
        return occ | (hit & (t < maxt)), None

    occ, _ = jax.lax.scan(body,
                          jnp.zeros_like(o[..., 0], dtype=bool),
                          jnp.arange(n_tiles))
    return occ
