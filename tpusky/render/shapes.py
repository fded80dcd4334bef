"""Analytic shapes with brute-force vectorised intersection.

TPU-first design: instead of a BVH (pointer-chasing is hostile to the
VPU/MXU), all shapes live in struct-of-arrays tables and every ray tests
every shape with dense, branch-free math; the closest hit wins via a masked
minimum. For the handful-of-shapes scenes the sunsky workloads use
(cf. SURVEY.md H3/H20: sphere/rectangle/disk/cube test scenes) this is both
simpler and faster than the reference's Embree/OptiX path on its own turf.
Shapes are expressed by an affine object-to-world transform, so one
(N, 4, 4) tensor describes each shape table.

Shape kinds: 0=sphere (unit, local), 1=rectangle ([-1,1]^2 in z=0 plane),
2=disk (unit radius in z=0 plane), 3=cube ([-1,1]^3), 4=cylinder (unit
radius, z in [0,1], open-ended — reference `cylinder.cpp` canonical frame).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.math import (dot, mat3_apply, mat3_apply_t, normalize,
                        safe_acos, safe_sqrt)

SPHERE, RECTANGLE, DISK, CUBE, CYLINDER = 0, 1, 2, 3, 4

_RAY_EPS = 1e-4


class ShapeTable(NamedTuple):
    """SoA shape set; static length N = number of shapes in the scene.

    `kind` is a tuple of Python ints registered as pytree AUX DATA, so it
    is STATIC under jit: the intersection loop dispatches to exactly one
    closed-form solution per shape at trace time instead of computing all
    five and selecting (~4x less VPU math per shape per ray) — the same
    static-specialization trick as `bsdf.table_kinds`."""
    kind: tuple                # (N,) static ints
    to_world: jnp.ndarray      # (N, 4, 4) affine object->world
    to_object: jnp.ndarray     # (N, 4, 4) inverse
    bsdf_idx: jnp.ndarray      # (N,) int32 index into the scene's BSDF table
    emitter_idx: jnp.ndarray   # (N,) int32 area-emitter index (-1 = none)
    area: jnp.ndarray          # (N,) world-space surface area


import jax as _jax  # noqa: E402  (pytree registration below)

_jax.tree_util.register_pytree_node(
    ShapeTable,
    lambda t: ((t.to_world, t.to_object, t.bsdf_idx, t.emitter_idx,
                t.area), t.kind),
    lambda kind, leaves: ShapeTable(kind, *leaves))


def _world_area(kind: int, t2w) -> float:
    """Surface area of the canonical shape under an affine transform.

    Exact for rectangles/disks (planar: |col0 x col1| scales area) and for
    spheres under uniform scaling; cubes use the average face scaling.
    """
    import numpy as np
    lin = np.asarray(t2w)[:3, :3]
    cross = np.linalg.norm(np.cross(lin[:, 0], lin[:, 1]))
    if kind == RECTANGLE:
        return 4.0 * cross
    if kind == DISK:
        return float(np.pi) * cross
    if kind == SPHERE:
        s = np.abs(np.linalg.det(lin)) ** (2.0 / 3.0)
        return 4.0 * float(np.pi) * s
    if kind == CYLINDER:
        # lateral area: average the azimuthal extremes of
        # |dp/dphi x dp/dz| (exact under uniform scaling)
        c02 = np.linalg.norm(np.cross(lin[:, 0], lin[:, 2]))
        c12 = np.linalg.norm(np.cross(lin[:, 1], lin[:, 2]))
        return float(np.pi) * (c02 + c12)
    # cube: 6 faces of area 4 each, averaged over the three face scalings
    c01 = np.linalg.norm(np.cross(lin[:, 0], lin[:, 1]))
    c12 = np.linalg.norm(np.cross(lin[:, 1], lin[:, 2]))
    c02 = np.linalg.norm(np.cross(lin[:, 0], lin[:, 2]))
    return 8.0 * (c01 + c12 + c02)


def world_area_jnp(kind: int, t2w):
    """Differentiable surface area of a canonical shape under `t2w` (4,4).

    jnp mirror of `_world_area` (kind is a static Python int) so
    `ShapeTable.area` can be re-derived when `to_world` is a traced,
    differentiated parameter (scene-wide traverse/update,
    reference `util.py:13-331` SceneParameters semantics)."""
    lin = t2w[:3, :3]
    cr01 = jnp.linalg.norm(jnp.cross(lin[:, 0], lin[:, 1]))
    if kind == RECTANGLE:
        return 4.0 * cr01
    if kind == DISK:
        return jnp.pi * cr01
    if kind == SPHERE:
        s = jnp.abs(jnp.linalg.det(lin)) ** (2.0 / 3.0)
        return 4.0 * jnp.pi * s
    cr12 = jnp.linalg.norm(jnp.cross(lin[:, 1], lin[:, 2]))
    cr02 = jnp.linalg.norm(jnp.cross(lin[:, 0], lin[:, 2]))
    if kind == CYLINDER:
        return jnp.pi * (cr02 + cr12)
    return 8.0 * (cr01 + cr12 + cr02)   # cube


def make_shape_table(shapes) -> ShapeTable:
    """Build a ShapeTable from a list of dicts:
    {kind, to_world (4x4), bsdf_idx, emitter_idx}."""
    import numpy as np
    n = len(shapes)
    kind = np.zeros((n,), np.int32)
    t2w = np.zeros((n, 4, 4), np.float32)
    bsdf = np.zeros((n,), np.int32)
    emit = np.full((n,), -1, np.int32)
    area = np.zeros((n,), np.float32)
    for i, s in enumerate(shapes):
        kind[i] = s["kind"]
        t2w[i] = np.asarray(s.get("to_world", np.eye(4)), np.float32)
        bsdf[i] = s.get("bsdf_idx", 0)
        emit[i] = s.get("emitter_idx", -1)
        area[i] = _world_area(int(kind[i]), t2w[i])
    t2o = np.linalg.inv(t2w)
    return ShapeTable(tuple(int(k) for k in kind), jnp.asarray(t2w),
                      jnp.asarray(t2o), jnp.asarray(bsdf),
                      jnp.asarray(emit), jnp.asarray(area))


def sample_position(table: ShapeTable, shape_idx, u2):
    """Uniform-area sample on the given shapes.

    shape_idx (...,) int32; u2 (..., 2). Returns (p_world, n_world,
    pdf_area) — pdf is 1/area in world measure. Supports rectangle, disk,
    sphere (area sampling; cf. reference shape `sample_position` methods).
    """
    # per-lane table rows via masked accumulation over the (small) static
    # shape count — per-lane gathers of 4x4 matrices are pathologically
    # slow on TPU (see ops/gather.py)
    n_shapes = len(table.kind)
    batch = shape_idx.shape
    kind = jnp.zeros(batch, jnp.int32)
    t2w = jnp.zeros(batch + (4, 4))
    t2o = jnp.zeros(batch + (4, 4))
    inv_area = jnp.zeros(batch)
    for s in range(n_shapes):
        sel = shape_idx == s
        kind = jnp.where(sel, table.kind[s], kind)
        t2w = jnp.where(sel[..., None, None], table.to_world[s], t2w)
        t2o = jnp.where(sel[..., None, None], table.to_object[s], t2o)
        inv_area = jnp.where(sel, 1.0 / table.area[s], inv_area)

    # rectangle: uniform on [-1,1]^2, z=0
    p_rect = jnp.stack([2.0 * u2[..., 0] - 1.0, 2.0 * u2[..., 1] - 1.0,
                        jnp.zeros_like(u2[..., 0])], axis=-1)
    # disk: concentric-free polar map
    r = jnp.sqrt(u2[..., 0])
    phi = 2.0 * jnp.pi * u2[..., 1]
    p_disk = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                        jnp.zeros_like(r)], axis=-1)
    n_plane = jnp.asarray([0.0, 0.0, 1.0])
    # sphere: uniform on the unit sphere
    z = 1.0 - 2.0 * u2[..., 0]
    sr = safe_sqrt(1.0 - z * z)
    p_sph = jnp.stack([sr * jnp.cos(phi), sr * jnp.sin(phi), z], axis=-1)
    # cylinder: uniform on the lateral surface
    p_cyl = jnp.stack([jnp.cos(phi), jnp.sin(phi), u2[..., 0]], axis=-1)
    n_cyl = jnp.stack([jnp.cos(phi), jnp.sin(phi),
                       jnp.zeros_like(phi)], axis=-1)

    planar = (kind == RECTANGLE) | (kind == DISK)
    p_local = jnp.select([(kind == RECTANGLE)[..., None],
                          (kind == DISK)[..., None],
                          (kind == CYLINDER)[..., None]],
                         [p_rect, p_disk, p_cyl], p_sph)
    n_local = jnp.select([planar[..., None],
                          (kind == CYLINDER)[..., None]],
                         [jnp.broadcast_to(n_plane, p_sph.shape), n_cyl],
                         p_sph)

    p_world = _xform_point(t2w, p_local)
    n_world = normalize(_xform_normal(t2o, n_local))
    return p_world, n_world, inv_area


def _mat3_rows(m, v, transpose=False):
    """Batched (..., 3, 3) x (..., 3) with explicit VPU arithmetic (no
    MXU bf16 truncation — see ops/math.py mat3_apply)."""
    a = m[..., :3, :3]
    if transpose:
        return (v[..., 0:1] * a[..., 0, :] + v[..., 1:2] * a[..., 1, :]
                + v[..., 2:3] * a[..., 2, :])
    return (v[..., 0:1] * a[..., :, 0] + v[..., 1:2] * a[..., :, 1]
            + v[..., 2:3] * a[..., :, 2])


def _xform_point(m, p):
    return _mat3_rows(m, p) + m[..., :3, 3]


def _xform_vector(m, v):
    return _mat3_rows(m, v)


def _xform_normal(m_inv, n):
    """Normals transform by the inverse-transpose of the linear part."""
    return _mat3_rows(m_inv, n, transpose=True)


def _isect_sphere(o, d):
    """Unit sphere |o + t d|^2 = 1."""
    a = dot(d, d)
    b = 2.0 * dot(o, d)
    c = dot(o, o) - 1.0
    disc = b * b - 4.0 * a * c
    sq = safe_sqrt(disc)   # zero-grad at disc<=0: miss lanes must not emit NaN cotangents
    q = -0.5 * (b + jnp.sign(b) * sq)
    t0 = q / a
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    big = jnp.asarray(jnp.inf, o.dtype)
    t = jnp.where(tn > _RAY_EPS, tn, jnp.where(tf > _RAY_EPS, tf, big))
    t = jnp.where(disc >= 0.0, t, big)
    # hit positions use a finite t on miss lanes: p = o + inf*d makes
    # NaNs (inf*0) whose arctan2/derivative cotangents contaminate the
    # backward pass through shared subexpressions
    pp = o + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * d
    uv = jnp.stack([
        jnp.arctan2(pp[..., 1], pp[..., 0]) / (2 * jnp.pi) + 0.5,
        safe_acos(pp[..., 2]) / jnp.pi], axis=-1)
    return t, pp, uv, jnp.isfinite(t)


def _isect_plane(o, d, disk):
    """z = 0 plane clipped to the unit rectangle/disk."""
    dz = d[..., 2]
    t_pl = -o[..., 2] / jnp.where(dz == 0.0, 1.0, dz)
    pp = o + t_pl[..., None] * d
    if disk:
        inside = pp[..., 0] ** 2 + pp[..., 1] ** 2 <= 1.0
    else:
        inside = (jnp.abs(pp[..., 0]) <= 1.0) & (jnp.abs(pp[..., 1]) <= 1.0)
    ok = (dz != 0.0) & (t_pl > _RAY_EPS) & inside
    big = jnp.asarray(jnp.inf, o.dtype)
    t = jnp.where(ok, t_pl, big)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], o.dtype), pp.shape)
    uv = 0.5 * (pp[..., :2] + 1.0)
    return t, n, uv, ok


def _isect_cylinder(o, d):
    """x^2 + y^2 = 1, z in [0, 1], open-ended."""
    a_cy = d[..., 0] ** 2 + d[..., 1] ** 2
    b_cy = 2.0 * (o[..., 0] * d[..., 0] + o[..., 1] * d[..., 1])
    c_cy = o[..., 0] ** 2 + o[..., 1] ** 2 - 1.0
    disc = b_cy * b_cy - 4.0 * a_cy * c_cy
    sq = safe_sqrt(disc)
    a_safe = jnp.where(a_cy == 0.0, 1.0, a_cy)
    t0 = (-b_cy - sq) / (2.0 * a_safe)
    t1 = (-b_cy + sq) / (2.0 * a_safe)

    def _valid(tc):
        z = o[..., 2] + tc * d[..., 2]
        return (tc > _RAY_EPS) & (z >= 0.0) & (z <= 1.0)

    big = jnp.asarray(jnp.inf, o.dtype)
    t = jnp.where(_valid(t0), t0, jnp.where(_valid(t1), t1, big))
    t = jnp.where((disc >= 0.0) & (a_cy > 0.0), t, big)
    pp = o + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * d
    n = jnp.stack([pp[..., 0], pp[..., 1], jnp.zeros_like(t)], axis=-1)
    uv = jnp.stack([
        jnp.arctan2(pp[..., 1], pp[..., 0]) / (2 * jnp.pi) + 0.5,
        jnp.clip(pp[..., 2], 0.0, 1.0)], axis=-1)
    return t, n, uv, jnp.isfinite(t)


def _isect_cube(o, d):
    """Slab test on [-1, 1]^3."""
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    tl = (-1.0 - o) * inv_d
    th = (1.0 - o) * inv_d
    t_near = jnp.max(jnp.minimum(tl, th), axis=-1)
    t_far = jnp.min(jnp.maximum(tl, th), axis=-1)
    hit = (t_near <= t_far) & (t_far > _RAY_EPS)
    big = jnp.asarray(jnp.inf, o.dtype)
    t = jnp.where(hit, jnp.where(t_near > _RAY_EPS, t_near, t_far), big)
    pp = o + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * d
    axis = jnp.argmax(jnp.abs(pp), axis=-1)
    n = (jnp.sign(pp) * (jnp.arange(3) == axis[..., None]).astype(o.dtype))
    uv = jnp.zeros(pp.shape[:-1] + (2,), o.dtype)
    return t, n, uv, jnp.isfinite(t) & hit


def _intersect_one(kind_s, o_l, d_l):
    """Local-space intersection against one shape. `kind_s` is a STATIC
    Python int (ShapeTable.kind aux data), so exactly one closed form is
    traced — the analogue of the reference compiling one intersection
    routine per shape plugin, without its virtual dispatch."""
    kind_s = int(kind_s)
    if kind_s == SPHERE:
        t, pp, uv, hit = _isect_sphere(o_l, d_l)
        return t, pp, uv, hit          # normal == position on unit sphere
    if kind_s in (RECTANGLE, DISK):
        return _isect_plane(o_l, d_l, disk=(kind_s == DISK))
    if kind_s == CYLINDER:
        return _isect_cylinder(o_l, d_l)
    if kind_s == CUBE:
        return _isect_cube(o_l, d_l)
    raise ValueError(f"unknown shape kind {kind_s}")


def ray_intersect(shapes: ShapeTable, o, d, maxt=jnp.inf):
    """Closest-hit intersection of world rays against every shape.

    o, d: (..., 3). Statically unrolls over the (small) shape count with
    pure elementwise math and running-minimum selection — no gathers, no
    shape-axis tensors. (Per-lane gathers of per-shape 4x4 matrices
    measured 26x slower on TPU than this formulation.)
    """
    n_shapes = len(shapes.kind)
    batch = o.shape[:-1]
    inf = jnp.inf

    best_t = jnp.full(batch, inf)
    best_n = jnp.zeros(batch + (3,))
    best_uv = jnp.zeros(batch + (2,))
    best_idx = jnp.full(batch, -1, jnp.int32)

    for s in range(n_shapes):
        m = shapes.to_object[s]              # (4, 4) static slice
        lin = m[:3, :3]
        # VPU-exact transforms: `@` would hit the MXU in bf16 (ops/math.py)
        o_l = mat3_apply(lin, o) + m[:3, 3]
        d_l = mat3_apply(lin, d)
        t, n_l, uv, hit = _intersect_one(shapes.kind[s], o_l, d_l)
        # world normal: inverse-transpose of the object-to-world linear
        # part == to_object's linear part, transposed contraction
        n_w = mat3_apply_t(lin, n_l)
        closer = hit & (t < best_t) & (t < maxt)
        best_t = jnp.where(closer, t, best_t)
        best_n = jnp.where(closer[..., None], n_w, best_n)
        best_uv = jnp.where(closer[..., None], uv, best_uv)
        best_idx = jnp.where(closer, s, best_idx)

    valid = jnp.isfinite(best_t) & (best_idx >= 0)
    best_n = normalize(jnp.where(valid[..., None], best_n,
                                 jnp.asarray([0.0, 0.0, 1.0])))
    p = o + jnp.where(valid, best_t, 0.0)[..., None] * d
    return best_t, p, best_n, best_uv, best_idx, valid


def ray_test(shapes: ShapeTable, o, d, maxt):
    """Shadow-ray predicate: does anything lie within (eps, maxt)?"""
    n_shapes = len(shapes.kind)
    occluded = jnp.zeros(o.shape[:-1], bool)
    for s in range(n_shapes):
        m = shapes.to_object[s]
        lin = m[:3, :3]
        o_l = mat3_apply(lin, o) + m[:3, 3]
        d_l = mat3_apply(lin, d)
        t, _, _, hit = _intersect_one(shapes.kind[s], o_l, d_l)
        occluded = occluded | (hit & (t < maxt))
    return occluded
