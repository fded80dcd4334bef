"""Signed-distance-function grid shape (reference: `src/shapes/sdfgrid.cpp`).

A trilinearly-interpolated SDF sampled on a regular grid over the unit
cube [0,1]^3, placed by an affine to_world transform. Intersection is
sphere tracing with a STATIC iteration count (`_N_STEPS`) — a bounded
`lax.fori_loop`, reverse-differentiable by construction (the reference
needs a custom `ray_intersect_preliminary` + reparameterization for the
same effect).

Differentiability: the marching itself is detached (it only locates the
root), then ONE attached Newton step
    t* = t - sdf(o + t d) / <grad sdf, d>
re-derives the hit distance through the implicit function theorem — so
gradients flow from the image to the grid VALUES (and the transform)
exactly, without differentiating through the marching loop. This mirrors
`sdfgrid.cpp`'s `differentiable position` trick.

Performance note: trilinear interpolation needs 8 per-lane gathers per
step. Gathers from small tables are the one op class that lowers badly on
TPU (see ops/gather.py), so this shape is correct-but-not-speed-of-light;
it exists for reference parity (H20) and differentiable-SDF experiments,
not for the hot path. The analytic shapes and meshes remain gather-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SDFGrid", "make_sdf_grid", "sdf_eval", "sdf_intersect",
           "sdf_test", "sphere_sdf_grid"]

_N_STEPS = 64          # sphere-tracing iterations (static)
_HIT_EPS = 1e-4        # |sdf| below this counts as a hit
_RAY_EPS = 1e-4


class SDFGrid(NamedTuple):
    values: jnp.ndarray     # (D, D, D) signed distances at grid nodes
    to_local: jnp.ndarray   # (4, 4) world -> unit-cube space
    to_world: jnp.ndarray   # (4, 4)
    bsdf_idx: jnp.ndarray   # () int32


def make_sdf_grid(values, to_world=None, bsdf_idx: int = 0) -> SDFGrid:
    t2w = np.eye(4, dtype=np.float32) if to_world is None \
        else np.asarray(to_world, np.float32)
    return SDFGrid(jnp.asarray(values, jnp.float32),
                   jnp.asarray(np.linalg.inv(t2w), jnp.float32),
                   jnp.asarray(t2w, jnp.float32),
                   jnp.asarray(int(bsdf_idx), jnp.int32))


def sphere_sdf_grid(res: int = 32, radius: float = 0.4,
                    center=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Analytic sphere baked onto a grid — the standard test asset
    (`sdfgrid.cpp` docs example)."""
    g = (np.arange(res) + 0.0) / (res - 1)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = np.asarray(center)
    return (np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
            - radius).astype(np.float32)


def _trilinear(values, p):
    """values (D,D,D); p (..., 3) in [0,1]^3 -> interpolated sdf (...,).

    Grid nodes sit at i/(D-1) (reference sdfgrid texel convention)."""
    D = values.shape[0]
    q = jnp.clip(p, 0.0, 1.0) * (D - 1)
    i0 = jnp.clip(q.astype(jnp.int32), 0, D - 2)
    f = q - i0
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    flat = values.reshape(-1)

    def corner(dx, dy, dz):
        idx = ((ix + dx) * D + (iy + dy)) * D + (iz + dz)
        return jnp.take(flat, idx)

    c000, c001 = corner(0, 0, 0), corner(0, 0, 1)
    c010, c011 = corner(0, 1, 0), corner(0, 1, 1)
    c100, c101 = corner(1, 0, 0), corner(1, 0, 1)
    c110, c111 = corner(1, 1, 0), corner(1, 1, 1)
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def sdf_eval(sdf: SDFGrid, p_world):
    """SDF value at world points (trilinear; distances are local-space)."""
    A = sdf.to_local
    pl = p_world @ A[:3, :3].T + A[:3, 3]
    return _trilinear(sdf.values, pl)


def _grad_local(values, p, eps=1e-3):
    """Central-difference gradient of the trilinear field (local space)."""
    def d(axis):
        e = jnp.zeros((3,)).at[axis].set(eps)
        return (_trilinear(values, p + e) - _trilinear(values, p - e)) \
            / (2 * eps)
    return jnp.stack([d(0), d(1), d(2)], axis=-1)


def _cube_interval(ol, dl):
    inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-12,
                          jnp.where(dl >= 0, 1e-12, -1e-12), dl)
    ta = (0.0 - ol) * inv
    tb = (1.0 - ol) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    ok = (t0 <= t1) & (t1 > _RAY_EPS)
    return jnp.maximum(t0, _RAY_EPS), t1, ok


def sdf_intersect(sdf: SDFGrid, o, d):
    """Sphere-trace world rays -> (t_world, n_world, hit).

    March in LOCAL space (the SDF's metric), convert t back through the
    direction's length."""
    A = sdf.to_local
    ol = o @ A[:3, :3].T + A[:3, 3]
    dl_raw = d @ A[:3, :3].T
    dscale = jnp.linalg.norm(dl_raw, axis=-1)
    dl = dl_raw / jnp.maximum(dscale, 1e-12)[..., None]

    t0, t1, box_ok = _cube_interval(ol, dl)
    sg = jax.lax.stop_gradient

    def step(_, carry):
        t, done = carry
        p = ol + t[..., None] * dl
        s = _trilinear(sg(sdf.values), sg(p))
        hit_now = jnp.abs(s) < _HIT_EPS
        adv = jnp.where(done | hit_now, 0.0, jnp.maximum(s, _HIT_EPS))
        return t + adv, done | hit_now | (t + adv > t1)

    t_init = jnp.where(box_ok, t0, jnp.inf)
    t_m, _ = jax.lax.fori_loop(0, _N_STEPS, step,
                               (sg(t_init), ~box_ok))
    p_m = ol + t_m[..., None] * dl
    s_final = _trilinear(sg(sdf.values), sg(p_m))
    hit = box_ok & (jnp.abs(s_final) < 10 * _HIT_EPS) & jnp.isfinite(t_m)

    # one attached Newton step: implicit-function-theorem gradients
    grad = _grad_local(sdf.values, sg(p_m))
    denom = jnp.sum(grad * dl, axis=-1)
    s_att = _trilinear(sdf.values, sg(p_m))
    t_att = sg(t_m) - s_att / jnp.where(jnp.abs(denom) < 1e-6,
                                        jnp.where(denom >= 0, 1e-6, -1e-6),
                                        denom)

    n_local = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    # normals transform by the inverse-transpose linear part
    n_world = n_local @ A[:3, :3]
    n_world = n_world / jnp.maximum(
        jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-9)
    t_world = t_att / jnp.maximum(dscale, 1e-12)
    t_world = jnp.where(hit, t_world, jnp.inf)
    return t_world, n_world, hit


def sdf_test(sdf: SDFGrid, o, d, maxt):
    t, _, hit = sdf_intersect(sdf, o, d)
    return hit & (t < maxt)
