"""Curve shapes: B-spline / linear curves as sphere-swept segment tables.

TPU-first counterpart of the reference's curve shapes (SURVEY.md H20;
`src/shapes/bsplinecurve.cpp`, `src/shapes/linearcurve.cpp`). The
reference ray-traces curves with Embree/OptiX curve primitives; here each
curve is tessellated at build time into *rounded cones* (sphere-swept
segments with linearly varying radius) and intersected brute-force in
dense 128-wide tiles, exactly like `mesh.py` — regular compute, no BVH.

- `linearcurve`: control points connect directly (one segment per edge).
- `bsplinecurve`: cubic uniform B-spline; every span of 4 consecutive
  control points is flattened into `subdiv` rounded cones via the basis
    B(t) = 1/6 [ (1-t)^3, 3t^3-6t^2+4, -3t^3+3t^2+3t+1, t^3 ]
  (the same basis the reference evaluates on-chip,
  `bsplinecurve.cpp` kernel helpers).

The rounded-cone intersector is the standard closed form (body quadratic
+ two sphere caps), branch-free with `where` masks.

File format parity: `make_curve_table_from_file` reads the reference's
ASCII format — one "x y z radius" per line, blank lines separating
individual curves (`bsplinecurve.cpp` file parsing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import safe_sqrt

_TILE = 128
_RAY_EPS = 1e-4


class CurveTable(NamedTuple):
    """All scene curve segments, concatenated and padded to a tile
    multiple. Segment i is the sphere-swept volume between (pa, ra) and
    (pb, rb)."""
    pa: jnp.ndarray         # (S, 3)
    pb: jnp.ndarray         # (S, 3)
    ra: jnp.ndarray         # (S,)
    rb: jnp.ndarray         # (S,)
    bsdf_idx: jnp.ndarray   # (S,) int32
    valid: jnp.ndarray      # (S,) bool (False on padding)


def _bspline_flatten(pts: np.ndarray, radii: np.ndarray, subdiv: int):
    """Cubic uniform B-spline -> polyline of (points, radii)."""
    n = len(pts)
    if n < 4:
        return pts, radii
    out_p, out_r = [], []
    ts = np.linspace(0.0, 1.0, subdiv + 1)
    for s in range(n - 3):
        p = pts[s:s + 4]           # (4, 3)
        r = radii[s:s + 4]
        t = ts[:-1] if s < n - 4 else ts
        b0 = (1 - t) ** 3 / 6.0
        b1 = (3 * t ** 3 - 6 * t ** 2 + 4) / 6.0
        b2 = (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1) / 6.0
        b3 = t ** 3 / 6.0
        basis = np.stack([b0, b1, b2, b3], axis=-1)     # (K, 4)
        out_p.append(basis @ p)
        out_r.append(basis @ r)
    return np.concatenate(out_p), np.concatenate(out_r)


def make_curve_table(curves, subdiv: int = 8) -> CurveTable:
    """curves: list of dicts {points (P,3), radii (P,) | radius float,
    kind 'linear'|'bspline', to_world (4,4) optional, bsdf_idx int}."""
    pas, pbs, ras, rbs, mats = [], [], [], [], []
    for c in curves:
        pts = np.asarray(c["points"], np.float32)
        radii = c.get("radii")
        if radii is None:
            radii = np.full((len(pts),), float(c.get("radius", 0.1)),
                            np.float32)
        else:
            radii = np.asarray(radii, np.float32)
        t2w = np.asarray(c.get("to_world", np.eye(4)), np.float32)
        pts = pts @ t2w[:3, :3].T + t2w[:3, 3]
        # uniform scale assumed for radii (like the reference's curve
        # to_world handling: radii scale by the linear part's norm)
        radii = radii * float(np.cbrt(abs(np.linalg.det(t2w[:3, :3]))))
        if c.get("kind", "bspline") == "bspline":
            pts, radii = _bspline_flatten(pts, radii, subdiv)
        pas.append(pts[:-1])
        pbs.append(pts[1:])
        ras.append(radii[:-1])
        rbs.append(radii[1:])
        mats.append(np.full((len(pts) - 1,), c.get("bsdf_idx", 0),
                            np.int32))
    pa = np.concatenate(pas) if pas else np.zeros((0, 3), np.float32)
    pb = np.concatenate(pbs) if pbs else np.zeros((0, 3), np.float32)
    ra = np.concatenate(ras) if ras else np.zeros((0,), np.float32)
    rb = np.concatenate(rbs) if rbs else np.zeros((0,), np.float32)
    mat = np.concatenate(mats) if mats else np.zeros((0,), np.int32)
    s = len(pa)
    pad = (-s) % _TILE
    valid = np.concatenate([np.ones((s,), bool), np.zeros((pad,), bool)])
    # padding segments are tiny far-away non-degenerate cones (masked by
    # `valid`, and harmless/finite even before masking)
    pad_a = np.full((pad, 3), 1e6, np.float32)
    pad_b = pad_a + np.array([1.0, 0.0, 0.0], np.float32)
    cat1 = lambda a, v: np.concatenate([a, np.full((pad,), v, a.dtype)])
    return CurveTable(jnp.asarray(np.concatenate([pa, pad_a])),
                      jnp.asarray(np.concatenate([pb, pad_b])),
                      jnp.asarray(cat1(ra, 1e-3)),
                      jnp.asarray(cat1(rb, 1e-3)),
                      jnp.asarray(cat1(mat, 0)),
                      jnp.asarray(valid))


def read_curve_file(path: str):
    """Reference ASCII curve format: 'x y z radius' lines; blank line =
    next curve (`bsplinecurve.cpp` parser). Returns list of
    (points (P,3), radii (P,))."""
    out, pts = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                if pts:
                    out.append(pts)
                    pts = []
                continue
            vals = [float(v) for v in line.split()]
            pts.append(vals[:4] if len(vals) >= 4 else vals + [0.1])
    if pts:
        out.append(pts)
    return [(np.asarray(p, np.float32)[:, :3],
             np.asarray(p, np.float32)[:, 3]) for p in out]


def _round_cone_hits(curve: CurveTable, tile: int, o, d):
    """Rounded-cone intersection for one 128-segment tile -> per-lane best
    (t, n, seg_local, hit)."""
    pa = jax.lax.dynamic_slice_in_dim(curve.pa, tile * _TILE, _TILE)
    pb = jax.lax.dynamic_slice_in_dim(curve.pb, tile * _TILE, _TILE)
    ra = jax.lax.dynamic_slice_in_dim(curve.ra, tile * _TILE, _TILE)
    rb = jax.lax.dynamic_slice_in_dim(curve.rb, tile * _TILE, _TILE)
    valid = jax.lax.dynamic_slice_in_dim(curve.valid, tile * _TILE, _TILE)

    o_b = o[..., None, :]                      # (N, 1, 3)
    d_b = d[..., None, :]
    ba = (pb - pa)[None]                       # (1, TILE, 3)
    oa = o_b - pa[None]
    ob = o_b - pb[None]
    rr = (ra - rb)[None]
    m0 = jnp.sum(ba * ba, axis=-1)
    m1 = jnp.sum(ba * oa, axis=-1)
    m2 = jnp.sum(ba * d_b, axis=-1)
    m3 = jnp.sum(d_b * oa, axis=-1)
    m5 = jnp.sum(oa * oa, axis=-1)
    m6 = jnp.sum(ob * d_b, axis=-1)
    m7 = jnp.sum(ob * ob, axis=-1)

    d2 = m0 - rr * rr
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * ra[None]
    k0 = (d2 * m5 - m1 * m1 + 2.0 * m1 * rr * ra[None]
          - m0 * ra[None] * ra[None])
    h = k1 * k1 - k0 * k2
    sq = safe_sqrt(h)
    k2s = jnp.where(jnp.abs(k2) < 1e-12, 1e-12, k2)
    t_body = (-sq - k1) / k2s
    y = m1 - ra[None] * rr + t_body * m2
    body_ok = (h > 0.0) & (y > 0.0) & (y < d2) & (d2 > 0.0) \
        & (t_body > _RAY_EPS)
    # sphere caps
    h1 = m3 * m3 - m5 + ra[None] * ra[None]
    h2 = m6 * m6 - m7 + rb[None] * rb[None]
    t_ca = -m3 - safe_sqrt(h1)
    t_cb = -m6 - safe_sqrt(h2)
    ca_ok = (h1 > 0.0) & (t_ca > _RAY_EPS)
    cb_ok = (h2 > 0.0) & (t_cb > _RAY_EPS)

    t_body = jnp.where(body_ok, t_body, jnp.inf)
    t_ca = jnp.where(ca_ok, t_ca, jnp.inf)
    t_cb = jnp.where(cb_ok, t_cb, jnp.inf)
    t = jnp.minimum(t_body, jnp.minimum(t_ca, t_cb))
    hit = jnp.isfinite(t) & valid[None]
    t = jnp.where(hit, t, jnp.inf)

    # normals for the winning part, per segment
    p_hit = o_b + d_b * t[..., None]
    n_body = d2[..., None] * (oa + t[..., None] * d_b) - ba * y[..., None]
    n_ca = (oa + t[..., None] * d_b)
    n_cb = (ob + t[..., None] * d_b)
    use_ca = t == t_ca
    use_cb = t == t_cb
    n_seg = jnp.where(use_ca[..., None], n_ca,
                      jnp.where(use_cb[..., None], n_cb, n_body))
    n_seg = n_seg / jnp.maximum(
        jnp.linalg.norm(n_seg, axis=-1, keepdims=True), 1e-12)

    arg = jnp.argmin(t, axis=-1)
    take = lambda a: jnp.take_along_axis(a, arg[..., None], axis=-1)[..., 0]
    n_best = jnp.take_along_axis(n_seg, arg[..., None, None], axis=-2)
    n_best = n_best[..., 0, :]
    t_best = take(t)
    del p_hit
    return t_best, n_best, arg, jnp.isfinite(t_best)


def curve_intersect(curve: CurveTable, o, d):
    """Closest hit against all curve segments -> (t, n, mat_idx, hit,
    tangent). The unit tangent of the winning segment feeds the hair
    BCSDF's fiber frame (`hair.cpp` expects +y along the fiber)."""
    n_tiles = curve.pa.shape[0] // _TILE
    batch = o.shape[:-1]

    def body(carry, tile):
        bt, bn, bseg = carry
        t, n, local, hit = _round_cone_hits(curve, tile, o, d)
        closer = t < bt
        bt = jnp.where(closer, t, bt)
        bn = jnp.where(closer[..., None], n, bn)
        bseg = jnp.where(closer, tile * _TILE + local, bseg)
        return (bt, bn, bseg), None

    init = (jnp.full(batch, jnp.inf),
            jnp.zeros(batch + (3,)).at[..., 2].set(1.0),
            jnp.full(batch, -1, jnp.int32))
    (t, n, seg), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    hit = jnp.isfinite(t)
    seg_c = jnp.maximum(seg, 0)
    mat = curve.bsdf_idx[seg_c]
    tg = curve.pb[seg_c] - curve.pa[seg_c]
    tg = tg / jnp.maximum(jnp.linalg.norm(tg, axis=-1, keepdims=True),
                          1e-12)
    return t, n, mat, hit, tg


def curve_test(curve: CurveTable, o, d, maxt):
    """Any-hit within (eps, maxt)."""
    n_tiles = curve.pa.shape[0] // _TILE

    def body(occ, tile):
        t, _, _, hit = _round_cone_hits(curve, tile, o, d)
        return occ | (hit & (t < maxt)), None

    occ, _ = jax.lax.scan(body, jnp.zeros(o.shape[:-1], bool),
                          jnp.arange(n_tiles))
    return occ
