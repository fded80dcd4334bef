"""2D sampling distributions over the unit square.

Reference parity for ``include/mitsuba/core/distr_2d.h``:
``Marginal2D<0>`` (:838 — row-marginal + per-row-conditional inverse-CDF
with bilinear density interpolation) and ``Hierarchical2D<0>`` (:344 —
mip-pyramid warp descending one resolution level per step). Mitsuba uses
these for envmap importance sampling (`envmap.cpp:103,:233`) and
microfacet visible-normal warps.

TPU-native design:

* Both are pure jnp over static-shape tables; sampling is branch-free.
* ``Marginal2D``: two `searchsorted` calls on precomputed inclusive CDFs +
  one fractional linear-interp each — O(log n) compares, no gathers of
  2D slices beyond one row fetch (`take_rows`).
* ``Hierarchical2D``: the reference walks the mip pyramid with
  data-dependent loads per level; the same walk here is a statically
  unrolled Python loop over the (log2 res) levels — each level is a
  4-way masked select, fully vectorized over the sample batch.
* Densities are *discrete* per cell (patch-constant), matching the
  reference's Hierarchical2D and the discrete (non-bilinear) Marginal2D
  mode; that is what chi² consistency tests require.

Both return (sample_xy, pdf) and provide an exact ``pdf(xy)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["Marginal2D", "make_marginal_2d", "marginal_sample",
           "marginal_pdf", "Hierarchical2D", "make_hierarchical_2d",
           "hierarchical_sample", "hierarchical_pdf"]


# ---------------------------------------------------------------------------
# Marginal2D
# ---------------------------------------------------------------------------

class Marginal2D(NamedTuple):
    density: jnp.ndarray    # (H, W) nonnegative cell densities (normalized)
    row_cdf: jnp.ndarray    # (H,) inclusive prefix of row masses
    cond_cdf: jnp.ndarray   # (H, W) per-row inclusive prefix


def make_marginal_2d(values) -> Marginal2D:
    """values: (H, W) nonnegative. Normalized so pdf integrates to 1 over
    [0,1]^2 (`distr_2d.h:838` ctor with normalization)."""
    v = jnp.asarray(values, jnp.float32)
    h, w = v.shape
    total = jnp.sum(v)
    density = v * (h * w / jnp.maximum(total, 1e-30))
    cond = jnp.cumsum(v, axis=1)
    rows = jnp.cumsum(cond[:, -1])
    return Marginal2D(density, rows / jnp.maximum(rows[-1], 1e-30),
                      cond / jnp.maximum(cond[:, -1:], 1e-30))


def marginal_sample(d: Marginal2D, u):
    """u: (..., 2) uniforms -> (xy in [0,1]^2, pdf). Inverse-CDF on the
    row marginal then the in-row conditional (`distr_2d.h` sample)."""
    from .gather import take_rows
    h, w = d.density.shape
    u1, u2 = u[..., 0], u[..., 1]
    row = jnp.clip(jnp.searchsorted(d.row_cdf, u1, side="right"), 0, h - 1)
    row_lo = jnp.where(row > 0, d.row_cdf[jnp.maximum(row - 1, 0)], 0.0)
    row_mass = jnp.maximum(d.row_cdf[row] - row_lo, 1e-30)
    y = (row + jnp.clip((u1 - row_lo) / row_mass, 0.0, 1.0)) / h

    cond_rows = take_rows(d.cond_cdf, row)                     # (..., W)
    col = jnp.clip(
        jnp.sum((cond_rows < u2[..., None]).astype(jnp.int32), axis=-1),
        0, w - 1)
    col_lo = jnp.where(col > 0,
                       jnp.take_along_axis(
                           cond_rows, jnp.maximum(col - 1, 0)[..., None],
                           axis=-1)[..., 0], 0.0)
    col_hi = jnp.take_along_axis(cond_rows, col[..., None], axis=-1)[..., 0]
    col_mass = jnp.maximum(col_hi - col_lo, 1e-30)
    x = (col + jnp.clip((u2 - col_lo) / col_mass, 0.0, 1.0)) / w
    xy = jnp.stack([x, y], axis=-1)
    return xy, marginal_pdf(d, xy)


def marginal_pdf(d: Marginal2D, xy):
    h, w = d.density.shape
    col = jnp.clip((xy[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((xy[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return d.density[row, col]


# ---------------------------------------------------------------------------
# Hierarchical2D
# ---------------------------------------------------------------------------

class Hierarchical2D(NamedTuple):
    # pyramid[0] is the full-res density; pyramid[k] sums 2x2 blocks of
    # pyramid[k-1]. Stored coarse-to-fine for the descent.
    pyramid: tuple            # tuple of (h_k, w_k) arrays, fine -> coarse
    density: jnp.ndarray      # (H, W) normalized pdf over [0,1]^2


def make_hierarchical_2d(values) -> Hierarchical2D:
    """values: (H, W) with H, W powers of two (`distr_2d.h:344` requires
    power-of-two padding too)."""
    v = np.asarray(values, np.float64)
    h, w = v.shape
    if h & (h - 1) or w & (w - 1):
        raise ValueError("Hierarchical2D needs power-of-two dimensions")
    total = v.sum()
    density = jnp.asarray(v * (h * w / max(total, 1e-30)), jnp.float32)
    levels = [jnp.asarray(v, jnp.float32)]
    cur = v
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        hh = max(cur.shape[0] // 2, 1)
        ww = max(cur.shape[1] // 2, 1)
        nxt = cur.reshape(hh, cur.shape[0] // hh, ww,
                          cur.shape[1] // ww).sum(axis=(1, 3))
        levels.append(jnp.asarray(nxt, jnp.float32))
        cur = nxt
    return Hierarchical2D(tuple(levels), density)


def hierarchical_sample(h2d: Hierarchical2D, u):
    """Descend the pyramid: at each level pick one of the 2x2 children
    proportionally to its mass and rescale the uniform (sample-reuse, the
    warp in `distr_2d.h:430-520`). Statically unrolled over levels."""
    u1 = u[..., 0]
    u2 = u[..., 1]
    row = jnp.zeros(u1.shape, jnp.int32)
    col = jnp.zeros(u1.shape, jnp.int32)
    # walk from the 1x1 level (last) down to full resolution (first)
    for level in h2d.pyramid[-2::-1]:
        hh, ww = level.shape
        row = row * (2 if hh > 1 else 1)
        col = col * (2 if ww > 1 else 1)
        r1 = jnp.minimum(row + (1 if hh > 1 else 0), hh - 1)
        c1 = jnp.minimum(col + (1 if ww > 1 else 0), ww - 1)
        v00 = level[row, col]
        v01 = level[row, c1]
        v10 = level[r1, col]
        v11 = level[r1, c1]
        # split vertically first (rows), then horizontally
        top = v00 + v01
        bot = v10 + v11
        p_top = top / jnp.maximum(top + bot, 1e-30)
        go_bot = u1 >= p_top
        u1 = jnp.where(go_bot,
                       (u1 - p_top) / jnp.maximum(1.0 - p_top, 1e-30),
                       u1 / jnp.maximum(p_top, 1e-30))
        u1 = jnp.clip(u1, 0.0, 1.0 - 1e-7)
        row = jnp.where(go_bot, r1, row)
        left = jnp.where(go_bot, v10, v00)
        right = jnp.where(go_bot, v11, v01)
        p_left = left / jnp.maximum(left + right, 1e-30)
        go_right = u2 >= p_left
        u2 = jnp.where(go_right,
                       (u2 - p_left) / jnp.maximum(1.0 - p_left, 1e-30),
                       u2 / jnp.maximum(p_left, 1e-30))
        u2 = jnp.clip(u2, 0.0, 1.0 - 1e-7)
        col = jnp.where(go_right, c1, col)
    h, w = h2d.density.shape
    y = (row + u1) / h
    x = (col + u2) / w
    xy = jnp.stack([x, y], axis=-1)
    return xy, hierarchical_pdf(h2d, xy)


def hierarchical_pdf(h2d: Hierarchical2D, xy):
    h, w = h2d.density.shape
    col = jnp.clip((xy[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((xy[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return h2d.density[row, col]
