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
           "hierarchical_sample", "hierarchical_pdf", "Bilinear2D",
           "make_bilinear_2d", "bilinear_sample", "bilinear_pdf"]


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


# ---------------------------------------------------------------------------
# Bilinear2D — continuous bilinear vertex density (the reference's
# Marginal2D<1>/Hierarchical2D<0> *bilinear* mode used by the envmap
# warp, `envmap.cpp:103,:233`)


class Bilinear2D(NamedTuple):
    """Continuous density over [0,1]^2: bilinear interpolation of a
    (H+1, W+1) vertex grid. Closed-form marginal sampling: the row band
    is linear in v (quadratic inverse), and because the conditional CDF
    of a lerp of two row densities is the lerp of their CDFs, the
    conditional in u needs only the two bounding vertex-row prefix
    tables — no per-sample hierarchy walk."""
    vtx: jnp.ndarray        # (H+1, W+1) vertex densities (>= 0)
    colcdf: jnp.ndarray     # (H+1, W+1) per-row trapezoid prefix over u
    row_edge: jnp.ndarray   # (H+1,) = colcdf[:, -1]
    row_cdf: jnp.ndarray    # (H,) inclusive prefix of band masses


def make_bilinear_2d(vertices) -> Bilinear2D:
    v = jnp.maximum(jnp.asarray(vertices, jnp.float32), 1e-12)
    seg = 0.5 * (v[:, :-1] + v[:, 1:])                  # (H+1, W)
    colcdf = jnp.concatenate(
        [jnp.zeros((v.shape[0], 1)), jnp.cumsum(seg, axis=1)], axis=1)
    row_edge = colcdf[:, -1]                            # (H+1,)
    band = 0.5 * (row_edge[:-1] + row_edge[1:])         # (H,)
    return Bilinear2D(v, colcdf, row_edge, jnp.cumsum(band))


def _inv_linear_cdf(b, slope2, rho):
    """Solve b*t + slope2*t^2 = rho for t in [0, 1] (b >= 0, stable)."""
    disc = jnp.maximum(b * b + 4.0 * slope2 * rho, 0.0)
    denom = b + jnp.sqrt(disc)
    return jnp.clip(2.0 * rho / jnp.maximum(denom, 1e-30), 0.0, 1.0)


def _bilinear_sample_flat(d: Bilinear2D, u2):
    h = d.row_cdf.shape[0]
    w = d.vtx.shape[1] - 1
    total = d.row_cdf[-1]

    # ---- v: pick the band, invert its linear marginal ----
    xi1 = u2[:, 0] * total
    i = jnp.clip(jnp.searchsorted(d.row_cdf, xi1, side="right"), 0, h - 1)
    lo = jnp.where(i > 0, d.row_cdf[jnp.maximum(i - 1, 0)], 0.0)
    rho = jnp.maximum(xi1 - lo, 0.0)
    r0 = d.row_edge[i]
    r1 = d.row_edge[i + 1]
    t = _inv_linear_cdf(r0, 0.5 * (r1 - r0), rho)
    v_out = (i.astype(jnp.float32) + t) / h

    # ---- u: lerped conditional CDF of the two bounding rows ----
    a0 = jnp.take(d.colcdf, i, axis=0)                  # (N, W+1)
    a1 = jnp.take(d.colcdf, i + 1, axis=0)
    at = (1.0 - t)[:, None] * a0 + t[:, None] * a1
    rt = jnp.maximum((1.0 - t) * r0 + t * r1, 1e-30)
    xi2 = u2[:, 1] * rt
    j = jnp.clip(jnp.sum((at <= xi2[:, None]).astype(jnp.int32),
                         axis=1) - 1, 0, w - 1)
    a_lo = jnp.take_along_axis(at, j[:, None], axis=1)[:, 0]
    rho2 = jnp.maximum(xi2 - a_lo, 0.0)
    v00 = jnp.take(d.vtx, i * (w + 1) + j)
    v01 = jnp.take(d.vtx, i * (w + 1) + j + 1)
    v10 = jnp.take(d.vtx, (i + 1) * (w + 1) + j)
    v11 = jnp.take(d.vtx, (i + 1) * (w + 1) + j + 1)
    d0 = (1.0 - t) * v00 + t * v10
    d1 = (1.0 - t) * v01 + t * v11
    s = _inv_linear_cdf(d0, 0.5 * (d1 - d0), rho2)
    u_out = (j.astype(jnp.float32) + s) / w

    dens = (1.0 - s) * d0 + s * d1
    pdf = dens * (h * w) / jnp.maximum(total, 1e-30)
    return jnp.stack([u_out, v_out], -1), pdf


def bilinear_sample(d: Bilinear2D, u2, chunk: int = 8192):
    """u2 (..., 2) uniform -> (xy (..., 2), pdf_uv (...,)).

    Internally chunked: the conditional-CDF lerp materialises (chunk,
    W+1) rows, so memory stays bounded for arbitrarily large wavefronts.
    """
    import jax
    batch = u2.shape[:-1]
    flat = u2.reshape(-1, 2)
    n = flat.shape[0]
    if n <= chunk:
        xy, pdf = _bilinear_sample_flat(d, flat)
    else:
        n_pad = -(-n // chunk) * chunk
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)),
                       constant_values=0.5)
        xy, pdf = jax.lax.map(
            lambda c: _bilinear_sample_flat(d, c),
            flat.reshape(-1, chunk, 2))
        xy = xy.reshape(-1, 2)[:n]
        pdf = pdf.reshape(-1)[:n]
    return xy.reshape(batch + (2,)), pdf.reshape(batch)


def bilinear_pdf(d: Bilinear2D, xy):
    """Continuous pdf over [0,1]^2 at xy (..., 2)."""
    h = d.row_cdf.shape[0]
    w = d.vtx.shape[1] - 1
    x = jnp.clip(xy[..., 0], 0.0, 1.0) * w
    y = jnp.clip(xy[..., 1], 0.0, 1.0) * h
    j = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    i = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    s = x - j
    t = y - i
    flat = d.vtx.reshape(-1)
    v00 = jnp.take(flat, i * (w + 1) + j)
    v01 = jnp.take(flat, i * (w + 1) + j + 1)
    v10 = jnp.take(flat, (i + 1) * (w + 1) + j)
    v11 = jnp.take(flat, (i + 1) * (w + 1) + j + 1)
    dens = ((1 - t) * ((1 - s) * v00 + s * v01)
            + t * ((1 - s) * v10 + s * v11))
    return dens * (h * w) / jnp.maximum(d.row_cdf[-1], 1e-30)
