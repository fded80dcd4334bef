"""Measured BRDFs in the RGL adaptive parameterization (Dupuy & Jakob
2018; reference `src/bsdfs/measured.cpp`).

The measurement ships five tensors over an incident-direction grid
(phi_i, theta_i):
  * `vndf` (P, T, H, W): visible-NDF warp used to place the half-vector,
  * `luminance` (P, T, H, W): a second warp that re-distributes the
    uniform sample by measured luminance before the VNDF warp,
  * `ndf` (H, W), `sigma` (H, W): the retro-transform factors,
  * `spectra` (P, T, L, H2, W2): reflectance spectra in the warped frame.

Half-vector parameterization (`measured.cpp:471-486`):
  u_theta = sqrt(theta * 2 / pi)  (square-root warp),
  u_phi   = (phi + pi) / (2 pi),
with phi measured relative to phi_i for isotropic data.

TPU-native warp design: the reference's `Marginal2D<Dim, true>` samples a
bilinearly-interpolated density with per-cell quadratic CDF inversion,
linearly blending the warps of the surrounding parameter-grid slices.
Linear blending commutes with prefix sums, so all per-slice CDF tables
are precomputed host-side and the per-lane work is: gather 4 slice rows,
blend, one masked-compare search per axis, one quadratic solve per axis.
Everything is pure jnp (vmap/grad-safe); sampling matches the pdf by
construction (chi2-tested).

Current scope: one measured dataset per scene (`Scene.measured`), RGB
and spectral files, isotropic or anisotropic (reduction handled like
`measured.cpp:246-252` sign folding).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ParamWarp2D(NamedTuple):
    """Continuous 2D warp over (P*T) parameter slices (vertex grid H x W,
    domain [0,1]^2), per-slice normalized."""
    density: jnp.ndarray    # (S, H, W) vertex densities (normalized)
    marg: jnp.ndarray       # (S, H) marginal vertex values m_h
    cdf_y: jnp.ndarray      # (S, H) marginal CDF nodes (cdf_y[-1] = 1)
    cdf_x: jnp.ndarray      # (S, H, W) conditional CDF nodes per row


import jax


@jax.tree_util.register_pytree_node_class
class MeasuredBRDF:
    """Measured-BRDF dataset. Array members are pytree children (traced
    under jit); `isotropic` / `jacobian` / `reduction` are static aux
    data so the BSDF code can branch on them at trace time."""

    _ARRAYS = ("phi_i", "theta_i", "wavelengths", "ndf", "sigma", "vndf",
               "luminance", "spectra")

    def __init__(self, phi_i, theta_i, wavelengths, ndf, sigma, vndf,
                 luminance, spectra, isotropic, jacobian, reduction):
        self.phi_i = phi_i            # (P,)
        self.theta_i = theta_i        # (T,)
        self.wavelengths = wavelengths  # (L,) (0, 1, 2 for RGB files)
        self.ndf = ndf                # (Hn, Wn)
        self.sigma = sigma            # (Hs, Ws)
        self.vndf = vndf              # ParamWarp2D
        self.luminance = luminance    # ParamWarp2D
        self.spectra = spectra        # (P, T, L, H2, W2)
        self.isotropic = isotropic
        self.jacobian = jacobian
        self.reduction = reduction

    def tree_flatten(self):
        return ([getattr(self, k) for k in self._ARRAYS],
                (self.isotropic, self.jacobian, self.reduction))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _build_warp(data: np.ndarray) -> ParamWarp2D:
    """data (P, T, H, W) vertex values -> per-slice normalized CDFs."""
    p, t, h, w = data.shape
    v = np.maximum(np.asarray(data, np.float64), 0.0).reshape(-1, h, w)
    dy = 1.0 / (h - 1)
    dx = 1.0 / (w - 1)
    # marginal vertex values: integral over x of the bilinear row
    marg = ((v[..., :-1] + v[..., 1:]) * 0.5).sum(-1) * dx       # (S, H)
    cell_y = (marg[:, :-1] + marg[:, 1:]) * 0.5 * dy
    total = np.maximum(cell_y.sum(-1, keepdims=True), 1e-12)
    cdf_y = np.concatenate([np.zeros((v.shape[0], 1)),
                            np.cumsum(cell_y, -1)], -1) / total
    marg = marg / total
    v = v / total[..., None]
    # conditional CDF nodes along x for each vertex row
    cell_x = (v[..., :-1] + v[..., 1:]) * 0.5 * dx
    cdf_x = np.concatenate([np.zeros((v.shape[0], h, 1)),
                            np.cumsum(cell_x, -1)], -1)          # (S,H,W)
    return ParamWarp2D(jnp.asarray(v, jnp.float32),
                       jnp.asarray(marg, jnp.float32),
                       jnp.asarray(cdf_y, jnp.float32),
                       jnp.asarray(cdf_x, jnp.float32))


def load_measured(fields: dict) -> MeasuredBRDF:
    """Assemble from a parsed tensor-file dict (`read_tensor_file`)."""
    theta_i = np.asarray(fields["theta_i"], np.float32)
    phi_i = np.asarray(fields["phi_i"], np.float32)
    spectral = "wavelengths" in fields
    wav = (np.asarray(fields["wavelengths"], np.float32) if spectral
           else np.array([0.0, 1.0, 2.0], np.float32))
    spectra = np.asarray(fields["spectra" if spectral else "rgb"],
                         np.float32)
    isotropic = phi_i.shape[0] <= 2
    reduction = 1
    if not isotropic:
        reduction = int(round((2 * np.pi) / (phi_i[-1] - phi_i[0])))
    jac = bool(np.asarray(fields["jacobian"]).ravel()[0])
    return MeasuredBRDF(
        phi_i=jnp.asarray(phi_i), theta_i=jnp.asarray(theta_i),
        wavelengths=jnp.asarray(wav),
        ndf=jnp.asarray(fields["ndf"], jnp.float32),
        sigma=jnp.asarray(fields["sigma"], jnp.float32),
        vndf=_build_warp(np.asarray(fields["vndf"], np.float32)),
        luminance=_build_warp(np.asarray(fields["luminance"],
                                         np.float32)),
        spectra=jnp.asarray(spectra),
        isotropic=isotropic, jacobian=jac, reduction=reduction)


# ---------------------------------------------------------------------------
# Parameter-slice weights
# ---------------------------------------------------------------------------


def _grid_weights(grid, x):
    """Linear interpolation weights on a sorted 1D grid -> (i0, w1)."""
    n = grid.shape[0]
    if n == 1:
        return jnp.zeros_like(x, jnp.int32), jnp.zeros_like(x)
    i = jnp.clip(jnp.searchsorted(grid, x, side="right") - 1, 0, n - 2)
    g0 = grid[i]
    g1 = grid[i + 1]
    w = jnp.clip((x - g0) / jnp.maximum(g1 - g0, 1e-9), 0.0, 1.0)
    return i.astype(jnp.int32), w


def _slice_weights(m: MeasuredBRDF, phi_i, theta_i):
    """4 (slice index, weight) pairs over the (phi_i, theta_i) grid."""
    t_n = m.theta_i.shape[0]
    ip, wp = _grid_weights(m.phi_i, phi_i)
    it, wt = _grid_weights(m.theta_i, theta_i)
    idx = []
    for dp, wq in ((0, 1.0 - wp), (1, wp)):
        for dt, wr in ((0, 1.0 - wt), (1, wt)):
            s = (jnp.minimum(ip + dp, m.phi_i.shape[0] - 1) * t_n
                 + jnp.minimum(it + dt, t_n - 1))
            idx.append((s, wq * wr))
    return idx


# ---------------------------------------------------------------------------
# Continuous marginal warp: sample / invert / pdf
# ---------------------------------------------------------------------------


def _solve_quadratic_cdf(c, f0, f1, dx):
    """Solve c = f0 t dx + (f1-f0) t^2 dx / 2 for t in [0, 1].

    Muller form t = 2c' / (f0 + sqrt(f0^2 + 2 (f1-f0) c')) with
    c' = c/dx: the branch continuous at c=0 for either density slope,
    and free of the (-b + sqrt) cancellation."""
    cp = c / jnp.maximum(dx, 1e-12)
    a2 = f1 - f0           # = 2a
    disc = jnp.maximum(f0 * f0 + 2.0 * a2 * cp, 0.0)
    denom = f0 + jnp.sqrt(disc)
    t = 2.0 * cp / jnp.maximum(denom, 1e-12)
    return jnp.clip(t, 0.0, 1.0)


def _fetch_row(tab, s, row):
    """(S, H, W) table -> (..., W) row gather via a flattened index (no
    per-lane slice materialization)."""
    s_, h, w = tab.shape
    return jnp.take(tab.reshape(s_ * h, w), s * h + row, axis=0)


def _warp_sample(warp: ParamWarp2D, slices, u):
    """Sample the blended warp at uniform u (..., 2) -> (pos (..., 2),
    pdf)."""
    h = warp.marg.shape[-1]
    w = warp.density.shape[-1]
    dy = 1.0 / (h - 1)
    dx = 1.0 / (w - 1)

    cdf_y = sum(wq[..., None] * jnp.take(warp.cdf_y, s, axis=0)
                for s, wq in slices)                       # (..., H)
    marg = sum(wq[..., None] * jnp.take(warp.marg, s, axis=0)
               for s, wq in slices)                        # (..., H)
    uy = u[..., 1]
    row = jnp.clip(jnp.sum((cdf_y <= uy[..., None]).astype(jnp.int32),
                           -1) - 1, 0, h - 2)
    c_y = uy - jnp.take_along_axis(cdf_y, row[..., None], -1)[..., 0]
    m0 = jnp.take_along_axis(marg, row[..., None], -1)[..., 0]
    m1 = jnp.take_along_axis(marg, row[..., None] + 1, -1)[..., 0]
    t_y = _solve_quadratic_cdf(c_y, m0, m1, dy)
    y = (row.astype(u.dtype) + t_y) * dy

    # interpolated row density and its conditional CDF (row gathers)
    row_d0 = sum(wq[..., None] * _fetch_row(warp.density, s, row)
                 for s, wq in slices)                      # (..., W)
    row_d1 = sum(wq[..., None] * _fetch_row(warp.density, s, row + 1)
                 for s, wq in slices)
    row_c0 = sum(wq[..., None] * _fetch_row(warp.cdf_x, s, row)
                 for s, wq in slices)
    row_c1 = sum(wq[..., None] * _fetch_row(warp.cdf_x, s, row + 1)
                 for s, wq in slices)
    r_d = (1.0 - t_y[..., None]) * row_d0 + t_y[..., None] * row_d1
    r_c = (1.0 - t_y[..., None]) * row_c0 + t_y[..., None] * row_c1
    m_y = jnp.maximum((1.0 - t_y) * m0 + t_y * m1, 1e-12)

    ux = u[..., 0] * m_y
    col = jnp.clip(jnp.sum((r_c <= ux[..., None]).astype(jnp.int32),
                           -1) - 1, 0, w - 2)
    c_x = ux - jnp.take_along_axis(r_c, col[..., None], -1)[..., 0]
    f0 = jnp.take_along_axis(r_d, col[..., None], -1)[..., 0]
    f1 = jnp.take_along_axis(r_d, col[..., None] + 1, -1)[..., 0]
    t_x = _solve_quadratic_cdf(c_x, f0, f1, dx)
    x = (col.astype(u.dtype) + t_x) * dx
    pdf = (1.0 - t_x) * f0 + t_x * f1
    return jnp.stack([x, y], -1), pdf


def _warp_invert(warp: ParamWarp2D, slices, pos):
    """Inverse of `_warp_sample`: position (..., 2) -> (u (..., 2),
    pdf)."""
    h = warp.marg.shape[-1]
    w = warp.density.shape[-1]
    dy = 1.0 / (h - 1)
    dx = 1.0 / (w - 1)
    x = jnp.clip(pos[..., 0], 0.0, 1.0)
    y = jnp.clip(pos[..., 1], 0.0, 1.0)
    row = jnp.clip((y / dy).astype(jnp.int32), 0, h - 2)
    t_y = y / dy - row.astype(y.dtype)
    col = jnp.clip((x / dx).astype(jnp.int32), 0, w - 2)
    t_x = x / dx - col.astype(x.dtype)

    cdf_y = sum(wq[..., None] * jnp.take(warp.cdf_y, s, axis=0)
                for s, wq in slices)
    marg = sum(wq[..., None] * jnp.take(warp.marg, s, axis=0)
               for s, wq in slices)
    m0 = jnp.take_along_axis(marg, row[..., None], -1)[..., 0]
    m1 = jnp.take_along_axis(marg, row[..., None] + 1, -1)[..., 0]
    uy = (jnp.take_along_axis(cdf_y, row[..., None], -1)[..., 0]
          + dy * (m0 * t_y + 0.5 * (m1 - m0) * t_y * t_y))

    def row_fetch(tab):
        r0 = sum(wq[..., None] * _fetch_row(tab, s, row)
                 for s, wq in slices)
        r1 = sum(wq[..., None] * _fetch_row(tab, s, row + 1)
                 for s, wq in slices)
        return (1.0 - t_y[..., None]) * r0 + t_y[..., None] * r1

    r_d = row_fetch(warp.density)
    r_c = row_fetch(warp.cdf_x)
    m_y = jnp.maximum((1.0 - t_y) * m0 + t_y * m1, 1e-12)
    f0 = jnp.take_along_axis(r_d, col[..., None], -1)[..., 0]
    f1 = jnp.take_along_axis(r_d, col[..., None] + 1, -1)[..., 0]
    gx = (jnp.take_along_axis(r_c, col[..., None], -1)[..., 0]
          + dx * (f0 * t_x + 0.5 * (f1 - f0) * t_x * t_x))
    ux = gx / m_y
    pdf = (1.0 - t_x) * f0 + t_x * f1
    return jnp.stack([jnp.clip(ux, 0.0, 1.0), jnp.clip(uy, 0.0, 1.0)],
                     -1), pdf


def _bilinear_2d(tab, pos):
    """Plain bilinear lookup on a (H, W) vertex grid, pos in [0,1]^2
    (x = W axis)."""
    h, w = tab.shape[-2], tab.shape[-1]
    fx = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    fy = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    x0 = jnp.clip(fx.astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
    tx = fx - x0
    ty = fy - y0
    flat = tab.reshape(tab.shape[:-2] + (-1,))

    def tap(dy_, dx_):
        return jnp.take(flat, (y0 + dy_) * w + x0 + dx_, axis=-1)

    return ((1 - tx) * (1 - ty) * tap(0, 0) + tx * (1 - ty) * tap(0, 1)
            + (1 - tx) * ty * tap(1, 0) + tx * ty * tap(1, 1))


# ---------------------------------------------------------------------------
# BSDF interface (local shading frame, like `bsdf.py` lobes)
# ---------------------------------------------------------------------------


def _elevation(d):
    """Numerically-stable elevation (`measured.cpp:195-200`)."""
    dist = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2
                    + (d[..., 2] - 1.0) ** 2)
    from ..ops.math import safe_asin
    return 2.0 * safe_asin(0.5 * dist)


def _theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta * (2.0 / jnp.pi), 0.0))


def _u2theta(u):
    return u * u * (jnp.pi / 2.0)


def _phi2u(phi):
    return (phi + jnp.pi) * (0.5 / jnp.pi)


def _u2phi(u):
    return (2.0 * u - 1.0) * jnp.pi


def _fold(m: MeasuredBRDF, wi, wo):
    """Anisotropic reduction sign folding (`measured.cpp:246-252`)."""
    if m.reduction < 2:
        return wi, wo
    sy = jnp.sign(jnp.where(wi[..., 1] == 0.0, 1.0, wi[..., 1]))
    sx = (jnp.sign(jnp.where(wi[..., 0] == 0.0, 1.0, wi[..., 0]))
          if m.reduction == 4 else sy)
    flip = jnp.stack([sx, sy, jnp.ones_like(sx)], -1)
    return wi * flip, wo * flip


def _spectra_eval(m: MeasuredBRDF, slices, sample, wavelengths):
    """Blend the reflectance spectra at warped coords `sample` for each
    output channel (`measured.cpp:297-303`). Pure scalar taps on the
    flattened spectra tensor (no slice materialization)."""
    p, t, l, h2, w2 = m.spectra.shape
    flat = m.spectra.reshape(-1)
    x = jnp.clip(sample[..., 0], 0.0, 1.0) * (w2 - 1)
    y = jnp.clip(sample[..., 1], 0.0, 1.0) * (h2 - 1)
    x0 = jnp.clip(x.astype(jnp.int32), 0, w2 - 2)
    y0 = jnp.clip(y.astype(jnp.int32), 0, h2 - 2)
    tx = x - x0
    ty = y - y0

    def tap(s, li, dy_, dx_):
        idx = ((s * l + li) * h2 + y0 + dy_) * w2 + x0 + dx_
        return jnp.take(flat, idx, axis=0)

    def plane(s, li):
        return ((1 - tx) * (1 - ty) * tap(s, li, 0, 0)
                + tx * (1 - ty) * tap(s, li, 0, 1)
                + (1 - tx) * ty * tap(s, li, 1, 0)
                + tx * ty * tap(s, li, 1, 1))

    nc = 3 if wavelengths is None else wavelengths.shape[-1]
    out = []
    for ci in range(nc):
        if wavelengths is None:
            acc = sum(wq * plane(s, ci) for s, wq in slices)
        else:
            li0, lw = _grid_weights(m.wavelengths, wavelengths[..., ci])
            li1 = jnp.clip(li0 + 1, 0, l - 1)
            acc = sum(wq * ((1.0 - lw) * plane(s, li0)
                            + lw * plane(s, li1)) for s, wq in slices)
        out.append(acc)
    return jnp.stack(out, -1)


def measured_eval_pdf(m: MeasuredBRDF, wi, wo, wavelengths=None):
    """(f * cos_o (..., C), pdf) — `measured.cpp:316-366` eval +
    :399-440 pdf. Reflection only, upper hemisphere."""
    active = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    wi_f, wo_f = _fold(m, wi, wo)
    half = wi_f + wo_f
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1,
                                              keepdims=True), 1e-12)
    theta_i = _elevation(wi_f)
    phi_i = jnp.arctan2(wi_f[..., 1], wi_f[..., 0])
    theta_m = _elevation(half)
    phi_m = jnp.arctan2(half[..., 1], half[..., 0])
    phi_rel = phi_m - phi_i if m.isotropic else phi_m
    u_m = jnp.stack([_theta2u(theta_m), _phi2u(phi_rel)], -1)
    u_m = u_m.at[..., 1].set(u_m[..., 1] - jnp.floor(u_m[..., 1]))
    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)

    slices = _slice_weights(m, phi_i, theta_i)
    sample, vndf_pdf = _warp_invert(m.vndf, slices, u_m)
    spec = _spectra_eval(m, slices, sample, wavelengths)
    if m.jacobian:
        spec = spec * (_bilinear_2d(m.ndf, u_m)
                       / jnp.maximum(4.0 * _bilinear_2d(m.sigma, u_wi),
                                     1e-9))[..., None]

    lum_pdf = _bilinear_2d_param(m.luminance.density, slices, sample)
    sin_theta_m = jnp.sqrt(jnp.maximum(
        half[..., 0] ** 2 + half[..., 1] ** 2, 0.0))
    jacobian = (jnp.maximum(2.0 * jnp.pi ** 2 * u_m[..., 0] * sin_theta_m,
                            1e-6)
                * 4.0 * jnp.sum(wi_f * half, axis=-1))
    pdf = vndf_pdf * lum_pdf / jnp.maximum(jacobian, 1e-9)
    spec = jnp.where(active[..., None] & jnp.isfinite(spec), spec, 0.0)
    pdf = jnp.where(active & jnp.isfinite(pdf), pdf, 0.0)
    return spec, pdf


def _bilinear_2d_param(density, slices, pos):
    """Blended bilinear over the (S, H, W) density stack (scalar taps on
    the flattened tensor)."""
    s_, h, w = density.shape
    flat = density.reshape(-1)
    x = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    y = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    x0 = jnp.clip(x.astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(y.astype(jnp.int32), 0, h - 2)
    tx = x - x0
    ty = y - y0

    def tap(s, dy_, dx_):
        return jnp.take(flat, (s * h + y0 + dy_) * w + x0 + dx_, axis=0)

    out = 0.0
    for s, wq in slices:
        out = out + wq * ((1 - tx) * (1 - ty) * tap(s, 0, 0)
                          + tx * (1 - ty) * tap(s, 0, 1)
                          + (1 - tx) * ty * tap(s, 1, 0)
                          + tx * ty * tap(s, 1, 1))
    return out


def measured_sample(m: MeasuredBRDF, wi, u2, wavelengths=None):
    """Sample wo (`measured.cpp:201-315`) -> (wo, spec_weight, pdf)."""
    active = wi[..., 2] > 0.0
    if m.reduction >= 2:
        sy = jnp.sign(jnp.where(wi[..., 1] == 0.0, 1.0, wi[..., 1]))
        sx = (jnp.sign(jnp.where(wi[..., 0] == 0.0, 1.0, wi[..., 0]))
              if m.reduction == 4 else sy)
        flip = jnp.stack([sx, sy, jnp.ones_like(sx)], -1)
    else:
        flip = jnp.ones_like(wi)
    wi_f = wi * flip

    theta_i = _elevation(wi_f)
    phi_i = jnp.arctan2(wi_f[..., 1], wi_f[..., 0])
    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)
    slices = _slice_weights(m, phi_i, theta_i)

    u = jnp.stack([u2[..., 1], u2[..., 0]], -1)
    u, lum_pdf = _warp_sample(m.luminance, slices, u)
    u_m, vndf_pdf = _warp_sample(m.vndf, slices, u)
    phi_m = _u2phi(u_m[..., 1])
    theta_m = _u2theta(u_m[..., 0])
    if m.isotropic:
        phi_m = phi_m + phi_i
    sin_tm = jnp.sin(theta_m)
    cos_tm = jnp.cos(theta_m)
    half = jnp.stack([jnp.cos(phi_m) * sin_tm, jnp.sin(phi_m) * sin_tm,
                      cos_tm], -1)
    wi_dot_m = jnp.sum(wi_f * half, axis=-1)
    jacobian = (jnp.maximum(2.0 * jnp.pi ** 2 * u_m[..., 0] * sin_tm,
                            1e-6) * 4.0 * wi_dot_m)
    wo_f = half * (2.0 * wi_dot_m)[..., None] - wi_f
    pdf = vndf_pdf * lum_pdf / jnp.maximum(jacobian, 1e-9)

    spec = _spectra_eval(m, slices, u, wavelengths)
    if m.jacobian:
        spec = spec * (_bilinear_2d(m.ndf, u_m)
                       / jnp.maximum(4.0 * _bilinear_2d(m.sigma, u_wi),
                                     1e-9))[..., None]
    wo = wo_f * flip
    active = active & (wo[..., 2] > 0.0) & (pdf > 1e-9)
    weight = jnp.where(active[..., None] & jnp.isfinite(spec),
                       spec / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
    pdf = jnp.where(active & jnp.isfinite(pdf), pdf, 0.0)
    return wo, weight, pdf


# ===========================================================================
# Polarized measured pBRDF (`measured_polarized.cpp`): Rusinkiewicz-
# parameterized 4x4 Mueller matrices, multilinearly interpolated over
# (phi_d, theta_d, theta_h, wavelength).
# ===========================================================================


@jax.tree_util.register_pytree_node_class
class MeasuredPolarized:
    """pBSDF dataset (`.pbsdf` tensor file): `M` (Pd, Td, Th, L, 4, 4)
    over Rusinkiewicz angle grids. `alpha_sample` only steers the GGX
    importance-sampling lobe (any value is unbiased,
    `measured_polarized.cpp` docs); `wavelength` pins a single
    wavelength for RGB renders (-1 = use the hero wavelengths /
    RGB primaries)."""

    _ARRAYS = ("phi_d", "theta_d", "theta_h", "wvls", "m_data")

    def __init__(self, phi_d, theta_d, theta_h, wvls, m_data,
                 alpha_sample=0.1, wavelength=-1.0):
        self.phi_d = phi_d
        self.theta_d = theta_d
        self.theta_h = theta_h
        self.wvls = wvls
        self.m_data = m_data
        self.alpha_sample = float(alpha_sample)
        self.wavelength = float(wavelength)

    def tree_flatten(self):
        return ([getattr(self, k) for k in self._ARRAYS],
                (self.alpha_sample, self.wavelength))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def load_measured_polarized(fields: dict, alpha_sample=0.1,
                            wavelength=-1.0) -> MeasuredPolarized:
    """Assemble from a parsed `.pbsdf` tensor-file dict
    (`measured_polarized.cpp:113-160` field layout; the angle grids are
    stored as (1, N) rows)."""
    def grid(name):
        return jnp.asarray(np.asarray(fields[name], np.float32).ravel())

    m = np.asarray(fields["M"], np.float32)
    if m.ndim != 6 or m.shape[-2:] != (4, 4):
        raise ValueError("invalid pBSDF 'M' tensor")
    return MeasuredPolarized(
        grid("phi_d"), grid("theta_d"), grid("theta_h"),
        jnp.asarray(np.asarray(fields["wvls"], np.float32).ravel()),
        jnp.asarray(m), alpha_sample, wavelength)


def _rotate_z(v, angle):
    """Rotate about +z (`measured_polarized.cpp` rotate_vector with the
    z axis)."""
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.stack([v[..., 0] * c - v[..., 1] * s,
                      v[..., 0] * s + v[..., 1] * c,
                      v[..., 2]], -1)


def _rusinkiewicz(i, o):
    """(phi_d, theta_h, theta_d) of the standard-frame direction pair
    (`measured_polarized.cpp:directions_to_rusinkiewicz`)."""
    h = i + o
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), h.shape)
    b = jnp.cross(n, h)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    t = jnp.cross(b, h)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    from ..ops.math import safe_acos
    td = safe_acos(jnp.sum(h * i, -1))
    th = safe_acos(h[..., 2])
    i_prj = i - jnp.sum(i * h, -1, keepdims=True) * h
    i_prj = i_prj / jnp.maximum(
        jnp.linalg.norm(i_prj, axis=-1, keepdims=True), 1e-12)
    cos_pd = jnp.clip(jnp.sum(t * i_prj, -1), -1.0, 1.0)
    sin_pd = jnp.clip(jnp.sum(b * i_prj, -1), -1.0, 1.0)
    return jnp.arctan2(sin_pd, cos_pd), th, td


def _mp_interp(mp: MeasuredPolarized, pd, td, th, lam):
    """Multilinear interpolation of the (4, 4) Mueller block over the 4
    parameter grids -> (..., 4, 4)."""
    n_pd = mp.phi_d.shape[0]
    n_td = mp.theta_d.shape[0]
    n_th = mp.theta_h.shape[0]
    n_l = mp.wvls.shape[0]
    flat = mp.m_data.reshape(-1, 16)
    ip, wp = _grid_weights(mp.phi_d, pd)
    it, wt = _grid_weights(mp.theta_d, td)
    ih, wh = _grid_weights(mp.theta_h, th)
    il, wl = _grid_weights(mp.wvls, lam)
    out = 0.0
    for dp, a in ((0, 1.0 - wp), (1, wp)):
        for dt, b in ((0, 1.0 - wt), (1, wt)):
            for dh, c in ((0, 1.0 - wh), (1, wh)):
                for dl, d in ((0, 1.0 - wl), (1, wl)):
                    idx = (((jnp.minimum(ip + dp, n_pd - 1) * n_td
                             + jnp.minimum(it + dt, n_td - 1)) * n_th
                            + jnp.minimum(ih + dh, n_th - 1)) * n_l
                           + jnp.minimum(il + dl, n_l - 1))
                    out = out + (a * b * c * d)[..., None] \
                        * jnp.take(flat, idx, axis=0)
    return out.reshape(out.shape[:-1] + (4, 4))


def _mp_lambda_channels(mp: MeasuredPolarized, wavelengths, shape):
    """Per-channel wavelengths: hero wavelengths, the pinned single
    wavelength, or RGB primaries."""
    if wavelengths is not None:
        return [wavelengths[..., i] for i in range(wavelengths.shape[-1])]
    if mp.wavelength > 0.0:
        lam = jnp.full(shape, mp.wavelength)
        return [lam, lam, lam]
    return [jnp.full(shape, l) for l in (600.0, 550.0, 450.0)]


def mp_eval_mueller(mp: MeasuredPolarized, wi, wo, wavelengths=None):
    """Polarized eval -> Mueller (..., C, 4, 4) w.r.t. the implicit local
    Stokes bases of (-wo, wi), INCLUDING the cos_theta_o factor
    (`measured_polarized.cpp:215-312` radiance-mode branch)."""
    from ..ops import mueller as mu
    active = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    wo_hat, wi_hat = wo, wi
    phi_std = jnp.arctan2(wi_hat[..., 1], wi_hat[..., 0])
    phi_std = jnp.where(phi_std < 0.0, phi_std + 2.0 * jnp.pi, phi_std)
    wo_std = _rotate_z(wo_hat, -phi_std)
    wi_std = _rotate_z(wi_hat, -phi_std)
    pd, th, td = _rusinkiewicz(wo_std, wi_std)

    lams = _mp_lambda_channels(mp, wavelengths, pd.shape)
    mats = [_mp_interp(mp, pd, td, th, lam) for lam in lams]
    value = jnp.stack(mats, axis=-3)                      # (..., C, 4, 4)
    # NaN-encoded invalid configurations -> 0
    bad = jnp.isnan(value).any((-1, -2))
    value = jnp.where(bad[..., None, None], 0.0, value)
    value = value.at[..., 0, 0].set(jnp.maximum(value[..., 0, 0], 0.0))

    def _nrm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-12)
    zo_std = -wo_std
    to_std = _nrm(jnp.cross(wo_std - wi_std, zo_std))
    yo_std = _nrm(jnp.cross(to_std, zo_std))
    xo_std = jnp.cross(yo_std, zo_std)
    zi_std = wi_std
    ti_std = _nrm(jnp.cross(wi_std - wo_std, zi_std))
    yi_std = _nrm(jnp.cross(ti_std, zi_std))
    xi_std = jnp.cross(yi_std, zi_std)
    xo_hat = _rotate_z(xo_std, phi_std)
    xi_hat = _rotate_z(xi_std, phi_std)
    value = mu.rotate_mueller_basis(
        value, -wo_hat, xo_hat, mu.stokes_basis(-wo_hat),
        wi_hat, xi_hat, mu.stokes_basis(wi_hat))
    value = value * jnp.maximum(wo[..., 2], 0.0)[..., None, None, None]
    return jnp.where(active[..., None, None, None], value, 0.0)


_MP_COS_WEIGHT = 0.1     # COSINE_HEMISPHERE_PDF_WEIGHT


def mp_eval_pdf(mp: MeasuredPolarized, wi, wo, wavelengths=None):
    """Scalar (unpolarized) eval + sampling pdf: the data's M00 entry
    times cos_theta_o; pdf = 0.1 cosine + 0.9 GGX(alpha_sample)."""
    from .bsdf import _ggx_ndf
    active = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    phi_std = jnp.arctan2(wi[..., 1], wi[..., 0])
    phi_std = jnp.where(phi_std < 0.0, phi_std + 2.0 * jnp.pi, phi_std)
    wo_std = _rotate_z(wo, -phi_std)
    wi_std = _rotate_z(wi, -phi_std)
    pd, th, td = _rusinkiewicz(wo_std, wi_std)
    lams = _mp_lambda_channels(mp, wavelengths, pd.shape)
    vals = []
    for lam in lams:
        m00 = _mp_interp(mp, pd, td, th, lam)[..., 0, 0]
        vals.append(jnp.maximum(jnp.nan_to_num(m00), 0.0))
    value = jnp.stack(vals, -1) * jnp.maximum(wo[..., 2], 0.0)[..., None]

    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    alpha = jnp.maximum(mp.alpha_sample, 1e-3)
    d_ndf = _ggx_ndf(h, alpha)
    wih = jnp.sum(wi * h, -1)
    pdf_mf = d_ndf * h[..., 2] / jnp.maximum(4.0 * jnp.abs(wih), 1e-6)
    inv_pi = 0.3183098861837907
    pdf = (_MP_COS_WEIGHT * inv_pi * jnp.maximum(wo[..., 2], 0.0)
           + (1.0 - _MP_COS_WEIGHT) * pdf_mf)
    return (jnp.where(active[..., None], value, 0.0),
            jnp.where(active, pdf, 0.0))


def mp_sample(mp: MeasuredPolarized, wi, u2, u1):
    """Sample wo: 10% cosine hemisphere / 90% GGX reflection
    (`measured_polarized.cpp:190-214`)."""
    from ..ops import warp as warp_mod
    from .bsdf import _ggx_sample, _reflect
    wo_diff = warp_mod.square_to_cosine_hemisphere(u2)
    m = _ggx_sample(jnp.maximum(mp.alpha_sample, 1e-3), u2)
    wo_mf = _reflect(wi, m)
    return jnp.where((u1 < _MP_COS_WEIGHT)[..., None], wo_diff, wo_mf)
