"""Hosek-Wilkie sun+sky model: precompute, radiance eval, importance sampling.

The functional core of the flagship emitter. Everything here is pure jnp —
`precompute` derives the per-configuration state (a small pytree) from the
differentiable parameters, and the eval/sample/pdf functions consume it.
Under jit the precompute is traced together with the render, so gradients
w.r.t. turbidity / albedo / sun direction flow through the whole chain
(the reference achieves the same via `parameters_changed` re-running its
precompute with AD enabled, `sunsky.cpp:242-285`).

Behavioural parity notes (reference `src/emitters/sunsky.cpp`,
`include/mitsuba/render/sunsky/sunsky.h`):
  * sky radiance: 9-parameter Hosek-Wilkie formula per channel
    (`sunsky.cpp:538-555`), coefficient tables Bezier-interpolated over
    elevation and lerped over turbidity/albedo (`sunsky.h:190-231`).
  * sun radiance: 45-segment piecewise polynomial in elevation; RGB bakes
    limb darkening into a (4 x 6) coefficient grid (`sunsky.cpp:572-614`);
    spectral applies an order-6 limb-darkening polynomial per wavelength
    (`sunsky.cpp:631-650`).
  * sampling: truncated-Gaussian-mixture (20 gaussians, bilinearly blended
    over turbidity/elevation) for the sky (`sunsky.cpp:661-763`), uniform
    cone for the sun disc; strategies mixed by a precomputed luminance
    ratio obtained with 200-pt Gauss-Legendre quadrature
    (`sunsky.cpp:772-886`).

All direction arguments are unit vectors in the emitter's local frame
(+z = up); batch dims broadcast.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops import warp
from ...ops.distr import (ContinuousDistribution, DiscreteDistribution,
                          continuous_sample_pdf, discrete_sample_reuse,
                          make_continuous, make_discrete)
from ...ops.math import (Frame, dir_to_sph, erfinv, gaussian_cdf, lerp,
                         poly_powers, safe_acos, safe_sqrt, sph_dir, unit_angle,
                         unit_angle_z)
from ...ops.gather import take_rows
from ...ops.quad import gauss_legendre
from ...ops.spectrum import cie1931_y, luminance_rgb
from . import constants as C
from .tables import SunskyTables, n_channels

# ---------------------------------------------------------------------------
# Parameter / state pytrees
# ---------------------------------------------------------------------------


class SunskyParams(NamedTuple):
    """Differentiable + configuration inputs of the model.

    turbidity in [1, 10]; albedo per channel in [0, 1] (3 for RGB mode, 11
    for spectral); sun_direction a unit vector in the local frame.
    """
    turbidity: jnp.ndarray
    albedo: jnp.ndarray
    sun_direction: jnp.ndarray
    sky_scale: jnp.ndarray
    sun_scale: jnp.ndarray
    sun_half_aperture: jnp.ndarray
    # width multiplier of the disc surrogate's straight-through tangent
    # ramp (primal unchanged — see _disc_weight); 1.0 = one 512p pixel.
    # Wider values let a blur-schedule recover the sun purely by
    # gradients from several degrees off (test_ad.py joint recovery).
    disc_softness: jnp.ndarray = 1.0


def make_params(turbidity=3.0, albedo=0.3, sun_direction=None, sky_scale=1.0,
                sun_scale=1.0, sun_aperture_deg=C.SUN_APERTURE_DEG,
                mode: str = "rgb", dtype=jnp.float32,
                disc_softness=1.0) -> SunskyParams:
    nc = n_channels(mode)
    albedo = jnp.broadcast_to(jnp.asarray(albedo, dtype), (nc,))
    if sun_direction is None:
        sun_direction = jnp.asarray([0.0, 0.0, 1.0], dtype)
    sun_direction = jnp.asarray(sun_direction, dtype)
    sun_direction = sun_direction / jnp.linalg.norm(sun_direction)
    return SunskyParams(
        jnp.asarray(turbidity, dtype), albedo, sun_direction,
        jnp.asarray(sky_scale, dtype), jnp.asarray(sun_scale, dtype),
        jnp.asarray(jnp.deg2rad(0.5 * sun_aperture_deg), dtype),
        jnp.asarray(disc_softness, dtype))


class SunskyState(NamedTuple):
    params: SunskyParams
    sun_angles: jnp.ndarray          # (2,) local (phi, theta)
    sun_frame_s: jnp.ndarray         # orthonormal frame around the sun dir
    sun_frame_t: jnp.ndarray
    sun_frame_n: jnp.ndarray
    sky_params: jnp.ndarray          # (NC, 9)
    sky_radiance: jnp.ndarray        # (NC,)
    sun_radiance: jnp.ndarray        # (45, NC, 4) spectral | (45, 3, 4, 6) rgb
    sun_ld: Optional[jnp.ndarray]    # (11, 6) | None
    gaussians: jnp.ndarray           # (20, 5)
    gaussian_distr: DiscreteDistribution
    sky_sampling_w: jnp.ndarray      # ()
    spectral_distr: Optional[ContinuousDistribution]


# ---------------------------------------------------------------------------
# Precompute
# ---------------------------------------------------------------------------

import numpy as _np_mod
_BEZIER_COEFS = _np_mod.array([1.0, 5.0, 10.0, 10.0, 5.0, 1.0], _np_mod.float32)


def _turbidity_lerp(table, turbidity):
    """Lerp a table with leading turbidity axis (size 10, levels 1..10)."""
    t_high = jnp.floor(turbidity)
    t_rem = turbidity - t_high
    t_high_i = t_high.astype(jnp.int32)
    t_low_i = t_high_i - 1
    low = jnp.take(table, jnp.clip(t_low_i, 0, C.N_TURBIDITY - 1), axis=0)
    high_valid = t_high_i < C.N_TURBIDITY
    high = jnp.take(table, jnp.clip(t_high_i, 0, C.N_TURBIDITY - 1), axis=0)
    high = jnp.where(high_valid, high, 0.0)
    return lerp(low, high, t_rem)


def _sky_table_interp(table, albedo, turbidity, eta):
    """(10, 2, 6, NC, ...) table -> (NC, ...) via Bezier(eta) + lerps.

    Quintic Bernstein interpolation over the 6 elevation control points in
    x = cbrt(2 eta / pi), then linear interpolation over turbidity and
    albedo; zero outside eta in [0, pi/2].
    """
    # clip keeps powers NaN-free (and grads finite) when eta is outside
    # [0, pi/2]; the result is masked to zero there anyway.
    x = jnp.clip(jnp.cbrt(2.0 * eta / jnp.pi), 0.0, 1.0)
    bern = (_BEZIER_COEFS * poly_powers(x, C.N_SKY_CTRL_PTS)
            * poly_powers(1.0 - x, C.N_SKY_CTRL_PTS)[..., ::-1])
    bez = jnp.tensordot(bern, table, axes=([0], [2]))  # (10, 2, NC, ...)
    by_alb = _turbidity_lerp(bez, turbidity)           # (2, NC, ...)
    alb = albedo.reshape((-1,) + (1,) * (by_alb.ndim - 2))
    res = lerp(by_alb[0], by_alb[1], alb)
    valid = (eta >= 0.0) & (eta <= 0.5 * jnp.pi)
    return jnp.where(valid, res, 0.0)


def _tgmm_mixture(tgmm, turbidity, eta):
    """Blend the 4 neighbouring (turbidity, elevation) TGMM fits.

    Returns (20, 5) gaussians [mu_phi, mu_theta, sigma_phi, sigma_theta, w]
    with weights scaled by the bilinear factors (they keep summing to ~1).
    """
    eta_deg = jnp.rad2deg(eta)
    eta_f = jnp.clip((eta_deg - 2.0) / 3.0, 0.0, C.N_ETAS - 1)
    t_f = jnp.clip(turbidity - 2.0, 0.0, C.N_TGMM_TURBIDITY - 1)

    eta_lo = jnp.clip(jnp.floor(eta_f).astype(jnp.int32), 0, C.N_ETAS - 1)
    t_lo = jnp.clip(jnp.floor(t_f).astype(jnp.int32), 0, C.N_TGMM_TURBIDITY - 1)
    eta_hi = jnp.minimum(eta_lo + 1, C.N_ETAS - 1)
    t_hi = jnp.minimum(t_lo + 1, C.N_TGMM_TURBIDITY - 1)
    eta_rem = eta_f - eta_lo
    t_rem = t_f - t_lo

    corners = [(t_lo, eta_lo), (t_lo, eta_hi), (t_hi, eta_lo), (t_hi, eta_hi)]
    factors = jnp.stack([(1 - t_rem) * (1 - eta_rem), (1 - t_rem) * eta_rem,
                         t_rem * (1 - eta_rem), t_rem * eta_rem])
    mixes = jnp.stack([tgmm[t, e] for t, e in corners])   # (4, 5, 5)
    weights = mixes[..., -1] * factors[:, None]
    mixes = mixes.at[..., -1].set(weights)
    return mixes.reshape(C.N_MIX_GAUSSIANS, C.N_GAUSSIAN_PARAMS)


def precompute(tables: SunskyTables, params: SunskyParams,
               mode: str = "rgb") -> SunskyState:
    """Derive the renderer-facing state from model parameters."""
    # Normalise here so optimisers can treat sun_direction as a free
    # 3-vector (gradients flow through the normalisation); the reference
    # normalises its input the same way (`sunsky.cpp:923`).
    sun_dir = params.sun_direction / jnp.linalg.norm(params.sun_direction)
    phi, theta = dir_to_sph(sun_dir)
    sun_angles = jnp.stack([phi, theta])
    frame = Frame(sun_dir)
    eta = 0.5 * jnp.pi - theta

    sky_params = _sky_table_interp(tables.sky_params, params.albedo,
                                   params.turbidity, eta)
    sky_radiance = _sky_table_interp(tables.sky_rad, params.albedo,
                                     params.turbidity, eta)
    # Flatten the sun table's trailing coefficient axes: per-ray gathers of
    # rank>=3 tensors with tiny minor dims pad catastrophically on TPU
    # ((N,3,4,6) tiles to 21x its size in HBM); a rank-2 (45, F) table
    # gathers to (N, F) with modest lane padding instead.
    sun_radiance = _turbidity_lerp(tables.sun_rad, params.turbidity)
    sun_radiance = sun_radiance.reshape(C.N_SUN_SEGMENTS, -1)

    gaussians = _tgmm_mixture(tables.tgmm, params.turbidity, eta)
    gaussian_distr = make_discrete(gaussians[:, -1])

    state = SunskyState(params, sun_angles, frame.s, frame.t, frame.n,
                        sky_params, sky_radiance, sun_radiance,
                        tables.sun_ld, gaussians, gaussian_distr,
                        jnp.asarray(0.5, sky_params.dtype), None)

    sky_w, spectral_distr = _estimate_sky_sun_ratio(state, mode)
    return state._replace(sky_sampling_w=sky_w, spectral_distr=spectral_distr)


# ---------------------------------------------------------------------------
# Radiance evaluation
# ---------------------------------------------------------------------------

# flat (k, j) index pairs for the RGB sun coefficient block (host-side
# numpy: module import must not initialise a jax backend)
import numpy as _np
_SUN_RGB_K = _np.arange(C.N_SUN_CTRL_PTS * C.N_SUN_LD_PARAMS) // C.N_SUN_LD_PARAMS
_SUN_RGB_J = _np.arange(C.N_SUN_CTRL_PTS * C.N_SUN_LD_PARAMS) % C.N_SUN_LD_PARAMS


def _sky_formula(coefs, mean_rad, cos_theta, gamma):
    """Hosek-Wilkie sky radiance; coefs (..., 9), scalars broadcast."""
    cos_gamma = jnp.cos(gamma)
    cos_gamma_sqr = cos_gamma * cos_gamma
    a, b, c, d, e, f, g, i, h = (coefs[..., k] for k in range(9))
    c1 = 1.0 + a * jnp.exp(b / (cos_theta + 0.01))
    # h (param 8) is the mie anisotropy; i (param 7) weighs the zenith term.
    # (1 + H^2 - 2 H cos_gamma) = (H - cos_gamma)^2 + sin^2 gamma >= 0
    base = 1.0 + h * h - 2.0 * h * cos_gamma
    chi = (1.0 + cos_gamma_sqr) / (base * safe_sqrt(base))
    c2 = (c + d * jnp.exp(e * gamma) + f * cos_gamma_sqr + g * chi
          + i * safe_sqrt(jnp.maximum(cos_theta, 0.0)))
    return c1 * c2 * mean_rad


def _sun_segment(cos_theta):
    """Piecewise-polynomial segment index and local coordinate x."""
    elevation = 0.5 * jnp.pi - safe_acos(cos_theta)
    pos_f = jnp.cbrt(2.0 * elevation / jnp.pi) * C.N_SUN_SEGMENTS
    pos = jnp.clip(jnp.floor(pos_f).astype(jnp.int32), 0, C.N_SUN_SEGMENTS - 1)
    break_x = 0.5 * jnp.pi * (pos.astype(cos_theta.dtype) / C.N_SUN_SEGMENTS) ** 3
    # x >= 0 whenever elevation >= 0; clamp avoids NaN powers below horizon
    return pos, jnp.maximum(elevation - break_x, 0.0)


def _cos_psi(gamma, sun_half_aperture):
    """Cosine of the angle to the sun's limb (for limb darkening)."""
    sol_rad_sin = jnp.sin(sun_half_aperture)
    sin_gamma = jnp.sin(gamma)
    return safe_sqrt(1.0 - (sin_gamma * sin_gamma) / (sol_rad_sin * sol_rad_sin))


def area_ratio(sun_half_aperture):
    """Ratio of the physical sun disc's solid angle to a custom aperture's."""
    return ((1.0 - jnp.cos(C.SUN_HALF_APERTURE))
            / (1.0 - jnp.cos(sun_half_aperture)))


def eval_sky_rgb(state: SunskyState, cos_theta, gamma):
    """Sky radiance, RGB channels -> (..., 3). No scale/normalisation."""
    return _sky_formula(state.sky_params, state.sky_radiance,
                        cos_theta[..., None], gamma[..., None])


def _sun_rgb_from_flat(coefs_flat, x, cos_psi):
    """RGB sun radiance from flattened (..., 72) coefficients.

    Layout: [c * 24 + k * 6 + j] (channel, elevation power, limb power).
    Slices along the minor axis fuse into the multiply-reduce, so nothing
    rank>2 is materialised.
    """
    xp = poly_powers(x, C.N_SUN_CTRL_PTS)
    cp = poly_powers(cos_psi, C.N_SUN_LD_PARAMS)
    w = (xp[..., _SUN_RGB_K] * cp[..., _SUN_RGB_J])     # (..., 24)
    block = C.N_SUN_CTRL_PTS * C.N_SUN_LD_PARAMS
    chans = [jnp.sum(coefs_flat[..., c * block:(c + 1) * block] * w, axis=-1)
             for c in range(3)]
    return jnp.stack(chans, axis=-1)


def eval_sun_rgb(state: SunskyState, cos_theta, gamma):
    """Sun radiance with baked limb darkening -> (..., 3)."""
    pos, x = _sun_segment(cos_theta)
    coefs = take_rows(state.sun_radiance, pos)          # (..., 72)
    return _sun_rgb_from_flat(coefs, x,
                              _cos_psi(gamma, state.params.sun_half_aperture))


def _select_channels(all_ch, idx):
    """all_ch (..., 11), idx (..., W) -> (..., W) channel pick.

    Masked sum over the tiny static channel axis instead of a per-lane
    gather (take_along_axis lowers to a scalar loop on TPU — the 26x trap
    documented in ops/gather.py)."""
    sel = (idx[..., :, None]
           == jnp.arange(C.N_WAVELENGTHS)).astype(all_ch.dtype)
    return jnp.sum(all_ch[..., None, :] * sel, axis=-1)


def _eval_sky_channels(state, channel_idx, cos_theta, gamma):
    """Sky radiance at integer channel indices (..., W)."""
    if channel_idx.ndim <= 1:  # static full-channel query (precompute path)
        coefs = state.sky_params[channel_idx]      # (W, 9)
        rad = state.sky_radiance[channel_idx]      # (W,)
        return _sky_formula(coefs, rad, cos_theta[..., None],
                            gamma[..., None])
    # per-lane wavelengths: evaluate ALL 11 dataset channels (pure VPU
    # math over a tiny static axis), then mask-select — no gathers
    all_ch = _sky_formula(state.sky_params, state.sky_radiance,
                          cos_theta[..., None], gamma[..., None])
    return _select_channels(all_ch, channel_idx)


def _eval_sun_all_channels(state, cos_theta):
    """Spectral sun radiance for all 11 dataset channels -> (..., 11).

    Evaluates the full channel axis with one single-axis gather on the
    segment index (a two-array gather compiles poorly), then callers pick
    channels with `take_along_axis`.
    """
    pos, x = _sun_segment(cos_theta)
    coefs = take_rows(state.sun_radiance, pos)                # (..., 44)
    xp = poly_powers(x, C.N_SUN_CTRL_PTS)
    k = C.N_SUN_CTRL_PTS
    chans = [jnp.sum(coefs[..., ch * k:(ch + 1) * k] * xp, axis=-1)
             for ch in range(C.N_WAVELENGTHS)]
    return jnp.stack(chans, axis=-1)


def _eval_sun_channels(state, channel_idx, cos_theta):
    """Spectral sun radiance at integer channel indices (..., W)."""
    all_ch = _eval_sun_all_channels(state, cos_theta)
    if channel_idx.ndim <= 1:  # static full-channel query (precompute path)
        return all_ch[..., channel_idx]
    all_ch = jnp.broadcast_to(
        all_ch, channel_idx.shape[:-1] + all_ch.shape[-1:])
    return _select_channels(all_ch, channel_idx)


def _eval_sun_ld(state, idx_low, idx_high, lerp_f, gamma):
    """Spectral limb darkening factor (..., W)."""
    cp = poly_powers(_cos_psi(gamma, state.params.sun_half_aperture),
                     C.N_SUN_LD_PARAMS)                        # (..., 6)
    # all 11 channels via one static matmul (sun_ld is (11, 6)), then
    # mask-select the two lerp endpoints — no per-lane gathers
    ld_all = jnp.einsum("...p,cp->...c", cp, state.sun_ld,
                        precision=jax.lax.Precision.HIGHEST)   # (..., 11)
    ld_all = jnp.broadcast_to(ld_all,
                              idx_low.shape[:-1] + ld_all.shape[-1:])
    return lerp(_select_channels(ld_all, idx_low),
                _select_channels(ld_all, idx_high), lerp_f)


def eval_spectral(state: SunskyState, cos_theta, gamma, wavelengths):
    """Spectral radiance at arbitrary wavelengths (..., W).

    Linearly interpolates the two neighbouring dataset channels of each
    queried wavelength; zero outside [320, 720] nm.
    """
    norm_wl = (wavelengths - C.WAVELENGTHS[0]) / C.WAVELENGTH_STEP
    valid = (norm_wl >= 0.0) & (norm_wl <= C.N_WAVELENGTHS - 1)
    idx_low = jnp.clip(jnp.floor(norm_wl).astype(jnp.int32),
                       0, C.N_WAVELENGTHS - 1)
    idx_high = jnp.minimum(idx_low + 1, C.N_WAVELENGTHS - 1)
    lerp_f = norm_wl - idx_low

    sky = lerp(_eval_sky_channels(state, idx_low, cos_theta, gamma),
               _eval_sky_channels(state, idx_high, cos_theta, gamma), lerp_f)

    sun = lerp(_eval_sun_channels(state, idx_low, cos_theta),
               _eval_sun_channels(state, idx_high, cos_theta), lerp_f)
    sun_ld = _eval_sun_ld(state, idx_low, idx_high, lerp_f, gamma)

    p = state.params
    w_disc = _disc_weight(state, gamma)   # == hit_sun; surrogate tangent
    res = (p.sky_scale * sky
           + w_disc[..., None] * (p.sun_scale * sun * sun_ld
                                  * area_ratio(p.sun_half_aperture)))
    active = (cos_theta >= 0.0)[..., None] & valid
    return jnp.where(active, res, 0.0)


def _disc_weight(state, gamma):
    """Sun-disc indicator with a straight-through surrogate gradient.

    The primal is EXACTLY the hard cone test (`sunsky.cpp:303` masks the
    sun term by gamma < aperture), but its derivative w.r.t. the sun
    direction / aperture is a delta on the cone boundary that pointwise
    AD evaluates to zero — so inverse rendering of `sun_direction` only
    sees the (weak, diffuse) sky-gradient signal and stalls ~10 degrees
    off (BASELINE.md round-3 config 5). The tangent therefore routes
    through a narrow linear ramp in cos(gamma) of half-width
    0.5*(1-cos(aperture)) (~0.06 deg in angle, about one 512p pixel):
    exactly the pixel-footprint smoothing that turns the boundary delta
    into the finite edge term an FD estimate of the pixel integral sees.
    (The reference has no counterpart; its sunsky experiments also note
    the missing disc gradient, `sunsky-testing/traversal_test.py`.)
    """
    cos_cut = jnp.cos(state.params.sun_half_aperture)
    cos_g = jnp.cos(gamma)
    hard = (cos_g >= cos_cut).astype(cos_g.dtype)
    soft = getattr(state.params, "disc_softness", 1.0)
    eps = 0.5 * (1.0 - cos_cut) * soft
    smooth = jnp.clip((cos_g - cos_cut) / jnp.maximum(eps, 1e-12) + 0.5,
                      0.0, 1.0)
    return smooth + jax.lax.stop_gradient(hard - smooth)


def _eval_rgb_jnp(state: SunskyState, d):
    """Pure-jnp RGB radiance (..., 3); reference path and AD backward."""
    cos_theta = d[..., 2]
    gamma = unit_angle(state.sun_frame_n, d)
    below = cos_theta < 0.0
    cos_theta_c = jnp.maximum(cos_theta, 0.0)
    p = state.params
    sky = eval_sky_rgb(state, cos_theta_c, gamma)
    sun = eval_sun_rgb(state, cos_theta_c, gamma)
    w_disc = _disc_weight(state, gamma)   # == hard mask; surrogate tangent
    res = (p.sky_scale * sky
           + w_disc[..., None]
           * (p.sun_scale * sun * area_ratio(p.sun_half_aperture)
              * C.SPEC_TO_RGB_SUN_CONV))
    res = res * C.CIE_Y_NORMALIZATION
    return jnp.where(below[..., None], 0.0, res)


def _bwd_interpret() -> bool:
    """Adjoint kernels run interpreted off-TPU (CPU tests)."""
    try:
        return jax.default_backend() in ("cpu",)
    except Exception:
        return True


def _fused_linear_tangent(jnp_fn, bwd_fn, primals, tangents):
    """Tangent of `jnp_fn` at `primals` as a `linear_call` whose transpose
    is the fused Pallas adjoint `bwd_fn`.

    Forward mode (`render_forward`, `common.py:495`) therefore evaluates
    the EXACT jnp JVP, while reverse mode — linearize via this rule, then
    transpose — runs the VMEM-resident backward kernel instead of
    transposing the unfused jnp graph (which pinned the fwd+bwd bench at
    the unfused program's HBM roofline; VERDICT r4 item 1, the analogue
    of Dr.Jit's fused reverse-AD kernels, `prb.py:246`).

    `tangents` leaves may be SymbolicZero (symbolic_zeros=True rules);
    only the non-zero leaves become linear operands — linear_call's
    transpose requires every linear operand to be an undefined primal.
    `bwd_fn(primals, out_ct) -> cotangent pytree congruent to primals`.
    """
    from jax.custom_derivatives import SymbolicZero, linear_call
    p_leaves, pdef = jax.tree.flatten(primals)
    t_leaves = jax.tree.flatten(
        tangents, is_leaf=lambda x: isinstance(x, SymbolicZero))[0]
    nz = tuple(not isinstance(t, SymbolicZero) for t in t_leaves)
    lin = [t for t, m in zip(t_leaves, nz) if m]
    out_avals = jax.eval_shape(lambda ps: jnp_fn(*ps), primals)

    def t_fwd(res_leaves, lin_):
        primals_ = jax.tree.unflatten(pdef, res_leaves)
        it = iter(lin_)
        full = [next(it) if m else jnp.zeros_like(p)
                for p, m in zip(res_leaves, nz)]
        _, tout = jax.jvp(jnp_fn, primals_, jax.tree.unflatten(pdef, full))
        return tout

    def t_t(res_leaves, ct):
        primals_ = jax.tree.unflatten(pdef, res_leaves)
        ct_leaves = jax.tree.flatten(ct)[0]
        av_leaves = jax.tree.flatten(out_avals)[0]
        ct_full = jax.tree.unflatten(
            jax.tree.structure(out_avals),
            [jnp.zeros(a.shape, a.dtype) if c is None else c
             for c, a in zip(ct_leaves, av_leaves)])
        cot = bwd_fn(primals_, ct_full)
        cot_leaves = jax.tree.flatten(cot)[0]
        return [c for c, m in zip(cot_leaves, nz) if m]

    return linear_call(t_fwd, t_t, p_leaves, lin)


@jax.custom_jvp
def _eval_rgb_fused(state: SunskyState, d):
    """Fused Pallas primal (TPU): one VMEM-resident kernel instead of the
    XLA fusion chain — measured 2.45x the jnp eval's throughput (697 vs
    284 M evals/s at 2M lanes). Forward-mode AD evaluates the exact jnp
    JVP; reverse mode transposes into the fused adjoint kernel
    (`sunsky_eval_rgb_bwd_pallas`) via `_fused_linear_tangent`."""
    from ...ops.pallas.sunsky_kernel import sunsky_eval_rgb_pallas
    return sunsky_eval_rgb_pallas(state, d)


def _eval_rgb_bwd(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_eval_rgb_bwd_pallas
    state, d = primals
    d_state, dd = sunsky_eval_rgb_bwd_pallas(state, d, ct,
                                             interpret=_bwd_interpret())
    return (d_state, dd)


@functools.partial(_eval_rgb_fused.defjvp, symbolic_zeros=True)
def _eval_rgb_fused_jvp(primals, tangents):
    primal_out = _eval_rgb_fused(*primals)
    return primal_out, _fused_linear_tangent(_eval_rgb_jnp, _eval_rgb_bwd,
                                             primals, tangents)


def _pallas_available() -> bool:
    """Use the fused kernel on real TPU backends; CPU keeps the jnp path
    (Mosaic-interpret would be slower; tests cover both)."""
    import os
    if os.environ.get("TPUSKY_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _eval_spec_jnp(state: SunskyState, d, wavelengths):
    """Pure-jnp spectral radiance (..., W); reference path and AD backward."""
    cos_theta = d[..., 2]
    gamma = unit_angle(state.sun_frame_n, d)
    # The formulas are only valid above the horizon; the output is masked
    # by cos_theta >= 0, but masked lanes must stay NaN/inf-free under AD
    # (exp(B / (cos_theta + 0.01)) explodes for cos_theta in [-1, 0)), so
    # clamp the formula input. The clamp is the identity on valid lanes.
    below = cos_theta < 0.0
    cos_theta_c = jnp.maximum(cos_theta, 0.0)
    res = eval_spectral(state, cos_theta_c, gamma, wavelengths)
    return jnp.where(below[..., None], 0.0, res)


@jax.custom_jvp
def _eval_spec_fused(state: SunskyState, d, wavelengths):
    """Fused Pallas spectral primal (TPU); forward-mode AD is the exact
    jnp JVP, reverse mode transposes into the fused spectral adjoint
    kernel (same linear_call pattern as the RGB blocks)."""
    from ...ops.pallas.sunsky_kernel import sunsky_eval_spec_pallas
    return sunsky_eval_spec_pallas(state, d, wavelengths)


def _eval_spec_bwd(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_hit_spec_bwd_pallas
    state, d, wl = primals
    d_state, dd, dwl = sunsky_hit_spec_bwd_pallas(
        state, d, wl, ct, with_pdf=False, interpret=_bwd_interpret())
    return (d_state, dd, dwl)


@functools.partial(_eval_spec_fused.defjvp, symbolic_zeros=True)
def _eval_spec_fused_jvp(primals, tangents):
    primal_out = _eval_spec_fused(*primals)
    return primal_out, _fused_linear_tangent(
        _eval_spec_jnp, _eval_spec_bwd, primals, tangents)


def eval(state: SunskyState, d, wavelengths=None, mode: str = "rgb"):
    """Emitted radiance along local direction d (pointing at the sky).

    RGB mode -> (..., 3) linear sRGB; spectral mode -> (..., W) with
    ``wavelengths`` (..., W) in nm. Both modes run fused Pallas kernels
    on TPU (reference eval `sunsky.cpp:303-352`, spectral wavelength
    lerp :326-347).
    """
    if mode == "rgb":
        if wavelengths is None and _pallas_available():
            flat = d.reshape(-1, 3)
            out = _eval_rgb_fused(state, flat)
            return out.reshape(d.shape[:-1] + (3,))
        return _eval_rgb_jnp(state, d)

    assert wavelengths is not None, "spectral eval needs wavelengths"
    if _pallas_available():
        nw = wavelengths.shape[-1]
        flat_d = d.reshape(-1, 3)
        flat_wl = jnp.broadcast_to(
            wavelengths, d.shape[:-1] + (nw,)).reshape(-1, nw)
        out = _eval_spec_fused(state, flat_d, flat_wl)
        return out.reshape(d.shape[:-1] + (nw,))
    return _eval_spec_jnp(state, d, wavelengths)


# ---------------------------------------------------------------------------
# Importance sampling
# ---------------------------------------------------------------------------

import numpy as _np_tr
_TRUNC_A = _np_tr.array([0.0, 0.0], _np_tr.float32)
_TRUNC_B = _np_tr.array([2.0 * _np_tr.pi, 0.5 * _np_tr.pi], _np_tr.float32)


def sample_sky(state: SunskyState, sample):
    """Sample a sky direction from the truncated gaussian mixture.

    sample: (..., 2) uniform. Returns local unit directions (..., 3).
    """
    idx, reused = discrete_sample_reuse(state.gaussian_distr, sample[..., 0])
    # Detached-sampling discipline: the rescaled uniform is sample
    # *placement*, not a differentiable quantity — and its reuse division
    # has unbounded gradients when a mixture weight is ~0 (exact-integer
    # turbidity zeroes half the bilinear corner weights).
    reused = jnp.asarray(jax.lax.stop_gradient(reused))
    g = take_rows(state.gaussians, idx)           # (..., 5)
    mu = g[..., 0:2]
    sigma = g[..., 2:4]

    cdf_a = gaussian_cdf(mu, sigma, _TRUNC_A)
    cdf_b = gaussian_cdf(mu, sigma, _TRUNC_B)
    u = jnp.stack([reused, sample[..., 1]], axis=-1)
    p = lerp(cdf_a, cdf_b, u)
    p = jnp.clip(p, C.EPSILON_F32, 1.0 - C.EPSILON_F32)
    angles = jnp.sqrt(2.0) * erfinv(2.0 * p - 1.0) * sigma + mu

    phi = angles[..., 0] + state.sun_angles[0] - 0.5 * jnp.pi
    theta = jnp.minimum(angles[..., 1], 0.5 * jnp.pi - C.EPSILON_F32)
    return sph_dir(theta, phi)


def sample_sun(state: SunskyState, sample):
    """Uniform direction in the sun cone; sample (..., 2) -> (..., 3)."""
    local = warp.square_to_uniform_cone(
        sample, jnp.cos(state.params.sun_half_aperture))
    return (local[..., 0:1] * state.sun_frame_s
            + local[..., 1:2] * state.sun_frame_t
            + local[..., 2:3] * state.sun_frame_n)


def tgmm_pdf(state: SunskyState, angles, active):
    """TGMM density in (phi, theta) space (no solid-angle jacobian)."""
    phi = angles[..., 0] - (state.sun_angles[0] - 0.5 * jnp.pi)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    phi = jnp.where(phi > 2 * jnp.pi, phi - 2 * jnp.pi, phi)
    theta = angles[..., 1]
    active = active & (theta >= 0.0) & (theta <= 0.5 * jnp.pi)

    g = state.gaussians                             # (20, 5)
    mu, sigma, w = g[:, 0:2], g[:, 2:4], g[:, 4]
    cdf_a = gaussian_cdf(mu, sigma, _TRUNC_A)
    cdf_b = gaussian_cdf(mu, sigma, _TRUNC_B)
    volume = ((cdf_b[:, 0] - cdf_a[:, 0]) * (cdf_b[:, 1] - cdf_a[:, 1])
              * sigma[:, 0] * sigma[:, 1])

    x = jnp.stack([phi, theta], axis=-1)[..., None, :]   # (..., 1, 2)
    z = (x - mu) / sigma                                 # (..., 20, 2)
    gauss = warp.square_to_std_normal_pdf(z)
    pdf = jnp.sum(w * gauss / volume, axis=-1)
    return jnp.where(active, pdf, 0.0)


def compute_pdfs(state: SunskyState, d, check_sun):
    """(sky_pdf, sun_pdf) of a local direction d; solid-angle measure."""
    cos_theta = d[..., 2]
    sin_theta = safe_sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)
    active = (cos_theta >= 0.0) & (sin_theta != 0.0)
    sin_theta = jnp.maximum(sin_theta, C.SIN_OFFSET)

    phi, theta = dir_to_sph(d)
    angles = jnp.stack([phi, theta], axis=-1)
    sky_pdf = tgmm_pdf(state, angles, active) / sin_theta

    cos_cutoff = jnp.cos(state.params.sun_half_aperture)
    cone_pdf = warp.square_to_uniform_cone_pdf(d, cos_cutoff)
    in_cone = jnp.sum(state.sun_frame_n * d, axis=-1) >= cos_cutoff
    # NB: jnp.logical_not, not `~` — a Python-bool check_sun would hit
    # Python's bitwise-not (~True == -2, truthy) and never mask.
    check_sun = jnp.asarray(check_sun, bool)
    sun_pdf = jnp.where(jnp.logical_or(jnp.logical_not(check_sun), in_cone),
                        cone_pdf, 0.0)
    sun_pdf = jnp.where(active, sun_pdf, 0.0)
    return sky_pdf, sun_pdf


def sample_direction(state: SunskyState, sample):
    """Importance-sample an emitter direction.

    sample: (..., 2) uniform. Returns (d_local (..., 3), pdf (...,)).
    Mixture of TGMM sky sampling and uniform sun-cone sampling weighted by
    the precomputed luminance ratio.
    """
    # strategy selection and uniform rescaling are sample placement ->
    # detached (gradients flow through the returned pdf instead)
    w = jax.lax.stop_gradient(state.sky_sampling_w)
    pick_sky = sample[..., 0] < w
    sky_u = jnp.stack([jnp.clip(sample[..., 0] / jnp.maximum(w, 1e-12), 0, 1),
                       sample[..., 1]], axis=-1)
    sun_u = jnp.stack([jnp.clip((sample[..., 0] - w)
                                / jnp.maximum(1 - w, 1e-12), 0, 1),
                       sample[..., 1]], axis=-1)
    d = jnp.where(pick_sky[..., None], sample_sky(state, sky_u),
                  sample_sun(state, sun_u))

    sky_pdf, sun_pdf = compute_pdfs(state, d, check_sun=pick_sky)
    pdf = lerp(sun_pdf, sky_pdf, w)
    pdf = jnp.where(d[..., 2] >= 0.0, pdf, 0.0)
    return d, pdf


def pdf_direction(state: SunskyState, d):
    """Solid-angle pdf of `sample_direction` for local direction d."""
    sky_pdf, sun_pdf = compute_pdfs(state, d, check_sun=True)
    return lerp(sun_pdf, sky_pdf, state.sky_sampling_w)


# ---------------------------------------------------------------------------
# Fused emitter-hit / NEE blocks (Pallas primal, jnp AD; RGB mode)
# ---------------------------------------------------------------------------


def _hit_rgb_jnp(state: SunskyState, d):
    return _eval_rgb_jnp(state, d), pdf_direction(state, d)


@jax.custom_jvp
def _hit_rgb_fused(state: SunskyState, d):
    """(radiance, pdf) in one Pallas pass — the emitter-hit MIS block
    (`eval` + `pdf_direction`); 4.25 ms vs 6.5 ms separate at 2M lanes.
    Reverse mode transposes into `sunsky_hit_rgb_bwd_pallas`."""
    from ...ops.pallas.sunsky_kernel import sunsky_hit_rgb_pallas
    return sunsky_hit_rgb_pallas(state, d)


def _hit_rgb_bwd(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_hit_rgb_bwd_pallas
    state, d = primals
    g_rad, g_pdf = ct
    d_state, dd = sunsky_hit_rgb_bwd_pallas(state, d, g_rad, g_pdf,
                                            interpret=_bwd_interpret())
    return (d_state, dd)


@functools.partial(_hit_rgb_fused.defjvp, symbolic_zeros=True)
def _hit_rgb_fused_jvp(primals, tangents):
    primal_out = _hit_rgb_fused(*primals)
    return primal_out, _fused_linear_tangent(_hit_rgb_jnp, _hit_rgb_bwd,
                                             primals, tangents)


def _hit_spec_jnp(state: SunskyState, d, wavelengths):
    return (_eval_spec_jnp(state, d, wavelengths), pdf_direction(state, d))


@jax.custom_jvp
def _hit_spec_fused(state: SunskyState, d, wavelengths):
    """(radiance, pdf) in one Pallas pass — spectral emitter-hit block.
    Reverse mode transposes into the fused spectral adjoint kernel."""
    from ...ops.pallas.sunsky_kernel import sunsky_hit_spec_pallas
    return sunsky_hit_spec_pallas(state, d, wavelengths)


def _hit_spec_bwd(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_hit_spec_bwd_pallas
    state, d, wl = primals
    g_rad, g_pdf = ct
    d_state, dd, dwl = sunsky_hit_spec_bwd_pallas(
        state, d, wl, g_rad, g_pdf, with_pdf=True,
        interpret=_bwd_interpret())
    return (d_state, dd, dwl)


@functools.partial(_hit_spec_fused.defjvp, symbolic_zeros=True)
def _hit_spec_fused_jvp(primals, tangents):
    primal_out = _hit_spec_fused(*primals)
    return primal_out, _fused_linear_tangent(
        _hit_spec_jnp, _hit_spec_bwd, primals, tangents)


def _hit_spec_jnp_rg(state: SunskyState, d, wavelengths):
    rad, pdf = _hit_spec_jnp(state, d, wavelengths)
    return rad, jax.lax.stop_gradient(pdf)


@jax.custom_jvp
def _hit_spec_fused_rg(state: SunskyState, d, wavelengths):
    from ...ops.pallas.sunsky_kernel import sunsky_hit_spec_pallas
    return sunsky_hit_spec_pallas(state, d, wavelengths)


def _hit_spec_bwd_rg(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_hit_spec_bwd_pallas
    state, d, wl = primals
    g_rad, _g_pdf = ct
    d_state, dd, dwl = sunsky_hit_spec_bwd_pallas(
        state, d, wl, g_rad, with_pdf=False, interpret=_bwd_interpret())
    return (d_state, dd, dwl)


@functools.partial(_hit_spec_fused_rg.defjvp, symbolic_zeros=True)
def _hit_spec_fused_rg_jvp(primals, tangents):
    primal_out = _hit_spec_fused_rg(*primals)
    return primal_out, _fused_linear_tangent(
        _hit_spec_jnp_rg, _hit_spec_bwd_rg, primals, tangents)


# --- render-contract variants (pdf outputs detached) -----------------------
#
# The path tracer only ever uses emitter pdfs DETACHED (`integrator.py`:
# `sg(em_pdf)` in the MIS weight, `sg(pdf_e)` in the NEE estimator —
# mirroring the reference's detached-sampling discipline, prb.py:147-160).
# These ops share the same fused forward kernels but declare that contract
# to AD: the pdf tangent is structurally zero, so the reverse transpose
# dispatches the radiance-only adjoint kernels and skips the 20-gaussian
# pdf transpose entirely.


def _hit_rgb_jnp_rg(state: SunskyState, d):
    return (_eval_rgb_jnp(state, d),
            jax.lax.stop_gradient(pdf_direction(state, d)))


@jax.custom_jvp
def _hit_rgb_fused_rg(state: SunskyState, d):
    from ...ops.pallas.sunsky_kernel import sunsky_hit_rgb_pallas
    return sunsky_hit_rgb_pallas(state, d)


def _hit_rgb_bwd_rg(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_eval_rgb_bwd_pallas
    state, d = primals
    g_rad, _g_pdf = ct
    d_state, dd = sunsky_eval_rgb_bwd_pallas(state, d, g_rad,
                                             interpret=_bwd_interpret())
    return (d_state, dd)


@functools.partial(_hit_rgb_fused_rg.defjvp, symbolic_zeros=True)
def _hit_rgb_fused_rg_jvp(primals, tangents):
    primal_out = _hit_rgb_fused_rg(*primals)
    return primal_out, _fused_linear_tangent(
        _hit_rgb_jnp_rg, _hit_rgb_bwd_rg, primals, tangents)


def _sample_eval_rgb_jnp_rg(state: SunskyState, u2):
    d, rad, pdf = _sample_eval_rgb_jnp(state, u2)
    return d, rad, jax.lax.stop_gradient(pdf)


@jax.custom_jvp
def _sample_eval_rgb_fused_rg(state: SunskyState, u2):
    from ...ops.pallas.sunsky_kernel import sunsky_nee_rgb_pallas
    return sunsky_nee_rgb_pallas(state, u2)


def _sample_eval_rgb_bwd_rg(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_nee_rgb_bwd_nopdf_pallas
    state, u2 = primals
    _g_d, g_rad, _g_pdf = ct
    d_state = sunsky_nee_rgb_bwd_nopdf_pallas(state, u2, g_rad,
                                              interpret=_bwd_interpret())
    return (d_state, jnp.zeros_like(u2))


@functools.partial(_sample_eval_rgb_fused_rg.defjvp, symbolic_zeros=True)
def _sample_eval_rgb_fused_rg_jvp(primals, tangents):
    primal_out = _sample_eval_rgb_fused_rg(*primals)
    return primal_out, _fused_linear_tangent(
        _sample_eval_rgb_jnp_rg, _sample_eval_rgb_bwd_rg, primals, tangents)


def eval_pdf(state: SunskyState, d, wavelengths=None, mode: str = "rgb",
             pdf_detached: bool = False):
    """Radiance + solid-angle pdf toward local direction d.

    Fused on TPU in both modes; identical to
    `(eval(...), pdf_direction(...))` otherwise. pdf_detached=True opts
    into the render contract (pdf used under stop_gradient only): same
    values, radiance-only adjoint."""
    if mode == "rgb" and wavelengths is None and _pallas_available():
        flat = d.reshape(-1, 3)
        op = _hit_rgb_fused_rg if pdf_detached else _hit_rgb_fused
        rad, pdf = op(state, flat)
        return (rad.reshape(d.shape[:-1] + (3,)),
                pdf.reshape(d.shape[:-1]))
    if mode != "rgb" and wavelengths is not None and _pallas_available():
        nw = wavelengths.shape[-1]
        flat_d = d.reshape(-1, 3)
        flat_wl = jnp.broadcast_to(
            wavelengths, d.shape[:-1] + (nw,)).reshape(-1, nw)
        op = _hit_spec_fused_rg if pdf_detached else _hit_spec_fused
        rad, pdf = op(state, flat_d, flat_wl)
        return (rad.reshape(d.shape[:-1] + (nw,)),
                pdf.reshape(d.shape[:-1]))
    pdf = pdf_direction(state, d)
    if pdf_detached:
        pdf = jax.lax.stop_gradient(pdf)
    return eval(state, d, wavelengths=wavelengths, mode=mode), pdf


def _sample_eval_rgb_jnp(state: SunskyState, u2):
    d, pdf = sample_direction(state, u2)
    # detached-sampling discipline (`prb.py:147-160`): the direction is
    # sample placement; gradients flow through radiance and pdf values
    d = jax.lax.stop_gradient(d)
    return d, _eval_rgb_jnp(state, d), pdf


@jax.custom_jvp
def _sample_eval_rgb_fused(state: SunskyState, u2):
    """(direction, radiance, pdf) in one Pallas pass — the NEE block
    (`sample_direction` + `eval`); 3.6 ms vs 7.2 ms separate at 2M lanes.
    Reverse mode transposes into `sunsky_nee_rgb_bwd_pallas`."""
    from ...ops.pallas.sunsky_kernel import sunsky_nee_rgb_pallas
    return sunsky_nee_rgb_pallas(state, u2)


def _sample_eval_rgb_bwd(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_nee_rgb_bwd_pallas
    state, u2 = primals
    _g_d, g_rad, g_pdf = ct      # direction = detached sample placement
    d_state = sunsky_nee_rgb_bwd_pallas(state, u2, g_rad, g_pdf,
                                        interpret=_bwd_interpret())
    return (d_state, jnp.zeros_like(u2))


@functools.partial(_sample_eval_rgb_fused.defjvp, symbolic_zeros=True)
def _sample_eval_rgb_fused_jvp(primals, tangents):
    primal_out = _sample_eval_rgb_fused(*primals)
    return primal_out, _fused_linear_tangent(
        _sample_eval_rgb_jnp, _sample_eval_rgb_bwd, primals, tangents)


def _sample_eval_spec_jnp(state: SunskyState, u2, wavelengths):
    d, pdf = sample_direction(state, u2)
    d = jax.lax.stop_gradient(d)
    return d, _eval_spec_jnp(state, d, wavelengths), pdf


@jax.custom_jvp
def _sample_eval_spec_fused(state: SunskyState, u2, wavelengths):
    """(direction, radiance, pdf) in one Pallas pass — spectral NEE.
    Reverse mode transposes into the fused spectral adjoint kernel."""
    from ...ops.pallas.sunsky_kernel import sunsky_nee_spec_pallas
    return sunsky_nee_spec_pallas(state, u2, wavelengths)


def _sample_eval_spec_bwd(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_nee_spec_bwd_pallas
    state, u2, wl = primals
    _g_d, g_rad, g_pdf = ct
    d_state, dwl = sunsky_nee_spec_bwd_pallas(
        state, u2, wl, g_rad, g_pdf, with_pdf=True,
        interpret=_bwd_interpret())
    return (d_state, jnp.zeros_like(u2), dwl)


@functools.partial(_sample_eval_spec_fused.defjvp, symbolic_zeros=True)
def _sample_eval_spec_fused_jvp(primals, tangents):
    primal_out = _sample_eval_spec_fused(*primals)
    return primal_out, _fused_linear_tangent(
        _sample_eval_spec_jnp, _sample_eval_spec_bwd, primals, tangents)


def _sample_eval_spec_jnp_rg(state: SunskyState, u2, wavelengths):
    d, rad, pdf = _sample_eval_spec_jnp(state, u2, wavelengths)
    return d, rad, jax.lax.stop_gradient(pdf)


@jax.custom_jvp
def _sample_eval_spec_fused_rg(state: SunskyState, u2, wavelengths):
    from ...ops.pallas.sunsky_kernel import sunsky_nee_spec_pallas
    return sunsky_nee_spec_pallas(state, u2, wavelengths)


def _sample_eval_spec_bwd_rg(primals, ct):
    from ...ops.pallas.sunsky_kernel import sunsky_nee_spec_bwd_pallas
    state, u2, wl = primals
    _g_d, g_rad, _g_pdf = ct
    d_state, dwl = sunsky_nee_spec_bwd_pallas(
        state, u2, wl, g_rad, with_pdf=False, interpret=_bwd_interpret())
    return (d_state, jnp.zeros_like(u2), dwl)


@functools.partial(_sample_eval_spec_fused_rg.defjvp, symbolic_zeros=True)
def _sample_eval_spec_fused_rg_jvp(primals, tangents):
    primal_out = _sample_eval_spec_fused_rg(*primals)
    return primal_out, _fused_linear_tangent(
        _sample_eval_spec_jnp_rg, _sample_eval_spec_bwd_rg, primals,
        tangents)


def sample_eval(state: SunskyState, u2, wavelengths=None,
                mode: str = "rgb", pdf_detached: bool = False):
    """Importance-sample a direction and evaluate its radiance + pdf.

    Returns (d_local (..., 3) — already detached, radiance, pdf). Fused on
    TPU in both modes. pdf_detached=True opts into the render contract
    (the NEE estimator divides by the detached pdf): same values,
    radiance-only adjoint."""
    if mode == "rgb" and wavelengths is None and _pallas_available():
        flat = u2.reshape(-1, 2)
        op = (_sample_eval_rgb_fused_rg if pdf_detached
              else _sample_eval_rgb_fused)
        d, rad, pdf = op(state, flat)
        batch = u2.shape[:-1]
        return (d.reshape(batch + (3,)), rad.reshape(batch + (3,)),
                pdf.reshape(batch))
    if mode != "rgb" and wavelengths is not None and _pallas_available():
        nw = wavelengths.shape[-1]
        batch = u2.shape[:-1]
        flat_u = u2.reshape(-1, 2)
        flat_wl = jnp.broadcast_to(wavelengths,
                                   batch + (nw,)).reshape(-1, nw)
        op = (_sample_eval_spec_fused_rg if pdf_detached
              else _sample_eval_spec_fused)
        d, rad, pdf = op(state, flat_u, flat_wl)
        return (d.reshape(batch + (3,)), rad.reshape(batch + (nw,)),
                pdf.reshape(batch))
    d, pdf = sample_direction(state, u2)
    d = jax.lax.stop_gradient(d)
    if pdf_detached:
        pdf = jax.lax.stop_gradient(pdf)
    rad = eval(state, d, wavelengths=wavelengths, mode=mode)
    return d, rad, pdf


def sample_wavelengths(state: SunskyState, u, n: int = 4):
    """Importance-sample hero wavelengths from the precomputed spectral
    distribution; u (...,) uniform -> (wavelengths (..., n), pdf (..., n))."""
    from ...ops.spectrum import sample_shifted
    shifted = sample_shifted(u, n)
    return continuous_sample_pdf(state.spectral_distr, shifted)


# ---------------------------------------------------------------------------
# Sky/sun luminance ratio (Gauss-Legendre quadrature)
# ---------------------------------------------------------------------------


def _estimate_sky_sun_ratio(state: SunskyState, mode: str, n_quad: int = 64):
    """Integrated sky vs sun luminance -> (sky sampling weight, spectral
    distribution over [360, 720] nm or None in RGB mode).

    The reference integrates on a 200-pt Gauss-Legendre grid
    (`sunsky.cpp:772`); 64 points reproduce the weight to ~5 decimal
    places (it is a smooth integrand) and the weight only balances the
    sky-vs-sun MIS strategy — sample() and pdf() share it, so ANY value
    is unbiased; accuracy affects variance only. 64 vs 200 cuts the
    per-parameter-update precompute ~10x (it runs every frame of an
    inverse-rendering loop)."""
    p = state.params
    nc = state.sky_params.shape[0]
    dtype = state.sky_params.dtype
    xq, wq = gauss_legendre(n_quad)
    xq = jnp.asarray(xq, dtype)
    wq = jnp.asarray(wq, dtype)
    channel_idx = jnp.arange(nc)

    # Sky: [-1,1]^2 -> phi in [0,2pi], cos_theta in [0,1]
    phi = jnp.pi * (xq + 1.0)
    cos_theta = 0.5 * (xq + 1.0)
    phi_g, ct_g = jnp.meshgrid(phi, cos_theta, indexing="xy")
    w_g = jnp.outer(wq, wq).T  # w_phi * w_cos_theta on the same grid
    st_g = safe_sqrt(1.0 - ct_g * ct_g)
    wo = jnp.stack([st_g * jnp.cos(phi_g), st_g * jnp.sin(phi_g), ct_g],
                   axis=-1)
    gamma = unit_angle(state.sun_frame_n, wo)
    sky_spec = _eval_sky_channels(state, channel_idx, ct_g, gamma)
    sky_int = jnp.sum(sky_spec * w_g[..., None], axis=(0, 1)) * (0.5 * jnp.pi)

    # Sun: cone around the sun direction, cos_gamma in [cos_cutoff, 1]
    cos_cutoff = jnp.cos(p.sun_half_aperture)
    jac = 0.5 * jnp.pi * (1.0 - cos_cutoff)
    cg = 0.5 * ((1.0 - cos_cutoff) * xq + (1.0 + cos_cutoff))
    phi_g, cg_g = jnp.meshgrid(phi, cg, indexing="xy")
    sg_g = safe_sqrt(1.0 - cg_g * cg_g)
    local = jnp.stack([sg_g * jnp.cos(phi_g), sg_g * jnp.sin(phi_g), cg_g],
                      axis=-1)
    gamma_sun = unit_angle_z(local)
    wo_sun = (local[..., 0:1] * state.sun_frame_s
              + local[..., 1:2] * state.sun_frame_t
              + local[..., 2:3] * state.sun_frame_n)
    ct_sun = wo_sun[..., 2]
    active = ct_sun >= 0.0

    if mode == "rgb":
        pos, x = _sun_segment(ct_sun)
        coefs = take_rows(state.sun_radiance, pos)
        sun_spec = _sun_rgb_from_flat(coefs, x,
                                      _cos_psi(gamma_sun, p.sun_half_aperture))
    else:
        sun_spec = _eval_sun_channels(state, channel_idx, ct_sun)
        cp = poly_powers(_cos_psi(gamma_sun, p.sun_half_aperture),
                         C.N_SUN_LD_PARAMS)[..., None, :]
        sun_spec = sun_spec * jnp.sum(state.sun_ld * cp, axis=-1)
    sun_spec = jnp.where(active[..., None], sun_spec, 0.0)
    sun_int = jnp.sum(sun_spec * w_g[..., None], axis=(0, 1)) * jac

    if mode == "rgb":
        sky_lum = p.sky_scale * luminance_rgb(sky_int)
        sun_lum = (p.sun_scale * luminance_rgb(sun_int)
                   * area_ratio(p.sun_half_aperture) * C.SPEC_TO_RGB_SUN_CONV)
        spectral_distr = None
    else:
        wl = jnp.asarray(C.WAVELENGTHS, dtype)
        sky_lum = p.sky_scale * jnp.mean(cie1931_y(wl) * sky_int)
        sun_lum = (p.sun_scale * jnp.mean(cie1931_y(wl) * sun_int)
                   * area_ratio(p.sun_half_aperture))
        # Wavelength distribution over [360, 720] (channel 0 = 320nm skipped)
        spec = (sky_int + sun_int)[1:]
        spec = jnp.where(jnp.all(spec == 0.0), jnp.ones_like(spec), spec)
        spectral_distr = make_continuous(spec, C.WAVELENGTHS[1],
                                         C.WAVELENGTHS[-1])

    ratio = sky_lum / (sky_lum + sun_lum)
    ratio = jnp.where(jnp.isnan(ratio), 0.0, ratio)
    return ratio, spectral_distr
