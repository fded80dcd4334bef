"""BSDFs (SoA material tables with branch-free multi-lobe dispatch).

TPU-first counterpart of the reference's BSDF plugins (SURVEY.md H7;
`src/bsdfs/`): materials live in one struct-of-arrays table; per-lane
dispatch evaluates every supported lobe (each a handful of VPU flops) and
selects with `where` — no vectorised virtual calls needed.

Supported kinds:
  0 diffuse         smooth Lambertian (reference `diffuse.cpp`)
  1 roughconductor  GGX microfacet + complex-IOR Fresnel
                    (`roughconductor.cpp`, `microfacet.h`)
  2 conductor       smooth mirror + complex-IOR Fresnel (delta lobe)
  3 dielectric      smooth glass, reflect/refract by Fresnel (delta lobe)

Directions are in the local shading frame (+z = normal). `sample` returns
weight = value/pdf with cosine foreshortening included; delta lobes return
pdf = the discrete lobe probability and is_delta = True (their pdf w.r.t.
solid angle is a Dirac — MIS treats them as unmatchable, like the
reference's `BSDFFlags::Delta`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import warp
from ..ops.gather import take_ints, take_rows, take_scalars
from ..ops.math import safe_sqrt

DIFFUSE, ROUGH_CONDUCTOR, CONDUCTOR, DIELECTRIC = 0, 1, 2, 3


class MaterialTable(NamedTuple):
    kind: jnp.ndarray         # (M,) int32
    albedo: jnp.ndarray       # (M, 3) diffuse reflectance / conductor tint
    twosided: jnp.ndarray     # (M,) bool
    albedo_spec: jnp.ndarray  # (M, 11) reflectance at 320..720nm step 40
    alpha: jnp.ndarray        # (M,) GGX roughness
    eta: jnp.ndarray          # (M, 3) conductor IOR (real part)
    k: jnp.ndarray            # (M, 3) conductor IOR (imaginary part)
    ior: jnp.ndarray          # (M,) dielectric relative IOR (int/ext)


# legacy alias used throughout the renderer
DiffuseTable = MaterialTable


def make_material_table(kinds=None, albedos=((0.5, 0.5, 0.5),),
                        twosided=None, spectral_albedos=None, alphas=None,
                        etas=None, ks=None, iors=None) -> MaterialTable:
    import numpy as np
    a = np.atleast_2d(np.asarray(albedos, np.float32))
    m = a.shape[0]
    kinds = (np.zeros((m,), np.int32) if kinds is None
             else np.asarray(kinds, np.int32))
    ts = (np.zeros((m,), bool) if twosided is None
          else np.asarray(twosided, bool))
    if spectral_albedos is None:
        spectral_albedos = np.repeat(a.mean(-1, keepdims=True), 11, axis=-1)
    alphas = (np.full((m,), 0.1, np.float32) if alphas is None
              else np.asarray(alphas, np.float32))
    # default conductor IOR: gold-ish values
    etas = (np.tile(np.array([0.143, 0.375, 1.442], np.float32), (m, 1))
            if etas is None else np.atleast_2d(np.asarray(etas, np.float32)))
    ks = (np.tile(np.array([3.983, 2.386, 1.603], np.float32), (m, 1))
          if ks is None else np.atleast_2d(np.asarray(ks, np.float32)))
    iors = (np.full((m,), 1.5046, np.float32) if iors is None
            else np.asarray(iors, np.float32))
    return MaterialTable(jnp.asarray(kinds), jnp.asarray(a),
                         jnp.asarray(ts),
                         jnp.asarray(np.asarray(spectral_albedos,
                                                np.float32)),
                         jnp.asarray(alphas), jnp.asarray(etas),
                         jnp.asarray(ks), jnp.asarray(iors))


def make_diffuse_table(albedos, twosided=None,
                       spectral_albedos=None) -> MaterialTable:
    """Back-compat constructor: all-diffuse table."""
    return make_material_table(albedos=albedos, twosided=twosided,
                               spectral_albedos=spectral_albedos)


def _reflectance(table: MaterialTable, mat_idx, wavelengths):
    """Per-lane reflectance: (..., C) RGB or (..., W) at hero wavelengths."""
    if wavelengths is None:
        return take_rows(table.albedo, mat_idx)
    spec = take_rows(table.albedo_spec, mat_idx)       # (..., 11)
    norm = jnp.clip((wavelengths - 320.0) / 40.0, 0.0, 10.0)
    lo = jnp.clip(jnp.floor(norm).astype(jnp.int32), 0, 9)
    t = norm - lo
    v_lo = jnp.take_along_axis(spec, lo, axis=-1)
    v_hi = jnp.take_along_axis(spec, lo + 1, axis=-1)
    return (1.0 - t) * v_lo + t * v_hi


def _flip_sign(wi, twosided):
    """Two-sided adapter: mirror the frame when arriving from below."""
    return jnp.where(twosided & (wi[..., 2] < 0.0), -1.0, 1.0)


# ---------------------------------------------------------------------------
# Microfacet (GGX / Trowbridge-Reitz) helpers — cf. reference microfacet.h
# ---------------------------------------------------------------------------


def _ggx_ndf(m, alpha):
    """GGX normal distribution D(m), alpha isotropic."""
    a2 = alpha * alpha
    c2 = m[..., 2] ** 2
    denom = c2 * (a2 - 1.0) + 1.0
    return jnp.where(m[..., 2] > 0.0, a2 / (jnp.pi * denom * denom), 0.0)


def _ggx_g1(v, alpha):
    """Smith masking G1 for GGX."""
    c = jnp.abs(v[..., 2])
    t2 = jnp.maximum(1.0 - c * c, 0.0) / jnp.maximum(c * c, 1e-12)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * t2))


def _ggx_sample(alpha, u):
    """Sample the GGX NDF (D(m) cos(m) pdf). Returns microfacet normal."""
    cos2 = (1.0 - u[..., 0]) / (u[..., 0] * (alpha * alpha - 1.0) + 1.0)
    cos_t = jnp.sqrt(jnp.maximum(cos2, 0.0))
    sin_t = safe_sqrt(1.0 - cos2)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                     axis=-1)


def _fresnel_conductor(cos_i, eta, k):
    """Exact Fresnel reflectance for a conductor (unpolarised average).

    cos_i (...,) broadcast against eta/k (..., C)."""
    c = jnp.clip(cos_i, 0.0, 1.0)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + c2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / (t1 + t2)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / (t3 + t4)
    return 0.5 * (rs + rp)


def fresnel_dielectric(cos_i, eta):
    """Fresnel reflectance + cos of transmitted angle for a dielectric.

    Returns (F, cos_t_signed, eta_rel): eta_rel is eta when entering,
    1/eta when exiting (cos_i < 0)."""
    entering = cos_i >= 0.0
    eta_rel = jnp.where(entering, eta, 1.0 / eta)
    c = jnp.abs(cos_i)
    s2_t = (1.0 - c * c) / jnp.maximum(eta_rel * eta_rel, 1e-12)
    tir = s2_t >= 1.0
    cos_t = safe_sqrt(1.0 - s2_t)
    rs = (c - eta_rel * cos_t) / jnp.maximum(c + eta_rel * cos_t, 1e-12)
    rp = (eta_rel * c - cos_t) / jnp.maximum(eta_rel * c + cos_t, 1e-12)
    f = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    return f, jnp.where(entering, -cos_t, cos_t), eta_rel


def _reflect(wi, m):
    return 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi


def _tint(table, mat_idx, wavelengths, n_chan_ref):
    """Specular tint: RGB uses the albedo column; spectral uses the
    interpolated spectrum."""
    return _reflectance(table, mat_idx, wavelengths)


def _n_chan(wavelengths):
    return 3 if wavelengths is None else wavelengths.shape[-1]


def eval_pdf(table: MaterialTable, mat_idx, wi, wo, wavelengths=None):
    """(f * cos(theta_o), pdf) over the non-delta lobes.

    Delta materials contribute 0 here (their throughput only arrives via
    `sample`), matching how the reference's NEE skips Delta BSDFs.
    """
    kind = take_ints(table.kind, mat_idx)
    sign = _flip_sign(wi, take_scalars(table.twosided.astype(jnp.float32),
                                       mat_idx) > 0.5)
    wi_l = wi * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], axis=-1)
    wo_l = wo * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], axis=-1)
    cos_i = wi_l[..., 2]
    cos_o = wo_l[..., 2]
    refl_active = (cos_i > 0.0) & (cos_o > 0.0)

    # --- diffuse lobe ---
    albedo = _reflectance(table, mat_idx, wavelengths)
    diff_val = albedo * (warp.INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
    diff_pdf = warp.INV_PI * jnp.maximum(cos_o, 0.0)

    # --- GGX rough conductor lobe ---
    alpha = take_scalars(table.alpha, mat_idx)
    m = wi_l + wo_l
    m_len = jnp.linalg.norm(m, axis=-1, keepdims=True)
    m = m / jnp.maximum(m_len, 1e-12)
    d_ndf = _ggx_ndf(m, alpha)
    g = _ggx_g1(wi_l, alpha) * _ggx_g1(wo_l, alpha)
    mi_dot = jnp.sum(wi_l * m, axis=-1)
    if wavelengths is None:
        f_c = _fresnel_conductor(mi_dot, take_rows(table.eta, mat_idx),
                                 take_rows(table.k, mat_idx))
    else:  # spectral: channel-averaged conductor Fresnel
        f_avg = jnp.mean(_fresnel_conductor(
            mi_dot, take_rows(table.eta, mat_idx),
            take_rows(table.k, mat_idx)), axis=-1)
        f_c = jnp.broadcast_to(f_avg[..., None],
                               mi_dot.shape + (wavelengths.shape[-1],))
    spec_tint = _tint(table, mat_idx, wavelengths, None)
    denom = 4.0 * jnp.maximum(cos_i, 1e-6)
    rough_val = (spec_tint * f_c
                 * (d_ndf * g / denom)[..., None])
    rough_pdf = (d_ndf * m[..., 2]
                 / jnp.maximum(4.0 * jnp.abs(mi_dot), 1e-6))

    is_diff = kind == DIFFUSE
    is_rough = kind == ROUGH_CONDUCTOR
    value = jnp.where(is_diff[..., None], diff_val,
                      jnp.where(is_rough[..., None], rough_val, 0.0))
    pdf = jnp.where(is_diff, diff_pdf, jnp.where(is_rough, rough_pdf, 0.0))
    value = jnp.where(refl_active[..., None], value, 0.0)
    pdf = jnp.where(refl_active, pdf, 0.0)
    return value, pdf


def sample(table: MaterialTable, mat_idx, wi, sample2, sample1,
           wavelengths=None):
    """Sample an outgoing direction.

    Returns (wo, weight, pdf, is_delta). `sample1` drives discrete lobe
    choices (dielectric reflect/refract).
    """
    kind = take_ints(table.kind, mat_idx)
    sign = _flip_sign(wi, take_scalars(table.twosided.astype(jnp.float32),
                                       mat_idx) > 0.5)
    sign3 = jnp.stack([jnp.ones_like(sign)] * 2 + [sign], axis=-1)
    wi_l = wi * sign3
    cos_i = wi_l[..., 2]
    active = cos_i > 0.0

    # --- diffuse: cosine hemisphere ---
    wo_diff = warp.square_to_cosine_hemisphere(sample2)
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo_diff)
    albedo = _reflectance(table, mat_idx, wavelengths)

    # --- rough conductor: sample the NDF, reflect ---
    alpha = take_scalars(table.alpha, mat_idx)
    m = _ggx_sample(alpha, sample2)
    wo_rough = _reflect(wi_l, m)
    mi_dot = jnp.sum(wi_l * m, axis=-1)
    pdf_rough = (_ggx_ndf(m, alpha) * m[..., 2]
                 / jnp.maximum(4.0 * jnp.abs(mi_dot), 1e-6))
    g = _ggx_g1(wi_l, alpha) * _ggx_g1(wo_rough, alpha)
    if wavelengths is None:
        f_c = _fresnel_conductor(mi_dot, take_rows(table.eta, mat_idx),
                                 take_rows(table.k, mat_idx))
    else:
        f_avg = jnp.mean(_fresnel_conductor(
            mi_dot, take_rows(table.eta, mat_idx),
            take_rows(table.k, mat_idx)), axis=-1)
        f_c = jnp.broadcast_to(f_avg[..., None],
                               mi_dot.shape + (wavelengths.shape[-1],))
    spec_tint = _tint(table, mat_idx, wavelengths, None)
    # weight = f*cos/pdf = tint * F * G * mi_dot / (cos_m * cos_i)
    w_rough = (spec_tint * f_c
               * (g * jnp.abs(mi_dot)
                  / jnp.maximum(m[..., 2] * jnp.maximum(cos_i, 1e-6), 1e-6)
                  )[..., None])
    rough_ok = (wo_rough[..., 2] > 0.0) & (mi_dot > 0.0)

    # --- smooth conductor: mirror reflection (delta) ---
    wo_mirr = jnp.stack([-wi_l[..., 0], -wi_l[..., 1], wi_l[..., 2]],
                        axis=-1)
    if wavelengths is None:
        f_m = _fresnel_conductor(cos_i, take_rows(table.eta, mat_idx),
                                 take_rows(table.k, mat_idx))
    else:
        f_avg = jnp.mean(_fresnel_conductor(
            cos_i, take_rows(table.eta, mat_idx),
            take_rows(table.k, mat_idx)), axis=-1)
        f_m = jnp.broadcast_to(f_avg[..., None],
                               cos_i.shape + (wavelengths.shape[-1],))
    w_mirr = spec_tint * f_m

    # --- smooth dielectric: reflect or refract by Fresnel (delta) ---
    ior = take_scalars(table.ior, mat_idx)
    # dielectric is inherently two-sided: use the unflipped wi
    f_d, cos_t, eta_rel = fresnel_dielectric(wi[..., 2], ior)
    do_reflect = sample1 < f_d
    wo_refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    scale_xy = -1.0 / eta_rel
    wo_refr = jnp.stack([wi[..., 0] * scale_xy, wi[..., 1] * scale_xy,
                         cos_t], axis=-1)
    wo_diel = jnp.where(do_reflect[..., None], wo_refl, wo_refr)
    # radiance transport carries the 1/eta_rel^2 factor on refraction
    # (reference dielectric.cpp solid-angle compression)
    w_diel_s = jnp.where(do_reflect, 1.0, 1.0 / (eta_rel * eta_rel))
    nc = _n_chan(wavelengths)
    w_diel = jnp.broadcast_to(w_diel_s[..., None], w_diel_s.shape + (nc,))
    pdf_diel = jnp.where(do_reflect, f_d, 1.0 - f_d)

    is_diff = kind == DIFFUSE
    is_rough = kind == ROUGH_CONDUCTOR
    is_mirr = kind == CONDUCTOR
    is_diel = kind == DIELECTRIC

    wo = jnp.where(is_diff[..., None], wo_diff,
                   jnp.where(is_rough[..., None], wo_rough,
                             jnp.where(is_mirr[..., None], wo_mirr,
                                       wo_diel)))
    weight = jnp.where(is_diff[..., None], albedo,
                       jnp.where(is_rough[..., None],
                                 jnp.where(rough_ok[..., None], w_rough, 0.0),
                                 jnp.where(is_mirr[..., None], w_mirr,
                                           w_diel)))
    pdf = jnp.where(is_diff, pdf_diff,
                    jnp.where(is_rough, pdf_rough,
                              jnp.where(is_mirr, 1.0, pdf_diel)))
    is_delta = is_mirr | is_diel

    # flip back to the geometric frame (dielectric already geometric)
    wo = jnp.where(is_diel[..., None], wo, wo * sign3)
    ok = jnp.where(is_diel, True, active)
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    return wo, weight, pdf, is_delta


# --- back-compat wrappers (diffuse-only call sites) ---


def diffuse_eval_pdf(table, mat_idx, wi, wo, wavelengths=None):
    return eval_pdf(table, mat_idx, wi, wo, wavelengths)


def diffuse_sample(table, mat_idx, wi, sample2, wavelengths=None):
    wo, weight, pdf, _ = sample(table, mat_idx, wi, sample2,
                                jnp.zeros(wi.shape[:-1]), wavelengths)
    return wo, weight, pdf
