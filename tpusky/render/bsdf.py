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
  4 plastic         smooth dielectric coat over a Lambertian base with
                    internal-scattering compensation (`plastic.cpp`)
  5 roughdielectric GGX microfacet glass, reflect+refract (`roughdielectric.cpp`)
  6 null            invisible pass-through (`null.cpp`; delta transmission)
  7 thindielectric  thin glass sheet: delta reflect / straight-through
                    transmit with multiple-internal-bounce reflectance
                    R* = 2F/(1+F) (`thindielectric.cpp`)
  8 roughplastic    GGX dielectric coat over a Lambertian base, both lobes
                    rough/non-delta (`roughplastic.cpp`)
  9 principled      Disney BSDF (`principled.cpp`): retro-reflective
                    diffuse + Schlick-Fresnel GGX specular + sheen +
                    GTR1 clearcoat; reflection lobes only (spec_trans /
                    anisotropic / flatness out of scope). Parameters live
                    in the `extra` column: [metallic, specular, sheen,
                    sheen_tint, clearcoat, clearcoat_gloss, spec_tint, -]
 10 blend           convex combination of two other table rows
                    (`blendbsdf.cpp`): eval/pdf = lerp of the children by
                    `blend_w`; sample = one-sample MIS (pick child b with
                    probability w, reweight by the blended value/pdf).
                    Children must be non-blend rows (one nesting level,
                    like the reference's practical usage).
 11 pplastic        polarized plastic (`pplastic.cpp`, Baek et al. 2018):
                    GGX dielectric specular + Lambertian base attenuated
                    by (1-F_i)(1-F_o); both lobes polarization-aware in
                    the Stokes transport path (`render/polarized.py`)
 12 polarizer       linear polarizing filter (`polarizer.cpp`): delta
                    straight-through transmission; `extra[0]` = rotation
                    angle theta in degrees, albedo = transmittance
 13 retarder        linear retarder / wave plate (`retarder.cpp`):
                    `extra[0]` = theta (deg), `extra[1]` = phase delta
                    (deg; 90 = quarter-wave, 180 = half-wave)
 14 circular        circular polarizer (`circular.cpp`): `extra[2]` > 0.5
                    selects left-handed

Any material additionally carries an `opacity` in [0, 1]: lanes pass
through unscattered with probability 1-opacity — the flattened equivalent
of the reference's `mask.cpp` wrapper (opacity 1 = no mask).

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
from ..ops.math import safe_acos, safe_asin, safe_sqrt

DIFFUSE, ROUGH_CONDUCTOR, CONDUCTOR, DIELECTRIC = 0, 1, 2, 3
PLASTIC, ROUGH_DIELECTRIC, NULL_BSDF = 4, 5, 6
THIN_DIELECTRIC, ROUGH_PLASTIC, PRINCIPLED = 7, 8, 9
BLEND = 10
PPLASTIC = 11       # polarized plastic (`pplastic.cpp`, Baek et al. 2018)
POLARIZER = 12      # linear polarizer filter (`polarizer.cpp`)
RETARDER = 13       # linear retarder / wave plate (`retarder.cpp`)
CIRCULAR = 14       # circular polarizer (`circular.cpp`)
PRINCIPLED_THIN = 15  # thin Disney BSDF (`principledthin.cpp`)
HAIR = 16           # Chiang et al. 2016 hair fiber (`hair.cpp`)
MEASURED = 17       # RGL measured BRDF (`measured.cpp`; render/measured.py)
MEASURED_POL = 18   # polarized measured pBRDF (`measured_polarized.cpp`)


class MaterialTable(NamedTuple):
    kind: jnp.ndarray         # (M,) int32
    albedo: jnp.ndarray       # (M, 3) diffuse reflectance / conductor tint
    twosided: jnp.ndarray     # (M,) bool
    albedo_spec: jnp.ndarray  # (M, 11) reflectance at 320..720nm step 40
    alpha: jnp.ndarray        # (M,) GGX roughness
    eta: jnp.ndarray          # (M, 3) conductor IOR (real part)
    k: jnp.ndarray            # (M, 3) conductor IOR (imaginary part)
    ior: jnp.ndarray          # (M,) dielectric relative IOR (int/ext)
    opacity: jnp.ndarray = None  # (M,) mask opacity (1 = opaque)
    tex_idx: jnp.ndarray = None  # (M,) int32 texture index (-1 = constant)
    extra: jnp.ndarray = None    # (M, 8) principled params (see kind 9)
    normal_tex_idx: jnp.ndarray = None  # (M,) int32 normal-map texture
    #                                     (-1 = none; `normalmap.cpp` /
    #                                     `bumpmap.cpp` wrappers, flattened)
    blend_a: jnp.ndarray = None  # (M,) int32 first child row (kind 10)
    blend_b: jnp.ndarray = None  # (M,) int32 second child row (kind 10)
    blend_w: jnp.ndarray = None  # (M,) weight of child b (`blendbsdf.cpp`)
    measured: object = None      # MeasuredBRDF dataset shared by the
    #                              kind-17 rows (one per scene;
    #                              render/measured.py)
    measured_pol: object = None  # MeasuredPolarized dataset shared by
    #                              the kind-18 rows (one per scene)


# legacy alias used throughout the renderer
DiffuseTable = MaterialTable


def make_material_table(kinds=None, albedos=((0.5, 0.5, 0.5),),
                        twosided=None, spectral_albedos=None, alphas=None,
                        etas=None, ks=None, iors=None,
                        opacities=None, tex_indices=None,
                        extras=None, normal_tex_indices=None,
                        blend_children=None, blend_weights=None,
                        measured=None, measured_pol=None) -> MaterialTable:
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
    opacities = (np.ones((m,), np.float32) if opacities is None
                 else np.asarray(opacities, np.float32))
    tex_indices = (np.full((m,), -1, np.int32) if tex_indices is None
                   else np.asarray(tex_indices, np.int32))
    if extras is None:
        extras = np.tile(np.array([0, 0.5, 0, 0, 0, 0, 0, 0], np.float32),
                         (m, 1))
    else:
        extras = np.asarray(extras, np.float32).reshape(m, 8)
    normal_tex_indices = (np.full((m,), -1, np.int32)
                          if normal_tex_indices is None
                          else np.asarray(normal_tex_indices, np.int32))
    blend_children = (np.zeros((m, 2), np.int32) if blend_children is None
                      else np.asarray(blend_children,
                                      np.int32).reshape(m, 2))
    blend_weights = (np.zeros((m,), np.float32) if blend_weights is None
                     else np.asarray(blend_weights, np.float32))
    return MaterialTable(jnp.asarray(kinds), jnp.asarray(a),
                         jnp.asarray(ts),
                         jnp.asarray(np.asarray(spectral_albedos,
                                                np.float32)),
                         jnp.asarray(alphas), jnp.asarray(etas),
                         jnp.asarray(ks), jnp.asarray(iors),
                         jnp.asarray(opacities), jnp.asarray(tex_indices),
                         jnp.asarray(extras),
                         jnp.asarray(normal_tex_indices),
                         jnp.asarray(blend_children[:, 0]),
                         jnp.asarray(blend_children[:, 1]),
                         jnp.asarray(blend_weights), measured,
                         measured_pol)


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
    # mask-select over the tiny static channel axis — take_along_axis is
    # a per-lane gather = scalar loop on TPU (see ops/gather.py)
    ids = jnp.arange(spec.shape[-1])
    sel_lo = (lo[..., :, None] == ids).astype(spec.dtype)
    sel_hi = (lo[..., :, None] + 1 == ids).astype(spec.dtype)
    v_lo = jnp.sum(spec[..., None, :] * sel_lo, axis=-1)
    v_hi = jnp.sum(spec[..., None, :] * sel_hi, axis=-1)
    return (1.0 - t) * v_lo + t * v_hi


def _apply_tex(albedo, refl_tex):
    """Override per-lane reflectance with a texture lookup where present.

    refl_tex: None, or (value (..., C), has (...,)) from
    `texture.eval_texture` — the flattened equivalent of the reference's
    nested `Texture` objects inside BSDF plugins."""
    if refl_tex is None:
        return albedo
    val, has = refl_tex
    return jnp.where(has[..., None], val, albedo)


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


def fresnel_diffuse_reflectance(inv_eta):
    """Diffuse (hemispherically averaged) Fresnel reflectance for a
    relative IOR < 1, Egan & Hilgeman (1973) fit — the reference's
    `fresnel_diffuse_reflectance` fast path (`fresnel.h`), evaluated at
    1/eta for the plastic model's internal scattering term."""
    return (-1.4399 * inv_eta * inv_eta + 0.7099 * inv_eta + 0.6681
            + 0.0636 / jnp.maximum(inv_eta, 1e-4))


def _rough_plastic_eval(albedo, alpha, ior, wi_l, wo_l):
    """Rough plastic (GGX dielectric coat + internally-scattered Lambertian
    base, `roughplastic.cpp`): -> (value = f*cos_o (..., C), pdf).

    Directions in the (twosided-flipped) local frame, upper hemisphere."""
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)
    cos_o = jnp.maximum(wo_l[..., 2], 0.0)
    alpha = jnp.maximum(alpha, 1e-3)
    m = wi_l + wo_l
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    d_ndf = _ggx_ndf(m, alpha)
    g = _ggx_g1(wi_l, alpha) * _ggx_g1(wo_l, alpha)
    wim = jnp.sum(wi_l * m, axis=-1)
    f_spec, _, _ = fresnel_dielectric(jnp.maximum(wim, 0.0), ior)
    spec = f_spec * d_ndf * g / (4.0 * jnp.maximum(cos_i, 1e-6))

    f_i, _, _ = fresnel_dielectric(cos_i, ior)
    f_o, _, _ = fresnel_dielectric(cos_o, ior)
    fdr = fresnel_diffuse_reflectance(1.0 / jnp.maximum(ior, 1.0 + 1e-4))
    inv_eta2 = 1.0 / (ior * ior)
    diff = (albedo / jnp.maximum(1.0 - albedo * fdr[..., None], 1e-3)
            * ((1.0 - f_i) * (1.0 - f_o) * inv_eta2
               * warp.INV_PI * cos_o)[..., None])
    value = spec[..., None] + diff
    # lobe choice in `sample`: specular with probability F(cos_i)
    pdf_spec = d_ndf * m[..., 2] / jnp.maximum(4.0 * jnp.abs(wim), 1e-6)
    pdf = f_i * pdf_spec + (1.0 - f_i) * warp.INV_PI * cos_o
    return value, pdf


def _pplastic_eval(albedo, alpha, ior, wi_l, wo_l, prob_spec):
    """Polarized plastic, scalar branch (`pplastic.cpp:312-401` non-
    polarized path): ad-hoc sum of a GGX dielectric specular lobe and a
    Lambertian base attenuated by the two refraction events
    (1 - F_i)(1 - F_o) — no internal-scattering series, unlike
    `roughplastic.cpp`. -> (value = f*cos_o (..., C), pdf).

    `prob_spec` is the lobe-selection probability
    (`pplastic.cpp:202-212`: s_mean / (d_mean + s_mean))."""
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)
    cos_o = jnp.maximum(wo_l[..., 2], 0.0)
    alpha = jnp.maximum(alpha, 1e-3)
    m = wi_l + wo_l
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    d_ndf = _ggx_ndf(m, alpha)
    g = _ggx_g1(wi_l, alpha) * _ggx_g1(wo_l, alpha)
    wim = jnp.sum(wi_l * m, axis=-1)
    f_spec, _, _ = fresnel_dielectric(jnp.maximum(wim, 0.0), ior)
    spec = f_spec * d_ndf * g / (4.0 * jnp.maximum(cos_i, 1e-6))

    f_i, _, _ = fresnel_dielectric(cos_i, ior)
    f_o, _, _ = fresnel_dielectric(cos_o, ior)
    diff = albedo * ((1.0 - f_i) * (1.0 - f_o)
                     * warp.INV_PI * cos_o)[..., None]
    value = spec[..., None] + diff
    pdf_spec = d_ndf * m[..., 2] / jnp.maximum(4.0 * jnp.abs(wim), 1e-6)
    pdf = (prob_spec * pdf_spec
           + (1.0 - prob_spec) * warp.INV_PI * cos_o)
    return value, pdf


# ---------------------------------------------------------------------------
# Hair fiber scattering (Chiang et al. 2016; reference `hair.cpp`)
# ---------------------------------------------------------------------------
#
# Fiber frame convention (`hair.cpp:140-149`): local +y is the fiber
# tangent (sin_theta = w.y); the (x, z) plane is the fiber cross-section
# with +z the outward normal at the hit. P_MAX = 3 discrete scattering
# modes (R, TT, TRT) plus a residual lobe.

_HAIR_PMAX = 3


def _bessel_i0(x):
    """10-term series for the modified Bessel function I0
    (`warp.h:748-758`)."""
    result = jnp.ones_like(x)
    x2 = x * x
    xi = x2
    denom = 4.0
    for i in range(1, 11):
        factor = i + 1.0
        result = result + xi / denom
        xi = xi * x2
        denom = denom * 4.0 * factor * factor
    return result


def _log_bessel_i0(x):
    """log(I0(x)) with the large-argument asymptote (`warp.h:761-766`)."""
    safe = jnp.minimum(x, 12.0)
    return jnp.where(
        x > 12.0,
        x + 0.5 * (-jnp.log(2.0 * jnp.pi * jnp.maximum(x, 1e-6))
                   + 1.0 / (8.0 * jnp.maximum(x, 1e-6))),
        jnp.log(jnp.maximum(_bessel_i0(safe), 1e-30)))


def _rough_fiber_pdf(v_dir, wi, kappa):
    """d'Eon et al. 2011 longitudinal scattering density M_p
    (`warp.h:772-792` `square_to_rough_fiber_pdf`, tangent = +y)."""
    sin_ti = wi[..., 1]
    sin_to = v_dir[..., 1]
    cos_ti = safe_sqrt(1.0 - sin_ti * sin_ti)
    cos_to = safe_sqrt(1.0 - sin_to * sin_to)
    c = cos_ti * cos_to * kappa
    s = sin_ti * sin_to * kappa
    inv_2pi = 0.15915494309189535
    big = jnp.exp(-s + _log_bessel_i0(c) - kappa + 0.6931
                  + jnp.log(0.5 * jnp.maximum(kappa, 1e-6))) * inv_2pi
    kp = jnp.minimum(kappa, 10.0)
    small = (jnp.exp(-s) * _bessel_i0(c) * kp
             / (2.0 * jnp.sinh(kp)) * inv_2pi)
    return jnp.where(kappa > 10.0, big, small)


def _hair_gamma(w):
    """Azimuthal offset angle of `w` w.r.t. the cross-section normal +z
    (`hair.cpp:528-536`); h = sin(gamma) is the chord offset."""
    proj = safe_sqrt(w[..., 0] ** 2 + w[..., 2] ** 2)
    g = safe_acos(jnp.clip(w[..., 2] / jnp.maximum(proj, 1e-12),
                            -1.0, 1.0))
    g = jnp.where(proj == 0.0, 0.0, g)
    return jnp.where(w[..., 0] < 0.0, g, -g)


def _hair_derived(beta_m, beta_n, tilt_deg):
    """Roughness -> lobe variances v[0..3], logistic scale s, and the
    scale-tilt double-angle tables (`hair.cpp:496-527` update())."""
    v0 = (0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20) ** 2
    v = [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]
    s = jnp.sqrt(jnp.pi / 8.0) * (0.265 * beta_n + 1.194 * beta_n ** 2
                                  + 5.372 * beta_n ** 22)
    sin0 = jnp.sin(jnp.deg2rad(tilt_deg))
    cos0 = safe_sqrt(1.0 - sin0 * sin0)
    sin1 = 2.0 * cos0 * sin0
    cos1 = cos0 * cos0 - sin0 * sin0
    sin2 = 2.0 * cos1 * sin1
    cos2 = cos1 * cos1 - sin1 * sin1
    return v, s, (sin0, sin1, sin2), (cos0, cos1, cos2)


def _hair_reframe(sin_ti, cos_ti, p, sin2k, cos2k):
    """Scale-tilt reframing of the incident angle per lobe
    (`hair.cpp:543-575`)."""
    if p == 0:
        s = sin_ti * cos2k[1] - cos_ti * sin2k[1]
        c = cos_ti * cos2k[1] + sin_ti * sin2k[1]
    elif p == 1:
        s = sin_ti * cos2k[0] + cos_ti * sin2k[0]
        c = cos_ti * cos2k[0] - sin_ti * sin2k[0]
    elif p == 2:
        s = sin_ti * cos2k[2] + cos_ti * sin2k[2]
        c = cos_ti * cos2k[2] - sin_ti * sin2k[2]
    else:
        s, c = sin_ti, cos_ti
    return s, jnp.abs(c)


def _hair_attenuation(cos_theta_i, eta, h, transmittance):
    """Per-mode attenuation a_p (`hair.cpp:577-592`): Fresnel at the
    fiber entry, absorption along the internal chords, residual series."""
    cos_gamma_i = safe_sqrt(1.0 - h * h)
    f, _, _ = fresnel_dielectric(cos_theta_i * cos_gamma_i, eta)
    f = f[..., None]
    t = transmittance
    a0 = jnp.broadcast_to(f, t.shape)
    a1 = (1.0 - f) ** 2 * t
    a2 = a1 * t * f
    a3 = a2 * f * t / jnp.maximum(1.0 - t * f, 1e-4)
    return [a0, a1, a2, a3]


def _hair_logistic(x, s):
    # s floor: non-hair material rows carry beta_n == 0 -> s == 0, and
    # exp(-x/0)/0 = NaN on the masked lanes; under reverse AD those NaN
    # primals turn zero cotangents into NaNs that contaminate the shared
    # geometry (wo/wi) of OTHER lobes (0 * NaN = NaN in the mul
    # transpose), so the guard is load-bearing even though the lanes are
    # select-masked.
    s = jnp.maximum(s, 1e-6)
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _hair_logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-jnp.clip(x / jnp.maximum(s, 1e-6),
                                          -60.0, 60.0)))


def _hair_azimuthal(delta_phi, p, s, gamma_i, gamma_t):
    """Trimmed-logistic azimuthal lobe N_p (`hair.cpp:630-645`)."""
    perfect = 2.0 * p * gamma_t - 2.0 * gamma_i + p * jnp.pi
    phi = delta_phi - perfect
    phi = jnp.mod(phi, 2.0 * jnp.pi)
    phi = jnp.where(phi < jnp.pi, phi + 2.0 * jnp.pi, phi)
    phi = jnp.where(phi > jnp.pi, phi - 2.0 * jnp.pi, phi)
    norm = (_hair_logistic_cdf(jnp.pi, s)
            - _hair_logistic_cdf(-jnp.pi, s))
    return _hair_logistic(phi, s) / jnp.maximum(norm, 1e-9)


def _hair_geometry(wi, eta):
    """Shared fiber-frame geometry for eval/pdf/sample."""
    # non-hair material rows carry eta == 0; sin_ti/eta would be an inf
    # primal whose mul-transpose turns zero cotangents into NaNs
    eta = jnp.maximum(eta, 1e-3)
    gamma_i = _hair_gamma(wi)
    h = jnp.sin(gamma_i)
    sin_ti = wi[..., 1]
    cos_ti = safe_sqrt(1.0 - sin_ti * sin_ti)
    sin_tt = sin_ti / eta
    cos_tt = safe_sqrt(1.0 - sin_tt * sin_tt)
    eta_p = safe_sqrt(eta * eta - sin_ti * sin_ti) \
        / jnp.maximum(cos_ti, 1e-6)
    sin_gt = h / jnp.maximum(eta_p, 1e-6)
    cos_gt = safe_sqrt(1.0 - sin_gt * sin_gt)
    gamma_t = safe_asin(sin_gt)
    return gamma_i, h, sin_ti, cos_ti, cos_tt, cos_gt, gamma_t


def _hair_eval_pdf(sigma_a, beta_m, beta_n, tilt_deg, eta, wi, wo):
    """(f (..., C), pdf) of the Chiang hair BCSDF in the fiber frame
    (`hair.cpp:420-477` eval_pdf). NOTE: the model folds the projected
    cosine in, so `f` already includes foreshortening."""
    v, s, sin2k, cos2k = _hair_derived(beta_m, beta_n, tilt_deg)
    (gamma_i, h, sin_ti, cos_ti, cos_tt, cos_gt,
     gamma_t) = _hair_geometry(wi, eta)
    transmittance = jnp.exp(-sigma_a * (2.0 * cos_gt / jnp.maximum(
        cos_tt, 1e-6))[..., None])
    a_p = _hair_attenuation(cos_ti, eta, h, transmittance)
    lum = [jnp.mean(a, axis=-1) for a in a_p]
    lum_sum = jnp.maximum(sum(lum), 1e-12)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 0])
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 0])
    delta_phi = phi_o - phi_i
    sin_pi, cos_pi = jnp.sin(phi_i), jnp.cos(phi_i)

    value = jnp.zeros_like(a_p[0])
    pdf = jnp.zeros_like(lum_sum)
    for p in range(_HAIR_PMAX):
        s_ip, c_ip = _hair_reframe(sin_ti, cos_ti, p, sin2k, cos2k)
        wi_p = jnp.stack([c_ip * cos_pi, s_ip, c_ip * sin_pi], axis=-1)
        m_p = _rough_fiber_pdf(wo, wi_p, 1.0 / jnp.maximum(v[p], 1e-7))
        n_p = _hair_azimuthal(delta_phi, p, s, gamma_i, gamma_t)
        value = value + (m_p * 2.0 * jnp.pi * n_p)[..., None] * a_p[p]
        pdf = pdf + m_p * 2.0 * jnp.pi * (lum[p] / lum_sum) * n_p
    m_res = _rough_fiber_pdf(wo, wi, 1.0 / jnp.maximum(v[3], 1e-7))
    value = value + m_res[..., None] * a_p[3]
    pdf = pdf + m_res * (lum[3] / lum_sum)
    value = jnp.where(jnp.isfinite(value), value, 0.0)
    pdf = jnp.where(jnp.isfinite(pdf), pdf, 0.0)
    return value, pdf


def _hair_sample(sigma_a, beta_m, beta_n, tilt_deg, eta, wi, u2, u1):
    """Sample an outgoing direction from the hair BCSDF
    (`hair.cpp:215-322`) -> wo; evaluate value/pdf with
    `_hair_eval_pdf`."""
    v, s, sin2k, cos2k = _hair_derived(beta_m, beta_n, tilt_deg)
    (gamma_i, h, sin_ti, cos_ti, cos_tt, cos_gt,
     gamma_t) = _hair_geometry(wi, eta)
    transmittance = jnp.exp(-sigma_a * (2.0 * cos_gt / jnp.maximum(
        cos_tt, 1e-6))[..., None])
    a_p = _hair_attenuation(cos_ti, eta, h, transmittance)
    lum = [jnp.mean(a, axis=-1) for a in a_p]
    lum_sum = jnp.maximum(sum(lum), 1e-12)
    ap_pdf = jnp.stack([l / lum_sum for l in lum], axis=-1)   # (..., 4)

    # lobe selection from u1, with the remainder rescaled per lobe
    # (`hair.cpp:233-243`)
    cdf = jnp.cumsum(ap_pdf, axis=-1)
    u = u1
    p_sel = (3 - (u < cdf[..., 2]).astype(jnp.int32)
             - (u < cdf[..., 1]).astype(jnp.int32)
             - (u < cdf[..., 0]).astype(jnp.int32))
    cdf_prev = jnp.concatenate([jnp.zeros_like(cdf[..., :1]),
                                cdf[..., :-1]], axis=-1)
    sel = jax.nn.one_hot(p_sel, 4, dtype=cdf.dtype)
    u_rem = ((u - jnp.sum(sel * cdf_prev, axis=-1))
             / jnp.maximum(jnp.sum(sel * ap_pdf, axis=-1), 1e-9))
    u_rem = jnp.clip(u_rem, 0.0, 1.0 - 1e-6)

    # longitudinal sample around the reframed incident angle
    s_ip = jnp.zeros_like(sin_ti)
    c_ip = jnp.zeros_like(cos_ti)
    v_sel = jnp.zeros_like(sin_ti)
    for p in range(4):
        sp, cp = _hair_reframe(sin_ti, cos_ti, p, sin2k, cos2k)
        is_p = p_sel == p
        s_ip = jnp.where(is_p, sp, s_ip)
        c_ip = jnp.where(is_p, cp, c_ip)
        v_sel = jnp.where(is_p, v[p], v_sel)
    v_sel = jnp.maximum(v_sel, 1e-7)
    u20 = jnp.clip(u2[..., 0], 1e-6, 1.0 - 1e-6)
    cos_theta = 1.0 + v_sel * jnp.log(
        u20 + (1.0 - u20) * jnp.exp(-2.0 / v_sel))
    sin_theta = safe_sqrt(1.0 - cos_theta ** 2)
    cos_phi_l = jnp.cos(2.0 * jnp.pi * u2[..., 1])
    sin_to = -cos_theta * s_ip + sin_theta * cos_phi_l * c_ip
    cos_to = safe_sqrt(1.0 - sin_to ** 2)

    # azimuthal sample: trimmed logistic around the perfect deflection
    # for p < 3, uniform for the residual lobe (`hair.cpp:268-280`)
    perfect = (2.0 * p_sel.astype(sin_ti.dtype) * gamma_t - 2.0 * gamma_i
               + p_sel.astype(sin_ti.dtype) * jnp.pi)
    k_log = (_hair_logistic_cdf(jnp.pi, s)
             - _hair_logistic_cdf(-jnp.pi, s))
    # inner log argument can reach <= 0 at u_rem ~ 1 (and on non-hair
    # masked lanes with s == 0): floor it — log(<=0) primals turn zero
    # cotangents into NaNs downstream under reverse AD
    x_log = -s * jnp.log(jnp.maximum(1.0 / jnp.maximum(
        u_rem * k_log + _hair_logistic_cdf(-jnp.pi, s), 1e-9) - 1.0,
        1e-12))
    x_log = jnp.clip(x_log, -jnp.pi, jnp.pi)
    delta_phi = jnp.where(p_sel < 3, perfect + x_log,
                          2.0 * jnp.pi * u_rem)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 0])
    phi_o = phi_i + delta_phi
    wo = jnp.stack([cos_to * jnp.cos(phi_o), sin_to,
                    cos_to * jnp.sin(phi_o)], axis=-1)
    return wo / jnp.maximum(jnp.linalg.norm(wo, axis=-1, keepdims=True),
                            1e-12)


def _schlick5(c):
    m = jnp.clip(1.0 - c, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def _luminance_rgb(c):
    """Rec.709 luminance (mitsuba `luminance()` for RGB spectra)."""
    return (0.212671 * c[..., 0] + 0.715160 * c[..., 1]
            + 0.072169 * c[..., 2])


def _principledthin_eval(base, rough, ior, extra, wi_g, wo_g):
    """Thin Disney BSDF (`principledthin.cpp:418-585` eval + :576 pdf):
    four lobes on a two-sided thin sheet — GGX specular reflection with a
    `thin_fresnel` tint blend, GGX specular transmission with IOR-scaled
    roughness (Burley 2015 Fig. 15), diffuse+retro(+fake-subsurface+sheen)
    reflection, and Lambertian diffuse transmission.

    Directions in the GEOMETRIC local frame (the model is symmetric: both
    get flipped to the wi-upper side, `principledthin.cpp:443-446`).
    `extra` columns: [spec_trans, diff_trans(0..1), sheen, sheen_tint,
    flatness, spec_tint, -, -]. Returns (value = f*|cos_o| (..., C), pdf).
    """
    spec_trans = extra[..., 0]
    diff_trans = extra[..., 1]
    sheen = extra[..., 2]
    sheen_tint = extra[..., 3]
    flatness = extra[..., 4]
    spec_tint = extra[..., 5]

    sign = jnp.sign(jnp.where(wi_g[..., 2] == 0.0, 1.0, wi_g[..., 2]))
    wi = wi_g * sign[..., None]
    wo_t = wo_g * sign[..., None]
    ci = jnp.abs(wi[..., 2])
    co = wo_t[..., 2]
    reflect = co > 0.0
    refract = co < 0.0

    wo_r = wo_t * jnp.array([1.0, 1.0, 0.0]) + jnp.stack(
        [jnp.zeros_like(co)] * 2 + [jnp.abs(co)], axis=-1)
    wh = wi + wo_r
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True),
                          1e-12)
    wi_wh = jnp.sum(wi * wh, axis=-1)
    cos_d = jnp.sum(wh * wo_t, axis=-1)

    alpha = jnp.maximum(rough * rough, 1e-4)
    alpha_s = jnp.maximum(((0.65 * ior - 0.35) * rough) ** 2, 1e-4)
    f_diel, _, _ = fresnel_dielectric(wi_wh, ior)

    # macro-micro compatibility (`principledhelpers.h:199-211`; m = wh is
    # in wi's upper hemisphere by construction)
    compat_r = (wi_wh > 0.0) & (jnp.sum(wo_t * wh, axis=-1) > 0.0)
    compat_t = (wi_wh > 0.0) & (jnp.sum(wo_t * -wh, axis=-1) > 0.0)

    nc = base.shape[-1]
    value = jnp.zeros(ci.shape + (nc,))

    # --- specular reflection (thin_fresnel tint blend) ---
    lum = _luminance_rgb(base) if nc == 3 else jnp.mean(base, axis=-1)
    c_tint = jnp.where((lum > 0.0)[..., None],
                       base / jnp.maximum(lum, 1e-8)[..., None], 1.0)
    r0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    f0_tint = c_tint * r0[..., None]
    f_schlick = f0_tint + (1.0 - f0_tint) * _schlick5(jnp.abs(wi_wh)
                                                      )[..., None]
    f_thin = ((1.0 - spec_tint)[..., None] * f_diel[..., None]
              + spec_tint[..., None] * f_schlick)
    d_r = _ggx_ndf(wh, alpha)
    g_r = (_ggx_g1(wi, alpha)
           * _ggx_g1(wo_r, alpha))
    spec_r = (spec_trans[..., None] * f_thin
              * (d_r * g_r / (4.0 * jnp.maximum(ci, 1e-6)))[..., None])
    value = value + jnp.where((reflect & compat_r & (spec_trans > 0.0)
                               )[..., None], spec_r, 0.0)

    # --- specular transmission (scaled roughness) ---
    d_t = _ggx_ndf(wh, alpha_s)
    g_t = (_ggx_g1(wi, alpha_s) * _ggx_g1(wo_r, alpha_s))
    spec_t = ((spec_trans * (1.0 - f_diel)
               * d_t * g_t / (4.0 * jnp.maximum(ci, 1e-6)))[..., None]
              * base)
    value = value + jnp.where((refract & compat_t & (spec_trans > 0.0)
                               )[..., None], spec_t, 0.0)

    # --- diffuse + retro + fake subsurface + sheen (reflection side) ---
    f_i = _schlick5(ci)
    f_o = _schlick5(jnp.abs(co))
    f_diff = (1.0 - 0.5 * f_i) * (1.0 - 0.5 * f_o)
    rr = 2.0 * rough * cos_d * cos_d
    f_retro = rr * (f_o + f_i + f_o * f_i * (rr - 1.0))
    fss90 = 0.5 * rr
    fss = ((1.0 + (fss90 - 1.0) * f_o) * (1.0 + (fss90 - 1.0) * f_i))
    f_ss = 1.25 * (fss * (1.0 / jnp.maximum(jnp.abs(co) + ci, 1e-6)
                          - 0.5) + 0.5)
    diff_term = ((1.0 - flatness) * (f_diff + f_retro)
                 + flatness * f_ss)
    diff = ((1.0 - spec_trans) * (1.0 - diff_trans)
            * warp.INV_PI * jnp.maximum(co, 0.0) * diff_term)[..., None] \
        * base
    f_d = _schlick5(jnp.abs(cos_d))
    c_sheen = (1.0 - sheen_tint)[..., None] + sheen_tint[..., None] * c_tint
    sheen_v = (sheen * (1.0 - spec_trans) * (1.0 - diff_trans) * f_d
               * jnp.abs(co))[..., None] * c_sheen
    value = value + jnp.where(reflect[..., None], diff + sheen_v, 0.0)

    # --- Lambertian diffuse transmission ---
    dtrans = ((1.0 - spec_trans) * diff_trans * warp.INV_PI
              * jnp.abs(co))[..., None] * base
    value = value + jnp.where(refract[..., None], dtrans, 0.0)

    # --- pdf over the same four lobes (`principledthin.cpp:576-650`) ---
    p_sr = 0.5 * spec_trans
    p_st = 0.5 * spec_trans
    p_cr = (1.0 - spec_trans) * (1.0 - diff_trans)
    p_ct = (1.0 - spec_trans) * diff_trans
    total = jnp.maximum(p_sr + p_st + p_cr + p_ct, 1e-8)
    pdf_sr = jnp.where(reflect & compat_r,
                       d_r * wh[..., 2]
                       / jnp.maximum(4.0 * jnp.abs(wi_wh), 1e-6), 0.0)
    pdf_st = jnp.where(refract & compat_t,
                       d_t * wh[..., 2]
                       / jnp.maximum(4.0 * jnp.abs(wi_wh), 1e-6), 0.0)
    pdf_cr = jnp.where(reflect, warp.INV_PI * jnp.maximum(co, 0.0), 0.0)
    pdf_ct = jnp.where(refract, warp.INV_PI * jnp.abs(co), 0.0)
    pdf = (p_sr * pdf_sr + p_st * pdf_st + p_cr * pdf_cr
           + p_ct * pdf_ct) / total
    ok = jnp.abs(wi_g[..., 2]) > 0.0
    return (jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0))


def _gtr1_ndf(cos_m, alpha):
    """GTR1 NDF (the Disney clearcoat distribution)."""
    a2 = alpha * alpha
    denom = jnp.pi * jnp.log(jnp.maximum(a2, 1e-6)) \
        * (1.0 + (a2 - 1.0) * cos_m * cos_m)
    return jnp.where(cos_m > 0.0, (a2 - 1.0) / denom, 0.0)


def _gtr1_sample(alpha, u):
    a2 = jnp.maximum(alpha * alpha, 1e-6)
    cos2 = (1.0 - jnp.power(a2, 1.0 - u[..., 0])) / (1.0 - a2)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = safe_sqrt(1.0 - cos2)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                     axis=-1)


def _principled_eval(base, rough, extra, wi_l, wo_l):
    """Disney principled reflection lobes (`principled.cpp`; Burley 2012):
    -> (value = f*cos_o (..., C), pdf). Upper-hemisphere local frame."""
    metallic = extra[..., 0]
    specular = extra[..., 1]
    sheen = extra[..., 2]
    sheen_tint = extra[..., 3]
    clearcoat = extra[..., 4]
    cc_gloss = extra[..., 5]
    spec_tint = extra[..., 6]

    cos_i = jnp.maximum(wi_l[..., 2], 1e-6)
    cos_o = jnp.maximum(wo_l[..., 2], 0.0)
    m = wi_l + wo_l
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    cos_d = jnp.sum(wi_l * m, axis=-1)            # half-vector angle

    # luminance-normalised tint colour
    lum = jnp.mean(base, axis=-1, keepdims=True)
    c_tint = jnp.where(lum > 0.0, base / jnp.maximum(lum, 1e-6), 1.0)

    # --- retro-reflective diffuse (Burley) ---
    fd90 = 0.5 + 2.0 * rough * cos_d * cos_d
    fd_i = 1.0 + (fd90 - 1.0) * _schlick5(cos_i)
    fd_o = 1.0 + (fd90 - 1.0) * _schlick5(cos_o)
    diff = (base * warp.INV_PI * (fd_i * fd_o * (1.0 - metallic)
                                  * cos_o)[..., None])

    # --- sheen (grazing retro lobe) ---
    c_sheen = 1.0 + (c_tint - 1.0) * sheen_tint[..., None]
    sheen_val = (c_sheen * (sheen * (1.0 - metallic) * _schlick5(cos_d)
                            * cos_o)[..., None])

    # --- main GGX specular with Schlick Fresnel ---
    alpha = jnp.maximum(rough * rough, 1e-4)
    d_ndf = _ggx_ndf(m, alpha)
    g = _ggx_g1(wi_l, alpha) * _ggx_g1(wo_l, alpha)
    f0_diel = (0.08 * specular)[..., None] \
        * (1.0 + (c_tint - 1.0) * spec_tint[..., None])
    c_spec0 = f0_diel + (base - f0_diel) * metallic[..., None]
    f_spec = c_spec0 + (1.0 - c_spec0) * _schlick5(cos_d)[..., None]
    spec = f_spec * (d_ndf * g / (4.0 * cos_i))[..., None]

    # --- clearcoat: GTR1 D, fixed 0.04 F0, GGX G at alpha 0.25 ---
    alpha_cc = 0.1 + (0.001 - 0.1) * cc_gloss
    d_cc = _gtr1_ndf(m[..., 2], alpha_cc)
    g_cc = _ggx_g1(wi_l, 0.25) * _ggx_g1(wo_l, 0.25)
    f_cc = 0.04 + 0.96 * _schlick5(cos_d)
    # Burley's 0.25*clearcoat*Gr*Fr*Dr is the f value; x cos_o here
    cc = (0.25 * clearcoat * d_cc * g_cc * f_cc * cos_o)[..., None]

    value = diff + sheen_val + spec + cc

    # --- sampling pdf: mixture matching `sample`'s lobe choice ---
    pdf_diff = warp.INV_PI * cos_o
    pdf_spec = d_ndf * m[..., 2] / jnp.maximum(4.0 * jnp.abs(cos_d), 1e-6)
    pdf_cc = d_cc * m[..., 2] / jnp.maximum(4.0 * jnp.abs(cos_d), 1e-6)
    w_diff = 1.0 - metallic
    w_spec = jnp.ones_like(metallic)
    w_cc = 0.25 * clearcoat
    w_sum = w_diff + w_spec + w_cc
    pdf = (w_diff * pdf_diff + w_spec * pdf_spec + w_cc * pdf_cc) / w_sum
    ok = (wi_l[..., 2] > 0.0) & (wo_l[..., 2] > 0.0)
    return jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0)


def _tint(table, mat_idx, wavelengths, n_chan_ref):
    """Specular tint: RGB uses the albedo column; spectral uses the
    interpolated spectrum."""
    return _reflectance(table, mat_idx, wavelengths)


def _n_chan(wavelengths):
    return 3 if wavelengths is None else wavelengths.shape[-1]


def table_kinds(table: MaterialTable):
    """Static lobe descriptor for a CONCRETE material table: (sorted kind
    tuple, any_mask flag). Pass the result to eval_pdf/sample as `kinds` so
    absent lobes are pruned at trace time instead of computed-and-masked —
    worth ~8% whole-render throughput for diffuse-only scenes. Returns None
    (= compute everything) when the table is a tracer."""
    import numpy as np
    try:
        ks = np.asarray(table.kind)
        op = np.asarray(table.opacity)
    except Exception:
        return None
    return (tuple(sorted(int(k) for k in np.unique(ks))),
            bool((op < 1.0).any()))


def table_normal_maps(table: MaterialTable) -> bool:
    """Static check: does any material carry a normal map? True (compute
    and mask) when the table is a tracer."""
    import numpy as np
    if table.normal_tex_idx is None:
        return False
    try:
        return bool((np.asarray(table.normal_tex_idx) >= 0).any())
    except Exception:
        return True


def _has_blend(table: MaterialTable, present) -> bool:
    """Static check: does the table contain a blend (kind 10) row?"""
    import numpy as np
    if present is not None:
        return BLEND in present
    if table.blend_a is None:
        return False
    try:
        return bool((np.asarray(table.kind) == BLEND).any())
    except Exception:
        return True    # tracer table: compute-and-mask


def _blend_children(table, mat_idx, is_blend):
    idx_a = jnp.where(is_blend, take_ints(table.blend_a, mat_idx), mat_idx)
    idx_b = jnp.where(is_blend, take_ints(table.blend_b, mat_idx), mat_idx)
    return idx_a, idx_b


def eval_pdf(table: MaterialTable, mat_idx, wi, wo, wavelengths=None,
             kinds=None, refl_tex=None):
    """(f * cos(theta_o), pdf) over the non-delta lobes.

    Blend rows (`blendbsdf.cpp`) resolve here: both children are
    evaluated through the core and lerped by `blend_w`. Tables without a
    blend row pay nothing (single core call).
    """
    present = kinds[0] if kinds is not None else None
    if not _has_blend(table, present):
        return _eval_pdf_core(table, mat_idx, wi, wo, wavelengths, kinds,
                              refl_tex)
    kind = take_ints(table.kind, mat_idx)
    is_blend = kind == BLEND
    w = jnp.where(is_blend,
                  jnp.clip(take_scalars(table.blend_w, mat_idx), 0.0, 1.0),
                  0.0)
    idx_a, idx_b = _blend_children(table, mat_idx, is_blend)
    va, pa = _eval_pdf_core(table, idx_a, wi, wo, wavelengths, kinds,
                            refl_tex)
    vb, pb = _eval_pdf_core(table, idx_b, wi, wo, wavelengths, kinds,
                            refl_tex)
    return ((1.0 - w)[..., None] * va + w[..., None] * vb,
            (1.0 - w) * pa + w * pb)


def sample(table: MaterialTable, mat_idx, wi, sample2, sample1,
           wavelengths=None, kinds=None, refl_tex=None):
    """Sample an outgoing direction; see `_sample_core`.

    Blend rows use the reference's one-sample strategy
    (`blendbsdf.cpp::sample`): child b is chosen with probability
    `blend_w`, `sample1` is re-folded for the child's own discrete
    choices, and for non-delta lobes the returned (weight, pdf) are the
    full blended value/pdf at the sampled direction (one-sample MIS).
    Delta-sampled lanes keep the child weight with pdf scaled by the
    selection probability (a delta direction cannot be evaluated by the
    sibling).
    """
    present = kinds[0] if kinds is not None else None
    if not _has_blend(table, present):
        return _sample_core(table, mat_idx, wi, sample2, sample1,
                            wavelengths, kinds, refl_tex)
    kind = take_ints(table.kind, mat_idx)
    is_blend = kind == BLEND
    w = jnp.where(is_blend,
                  jnp.clip(take_scalars(table.blend_w, mat_idx), 0.0, 1.0),
                  0.0)
    pick_b = is_blend & (sample1 < w)
    s1 = jnp.where(pick_b, sample1 / jnp.maximum(w, 1e-6),
                   (sample1 - w) / jnp.maximum(1.0 - w, 1e-6))
    s1 = jnp.clip(jnp.where(is_blend, s1, sample1), 0.0, 1.0 - 1e-7)
    idx_a, idx_b = _blend_children(table, mat_idx, is_blend)
    idx_sel = jnp.where(pick_b, idx_b, idx_a)
    idx_oth = jnp.where(pick_b, idx_a, idx_b)
    wo, wt, pdf, is_delta = _sample_core(table, idx_sel, wi, sample2, s1,
                                         wavelengths, kinds, refl_tex)
    v_oth, p_oth = _eval_pdf_core(table, idx_oth, wi, wo, wavelengths,
                                  kinds, refl_tex)
    w_sel = jnp.where(pick_b, w, 1.0 - w)
    w_oth = 1.0 - w_sel
    num = w_sel[..., None] * wt * pdf[..., None] + w_oth[..., None] * v_oth
    den = w_sel * pdf + w_oth * p_oth
    wt_mix = jnp.where((den > 1e-12)[..., None],
                       num / jnp.maximum(den, 1e-12)[..., None], 0.0)
    wt = jnp.where(is_delta[..., None], wt, wt_mix)
    pdf = jnp.where(is_delta, w_sel * pdf, den)
    return wo, wt, pdf, is_delta


def _eval_pdf_core(table: MaterialTable, mat_idx, wi, wo, wavelengths=None,
                   kinds=None, refl_tex=None):
    """(f * cos(theta_o), pdf) over the non-delta lobes.

    Delta materials contribute 0 here (their throughput only arrives via
    `sample`), matching how the reference's NEE skips Delta BSDFs.
    `kinds`: optional static descriptor from `table_kinds` — lobes not in
    it are skipped entirely. `refl_tex`: optional per-lane textured
    reflectance override (value, has) from `texture.eval_texture`.
    """
    present, any_mask = kinds if kinds is not None else (None, True)

    def has(k):
        return present is None or k in present

    kind = take_ints(table.kind, mat_idx)
    sign = _flip_sign(wi, take_scalars(table.twosided.astype(jnp.float32),
                                       mat_idx) > 0.5)
    wi_l = wi * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], axis=-1)
    wo_l = wo * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], axis=-1)
    cos_i = wi_l[..., 2]
    cos_o = wo_l[..., 2]
    refl_active = (cos_i > 0.0) & (cos_o > 0.0)

    nc = _n_chan(wavelengths)
    value = jnp.zeros(cos_i.shape + (nc,))
    pdf = jnp.zeros(cos_i.shape)

    # --- diffuse lobe ---
    if (has(DIFFUSE) or has(PLASTIC) or has(ROUGH_PLASTIC)
            or has(PRINCIPLED) or has(PPLASTIC)):
        albedo = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                            refl_tex)
    if has(DIFFUSE):
        diff_val = albedo * (warp.INV_PI
                             * jnp.maximum(cos_o, 0.0))[..., None]
        diff_pdf = warp.INV_PI * jnp.maximum(cos_o, 0.0)
        is_diff = kind == DIFFUSE
        value = jnp.where(is_diff[..., None], diff_val, value)
        pdf = jnp.where(is_diff, diff_pdf, pdf)

    # --- GGX rough conductor lobe ---
    if has(ROUGH_CONDUCTOR):
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
        rough_val = (spec_tint * f_c * (d_ndf * g / denom)[..., None])
        rough_pdf = (d_ndf * m[..., 2]
                     / jnp.maximum(4.0 * jnp.abs(mi_dot), 1e-6))
        is_rough = kind == ROUGH_CONDUCTOR
        value = jnp.where(is_rough[..., None], rough_val, value)
        pdf = jnp.where(is_rough, rough_pdf, pdf)

    if (has(PLASTIC) or has(ROUGH_DIELECTRIC) or has(ROUGH_PLASTIC)
            or has(PPLASTIC)):
        ior = take_scalars(table.ior, mat_idx)

    # --- polarized plastic (scalar radiometry; the polarized transport
    #     layer re-polarizes via `render/polarized.py`) ---
    if has(PPLASTIC):
        alpha_pp = take_scalars(table.alpha, mat_idx)
        d_mean = jnp.mean(take_rows(table.albedo, mat_idx), axis=-1)
        prob_spec_pp = 1.0 / (1.0 + d_mean)
        pp_val, pp_pdf = _pplastic_eval(albedo, alpha_pp, ior, wi_l, wo_l,
                                        prob_spec_pp)
        is_pp = kind == PPLASTIC
        value = jnp.where(is_pp[..., None], pp_val, value)
        pdf = jnp.where(is_pp, pp_pdf, pdf)

    # --- rough plastic: GGX coat + Lambertian base (both non-delta) ---
    if has(ROUGH_PLASTIC):
        alpha = take_scalars(table.alpha, mat_idx)
        rp_val, rp_pdf = _rough_plastic_eval(albedo, alpha, ior, wi_l, wo_l)
        is_rp = kind == ROUGH_PLASTIC
        value = jnp.where(is_rp[..., None], rp_val, value)
        pdf = jnp.where(is_rp, rp_pdf, pdf)

    # --- principled (Disney) ---
    if has(PRINCIPLED):
        rough_p = take_scalars(table.alpha, mat_idx)
        extra_p = take_rows(table.extra, mat_idx)
        pr_val, pr_pdf = _principled_eval(albedo, rough_p, extra_p,
                                          wi_l, wo_l)
        is_pr = kind == PRINCIPLED
        value = jnp.where(is_pr[..., None], pr_val, value)
        pdf = jnp.where(is_pr, pr_pdf, pdf)

    # --- smooth plastic: Fresnel-weighted Lambertian base
    #     (specular coat is a delta lobe -> only via `sample`) ---
    if has(PLASTIC):
        f_i_pl, _, _ = fresnel_dielectric(jnp.maximum(cos_i, 0.0), ior)
        f_o_pl, _, _ = fresnel_dielectric(jnp.maximum(cos_o, 0.0), ior)
        fdr = fresnel_diffuse_reflectance(1.0 / jnp.maximum(ior,
                                                            1.0 + 1e-4))
        inv_eta2 = 1.0 / (ior * ior)
        # nonlinear=True internal-scattering compensation (`plastic.cpp`)
        pl_val = (albedo / jnp.maximum(1.0 - albedo * fdr[..., None], 1e-3)
                  * ((1.0 - f_i_pl) * (1.0 - f_o_pl) * inv_eta2
                     * warp.INV_PI * jnp.maximum(cos_o, 0.0))[..., None])
        # lobe choice matches `sample`: specular with probability F(cos_i)
        pl_pdf = (1.0 - f_i_pl) * warp.INV_PI * jnp.maximum(cos_o, 0.0)
        is_plastic = kind == PLASTIC
        value = jnp.where(is_plastic[..., None], pl_val, value)
        pdf = jnp.where(is_plastic, pl_pdf, pdf)

    value = jnp.where(refl_active[..., None], value, 0.0)
    pdf = jnp.where(refl_active, pdf, 0.0)

    # --- rough dielectric (GGX reflect + refract, Walter 2007 / the
    #     reference's `roughdielectric.cpp`) — geometric frame, and it
    #     bypasses the reflection-hemisphere gate above ---
    if has(ROUGH_DIELECTRIC):
        alpha = take_scalars(table.alpha, mat_idx)
        gi, go = wi[..., 2], wo[..., 2]
        reflecting = gi * go > 0.0
        eta_rel_rd = jnp.where(gi >= 0.0, ior, 1.0 / ior)
        # half vector: reflection m ~ wi+wo; refraction m ~ -(wi + eta*wo)
        m_refl = wi + wo
        m_refr = -(wi + wo * eta_rel_rd[..., None])
        m_rd = jnp.where(reflecting[..., None], m_refl, m_refr)
        m_rd = m_rd / jnp.maximum(
            jnp.linalg.norm(m_rd, axis=-1, keepdims=True), 1e-12)
        m_rd = m_rd * jnp.sign(m_rd[..., 2:3])      # upper hemisphere
        alpha_rd = jnp.maximum(alpha, 1e-3)
        d_rd = _ggx_ndf(m_rd, alpha_rd)
        # Smith G with shadowing evaluated in the upper half space
        g_rd = (_ggx_g1(wi * jnp.sign(gi)[..., None], alpha_rd)
                * _ggx_g1(wo * jnp.sign(go)[..., None], alpha_rd))
        wim = jnp.sum(wi * m_rd, axis=-1)
        wom = jnp.sum(wo * m_rd, axis=-1)
        f_rd, _, _ = fresnel_dielectric(wim, ior)
        # reflection: f*cos_o = F D G / (4 |cos_i|)
        val_refl = (f_rd * d_rd * g_rd
                    / (4.0 * jnp.maximum(jnp.abs(gi), 1e-6)))
        jac_refl = 1.0 / jnp.maximum(4.0 * jnp.abs(wom), 1e-6)
        # refraction (Walter eq. 21), x cos_o, x 1/eta^2 compression
        sqrt_dn = wim + eta_rel_rd * wom
        jac_refr = (eta_rel_rd * eta_rel_rd * jnp.abs(wom)
                    / jnp.maximum(sqrt_dn * sqrt_dn, 1e-8))
        val_refr = ((1.0 - f_rd) * d_rd * g_rd * jnp.abs(wim) * jac_refr
                    / jnp.maximum(jnp.abs(gi), 1e-6)
                    / (eta_rel_rd * eta_rel_rd))
        rd_ok = jnp.where(reflecting, wim * gi > 0.0,
                          (wim * gi > 0.0) & (wom * go > 0.0))
        rd_val_s = jnp.where(reflecting, val_refl, val_refr)
        rd_val_s = jnp.where(rd_ok, rd_val_s, 0.0)
        rd_pdf = (d_rd * jnp.abs(m_rd[..., 2])
                  * jnp.where(reflecting, f_rd * jac_refl,
                              (1.0 - f_rd) * jac_refr))
        rd_pdf = jnp.where(rd_ok, rd_pdf, 0.0)
        rd_val = jnp.broadcast_to(rd_val_s[..., None],
                                  rd_val_s.shape + (nc,))
        is_rd = kind == ROUGH_DIELECTRIC
        value = jnp.where(is_rd[..., None], rd_val, value)
        pdf = jnp.where(is_rd, rd_pdf, pdf)

    # --- thin Disney BSDF (geometric frame, two-sided by construction) ---
    if has(PRINCIPLED_THIN):
        if not (has(DIFFUSE) or has(PLASTIC) or has(ROUGH_PLASTIC)
                or has(PRINCIPLED) or has(PPLASTIC)):
            albedo = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                                refl_tex)
        pt_val, pt_pdf = _principledthin_eval(
            albedo, take_scalars(table.alpha, mat_idx),
            take_scalars(table.ior, mat_idx),
            take_rows(table.extra, mat_idx), wi, wo)
        is_pt = kind == PRINCIPLED_THIN
        value = jnp.where(is_pt[..., None], pt_val, value)
        pdf = jnp.where(is_pt, pt_pdf, pdf)

    # --- hair fiber (fiber frame: +y tangent; full-sphere scattering) ---
    if has(HAIR):
        sig_h = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                           refl_tex)
        extra_h = take_rows(table.extra, mat_idx)
        is_h = kind == HAIR
        # input sanitisation (double-where at lobe granularity): on
        # non-hair lanes the fiber math runs on a fixed safe direction,
        # so no inf/NaN primal can leak NaN cotangents into the shared
        # wi/wo geometry under reverse AD
        safe_d = jnp.asarray([0.6, 0.48, 0.64], wi.dtype)
        wi_h = jnp.where(is_h[..., None], wi, safe_d)
        wo_hq = jnp.where(is_h[..., None], wo, safe_d)
        h_val, h_pdf = _hair_eval_pdf(
            sig_h, take_scalars(table.alpha, mat_idx), extra_h[..., 0],
            extra_h[..., 1], take_scalars(table.ior, mat_idx), wi_h,
            wo_hq)
        value = jnp.where(is_h[..., None], h_val, value)
        pdf = jnp.where(is_h, h_pdf, pdf)

    # --- RGL measured BRDF (geometric upper hemisphere, reflection) ---
    if has(MEASURED) and table.measured is not None:
        from .measured import measured_eval_pdf
        md_val, md_pdf = measured_eval_pdf(table.measured, wi_l, wo_l,
                                           wavelengths)
        is_md = kind == MEASURED
        value = jnp.where(is_md[..., None], md_val, value)
        pdf = jnp.where(is_md, md_pdf, pdf)

    # --- polarized measured pBRDF (scalar M00 radiometry; the Mueller
    #     transport lives in render/polarized.py) ---
    if has(MEASURED_POL) and table.measured_pol is not None:
        from .measured import mp_eval_pdf
        mpv, mpp = mp_eval_pdf(table.measured_pol, wi_l, wo_l, wavelengths)
        is_mp = kind == MEASURED_POL
        value = jnp.where(is_mp[..., None], mpv, value)
        pdf = jnp.where(is_mp, mpp, pdf)

    # mask wrapper: surviving (non-passthrough) interaction probability
    if any_mask:
        opac = take_scalars(table.opacity, mat_idx)
        value = value * opac[..., None]
        pdf = pdf * opac
    return value, pdf


def _sample_core(table: MaterialTable, mat_idx, wi, sample2, sample1,
                 wavelengths=None, kinds=None, refl_tex=None):
    """Sample an outgoing direction.

    Returns (wo, weight, pdf, is_delta). `sample1` drives discrete lobe
    choices (dielectric reflect/refract, mask pass-through). `kinds`:
    optional static descriptor from `table_kinds` — absent lobes are
    skipped at trace time. `refl_tex`: optional per-lane textured
    reflectance override (value, has).
    """
    present, any_mask = kinds if kinds is not None else (None, True)

    def has(k):
        return present is None or k in present

    kind = take_ints(table.kind, mat_idx)
    sign = _flip_sign(wi, take_scalars(table.twosided.astype(jnp.float32),
                                       mat_idx) > 0.5)
    sign3 = jnp.stack([jnp.ones_like(sign)] * 2 + [sign], axis=-1)
    wi_l = wi * sign3
    cos_i = wi_l[..., 2]
    active = cos_i > 0.0
    nc = _n_chan(wavelengths)
    one_c = jnp.ones(cos_i.shape + (nc,))

    if any_mask:
        # mask wrapper (`mask.cpp`): pass through with prob 1-opacity; the
        # surviving lanes re-use the renormalised lobe-choice sample
        opac = take_scalars(table.opacity, mat_idx)
        passthrough = sample1 >= opac
        sample1 = jnp.clip(sample1 / jnp.maximum(opac, 1e-6), 0.0,
                           1.0 - 1e-7)

    wo = jnp.zeros_like(wi)
    weight = jnp.zeros(cos_i.shape + (nc,))
    pdf = jnp.zeros(cos_i.shape)
    is_delta = jnp.zeros(cos_i.shape, bool)
    geom_frame = jnp.zeros(cos_i.shape, bool)   # lobes w/o twosided flip

    # --- diffuse: cosine hemisphere ---
    if (has(DIFFUSE) or has(PLASTIC) or has(ROUGH_PLASTIC)
            or has(PRINCIPLED) or has(PPLASTIC)):
        wo_diff = warp.square_to_cosine_hemisphere(sample2)
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo_diff)
        albedo = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                            refl_tex)
    if has(DIFFUSE):
        is_diff = kind == DIFFUSE
        wo = jnp.where(is_diff[..., None], wo_diff, wo)
        weight = jnp.where(is_diff[..., None], albedo, weight)
        pdf = jnp.where(is_diff, pdf_diff, pdf)

    if has(ROUGH_CONDUCTOR) or has(CONDUCTOR):
        spec_tint = _tint(table, mat_idx, wavelengths, None)

    # --- rough conductor: sample the NDF, reflect ---
    if has(ROUGH_CONDUCTOR):
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
        # weight = f*cos/pdf = tint * F * G * mi_dot / (cos_m * cos_i)
        w_rough = (spec_tint * f_c
                   * (g * jnp.abs(mi_dot)
                      / jnp.maximum(m[..., 2] * jnp.maximum(cos_i, 1e-6),
                                    1e-6))[..., None])
        rough_ok = (wo_rough[..., 2] > 0.0) & (mi_dot > 0.0)
        is_rough = kind == ROUGH_CONDUCTOR
        wo = jnp.where(is_rough[..., None], wo_rough, wo)
        weight = jnp.where(is_rough[..., None],
                           jnp.where(rough_ok[..., None], w_rough, 0.0),
                           weight)
        pdf = jnp.where(is_rough, pdf_rough, pdf)

    # --- smooth conductor: mirror reflection (delta) ---
    if has(CONDUCTOR) or has(PLASTIC):
        wo_mirr = jnp.stack([-wi_l[..., 0], -wi_l[..., 1], wi_l[..., 2]],
                            axis=-1)
    if has(CONDUCTOR):
        if wavelengths is None:
            f_m = _fresnel_conductor(cos_i, take_rows(table.eta, mat_idx),
                                     take_rows(table.k, mat_idx))
        else:
            f_avg = jnp.mean(_fresnel_conductor(
                cos_i, take_rows(table.eta, mat_idx),
                take_rows(table.k, mat_idx)), axis=-1)
            f_m = jnp.broadcast_to(f_avg[..., None],
                                   cos_i.shape + (wavelengths.shape[-1],))
        is_mirr = kind == CONDUCTOR
        wo = jnp.where(is_mirr[..., None], wo_mirr, wo)
        weight = jnp.where(is_mirr[..., None], spec_tint * f_m, weight)
        pdf = jnp.where(is_mirr, 1.0, pdf)
        is_delta = is_delta | is_mirr

    if (has(DIELECTRIC) or has(PLASTIC) or has(ROUGH_DIELECTRIC)
            or has(THIN_DIELECTRIC) or has(ROUGH_PLASTIC)
            or has(PPLASTIC)):
        ior = take_scalars(table.ior, mat_idx)

    # --- polarized plastic: pick GGX coat vs Lambertian base by the
    #     reflectance-balanced weight (`pplastic.cpp:216-262`) ---
    if has(PPLASTIC):
        alpha_pp = take_scalars(table.alpha, mat_idx)
        d_mean = jnp.mean(take_rows(table.albedo, mat_idx), axis=-1)
        prob_spec_pp = 1.0 / (1.0 + d_mean)
        pp_spec = sample1 < prob_spec_pp
        m_pp = _ggx_sample(jnp.maximum(alpha_pp, 1e-3), sample2)
        wo_pp = jnp.where(pp_spec[..., None], _reflect(wi_l, m_pp),
                          wo_diff)
        pp_val, pp_pdf = _pplastic_eval(albedo, alpha_pp, ior, wi_l, wo_pp,
                                        prob_spec_pp)
        pp_ok = (wo_pp[..., 2] > 0.0) & (pp_pdf > 1e-12)
        w_pp = jnp.where(pp_ok[..., None],
                         pp_val / jnp.maximum(pp_pdf, 1e-12)[..., None],
                         0.0)
        is_pp = kind == PPLASTIC
        wo = jnp.where(is_pp[..., None], wo_pp, wo)
        weight = jnp.where(is_pp[..., None], w_pp, weight)
        pdf = jnp.where(is_pp, pp_pdf, pdf)

    # --- principled: three-way lobe choice (diffuse / GGX / clearcoat)
    #     with weight = f*cos/pdf via the shared eval ---
    if has(PRINCIPLED):
        rough_p = take_scalars(table.alpha, mat_idx)
        extra_p = take_rows(table.extra, mat_idx)
        metallic_p = extra_p[..., 0]
        cc_p = extra_p[..., 4]
        w_diff = 1.0 - metallic_p
        w_spec = jnp.ones_like(metallic_p)
        w_cc = 0.25 * cc_p
        w_sum = w_diff + w_spec + w_cc
        t1 = w_diff / w_sum
        t2 = (w_diff + w_spec) / w_sum
        alpha_p = jnp.maximum(rough_p * rough_p, 1e-4)
        m_sp = _ggx_sample(alpha_p, sample2)
        alpha_cc = 0.1 + (0.001 - 0.1) * extra_p[..., 5]
        m_cc = _gtr1_sample(alpha_cc, sample2)
        wo_pr = jnp.where((sample1 < t1)[..., None], wo_diff,
                          jnp.where((sample1 < t2)[..., None],
                                    _reflect(wi_l, m_sp),
                                    _reflect(wi_l, m_cc)))
        pr_val, pr_pdf = _principled_eval(albedo, rough_p, extra_p,
                                          wi_l, wo_pr)
        pr_ok = (wo_pr[..., 2] > 0.0) & (pr_pdf > 1e-12)
        w_pr = jnp.where(pr_ok[..., None],
                         pr_val / jnp.maximum(pr_pdf, 1e-12)[..., None],
                         0.0)
        is_pr = kind == PRINCIPLED
        wo = jnp.where(is_pr[..., None], wo_pr, wo)
        weight = jnp.where(is_pr[..., None], w_pr, weight)
        pdf = jnp.where(is_pr, pr_pdf, pdf)

    # --- rough plastic: pick coat vs base by F(cos_i), weight = f*cos/pdf
    #     via the shared eval (`roughplastic.cpp` sampling scheme) ---
    if has(ROUGH_PLASTIC):
        alpha_rp = take_scalars(table.alpha, mat_idx)
        f_i_rp, _, _ = fresnel_dielectric(cos_i, ior)
        rp_spec = sample1 < f_i_rp
        # re-fold sample1 so the GGX angles stay decorrelated from the
        # lobe choice (same renormalisation trick as the mask wrapper)
        m_rp = _ggx_sample(jnp.maximum(alpha_rp, 1e-3), sample2)
        wo_rp = jnp.where(rp_spec[..., None], _reflect(wi_l, m_rp), wo_diff)
        rp_val, rp_pdf = _rough_plastic_eval(albedo, alpha_rp, ior,
                                             wi_l, wo_rp)
        rp_ok = (wo_rp[..., 2] > 0.0) & (rp_pdf > 1e-12)
        w_rp = jnp.where(rp_ok[..., None],
                         rp_val / jnp.maximum(rp_pdf, 1e-12)[..., None],
                         0.0)
        is_rp = kind == ROUGH_PLASTIC
        wo = jnp.where(is_rp[..., None], wo_rp, wo)
        weight = jnp.where(is_rp[..., None], w_rp, weight)
        pdf = jnp.where(is_rp, rp_pdf, pdf)

    # --- smooth dielectric: reflect or refract by Fresnel (delta) ---
    if has(DIELECTRIC):
        # dielectric is inherently two-sided: use the unflipped wi
        f_d, cos_t, eta_rel = fresnel_dielectric(wi[..., 2], ior)
        do_reflect = sample1 < f_d
        wo_refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]],
                            axis=-1)
        scale_xy = -1.0 / eta_rel
        wo_refr = jnp.stack([wi[..., 0] * scale_xy, wi[..., 1] * scale_xy,
                             cos_t], axis=-1)
        wo_diel = jnp.where(do_reflect[..., None], wo_refl, wo_refr)
        # radiance transport carries the 1/eta_rel^2 factor on refraction
        # (reference dielectric.cpp solid-angle compression)
        w_diel_s = jnp.where(do_reflect, 1.0, 1.0 / (eta_rel * eta_rel))
        is_diel = kind == DIELECTRIC
        wo = jnp.where(is_diel[..., None], wo_diel, wo)
        weight = jnp.where(is_diel[..., None], w_diel_s[..., None] * one_c,
                           weight)
        pdf = jnp.where(is_diel, jnp.where(do_reflect, f_d, 1.0 - f_d),
                        pdf)
        is_delta = is_delta | is_diel
        geom_frame = geom_frame | is_diel

    # --- smooth plastic: delta coat (prob F) over Lambertian base ---
    if has(PLASTIC):
        f_i_pl, _, _ = fresnel_dielectric(jnp.maximum(cos_i, 0.0), ior)
        pl_spec = sample1 < f_i_pl
        f_o_pl, _, _ = fresnel_dielectric(
            jnp.maximum(wo_diff[..., 2], 0.0), ior)
        fdr = fresnel_diffuse_reflectance(
            1.0 / jnp.maximum(ior, 1.0 + 1e-4))
        inv_eta2 = 1.0 / (ior * ior)
        w_pl_diff = (albedo
                     / jnp.maximum(1.0 - albedo * fdr[..., None], 1e-3)
                     * ((1.0 - f_o_pl) * inv_eta2)[..., None])
        is_pl = kind == PLASTIC
        wo = jnp.where(is_pl[..., None],
                       jnp.where(pl_spec[..., None], wo_mirr, wo_diff), wo)
        weight = jnp.where(is_pl[..., None],
                           jnp.where(pl_spec[..., None], one_c, w_pl_diff),
                           weight)
        pdf = jnp.where(is_pl,
                        jnp.where(pl_spec, f_i_pl,
                                  (1.0 - f_i_pl) * pdf_diff), pdf)
        is_delta = is_delta | (is_pl & pl_spec)

    # --- RGL measured BRDF: luminance + VNDF warp sampling ---
    if has(MEASURED) and table.measured is not None:
        from .measured import measured_sample
        wo_md, w_md, pdf_md = measured_sample(table.measured, wi_l,
                                              sample2, wavelengths)
        is_md = kind == MEASURED
        wo = jnp.where(is_md[..., None], wo_md, wo)
        weight = jnp.where(is_md[..., None], w_md, weight)
        pdf = jnp.where(is_md, pdf_md, pdf)

    # --- polarized measured pBRDF: cosine/GGX mixture sampling ---
    if has(MEASURED_POL) and table.measured_pol is not None:
        from .measured import mp_eval_pdf, mp_sample
        wo_mp = mp_sample(table.measured_pol, wi_l, sample2, sample1)
        mpv, mpp = mp_eval_pdf(table.measured_pol, wi_l, wo_mp,
                               wavelengths)
        w_mp = jnp.where((mpp > 1e-12)[..., None],
                         mpv / jnp.maximum(mpp, 1e-12)[..., None], 0.0)
        is_mp = kind == MEASURED_POL
        wo = jnp.where(is_mp[..., None], wo_mp, wo)
        weight = jnp.where(is_mp[..., None], w_mp, weight)
        pdf = jnp.where(is_mp, mpp, pdf)

    # flip the local-frame lobes back to the geometric frame
    wo = jnp.where(geom_frame[..., None], wo, wo * sign3)
    ok = geom_frame | active
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)

    # --- rough dielectric: GGX half-vector, Fresnel reflect/refract
    #     (geometric frame, two-sided by construction) ---
    if has(ROUGH_DIELECTRIC):
        alpha_rd = jnp.maximum(take_scalars(table.alpha, mat_idx), 1e-3)
        m_rd = _ggx_sample(alpha_rd, sample2)      # upper hemisphere
        wim = jnp.sum(wi * m_rd, axis=-1)
        f_rd, cos_t_rd, eta_rel_rd = fresnel_dielectric(wim, ior)
        rd_reflect = sample1 < f_rd
        wo_rd_refl = _reflect(wi, m_rd)
        inv_eta_rd = 1.0 / eta_rel_rd
        wo_rd_refr = (m_rd * (wim * inv_eta_rd + cos_t_rd)[..., None]
                      - wi * inv_eta_rd[..., None])
        wo_rd = jnp.where(rd_reflect[..., None], wo_rd_refl, wo_rd_refr)
        g_rd = (_ggx_g1(wi * jnp.sign(wi[..., 2:3]), alpha_rd)
                * _ggx_g1(wo_rd * jnp.sign(wo_rd[..., 2:3]), alpha_rd))
        # D-sampling weight (Walter eq. 41): G |wi.m| / (|cos_i| m_z)
        w_rd_s = (g_rd * jnp.abs(wim)
                  / jnp.maximum(jnp.abs(wi[..., 2])
                                * jnp.maximum(m_rd[..., 2], 1e-6), 1e-6))
        w_rd_s = jnp.where(rd_reflect, w_rd_s,
                           w_rd_s / (eta_rel_rd * eta_rel_rd))
        # hemisphere consistency: reflected stays, refracted crosses
        rd_ok = jnp.where(rd_reflect, wo_rd[..., 2] * wi[..., 2] > 0.0,
                          wo_rd[..., 2] * wi[..., 2] < 0.0)
        w_rd = jnp.where((rd_ok & (jnp.abs(wim) > 1e-6))[..., None],
                         w_rd_s[..., None] * one_c, 0.0)
        pdf_d_rd = _ggx_ndf(m_rd, alpha_rd) * m_rd[..., 2]
        wom_rd = jnp.sum(wo_rd * m_rd, axis=-1)
        jac_rd = jnp.where(
            rd_reflect, 1.0 / jnp.maximum(4.0 * jnp.abs(wom_rd), 1e-6),
            eta_rel_rd ** 2 * jnp.abs(wom_rd)
            / jnp.maximum((wim + eta_rel_rd * wom_rd) ** 2, 1e-8))
        pdf_rd = (pdf_d_rd * jnp.where(rd_reflect, f_rd, 1.0 - f_rd)
                  * jac_rd)
        is_rd = kind == ROUGH_DIELECTRIC
        wo = jnp.where(is_rd[..., None], wo_rd, wo)
        weight = jnp.where(is_rd[..., None], w_rd, weight)
        pdf = jnp.where(is_rd, pdf_rd, pdf)

    # --- thin dielectric: delta reflect / straight-through transmit with
    #     the multi-internal-bounce reflectance R* = 2F/(1+F)
    #     (`thindielectric.cpp`) — two-sided by construction ---
    if has(THIN_DIELECTRIC):
        f_td, _, _ = fresnel_dielectric(jnp.abs(wi[..., 2]), ior)
        r_star = jnp.where(f_td < 1.0, 2.0 * f_td / (1.0 + f_td), 1.0)
        td_reflect = sample1 < r_star
        wo_td_refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]],
                               axis=-1)
        wo_td = jnp.where(td_reflect[..., None], wo_td_refl, -wi)
        is_td = kind == THIN_DIELECTRIC
        wo = jnp.where(is_td[..., None], wo_td, wo)
        weight = jnp.where(is_td[..., None], one_c, weight)
        pdf = jnp.where(is_td, jnp.where(td_reflect, r_star, 1.0 - r_star),
                        pdf)
        is_delta = is_delta | is_td

    # --- thin Disney BSDF: four-way lobe choice in the wi-upper frame,
    #     weight = f*|cos|/pdf via the shared eval (geometric frame) ---
    if has(PRINCIPLED_THIN):
        if not (has(DIFFUSE) or has(PLASTIC) or has(ROUGH_PLASTIC)
                or has(PRINCIPLED) or has(PPLASTIC)):
            albedo = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                                refl_tex)
            wo_diff = warp.square_to_cosine_hemisphere(sample2)
        extra_pt = take_rows(table.extra, mat_idx)
        rough_pt = take_scalars(table.alpha, mat_idx)
        ior_pt = take_scalars(table.ior, mat_idx)
        st_, dt_ = extra_pt[..., 0], extra_pt[..., 1]
        p_sr = 0.5 * st_
        p_st = 0.5 * st_
        p_cr = (1.0 - st_) * (1.0 - dt_)
        tot = jnp.maximum(p_sr + p_st + p_cr + (1.0 - st_) * dt_, 1e-8)
        t1 = p_sr / tot
        t2 = (p_sr + p_st) / tot
        t3 = (p_sr + p_st + p_cr) / tot
        sgn = jnp.sign(jnp.where(wi[..., 2] == 0.0, 1.0, wi[..., 2]))
        wi_up = wi * sgn[..., None]
        alpha_pt = jnp.maximum(rough_pt * rough_pt, 1e-4)
        alpha_pts = jnp.maximum(((0.65 * ior_pt - 0.35) * rough_pt) ** 2,
                                1e-4)
        m_sr = _ggx_sample(alpha_pt, sample2)
        m_st = _ggx_sample(alpha_pts, sample2)
        wo_sr = _reflect(wi_up, m_sr)
        wo_st = _reflect(wi_up, m_st) * jnp.array([1.0, 1.0, -1.0])
        wo_pt = jnp.where((sample1 < t1)[..., None], wo_sr,
                          jnp.where((sample1 < t2)[..., None], wo_st,
                                    jnp.where((sample1 < t3)[..., None],
                                              wo_diff,
                                              -wo_diff)))
        wo_pt = wo_pt * sgn[..., None]       # back to the geometric frame
        pt_val, pt_pdf = _principledthin_eval(albedo, rough_pt, ior_pt,
                                              extra_pt, wi, wo_pt)
        # reject micro/macro-incompatible specular samples like the
        # reference (`principledthin.cpp:345-352,385-390`): a reflected
        # direction that ends up below the sheet (or a transmitted one
        # above it) gets weight 0 rather than aliasing into the other
        # lobe's distribution
        chose_sr = sample1 < t1
        chose_st = (sample1 >= t1) & (sample1 < t2)
        ok_sr = ((wo_sr[..., 2] > 0.0)
                 & (jnp.sum(wi_up * m_sr, axis=-1) > 0.0)
                 & (jnp.sum(wo_sr * m_sr, axis=-1) > 0.0))
        ok_st = ((wo_st[..., 2] < 0.0)
                 & (jnp.sum(wi_up * m_st, axis=-1) > 0.0)
                 & (jnp.sum(wo_st * -m_st, axis=-1) > 0.0))
        pt_valid = jnp.where(chose_sr, ok_sr,
                             jnp.where(chose_st, ok_st, True))
        pt_pdf = jnp.where(pt_valid, pt_pdf, 0.0)
        pt_ok = pt_pdf > 1e-12
        w_pt = jnp.where(pt_ok[..., None],
                         pt_val / jnp.maximum(pt_pdf, 1e-12)[..., None],
                         0.0)
        is_pt = kind == PRINCIPLED_THIN
        wo = jnp.where(is_pt[..., None], wo_pt, wo)
        weight = jnp.where(is_pt[..., None], w_pt, weight)
        pdf = jnp.where(is_pt, pt_pdf, pdf)

    # --- hair fiber: lobe cascade + longitudinal/azimuthal inverse CDFs,
    #     weight = f/pdf via the shared eval (fiber frame, full sphere) ---
    if has(HAIR):
        sig_h = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                           refl_tex)
        extra_h = take_rows(table.extra, mat_idx)
        beta_m_h = take_scalars(table.alpha, mat_idx)
        eta_h = take_scalars(table.ior, mat_idx)
        is_h = kind == HAIR
        # input sanitisation — see the eval-side comment
        safe_d = jnp.asarray([0.6, 0.48, 0.64], wi.dtype)
        wi_h = jnp.where(is_h[..., None], wi, safe_d)
        wo_h = _hair_sample(sig_h, beta_m_h, extra_h[..., 0],
                            extra_h[..., 1], eta_h, wi_h, sample2,
                            sample1)
        h_val, h_pdf = _hair_eval_pdf(sig_h, beta_m_h, extra_h[..., 0],
                                      extra_h[..., 1], eta_h, wi_h, wo_h)
        w_h = jnp.where((h_pdf > 1e-12)[..., None],
                        h_val / jnp.maximum(h_pdf, 1e-12)[..., None], 0.0)
        wo = jnp.where(is_h[..., None], wo_h, wo)
        weight = jnp.where(is_h[..., None], w_h, weight)
        pdf = jnp.where(is_h, h_pdf, pdf)

    # --- null: invisible pass-through (delta transmission) ---
    if has(NULL_BSDF):
        is_null = kind == NULL_BSDF
        wo = jnp.where(is_null[..., None], -wi, wo)
        weight = jnp.where(is_null[..., None], one_c, weight)
        pdf = jnp.where(is_null, 1.0, pdf)
        is_delta = is_delta | is_null

    # --- polarization filters: delta straight-through transmission.
    #     Scalar radiometry per the reference's unpolarized fallbacks:
    #     polarizer/circular transmit half the (unpolarized) energy
    #     (`polarizer.cpp:148`, `circular.cpp:111`); a retarder only
    #     attenuates by its transmittance (`retarder.cpp:137`). The
    #     Mueller-matrix weights live in `render/polarized.py`. ---
    if has(POLARIZER) or has(RETARDER) or has(CIRCULAR):
        trans = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                           refl_tex)
        for kk, fac in ((POLARIZER, 0.5), (RETARDER, 1.0), (CIRCULAR, 0.5)):
            if has(kk):
                is_k = kind == kk
                wo = jnp.where(is_k[..., None], -wi, wo)
                weight = jnp.where(is_k[..., None], fac * trans, weight)
                pdf = jnp.where(is_k, 1.0, pdf)
                is_delta = is_delta | is_k

    # mask pass-through overrides everything
    if any_mask:
        wo = jnp.where(passthrough[..., None], -wi, wo)
        weight = jnp.where(passthrough[..., None], one_c, weight)
        pdf = jnp.where(passthrough, 1.0 - opac, pdf * opac)
        is_delta = is_delta | passthrough
    return wo, weight, pdf, is_delta


# --- back-compat wrappers (diffuse-only call sites) ---


def diffuse_eval_pdf(table, mat_idx, wi, wo, wavelengths=None):
    return eval_pdf(table, mat_idx, wi, wo, wavelengths)


def diffuse_sample(table, mat_idx, wi, sample2, wavelengths=None):
    wo, weight, pdf, _ = sample(table, mat_idx, wi, sample2,
                                jnp.zeros(wi.shape[:-1]), wavelengths)
    return wo, weight, pdf
