"""Polarized light transport: Stokes-vector path tracing.

TPU-first re-design of the reference's polarized rendering modes
(`*_polarized` variants) and the `stokes` integrator
(`src/integrators/stokes.cpp`):

* Radiance is a 4-component Stokes vector per channel; path throughput is
  a Mueller matrix per channel: state shapes (N, C, 4) / (N, C, 4, 4).
  The bounce loop multiplies the per-vertex Mueller BSDF weight on the
  *right* of the running throughput (`path.cpp:275` `spec *= bsdf_val`
  with Mueller semantics), so the measured Stokes vector is
  `T @ s_emitted` with camera-side matrices applied last, exactly like
  the reference.
* Every emitter is an unpolarized (depolarizing) source; polarization is
  introduced by the polarization-aware BSDF kinds: conductor /
  roughconductor / dielectric (polarized Fresnel, `conductor.cpp:272-302`,
  `dielectric.cpp:294-340`), pplastic (`pplastic.cpp:280-369`) and the
  filter elements polarizer / retarder / circular. All other kinds act as
  ideal depolarizers of their scalar value — the same fallback the
  reference's non-polarization-aware plugins use (`depolarizer<Spectrum>`).
* Scalar radiometry (pdfs, sampling decisions, S0 magnitudes) is shared
  with the scalar BSDF core (`bsdf.py`): the Mueller weight of a
  polarization-aware lobe is reconstructed as
  `M_fresnel_rotated * (scalar_weight / M_fresnel[0,0])` — the scalar
  weight already contains the unpolarized Fresnel average, which is
  exactly the (0,0) entry of the Fresnel Mueller matrix, so S0 transport
  is *bitwise identical* to the scalar renderer while S1..S3 carry the
  exact polarized Fresnel ratios.
* Mueller matrices are produced in the local shading frame w.r.t. the
  implicit Stokes bases of (-wo, wi) (radiance transport, the
  `conductor.cpp:279-300` convention) and rotated to world bases with
  `to_world_mueller` before entering the throughput product
  (`path.cpp:242,255`).

Scope: RGB mode, surface scenes (env + area + point emitters, analytic
shapes + meshes); participating media render unpolarized in this path —
use the scalar integrator for them.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import mueller as mu
from ..ops.gather import take_ints, take_rows, take_scalars
from ..ops.math import Frame, dot
from . import bsdf as bsdf_mod
from . import emitters as em
from . import film as film_mod
from . import sensors as sensors_mod
from .bsdf import (CIRCULAR, CONDUCTOR, DIELECTRIC, MEASURED_POL,
                   POLARIZER, PPLASTIC, RETARDER, ROUGH_CONDUCTOR,
                   fresnel_dielectric)
from .integrator import _SamplerCtx, _mis_weight, _SHADOW_EPS
from .mesh import mesh_intersect
from .scene import Scene, scene_occluded
from .shapes import ray_intersect

_POL_KINDS = (CONDUCTOR, ROUGH_CONDUCTOR, DIELECTRIC, PPLASTIC,
              POLARIZER, RETARDER, CIRCULAR)


def _eye4(n, c):
    return jnp.broadcast_to(jnp.eye(4), (n, c, 4, 4))


def _first_col(t):
    """First Mueller column = response to unpolarized unit light."""
    return t[..., :, 0]


def _specular_mueller_local(wi, wo, m_normal, eta_re, eta_im=None,
                            transmission=False, eta_scalar=None):
    """Fresnel Mueller matrix for a specular event about micro-normal
    `m_normal`, rotated to the implicit Stokes bases of (-wo, wi) in the
    local frame — the shared rotation block of `conductor.cpp:281-300`,
    `roughconductor.cpp:282-301` and `dielectric.cpp:294-333`.

    Radiance transport: light arrives along -wo_hat = -wo and leaves
    along +wi_hat = +wi. `eta_re/eta_im` are per-channel (..., C);
    `cos_theta` for the Fresnel is dot(wo, m_normal).
    Returns (..., C, 4, 4)."""
    cos_theta = jnp.sum(wo * m_normal, axis=-1)
    if transmission:
        f = mu.specular_transmission(cos_theta[..., None], eta_re)
    else:
        f = mu.specular_reflection(cos_theta[..., None], eta_re,
                                   0.0 if eta_im is None else eta_im)

    s_axis_in = jnp.cross(m_normal, -wo)
    s_axis_out = jnp.cross(m_normal, wi)
    # collinear singularity: arbitrary perpendicular axis
    def _fix(a):
        n2 = jnp.sum(a * a, axis=-1, keepdims=True)
        coll = n2 < 1e-18
        a = jnp.where(coll, jnp.array([1.0, 0.0, 0.0]),
                      a / jnp.sqrt(jnp.maximum(n2, 1e-30)))
        return a
    s_axis_in = _fix(s_axis_in)
    s_axis_out = _fix(s_axis_out)

    return mu.rotate_mueller_basis(
        f,
        -wo, s_axis_in, mu.stokes_basis(-wo),
        wi, s_axis_out, mu.stokes_basis(wi))


def _filter_mueller_local(table, mat_idx, kind, wi, trans):
    """Mueller matrices of the null-transmission polarization filters
    (polarizer / retarder / circular), local frame, radiance transport.

    For straight-through transmission light propagates along
    forward = wi (it arrives along -wo = wi and leaves along wi) —
    `polarizer.cpp:126-146`, `retarder.cpp:104-139`, `circular.cpp:90-111`.
    `trans` is the per-channel transmittance (N, C)."""
    n = wi.shape[0]
    c = trans.shape[-1]
    extra = take_rows(table.extra, mat_idx)
    theta = jnp.deg2rad(extra[..., 0])
    forward = wi

    out = jnp.zeros((n, c, 4, 4))
    # --- linear polarizer: tilted effective transmission axis
    #     (Korger et al. 2013, `polarizer.cpp:131-141`) ---
    if True:
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        a_axis = jnp.stack([sin_t, cos_t, jnp.zeros_like(sin_t)], axis=-1)
        eff_a = a_axis - jnp.sum(a_axis * forward,
                                 axis=-1, keepdims=True) * forward
        eff_a = eff_a / jnp.maximum(
            jnp.linalg.norm(eff_a, axis=-1, keepdims=True), 1e-12)
        eff_t = jnp.cross(forward, eff_a)
        m_pol = jnp.broadcast_to(mu.linear_polarizer(1.0), (n, c, 4, 4))
        m_pol = mu.rotate_mueller_basis_collinear(
            m_pol, forward, eff_t, mu.stokes_basis(forward))
        out = jnp.where((kind == POLARIZER)[..., None, None, None],
                        m_pol, out)
    # --- linear retarder: cosine-falloff phase, element rotation flips
    #     from the backside (`retarder.cpp:106-120`) ---
    if True:
        delta = jnp.deg2rad(extra[..., 1])
        cos_i = wi[..., 2]
        delta = delta * jnp.abs(cos_i)
        m_ret = mu.linear_retarder(delta[..., None]
                                   * jnp.ones((1, c)))
        m_ret = mu.rotated_element(
            (jnp.sign(cos_i) * theta)[..., None], m_ret)
        m_ret = mu.rotate_mueller_basis_collinear(
            m_ret, forward, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]),
                                             forward.shape),
            mu.stokes_basis(forward))
        out = jnp.where((kind == RETARDER)[..., None, None, None],
                        m_ret, out)
    # --- circular polarizer (`circular.cpp:91-105`) ---
    if True:
        left = take_rows(table.extra, mat_idx)[..., 2] > 0.5
        m_circ = jnp.where(left[..., None, None, None],
                           mu.left_circular_polarizer(),
                           mu.right_circular_polarizer())
        m_circ = jnp.broadcast_to(m_circ, (n, c, 4, 4))
        m_circ = mu.rotate_mueller_basis_collinear(
            m_circ, forward, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]),
                                              forward.shape),
            mu.stokes_basis(forward))
        out = jnp.where((kind == CIRCULAR)[..., None, None, None],
                        m_circ, out)
    return out * mu.absorber(trans)


def _polarize_scaled(m_fresnel, scalar):
    """`M * (scalar / M[0,0])`: graft the exact polarized Fresnel ratios
    onto the scalar radiometry (see module docstring)."""
    m00 = m_fresnel[..., 0:1, 0:1]
    scale = jnp.where(m00 > 1e-12, scalar[..., None, None]
                      / jnp.maximum(m00, 1e-12), 0.0)
    return m_fresnel * scale


def _conductor_eta_k(table, mat_idx, wavelengths):
    """Per-channel conductor IOR: RGB directly; spectral uses the
    channel-mean like the scalar core (`bsdf.py` spectral branch)."""
    eta = take_rows(table.eta, mat_idx)
    k = take_rows(table.k, mat_idx)
    if wavelengths is None:
        return eta, k
    nc = wavelengths.shape[-1]
    return (jnp.broadcast_to(jnp.mean(eta, -1, keepdims=True),
                             eta.shape[:-1] + (nc,)),
            jnp.broadcast_to(jnp.mean(k, -1, keepdims=True),
                             k.shape[:-1] + (nc,)))


def _pol_weight_eval(table, mat_idx, wi, wo, scalar_val, kinds,
                     refl_tex=None, wavelengths=None):
    """Mueller matrix for an *evaluated* direction pair (NEE): non-delta
    polarization-aware lobes get polarized Fresnel; everything else is a
    depolarizer of the scalar value. Local frame, (N, C, 4, 4)."""
    present = kinds[0] if kinds is not None else None

    def has(k):
        return present is None or k in present

    kind = take_ints(table.kind, mat_idx)
    out = mu.depolarizer(scalar_val)

    if has(ROUGH_CONDUCTOR):
        m = wi + wo
        m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True),
                            1e-12)
        eta_c, k_c = _conductor_eta_k(table, mat_idx, wavelengths)
        f = _specular_mueller_local(wi, wo, m, eta_c, k_c)
        out = jnp.where((kind == ROUGH_CONDUCTOR)[..., None, None, None],
                        _polarize_scaled(f, scalar_val), out)

    if has(PPLASTIC):
        out_pp = _pplastic_mueller_eval(table, mat_idx, wi, wo, refl_tex,
                                        wavelengths)
        out = jnp.where((kind == PPLASTIC)[..., None, None, None],
                        out_pp, out)

    if has(MEASURED_POL) and table.measured_pol is not None:
        from .measured import mp_eval_mueller
        out_mp = mp_eval_mueller(table.measured_pol, wi, wo, wavelengths)
        out = jnp.where((kind == MEASURED_POL)[..., None, None, None],
                        out_mp, out)
    return out


def _pplastic_mueller_eval(table, mat_idx, wi, wo, refl_tex=None,
                           wavelengths=None):
    """Polarized plastic eval (`pplastic.cpp:280-369`): GGX specular
    reflection Mueller (half-vector frame) + depolarized base sandwiched
    between the two refraction Mueller matrices (normal frame)."""
    from .bsdf import (_apply_tex, _ggx_g1, _ggx_ndf, _reflectance)
    cos_i = jnp.maximum(wi[..., 2], 0.0)
    cos_o = jnp.maximum(wo[..., 2], 0.0)
    alpha = jnp.maximum(take_scalars(table.alpha, mat_idx), 1e-3)
    ior = take_scalars(table.ior, mat_idx)
    albedo = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                        refl_tex)
    c = albedo.shape[-1]

    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    d_ndf = _ggx_ndf(h, alpha)
    g = _ggx_g1(wi, alpha) * _ggx_g1(wo, alpha)
    spec_scalar = d_ndf * g / (4.0 * jnp.maximum(cos_i, 1e-6))
    f_spec = _specular_mueller_local(wi, wo, h, ior[..., None]
                                     * jnp.ones((1, c)))
    m_spec = f_spec * spec_scalar[..., None, None, None]

    # diffuse: To (refract in, evaluated at the light side wo), depolarizer
    # base, Ti (refract out, evaluated at the internal refracted wi)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi.shape)
    eta_c = ior[..., None] * jnp.ones((1, c))
    t_o = mu.specular_transmission(jnp.abs(wo[..., 2])[..., None], eta_c)
    base = mu.depolarizer(albedo)
    _, cos_t_i, _ = fresnel_dielectric(cos_i, ior)
    # internal direction of the camera-side beam (`pplastic.cpp:339-342`)
    inv_eta = 1.0 / ior
    wi_hat_p_z = -jnp.abs(cos_t_i)     # refracted cosine, below surface
    t_i = mu.specular_transmission(jnp.abs(wi_hat_p_z)[..., None],
                                   (inv_eta)[..., None] * jnp.ones((1, c)))
    diff = mu.matmul(t_i, mu.matmul(base, t_o))

    s_axis_in = jnp.cross(n, -wo)
    s_axis_out = jnp.cross(n, wi)

    def _fix(a):
        n2 = jnp.sum(a * a, axis=-1, keepdims=True)
        return jnp.where(n2 < 1e-18, jnp.array([1.0, 0.0, 0.0]),
                         a / jnp.sqrt(jnp.maximum(n2, 1e-30)))
    diff = mu.rotate_mueller_basis(
        diff, -wo, _fix(s_axis_in), mu.stokes_basis(-wo),
        wi, _fix(s_axis_out), mu.stokes_basis(wi))
    inv_pi = 0.3183098861837907
    m_diff = diff * (inv_pi * cos_o)[..., None, None, None]

    ok = (cos_i > 0.0) & (cos_o > 0.0)
    return jnp.where(ok[..., None, None, None], m_spec + m_diff, 0.0)


def _pol_weight_sample(table, mat_idx, wi, wo, scalar_w, pdf, kinds,
                       refl_tex=None, wavelengths=None):
    """Mueller weight for a *sampled* direction: delta polarization-aware
    lobes construct their Fresnel Mueller directly; non-delta pol-aware
    lobes reuse the eval path; the rest depolarize the scalar weight.
    Local frame, (N, C, 4, 4)."""
    present = kinds[0] if kinds is not None else None

    def has(k):
        return present is None or k in present

    kind = take_ints(table.kind, mat_idx)
    nc = scalar_w.shape[-1]
    out = mu.depolarizer(scalar_w)

    if has(ROUGH_CONDUCTOR) or has(PPLASTIC):
        val = scalar_w * pdf[..., None]   # back out f*cos from weight
        m_ev = _pol_weight_eval(table, mat_idx, wi, wo, val, kinds,
                                refl_tex, wavelengths)
        scale = jnp.where(pdf > 1e-12, 1.0 / jnp.maximum(pdf, 1e-12), 0.0)
        m_ev = m_ev * scale[..., None, None, None]
        sel = (kind == ROUGH_CONDUCTOR) | (kind == PPLASTIC)
        out = jnp.where(sel[..., None, None, None], m_ev, out)

    if has(CONDUCTOR):
        nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi.shape)
        nrm = nrm * jnp.sign(wi[..., 2:3])    # twosided support
        eta_c, k_c = _conductor_eta_k(table, mat_idx, wavelengths)
        f = _specular_mueller_local(wi, wo, nrm, eta_c, k_c)
        out = jnp.where((kind == CONDUCTOR)[..., None, None, None],
                        _polarize_scaled(f, scalar_w), out)

    if has(DIELECTRIC):
        ior = take_scalars(table.ior, mat_idx)
        eta_c = ior[..., None] * jnp.ones((1, nc))
        nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi.shape)
        refl = wi[..., 2] * wo[..., 2] > 0.0
        f_r = _specular_mueller_local(wi, wo, nrm, eta_c)
        f_t = _specular_mueller_local(wi, wo, nrm, eta_c, transmission=True)
        f = jnp.where(refl[..., None, None, None], f_r, f_t)
        # scalar weight already carries 1/pdf (=1) and the eta^2 radiance
        # compression; M00 of the selected matrix equals the selection
        # probability, so the ratio rule applies unchanged
        out = jnp.where((kind == DIELECTRIC)[..., None, None, None],
                        _polarize_scaled(f, scalar_w), out)

    if has(POLARIZER) or has(RETARDER) or has(CIRCULAR):
        from .bsdf import _apply_tex, _reflectance
        trans = _apply_tex(_reflectance(table, mat_idx, wavelengths),
                           refl_tex)
        is_filter = ((kind == POLARIZER) | (kind == RETARDER)
                     | (kind == CIRCULAR))
        m_f = _filter_mueller_local(table, mat_idx, kind, wi, trans)
        out = jnp.where(is_filter[..., None, None, None], m_f, out)

    if has(MEASURED_POL) and table.measured_pol is not None:
        from .measured import mp_eval_mueller
        m_mp = mp_eval_mueller(table.measured_pol, wi, wo, wavelengths)
        scale = jnp.where(pdf > 1e-12, 1.0 / jnp.maximum(pdf, 1e-12), 0.0)
        out = jnp.where((kind == MEASURED_POL)[..., None, None, None],
                        m_mp * scale[..., None, None, None], out)
    return out


class PolPathState(NamedTuple):
    o: jnp.ndarray            # (N, 3)
    d: jnp.ndarray            # (N, 3)
    throughput: jnp.ndarray   # (N, C, 4, 4) Mueller
    result: jnp.ndarray       # (N, C, 4) Stokes
    active: jnp.ndarray       # (N,)
    prev_bsdf_pdf: jnp.ndarray
    prev_bsdf_delta: jnp.ndarray


def _scene_hit(scene, o, d):
    """Closest surface hit over analytic shapes + meshes (the polarized
    path's reduced intersection sweep)."""
    t, p, ng, uv, shape_idx, hit = ray_intersect(scene.shapes, o, d)
    mat_idx = take_ints(scene.shapes.bsdf_idx, jnp.maximum(shape_idx, 0))
    if scene.mesh is not None:
        tm, nm, matm, _b1, _b2, _tri, hitm = mesh_intersect(scene.mesh, o, d)
        use_mesh = hitm & (tm < t)
        t = jnp.where(use_mesh, tm, t)
        p = jnp.where(use_mesh[..., None], o + tm[..., None] * d, p)
        ng = jnp.where(use_mesh[..., None], nm, ng)
        shape_idx = jnp.where(use_mesh, -2, shape_idx)
        mat_idx = jnp.where(use_mesh, matm, mat_idx)
        hit = hit | hitm
    return t, p, ng, uv, shape_idx, mat_idx, hit


def _env_stokes(scene, d, wavelengths=None):
    mode = "rgb" if wavelengths is None else "spectral"
    nc = 3 if wavelengths is None else wavelengths.shape[-1]
    if scene.env is None:
        return jnp.zeros(d.shape[:-1] + (nc,)), jnp.zeros(d.shape[:-1])
    return em.env_eval_pdf(scene.env, d, scene.env_to_world, wavelengths,
                           mode)


def path_sample_polarized(scene: Scene, o, d, smp: _SamplerCtx,
                          max_depth: int, rr_depth: int = 1000,
                          kinds=None, wavelengths=None):
    """Estimate the Stokes radiance along primary rays -> (N, C, 4).

    The returned Stokes vectors are w.r.t. the implicit bases
    `stokes_basis(-d)` of the primary directions (rotate with
    `sensor_stokes_rotation` for display, like `stokes.cpp:100-110`)."""
    n = o.shape[0]
    nc = 3 if wavelengths is None else wavelengths.shape[-1]
    sg = jax.lax.stop_gradient

    init = PolPathState(
        o=o, d=d,
        throughput=_eye4(n, nc),
        result=jnp.zeros((n, nc, 4)),
        active=jnp.ones((n,), bool),
        prev_bsdf_pdf=jnp.ones((n,)),
        prev_bsdf_delta=jnp.ones((n,), bool),
    )

    def emitter_hits(state, t, p, ng, shape_idx, hit):
        """Env + area emitter-hit contributions with MIS (unpolarized
        sources -> throughput first column x radiance)."""
        escaped = state.active & ~hit
        col = _first_col(state.throughput)
        result = state.result
        env_L, em_pdf_raw = _env_stokes(scene, state.d, wavelengths)
        em_pdf = jnp.where(state.prev_bsdf_delta, 0.0, em_pdf_raw)
        mis_em = _mis_weight(state.prev_bsdf_pdf, sg(em_pdf))
        result = result + jnp.where(
            escaped[..., None, None],
            col * (env_L * mis_em[..., None])[..., None], 0.0)

        n_area = scene.area_emitter_shapes.shape[0]
        if n_area > 0:
            area_L = take_rows(scene.area_radiance,
                               jnp.maximum(shape_idx, 0))
            if wavelengths is not None:
                area_L = jnp.broadcast_to(
                    jnp.mean(area_L, -1, keepdims=True),
                    area_L.shape[:-1] + (nc,))
            facing = (dot(ng, -state.d) > 0.0) & (shape_idx >= 0)
            area_pdf = em.area_pdf_direction(scene, state.o, p, ng,
                                             jnp.maximum(shape_idx, 0))
            area_pdf = jnp.where(state.prev_bsdf_delta, 0.0, area_pdf)
            mis_a = _mis_weight(state.prev_bsdf_pdf, sg(area_pdf))
            result = result + jnp.where(
                (state.active & hit & facing)[..., None, None],
                col * (area_L * mis_a[..., None])[..., None], 0.0)
        return result

    def bounce(state: PolPathState, depth):
        t, p, ng, uv, shape_idx, mat_idx, hit = _scene_hit(
            scene, state.o, state.d)
        result = emitter_hits(state, t, p, ng, shape_idx, hit)
        active = state.active & hit & (depth + 1 < max_depth)

        refl_tex = None
        if scene.textures is not None:
            from .texture import eval_texture
            tex_idx = take_ints(scene.bsdfs.tex_idx, mat_idx)
            refl_tex = eval_texture(scene.textures, tex_idx, uv,
                                    wavelengths)

        frame = Frame(ng)
        wi_local = frame.to_local(-state.d)

        def offset(dvec):
            return p + jnp.sign(dot(ng, dvec))[..., None] * ng * (
                _SHADOW_EPS * jnp.maximum(
                    1.0, jnp.linalg.norm(p, axis=-1, keepdims=True)))

        # ---- NEE toward the environment ----
        if scene.env is not None:
            u_nee = sg(smp.next(3 * depth + 0, 2))
            d_e, L_e, pdf_e = em.env_sample_eval(
                scene.env, scene.env_to_world, u_nee, wavelengths,
                "rgb" if wavelengths is None else "spectral")
            pdf_e_d = sg(pdf_e)
            wo_local = frame.to_local(d_e)
            f_val, pdf_b = bsdf_mod.eval_pdf(scene.bsdfs, mat_idx,
                                             wi_local, wo_local,
                                             wavelengths, kinds=kinds,
                                             refl_tex=refl_tex)
            m_local = _pol_weight_eval(scene.bsdfs, mat_idx, wi_local,
                                       wo_local, f_val, kinds, refl_tex,
                                       wavelengths)
            m_world = mu.to_world_mueller(frame, m_local, -wo_local,
                                          wi_local)
            tm = mu.matmul(state.throughput, m_world)
            occluded = scene_occluded(scene, offset(d_e), d_e,
                                      jnp.full((n,), jnp.inf))
            mis_nee = _mis_weight(pdf_e_d, sg(pdf_b))
            w = (L_e * (mis_nee / jnp.maximum(pdf_e_d, 1e-20))[..., None])
            ok = active & ~occluded & (pdf_e_d > 0.0)
            result = result + jnp.where(ok[..., None, None],
                                        _first_col(tm) * w[..., None], 0.0)

        # ---- NEE toward area emitters ----
        if scene.area_emitter_shapes.shape[0] > 0:
            u_area = sg(smp.next(3 * depth + 3, 3))
            d_a, dist_a, pdf_a, L_a, _, _ = em.area_sample_direction(
                scene, p, u_area[..., :2], u_area[..., 2])
            d_a = sg(d_a)
            pdf_a = sg(pdf_a)
            if wavelengths is not None:
                L_a = jnp.broadcast_to(jnp.mean(L_a, -1, keepdims=True),
                                       L_a.shape[:-1] + (nc,))
            wo_a = frame.to_local(d_a)
            f_a, pdf_b_a = bsdf_mod.eval_pdf(scene.bsdfs, mat_idx,
                                             wi_local, wo_a, wavelengths,
                                             kinds=kinds, refl_tex=refl_tex)
            m_local = _pol_weight_eval(scene.bsdfs, mat_idx, wi_local,
                                       wo_a, f_a, kinds, refl_tex,
                                       wavelengths)
            m_world = mu.to_world_mueller(frame, m_local, -wo_a, wi_local)
            tm = mu.matmul(state.throughput, m_world)
            # along-ray shadow origin offset (exact-eps shortening; same
            # false-self-occlusion fix as integrator.py area NEE)
            eps_a = _SHADOW_EPS * jnp.maximum(
                1.0, jnp.linalg.norm(p, axis=-1))
            occ_a = scene_occluded(
                scene, p + eps_a[..., None] * d_a, d_a,
                (dist_a - eps_a) * (1.0 - 1e-3))
            mis_a = _mis_weight(pdf_a, sg(pdf_b_a))
            w = L_a * (mis_a / jnp.maximum(pdf_a, 1e-20))[..., None]
            ok_a = active & ~occ_a & (pdf_a > 0.0)
            result = result + jnp.where(ok_a[..., None, None],
                                        _first_col(tm) * w[..., None], 0.0)

        # ---- point lights ----
        for li in range(scene.point_lights.shape[0]):
            lp = scene.point_lights[li, :3]
            intensity = scene.point_lights[li, 3:]
            to_l = lp - p
            dist2 = jnp.sum(to_l * to_l, axis=-1)
            dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
            d_l = to_l / dist[..., None]
            wo_l = frame.to_local(d_l)
            f_l, _ = bsdf_mod.eval_pdf(scene.bsdfs, mat_idx, wi_local,
                                       wo_l, wavelengths, kinds=kinds,
                                       refl_tex=refl_tex)
            m_local = _pol_weight_eval(scene.bsdfs, mat_idx, wi_local,
                                       wo_l, f_l, kinds, refl_tex,
                                       wavelengths)
            m_world = mu.to_world_mueller(frame, m_local, -wo_l, wi_local)
            tm = mu.matmul(state.throughput, m_world)
            occ_l = scene_occluded(scene, offset(d_l), d_l,
                                   dist * (1 - 1e-3))
            inten_c = (intensity if wavelengths is None
                       else jnp.mean(intensity, keepdims=True))
            w = inten_c / dist2[..., None]
            result = result + jnp.where(
                (active & ~occ_l)[..., None, None],
                _first_col(tm) * w[..., None], 0.0)

        # ---- BSDF sampling for the next bounce ----
        u_bsdf = sg(smp.next(3 * depth + 1, 3))
        wo_local, weight, pdf_b, is_delta = bsdf_mod.sample(
            scene.bsdfs, mat_idx, wi_local, u_bsdf[..., :2],
            u_bsdf[..., 2], wavelengths, kinds=kinds, refl_tex=refl_tex)
        wo_local = sg(wo_local)
        m_local = _pol_weight_sample(scene.bsdfs, mat_idx, wi_local,
                                     wo_local, weight, pdf_b, kinds,
                                     refl_tex, wavelengths)
        m_world = mu.to_world_mueller(frame, m_local, -wo_local, wi_local)
        d_next = frame.to_world(wo_local)
        throughput = mu.matmul(state.throughput, m_world)
        active = active & (pdf_b > 0.0)

        # ---- russian roulette on the unpolarized throughput ----
        thr_max = sg(jnp.max(throughput[..., 0, 0], axis=-1))
        rr_prob = jnp.clip(thr_max, 0.0, 0.95)
        do_rr = depth + 1 >= rr_depth
        u_rr = sg(smp.next(3 * depth + 2, 1))[..., 0]
        survive = jnp.where(do_rr, u_rr < rr_prob, True)
        throughput = jnp.where(
            do_rr,
            throughput / jnp.maximum(rr_prob, 1e-6)[..., None, None, None],
            throughput)
        active = active & survive

        new_state = PolPathState(
            o=jnp.where(active[..., None], offset(d_next), state.o),
            d=jnp.where(active[..., None], d_next, state.d),
            throughput=jnp.where(active[..., None, None, None], throughput,
                                 state.throughput),
            result=result,
            active=active,
            prev_bsdf_pdf=jnp.where(active, sg(pdf_b),
                                    state.prev_bsdf_pdf),
            prev_bsdf_delta=jnp.where(active, is_delta,
                                      state.prev_bsdf_delta),
        )
        return new_state, None

    if max_depth > 1:
        state, _ = jax.lax.scan(jax.checkpoint(bounce), init,
                                jnp.arange(max_depth - 1))
    else:
        state = init

    # final vertex: emitter hits only
    t, p, ng, uv, shape_idx, mat_idx, hit = _scene_hit(scene, state.o,
                                                       state.d)
    return emitter_hits(state, t, p, ng, shape_idx, hit)


def sensor_stokes_rotation(sensor, d):
    """Rotator aligning per-ray Stokes output with the sensor's horizontal
    axis (`stokes.cpp:100-110`): from stokes_basis(-d) to
    cross(d, sensor_vertical). (N, 4, 4)."""
    to_world = getattr(sensor, "to_world", None)
    if to_world is None:
        vertical = jnp.array([0.0, 0.0, 1.0])
    else:
        vertical = to_world[:3, 1]
    current = mu.stokes_basis(-d)
    target = jnp.cross(d, jnp.broadcast_to(vertical, d.shape))
    # degenerate when d || vertical: keep the implicit basis
    n2 = jnp.sum(target * target, axis=-1, keepdims=True)
    target = jnp.where(n2 < 1e-12, current, target)
    return mu.rotate_stokes_basis(-d, current, target)


@partial(jax.jit, static_argnames=("film_cfg", "spp", "max_depth",
                                   "rr_depth", "sampler_kind", "kinds",
                                   "mode"))
def _render_stokes_impl(scene, sensor, film_cfg, key, spp, max_depth,
                        rr_depth, sampler_kind="independent", kinds=None,
                        mode="rgb"):
    h, w = film_cfg.height, film_cfg.width
    n = h * w * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = lane // spp
    sample_idx = lane % spp
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)
    smp = _SamplerCtx(sampler_kind, key, pixel, sample_idx, spp)
    u_pos = smp.next(10_000, 2)
    uv = jnp.stack([(px + u_pos[:, 0]) / w, (py + u_pos[:, 1]) / h], -1)
    o, d = sensors_mod.sample_ray(sensor, uv)

    if mode == "spectral":
        # hero-wavelength polarized transport, like the reference's
        # *_spectral_polarized variants; each Stokes component converts
        # to sRGB with the shared pdf weight (`stokes.cpp:117-128`)
        from ..ops import spectrum as spec_mod
        u_wl = smp.next(20_000, 1)[..., 0]
        shifted = spec_mod.sample_shifted(u_wl, 4)
        wavelengths, wl_weight = spec_mod.sample_rgb_spectrum(shifted)
        stokes_spec = path_sample_polarized(scene, o, d, smp, max_depth,
                                            rr_depth, kinds=kinds,
                                            wavelengths=wavelengths)
        stokes = jnp.stack(
            [spec_mod.spectrum_to_srgb(stokes_spec[..., si] * wl_weight,
                                       wavelengths)
             for si in range(4)], axis=-1)          # (N, 3, 4)
    else:
        stokes = path_sample_polarized(scene, o, d, smp, max_depth,
                                       rr_depth, kinds=kinds)
    rot = sensor_stokes_rotation(sensor, d)[..., None, :, :]
    stokes = mu.apply_stokes(rot, stokes)
    stokes = jnp.where(jnp.isfinite(stokes), stokes, 0.0)

    # splat all 4 components as a 12-channel image
    flat = jnp.moveaxis(stokes, -1, -2).reshape(n, 4 * 3)
    film12 = film_mod.Film(h, w, 12, "box")
    accum = film_mod.splat_ordered(film12, flat, spp)
    img = film_mod.develop(accum)
    return img.reshape(h, w, 4, 3)


def render_stokes(scene: Scene, sensor, film: film_mod.Film, key,
                  spp: int = 16, max_depth: int = 4,
                  rr_depth: int = 1000,
                  sampler_kind: str = "independent", mode: str = "rgb"):
    """Render the full polarization state -> (H, W, 4, 3): Stokes
    components S0 (radiance) and S1..S3 aligned with the sensor's
    horizontal axis, the output convention of the reference's `stokes`
    integrator AOVs (`stokes.cpp:113-131`). `mode="spectral"` runs
    4-hero-wavelength polarized transport (the `*_spectral_polarized`
    variants)."""
    kinds = bsdf_mod.table_kinds(scene.bsdfs)
    return _render_stokes_impl(scene, sensor, film,
                               jax.random.fold_in(key, 0), spp, max_depth,
                               rr_depth, sampler_kind, kinds, mode)
