"""Integrators: direct illumination and a wavefront path tracer.

TPU-first re-design of the reference's integrators (SURVEY.md H4;
`src/integrators/path.cpp:94-308`, `direct.cpp:81`):

* The whole wavefront (H * W * spp lanes) is one SoA tensor program; the
  bounce loop is a `lax.scan` with static depth and per-lane active masks
  (no data-dependent control flow — the analogue of the reference's
  recorded megakernel loop, `path.cpp:158`).
* MIS between emitter sampling (environment importance sampling — TGMM +
  sun cone for sunsky) and BSDF sampling, with the same beta=2 power
  heuristic as `path.cpp:321`.
* Sampling decisions are `stop_gradient`-ed, matching the reference's
  detached-sampling discipline for differentiable rendering
  (`prb.py:147-160`): gradients flow through radiance/throughput values,
  not through sample placement.
* RNG: counter-based (threefry) keys derived from the *global* lane index,
  so renders are bitwise-independent of device mesh shape (SURVEY.md §7
  item 8).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.gather import take_ints, take_rows
from ..ops.math import Frame, dot
from . import sampler as sampler_mod
from . import bsdf as bsdf_mod
from . import emitters as em
from . import film as film_mod
from . import sensors as sensors_mod
from . import medium as medium_mod
from .mesh import mesh_intersect, mesh_test
from .scene import Scene, scene_occluded
from .shapes import ray_intersect, ray_test

_SHADOW_EPS = 1e-3


def _mis_weight(pdf_a, pdf_b):
    """Power heuristic with beta=2, guarded like the reference
    (`path.cpp:321-327` squares both pdfs before the balance ratio)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    w = a2 / (a2 + b2)
    return jnp.where(jnp.isfinite(w), w, 0.0)


def _lane_samples(key, lane_idx, dim, n):
    """n uniform samples for each lane, decorrelated across `dim` slots.
    (Independent sampler path; see `sampler.py` for stratified/QMC.)"""
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.fold_in(key, i), dim))(lane_idx)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(keys)


class _SamplerCtx:
    """Per-render sampler context bound to lane identities."""

    def __init__(self, kind, key, pixel_idx, sample_idx, spp):
        self.kind = kind
        self.key = key
        self.pixel_idx = pixel_idx
        self.sample_idx = sample_idx
        self.spp = spp

    def next(self, dim, n):
        return sampler_mod.lane_samples(self.kind, self.key, self.pixel_idx,
                                        self.sample_idx, self.spp, dim, n)


def _env_radiance(scene: Scene, d, wavelengths, mode):
    if scene.env is None:
        c = 1 if wavelengths is not None else 3
        shape = d.shape[:-1] + ((wavelengths.shape[-1],)
                                if wavelengths is not None else (3,))
        return jnp.zeros(shape)
    return em.env_eval(scene.env, d, scene.env_to_world,
                       wavelengths=wavelengths, mode=mode)


class PathState(NamedTuple):
    o: jnp.ndarray            # (N, 3) current ray origin
    d: jnp.ndarray            # (N, 3) current ray direction
    throughput: jnp.ndarray   # (N, C)
    result: jnp.ndarray       # (N, C)
    active: jnp.ndarray       # (N,)
    prev_bsdf_pdf: jnp.ndarray  # (N,) pdf of the ray's generating BSDF sample
    prev_bsdf_delta: jnp.ndarray  # (N,) whether it was a delta sample


def _spec_rows(coeffs_table, rows_idx, wavelengths):
    """Per-lane EMITTER spectrum: gather fitted (c0,c1,c2,scale) rows and
    evaluate at the hero wavelengths -> (..., W), including the D65
    illuminant factor (`rgb2spec.eval_emitter_coeff_spectrum` — the
    reference's srgb_d65 emitter convention)."""
    from ..ops.gather import take_rows
    from ..ops.rgb2spec import eval_emitter_coeff_spectrum
    return eval_emitter_coeff_spectrum(take_rows(coeffs_table, rows_idx),
                                       wavelengths)



def _delta_lights_single_sample(scene, u_pick, p, ng, frame, wi_local,
                                mat_idx, thr_s, active, wavelengths,
                                emit_cf, kinds, refl_tex, shadow_T):
    """ONE sampled delta emitter (point/directional/spot) per NEE query.

    The reference builds a DiscreteDistribution over each emitter's
    `sampling_weight()` and samples a single emitter per query
    (`scene.cpp:100-119,295-345`); per-vertex cost — one BSDF eval + one
    shadow ray — is independent of the light count. The statically
    unrolled per-light connection in `bounce` remains the specialisation
    for <= 2 delta lights. Estimator: contribution(selected) / pmf."""
    from ..ops.distr import discrete_sample_reuse, make_discrete
    from ..ops.gather import take_rows
    sg = jax.lax.stop_gradient
    n = p.shape[0]
    n_pt = scene.point_lights.shape[0]
    n_dir = scene.directional_lights.shape[0]
    n_spot = len(scene.spot_lights)
    n_delta = n_pt + n_dir + n_spot

    w = scene.delta_light_weights
    if w is None:
        w = jnp.ones((n_delta,))
    w = sg(jnp.maximum(w, 0.0))
    pmf = w / jnp.maximum(jnp.sum(w), 1e-12)
    idx, _ = discrete_sample_reuse(make_discrete(w), u_pick)

    def _stack(rows):
        return jnp.concatenate([jnp.asarray(r, jnp.float32).reshape(-1, 3)
                                for r in rows], axis=0)
    pos_rows = _stack([scene.point_lights[:, :3],
                       jnp.zeros((n_dir, 3))]
                      + [l.position for l in scene.spot_lights])
    dir_rows = _stack([jnp.zeros((n_pt, 3)),
                       scene.directional_lights[:, :3],
                       jnp.zeros((n_spot, 3))])
    inten_rows = _stack([scene.point_lights[:, 3:],
                         scene.directional_lights[:, 3:]]
                        + [l.intensity for l in scene.spot_lights])

    lp = take_rows(pos_rows, idx)
    ld = take_rows(dir_rows, idx)
    I_rgb = take_rows(inten_rows, idx)
    pmf_sel = take_rows(pmf[:, None], idx)[..., 0]
    is_dir = (idx >= n_pt) & (idx < n_pt + n_dir)
    is_spot = idx >= n_pt + n_dir

    to_l = lp - p
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    d_pos = to_l / dist[..., None]
    d_dirn = -ld / jnp.maximum(
        jnp.linalg.norm(ld, axis=-1, keepdims=True), 1e-12)
    d_l = jnp.where(is_dir[..., None], d_dirn, d_pos)
    maxt = jnp.where(is_dir, jnp.inf, dist * (1.0 - 1e-3))
    t_dist = jnp.where(is_dir, jnp.inf, dist)

    wo_l = frame.to_local(d_l)
    f_l, _ = bsdf_mod.eval_pdf(scene.bsdfs, mat_idx, wi_local, wo_l,
                               wavelengths, kinds=kinds, refl_tex=refl_tex)
    off_l = p + jnp.sign(dot(ng, d_l))[..., None] * ng * (
        _SHADOW_EPS * jnp.maximum(
            1.0, jnp.linalg.norm(p, axis=-1, keepdims=True)))
    occ_l = scene_occluded(scene, off_l, d_l, maxt)

    # spot falloff: per-spot masked selects (cheap math only — the BSDF
    # eval and shadow ray above are shared by every branch)
    fall = I_rgb
    ratio = jnp.ones((n,))
    for si, light in enumerate(scene.spot_lights):
        m = idx == n_pt + n_dir + si
        f_s = em.spot_falloff(light, -d_l)
        fall = jnp.where(m[..., None], f_s, fall)
        ratio = jnp.where(
            m, jnp.sum(f_s, -1) / jnp.maximum(jnp.sum(light.intensity),
                                              1e-12), ratio)

    if wavelengths is None:
        I_eff = jnp.where(is_spot[..., None], fall, I_rgb)
    else:
        from ..ops.rgb2spec import eval_emitter_coeff_spectrum
        ncf = None
        for key_ in ("point", "dirl"):
            if emit_cf[key_] is not None:
                ncf = emit_cf[key_].shape[-1]
        if emit_cf["spot"]:
            ncf = jnp.asarray(emit_cf["spot"][0]).reshape(-1).shape[0]
        blocks = []
        blocks.append(emit_cf["point"].reshape(n_pt, -1) if n_pt and
                      emit_cf["point"] is not None
                      else jnp.zeros((n_pt, ncf)))
        blocks.append(emit_cf["dirl"].reshape(n_dir, -1) if n_dir and
                      emit_cf["dirl"] is not None
                      else jnp.zeros((n_dir, ncf)))
        for c in emit_cf["spot"]:
            blocks.append(jnp.asarray(c).reshape(1, -1))
        cf_rows = jnp.concatenate(blocks, axis=0)
        I_spec = eval_emitter_coeff_spectrum(take_rows(cf_rows, idx),
                                             wavelengths)
        I_eff = I_spec * jnp.where(is_spot, ratio, 1.0)[..., None]

    geo = jnp.where(is_dir, 1.0, 1.0 / jnp.maximum(dist2, 1e-12))
    contrib = (thr_s * f_l * I_eff * shadow_T(off_l, d_l, t_dist)
               * (geo / jnp.maximum(pmf_sel, 1e-12))[..., None])
    ok = active & ~occ_l & (pmf_sel > 0.0)
    return jnp.where(ok[..., None], contrib, 0.0)


def _path_sample(scene: Scene, o, d, smp: "_SamplerCtx", max_depth: int,
                 rr_depth: int, mode: str, wavelengths, vma_axes=(),
                 kinds=None, nmaps=False, tkinds=None):
    """Estimate radiance along primary rays o, d -> (N, C).

    max_depth counts path vertices like the reference (-1 handled by the
    caller; depth=2 == direct illumination). `vma_axes` names the mesh
    axes this call runs under inside shard_map (the scan carry must be
    marked device-varying for those axes).
    """
    n = o.shape[0]
    n_chan = (3 if wavelengths is None else wavelengths.shape[-1])
    sg = jax.lax.stop_gradient

    # f64 variant (SURVEY §1): compute in the scene's dtype — camera rays
    # arrive f32 from the sensor tables, so promote them here or the scan
    # carry dtypes diverge after the first bounce
    cdt = scene.shapes.to_world.dtype
    o = jnp.asarray(o, cdt)
    d = jnp.asarray(d, cdt)

    # rgb2spec emitter spectra (reference `srgb.cpp:14-38`): in spectral
    # mode every RGB emitter quantity is upsampled to a sigmoid-polynomial
    # spectrum ONCE per render (table-level fit — loop-invariant, hoisted
    # by XLA) and evaluated at the hero wavelengths per lane, replacing
    # the earlier channel-mean approximation.
    emit_cf = None
    if wavelengths is not None:
        from ..ops.rgb2spec import fit_sigmoid_coeffs_jnp as _fit
        emit_cf = dict(
            area=(_fit(scene.area_radiance)
                  if scene.area_emitter_shapes.shape[0] else None),
            point=(_fit(scene.point_lights[:, 3:])
                   if scene.point_lights.shape[0] else None),
            dirl=(_fit(scene.directional_lights[:, 3:])
                  if scene.directional_lights.shape[0] else None),
            spot=tuple(_fit(light.intensity)
                       for light in scene.spot_lights))

    def varying(x):
        if not vma_axes:
            return x
        try:
            return jax.lax.pcast(x, vma_axes, to="varying")
        except ValueError:  # already varying over these axes
            return x

    init = PathState(
        o=varying(o), d=varying(d),
        throughput=varying(jnp.ones((n, n_chan))),
        result=varying(jnp.zeros((n, n_chan))),
        active=varying(jnp.ones((n,), bool)),
        prev_bsdf_pdf=varying(jnp.ones((n,))),
        prev_bsdf_delta=varying(jnp.ones((n,), bool)),
    )

    def bounce(state: PathState, depth):
        t, p, ng, uv, shape_idx, hit = ray_intersect(
            scene.shapes, state.o, state.d)
        mesh_mat = None
        mesh_attr = None
        if scene.mesh is not None:
            tm, nm, matm, _b1, _b2, _tri, hitm = mesh_intersect(
                scene.mesh, state.o, state.d)
            use_mesh = hitm & (tm < t)
            t = jnp.where(use_mesh, tm, t)
            p = jnp.where(use_mesh[..., None],
                          state.o + tm[..., None] * state.d, p)
            ng = jnp.where(use_mesh[..., None], nm, ng)
            shape_idx = jnp.where(use_mesh, -2, shape_idx)
            hit = hit | hitm
            mesh_mat = (use_mesh, matm)
            if scene.textures is not None:
                from .mesh import mesh_interp_uv
                uv = jnp.where(use_mesh[..., None],
                               mesh_interp_uv(scene.mesh, _tri, _b1, _b2),
                               uv)
                if scene.mesh.col is not None:
                    from .mesh import mesh_interp_color
                    mesh_attr = jnp.where(
                        use_mesh[..., None],
                        mesh_interp_color(scene.mesh, _tri, _b1, _b2), 0.0)

        sdf_mat = None
        if scene.sdf is not None:
            from .sdf import sdf_intersect
            ts_, ns_, hs_ = sdf_intersect(scene.sdf, state.o, state.d)
            use_sdf = hs_ & (ts_ < t)
            t = jnp.where(use_sdf, ts_, t)
            p = jnp.where(use_sdf[..., None],
                          state.o + ts_[..., None] * state.d, p)
            ng = jnp.where(use_sdf[..., None], ns_, ng)
            shape_idx = jnp.where(use_sdf, -3, shape_idx)
            hit = hit | use_sdf
            sdf_mat = use_sdf

        curve_mat = None
        curve_tangent = None
        if scene.curve is not None:
            from .curve import curve_intersect
            tc_, nc_, matc_, hc_, tgc_ = curve_intersect(scene.curve,
                                                         state.o, state.d)
            curve_tangent = tgc_
            use_cv = hc_ & (tc_ < t)
            t = jnp.where(use_cv, tc_, t)
            p = jnp.where(use_cv[..., None],
                          state.o + tc_[..., None] * state.d, p)
            ng = jnp.where(use_cv[..., None], nc_, ng)
            shape_idx = jnp.where(use_cv, -4, shape_idx)
            hit = hit | use_cv
            curve_mat = (use_cv, matc_)

        # ---- participating medium: free-flight sampling ----------------
        # The medium region is convex, so the ray's overlap is ONE closed-
        # form interval — no inside/outside loop state, no null-boundary
        # events (contrast `volpath.cpp`'s per-ray MediumPtr chase; see
        # `medium.py`). Emissive hits (env/area) use ANALYTIC transmittance
        # T_seg (zero added variance); reflection and in-scattering split
        # the lane by the sampled free-flight distance with the standard
        # ratio weights, using the channel-averaged extinction as the
        # sampling density (`homogeneous.cpp` sample_interaction).
        med = scene.medium
        if med is not None:
            media = medium_mod.as_stack(med)
            t_eff = jnp.where(hit, t, jnp.inf)
            u_dist = sg(smp.next(100_000 + 4 * depth, len(media)))
            (m_scat, t_scat, reg_oh, T_seg, w_pass,
             w_scat) = medium_mod.stack_sample(
                media, state.o, state.d, t_eff, u_dist)
            med_scatter = state.active & m_scat
        else:
            T_seg = 1.0
            med_scatter = None

        def shadow_T(p0, dvec, dist):
            """Medium transmittance along a shadow ray (1.0 without one)."""
            if med is None:
                return 1.0
            return medium_mod.stack_transmittance(med, p0, dvec, dist)

        # ---- emitter hit (environment): MIS vs previous BSDF sample ----
        escaped = state.active & ~hit
        if scene.env is not None:
            # one fused pass computes radiance AND pdf (Pallas on TPU)
            env_L, em_pdf_raw = em.env_eval_pdf(scene.env, state.d,
                                                scene.env_to_world,
                                                wavelengths, mode,
                                                pdf_detached=True)
            em_pdf = jnp.where(state.prev_bsdf_delta, 0.0, em_pdf_raw)
        else:
            env_L = _env_radiance(scene, state.d, wavelengths, mode)
            em_pdf = jnp.zeros_like(state.prev_bsdf_pdf)
        # MIS weights are detached, mirroring the reference's
        # detached-sampling AD discipline (`prb.py:147-160`)
        mis_em = _mis_weight(state.prev_bsdf_pdf, sg(em_pdf))
        result = state.result + jnp.where(
            escaped[..., None],
            state.throughput * T_seg * env_L * mis_em[..., None], 0.0)

        # ---- area-emitter hit: MIS vs the area-NEE strategy ----
        n_area = scene.area_emitter_shapes.shape[0]
        area_rows = take_rows(scene.area_radiance,
                              jnp.maximum(shape_idx, 0))
        if wavelengths is None:
            area_L = area_rows
        elif emit_cf["area"] is not None:   # rgb2spec-upsampled spectra
            area_L = _spec_rows(emit_cf["area"], jnp.maximum(shape_idx, 0),
                                wavelengths)
        else:
            area_L = jnp.mean(area_rows, axis=-1, keepdims=True)
        facing = (dot(ng, -state.d) > 0.0) & (shape_idx >= 0)
        if n_area > 0:
            area_hit_pdf = em.area_pdf_direction(
                scene, state.o, p, ng, jnp.maximum(shape_idx, 0))
            area_hit_pdf = jnp.where(state.prev_bsdf_delta, 0.0,
                                     area_hit_pdf)
            mis_area_hit = _mis_weight(state.prev_bsdf_pdf, sg(area_hit_pdf))
        else:
            mis_area_hit = jnp.ones_like(state.prev_bsdf_pdf)
        result = result + jnp.where(
            (state.active & hit & facing)[..., None],
            state.throughput * T_seg * area_L * mis_area_hit[..., None], 0.0)

        active = state.active & hit & (depth + 1 < max_depth)
        if med is not None:
            active = active & ~med_scatter
        # surface-path throughput: attenuated by the medium pass-through
        # ratio estimator (exact T / survival probability)
        thr_s = state.throughput * w_pass if med is not None \
            else state.throughput

        mat_idx = take_ints(scene.shapes.bsdf_idx,
                            jnp.maximum(shape_idx, 0))
        if mesh_mat is not None:
            mat_idx = jnp.where(mesh_mat[0], mesh_mat[1], mat_idx)
        if sdf_mat is not None:
            mat_idx = jnp.where(sdf_mat, scene.sdf.bsdf_idx, mat_idx)
        if curve_mat is not None:
            mat_idx = jnp.where(curve_mat[0], curve_mat[1], mat_idx)

        # per-lane textured reflectance, evaluated once per bounce and
        # shared by every BSDF query at this vertex
        refl_tex = None
        if scene.textures is not None:
            from .texture import eval_texture
            tex_idx = take_ints(scene.bsdfs.tex_idx, mat_idx)
            refl_tex = eval_texture(scene.textures, tex_idx, uv,
                                    wavelengths, p=p, attr=mesh_attr,
                                    tkinds=tkinds)

        # shading frame (geometric normal; two-sided flipping happens
        # inside the bsdf). Normal-mapped materials perturb it per lane
        # (the flattened `normalmap.cpp` wrapper); the geometric normal
        # stays authoritative for ray offsets and facing tests.
        geo_frame = Frame(ng)
        if nmaps and scene.textures is not None:
            from .texture import eval_texture as _evt
            nm_idx = take_ints(scene.bsdfs.normal_tex_idx, mat_idx)
            n_rgb, n_has = _evt(scene.textures, nm_idx, uv, None,
                                p=p, attr=mesh_attr, tkinds=tkinds)
            n_loc = 2.0 * n_rgb - 1.0
            n_loc = n_loc / jnp.maximum(
                jnp.linalg.norm(n_loc, axis=-1, keepdims=True), 1e-6)
            ns = geo_frame.to_world(n_loc)
            frame = Frame(jnp.where(n_has[..., None], ns, ng))
        else:
            frame = geo_frame
        # hair fiber frame: +y along the curve tangent, +z the hit normal
        # projected onto the cross-section plane (the convention the
        # Chiang BCSDF expects, `hair.cpp:140-149`)
        if (curve_tangent is not None and kinds is not None
                and bsdf_mod.HAIR in kinds[0]):
            kind_l = take_ints(scene.bsdfs.kind, mat_idx)
            hair_lane = curve_mat[0] & (kind_l == bsdf_mod.HAIR)
            tg = curve_tangent
            z_h = ng - jnp.sum(ng * tg, axis=-1, keepdims=True) * tg
            z_h = z_h / jnp.maximum(
                jnp.linalg.norm(z_h, axis=-1, keepdims=True), 1e-9)
            s_h = jnp.cross(tg, z_h)
            m = hair_lane[..., None]
            frame.s = jnp.where(m, s_h, frame.s)
            frame.t = jnp.where(m, tg, frame.t)
            frame.n = jnp.where(m, z_h, frame.n)
        wi_local = frame.to_local(-state.d)

        # ---- next-event estimation toward the environment ----
        if scene.env is not None:
            u_nee = sg(smp.next(3 * depth + 0, 2))
            # fused sample + radiance + pdf (one Pallas pass on TPU);
            # d_e comes back detached (sample placement)
            d_e, L_e, pdf_e = em.env_sample_eval(
                scene.env, scene.env_to_world, u_nee, wavelengths, mode,
                pdf_detached=True)
            pdf_e_detached = sg(pdf_e)
            wo_local = frame.to_local(d_e)
            f_val, pdf_b = bsdf_mod.eval_pdf(
                scene.bsdfs, mat_idx, wi_local, wo_local, wavelengths,
                kinds=kinds, refl_tex=refl_tex)
            offset_p = p + jnp.sign(dot(ng, d_e))[..., None] * ng * (
                _SHADOW_EPS * jnp.maximum(
                    1.0, jnp.linalg.norm(p, axis=-1, keepdims=True)))
            occluded = scene_occluded(scene, offset_p, d_e,
                                      jnp.full((n,), jnp.inf))
            mis_nee = _mis_weight(pdf_e_detached, sg(pdf_b))
            contrib = (thr_s * f_val * L_e
                       * shadow_T(offset_p, d_e, jnp.full((n,), jnp.inf))
                       * (mis_nee / jnp.maximum(pdf_e_detached, 1e-20))
                       [..., None])
            ok = active & ~occluded & (pdf_e_detached > 0.0)
            result = result + jnp.where(ok[..., None], contrib, 0.0)

        # ---- next-event estimation toward area emitters ----
        if n_area > 0:
            u_area = sg(smp.next(3 * depth + 3, 3))
            (d_a, dist_a, pdf_a, L_a, _n_emit,
             emit_shape_a) = em.area_sample_direction(
                scene, p, u_area[..., :2], u_area[..., 2])
            d_a = sg(d_a)
            pdf_a = sg(pdf_a)
            if wavelengths is not None:
                L_a = _spec_rows(emit_cf["area"], emit_shape_a, wavelengths)
            wo_a = frame.to_local(d_a)
            f_a, pdf_b_a = bsdf_mod.eval_pdf(
                scene.bsdfs, mat_idx, wi_local, wo_a, wavelengths,
                kinds=kinds, refl_tex=refl_tex)
            # Shadow-ray origin offset ALONG THE RAY (the reference's
            # spawn_ray_to scheme): a normal-direction offset shortens
            # the true distance to the sampled emitter point by
            # eps*(n·N_emit)/(d·N_emit) — UNBOUNDED at shallow emitter
            # angles — so any fixed maxt margin falsely self-occludes
            # far receivers against the emitter's own surface (found by
            # the ptracer-vs-path Z-test: the path image lost ALL
            # area-NEE light beyond |p| ~ 2, a +29% band error, exact-
            # quadrature-confirmed). Along-ray offsets shorten the
            # distance by exactly eps.
            eps_a = _SHADOW_EPS * jnp.maximum(
                1.0, jnp.linalg.norm(p, axis=-1))
            off_a = p + eps_a[..., None] * d_a
            occ_a = scene_occluded(scene, off_a, d_a,
                                   (dist_a - eps_a) * (1.0 - 1e-3))
            mis_a = _mis_weight(pdf_a, sg(pdf_b_a))
            contrib_a = (thr_s * f_a * L_a * shadow_T(off_a, d_a, dist_a)
                         * (mis_a / jnp.maximum(pdf_a, 1e-20))[..., None])
            ok_a = active & ~occ_a & (pdf_a > 0.0)
            result = result + jnp.where(ok_a[..., None], contrib_a, 0.0)

        def _delta_lights_unrolled():
            """Static per-light direct connections (<= 2 delta lights)."""
            acc = jnp.zeros_like(result)
            for li in range(n_point):
                lp = scene.point_lights[li, :3]
                intensity = scene.point_lights[li, 3:]
                to_l = lp - p
                dist2_l = jnp.sum(to_l * to_l, axis=-1)
                dist_l = jnp.sqrt(jnp.maximum(dist2_l, 1e-12))
                d_l = to_l / dist_l[..., None]
                wo_l = frame.to_local(d_l)
                f_l, _ = bsdf_mod.eval_pdf(
                    scene.bsdfs, mat_idx, wi_local, wo_l, wavelengths,
                    kinds=kinds, refl_tex=refl_tex)
                off_l = p + jnp.sign(dot(ng, d_l))[..., None] * ng * (
                    _SHADOW_EPS * jnp.maximum(
                        1.0, jnp.linalg.norm(p, axis=-1, keepdims=True)))
                occ_l = scene_occluded(scene, off_l, d_l, dist_l * (1 - 1e-3))
                from ..ops.rgb2spec import eval_emitter_coeff_spectrum
                I_l = (intensity if wavelengths is None
                       else eval_emitter_coeff_spectrum(emit_cf["point"][li],
                                                wavelengths))
                contrib_l = (thr_s * f_l * I_l * shadow_T(off_l, d_l, dist_l)
                             / dist2_l[..., None])
                acc = acc + jnp.where((active & ~occ_l)[..., None],
                                            contrib_l, 0.0)
            n_dir = scene.directional_lights.shape[0]
            for li in range(n_dir):
                d_l = -scene.directional_lights[li, :3]
                d_l = d_l / jnp.linalg.norm(d_l)
                irr = scene.directional_lights[li, 3:]
                d_b = jnp.broadcast_to(d_l, p.shape)
                wo_l = frame.to_local(d_b)
                f_l, _ = bsdf_mod.eval_pdf(
                    scene.bsdfs, mat_idx, wi_local, wo_l, wavelengths,
                    kinds=kinds, refl_tex=refl_tex)
                off_l = p + jnp.sign(dot(ng, d_b))[..., None] * ng * (
                    _SHADOW_EPS * jnp.maximum(
                        1.0, jnp.linalg.norm(p, axis=-1, keepdims=True)))
                occ_l = scene_occluded(scene, off_l, d_b,
                                       jnp.full((n,), jnp.inf))
                from ..ops.rgb2spec import eval_emitter_coeff_spectrum
                E_l = (irr if wavelengths is None
                       else eval_emitter_coeff_spectrum(emit_cf["dirl"][li],
                                                wavelengths))
                contrib_l = (thr_s * f_l * E_l
                             * shadow_T(off_l, d_b, jnp.full((n,), jnp.inf)))
                acc = acc + jnp.where((active & ~occ_l)[..., None],
                                            contrib_l, 0.0)
            for si, light in enumerate(scene.spot_lights):   # spot / projector
                to_l = light.position - p
                dist2_l = jnp.sum(to_l * to_l, axis=-1)
                dist_l = jnp.sqrt(jnp.maximum(dist2_l, 1e-12))
                d_l = to_l / dist_l[..., None]
                falloff = em.spot_falloff(light, -d_l)
                wo_l = frame.to_local(d_l)
                f_l, _ = bsdf_mod.eval_pdf(
                    scene.bsdfs, mat_idx, wi_local, wo_l, wavelengths,
                    kinds=kinds, refl_tex=refl_tex)
                off_l = p + jnp.sign(dot(ng, d_l))[..., None] * ng * (
                    _SHADOW_EPS * jnp.maximum(
                        1.0, jnp.linalg.norm(p, axis=-1, keepdims=True)))
                occ_l = scene_occluded(scene, off_l, d_l, dist_l * (1 - 1e-3))
                if wavelengths is None:
                    I_l = falloff
                else:
                    # spectral intensity x scalar (falloff+texture) modulation
                    from ..ops.rgb2spec import eval_emitter_coeff_spectrum
                    ratio = (jnp.sum(falloff, -1)
                             / jnp.maximum(jnp.sum(light.intensity), 1e-12))
                    I_l = (eval_emitter_coeff_spectrum(emit_cf["spot"][si],
                                                       wavelengths)
                           * ratio[..., None])
                contrib_l = (thr_s * f_l * I_l * shadow_T(off_l, d_l, dist_l)
                             / dist2_l[..., None])
                acc = acc + jnp.where((active & ~occ_l)[..., None],
                                            contrib_l, 0.0)
            return acc

        # ---- delta emitters (point / directional / spot) ----
        n_point = scene.point_lights.shape[0]
        n_dirl = scene.directional_lights.shape[0]
        n_spotl = len(scene.spot_lights)
        if n_point + n_dirl + n_spotl > 2:
            # single-sample emitter selection over sampling_weight
            # (`scene.cpp:100-119,295-345`): O(1) BSDF/shadow work per
            # vertex regardless of the light count
            u_pick = sg(smp.next(300_000 + depth, 1))[..., 0]
            result = result + _delta_lights_single_sample(
                scene, u_pick, p, ng, frame, wi_local, mat_idx, thr_s,
                active, wavelengths, emit_cf, kinds, refl_tex, shadow_T)
        else:
            result = result + _delta_lights_unrolled()

        # ---- BSDF sampling for the next bounce ----
        u_bsdf = sg(smp.next(3 * depth + 1, 3))
        wo_local, weight, pdf_b, is_delta = bsdf_mod.sample(
            scene.bsdfs, mat_idx, wi_local, u_bsdf[..., :2],
            u_bsdf[..., 2], wavelengths, kinds=kinds, refl_tex=refl_tex)
        wo_local = sg(wo_local)
        d_next = frame.to_world(wo_local)
        throughput = thr_s * weight
        active = active & (pdf_b > 0.0)

        # ---- medium in-scattering event (volpath.cpp medium branch) ----
        if med is not None:
            med_act = med_scatter & (depth + 1 < max_depth)
            p_m = state.o + t_scat[..., None] * state.d
            thr_m = state.throughput * w_scat
            if scene.env is not None:
                u_nee_m = sg(smp.next(100_000 + 4 * depth + 1, 2))
                d_me, L_me, pdf_me = em.env_sample_eval(
                    scene.env, scene.env_to_world, u_nee_m, wavelengths,
                    mode, pdf_detached=True)
                pdf_me_d = sg(pdf_me)
                f_p = medium_mod.stack_phase_pdf(media, reg_oh,
                                                 state.d, d_me)
                occ_m = scene_occluded(scene, p_m, d_me,
                                       jnp.full((n,), jnp.inf))
                T_sh = medium_mod.stack_transmittance(
                    media, p_m, d_me, jnp.full((n,), jnp.inf))
                mis_m = _mis_weight(pdf_me_d, sg(f_p))
                contrib_m = (thr_m * f_p[..., None] * L_me * T_sh
                             * (mis_m / jnp.maximum(pdf_me_d, 1e-20))
                             [..., None])
                ok_m = med_act & ~occ_m & (pdf_me_d > 0.0)
                result = result + jnp.where(ok_m[..., None], contrib_m, 0.0)
            u_ph = sg(smp.next(100_000 + 4 * depth + 2, 2))
            d_ph, pdf_ph = medium_mod.stack_phase_sample(media, reg_oh,
                                                         state.d, u_ph)
            d_ph = sg(d_ph)

        # ---- merge surface and medium continuations ----
        offset_p = p + jnp.sign(dot(ng, d_next))[..., None] * ng * (
            _SHADOW_EPS * jnp.maximum(1.0, jnp.linalg.norm(p, axis=-1,
                                                           keepdims=True)))
        if med is not None:
            m = med_scatter
            offset_p = jnp.where(m[..., None], p_m, offset_p)
            d_next = jnp.where(m[..., None], d_ph, d_next)
            throughput = jnp.where(m[..., None], thr_m, throughput)
            pdf_next = jnp.where(m, sg(pdf_ph), sg(pdf_b))
            delta_next = jnp.where(m, False, is_delta)
            active = active | med_act
        else:
            pdf_next = sg(pdf_b)
            delta_next = is_delta

        # ---- russian roulette (detached, like `path.cpp:285-301`) ----
        rr_prob = jnp.clip(sg(jnp.max(throughput, axis=-1)), 0.0, 0.95)
        do_rr = depth + 1 >= rr_depth
        u_rr = sg(smp.next(3 * depth + 2, 1))[..., 0]
        survive = jnp.where(do_rr, u_rr < rr_prob, True)
        throughput = jnp.where(do_rr,
                               throughput / jnp.maximum(rr_prob, 1e-6)[..., None],
                               throughput)
        active = active & survive

        new_state = PathState(
            # dtype pins keep the scan carry stable under jax_enable_x64
            # (f64 sampler uniforms would otherwise promote the rays)
            o=jnp.where(active[..., None], offset_p,
                        state.o).astype(state.o.dtype),
            d=jnp.where(active[..., None], d_next,
                        state.d).astype(state.d.dtype),
            throughput=jnp.where(active[..., None], throughput,
                                 state.throughput
                                 ).astype(state.throughput.dtype),
            result=result.astype(state.result.dtype),
            active=active,
            prev_bsdf_pdf=jnp.where(
                active, pdf_next,
                state.prev_bsdf_pdf).astype(state.prev_bsdf_pdf.dtype),
            prev_bsdf_delta=jnp.where(active, delta_next,
                                      state.prev_bsdf_delta),
        )
        return new_state, None

    # Rematerialised bounce (depth > 4): the backward sweep stores only
    # the compact per-bounce carry (rays, throughput — a dozen floats per
    # lane) and recomputes intersections/emitter evals per bounce. This is
    # the JAX-native analogue of the reference's path-replay backprop
    # (`prb.py:63-258`): replay instead of taping, with identical RNG by
    # construction (counter-based streams).
    #
    # At SHALLOW depths remat is a pure tax: the fused sunsky blocks
    # already recompute their forward inside the adjoint kernel (their
    # linearisation residuals are just the inputs), so checkpointing the
    # bounce forces a second forward run of the Pallas kernels per bounce
    # for nothing (~25% of the fwd+bwd step at depth 2). Residual memory
    # for <=4 bounces is tens of floats/lane — far below HBM pressure.
    if max_depth > 1:
        body = bounce if max_depth <= 4 else jax.checkpoint(bounce)
        state, _ = jax.lax.scan(body, init, jnp.arange(max_depth - 1))
    else:
        state = init

    # Final path vertex: only the emitter-hit contribution can remain, so
    # skip the NEE/BSDF/RR machinery the full bounce would compute and
    # mask off (a ~25% saving at direct-illumination depths).
    t, p, ng, uv, shape_idx, hit = ray_intersect(scene.shapes, state.o,
                                                 state.d)
    if scene.mesh is not None:
        tm, nm, matm, _b1, _b2, _tri, hitm = mesh_intersect(scene.mesh,
                                                            state.o, state.d)
        use_mesh = hitm & (tm < t)
        ng = jnp.where(use_mesh[..., None], nm, ng)
        shape_idx = jnp.where(use_mesh, -2, shape_idx)
        hit = hit | hitm
    if scene.sdf is not None:
        from .sdf import sdf_intersect as _sdi
        ts_, ns_, hs_ = _sdi(scene.sdf, state.o, state.d)
        use_sdf = hs_ & (ts_ < t)
        t = jnp.where(use_sdf, ts_, t)
        ng = jnp.where(use_sdf[..., None], ns_, ng)
        shape_idx = jnp.where(use_sdf, -3, shape_idx)
        hit = hit | use_sdf
    if scene.curve is not None:
        from .curve import curve_intersect as _cvi
        tc_, nc_, _mc_, hc_, _tg_ = _cvi(scene.curve, state.o, state.d)
        use_cv = hc_ & (tc_ < t)
        t = jnp.where(use_cv, tc_, t)
        ng = jnp.where(use_cv[..., None], nc_, ng)
        shape_idx = jnp.where(use_cv, -4, shape_idx)
        hit = hit | use_cv
    escaped = state.active & ~hit
    if scene.medium is not None:
        # (density-march) transmittance to the final emissive vertex
        t_eff = jnp.where(hit, t, jnp.inf)
        T_fin = medium_mod.stack_transmittance(scene.medium, state.o,
                                               state.d, t_eff)
    else:
        T_fin = 1.0
    if scene.env is not None:
        env_L, em_pdf_raw = em.env_eval_pdf(scene.env, state.d,
                                            scene.env_to_world,
                                            wavelengths, mode,
                                            pdf_detached=True)
        em_pdf = jnp.where(state.prev_bsdf_delta, 0.0, em_pdf_raw)
    else:
        env_L = _env_radiance(scene, state.d, wavelengths, mode)
        em_pdf = jnp.zeros_like(state.prev_bsdf_pdf)
    mis_em = _mis_weight(state.prev_bsdf_pdf, sg(em_pdf))
    result = state.result + jnp.where(
        escaped[..., None],
        state.throughput * T_fin * env_L * mis_em[..., None], 0.0)
    n_area = scene.area_emitter_shapes.shape[0]
    area_rows = take_rows(scene.area_radiance, jnp.maximum(shape_idx, 0))
    if wavelengths is not None:
        if n_area > 0:
            from ..ops.rgb2spec import fit_sigmoid_coeffs_jnp
            area_rows = _spec_rows(fit_sigmoid_coeffs_jnp(
                scene.area_radiance), jnp.maximum(shape_idx, 0),
                wavelengths)
        else:
            area_rows = jnp.mean(area_rows, axis=-1, keepdims=True)
    facing = (dot(ng, -state.d) > 0.0) & (shape_idx >= 0)
    if n_area > 0:
        area_pdf = em.area_pdf_direction(scene, state.o, p, ng,
                                         jnp.maximum(shape_idx, 0))
        area_pdf = jnp.where(state.prev_bsdf_delta, 0.0, area_pdf)
        mis_area = _mis_weight(state.prev_bsdf_pdf, sg(area_pdf))
    else:
        mis_area = jnp.ones_like(state.prev_bsdf_pdf)
    result = result + jnp.where(
        (state.active & hit & facing)[..., None],
        state.throughput * T_fin * area_rows * mis_area[..., None], 0.0)
    return result


def _render_rows_chunk(scene, sensor, film_cfg, key, spp, spp0, spp_chunk,
                       max_depth, rr_depth, mode, row0, n_rows, vma_axes=(),
                       sampler_kind="independent", kinds=None, nmaps=False,
                       tkinds=None):
    """Render `spp_chunk` of `spp` samples for a block of film rows.

    Returns an accumulation block (n_rows, W, C+1). RNG is keyed on the
    *global* lane index (pixel * spp + sample index), so the image is
    invariant both to row sharding across devices and to spp chunking
    (SURVEY.md §7 item 8).
    """
    h, w = film_cfg.height, film_cfg.width
    cx0, cy0, cw, _ch = film_mod.crop_extent(film_cfg)
    n = n_rows * cw * spp_chunk
    local_lane = jnp.arange(n, dtype=jnp.uint32)
    local_pixel = local_lane // spp_chunk
    # full-film pixel id: RNG keys stay crop-invariant (`hdrfilm.cpp:137`
    # semantics — a crop renders the same samples as that window of the
    # full film), so crop == full-render window bitwise for box filters
    px_full = jnp.uint32(cx0) + local_pixel % cw
    py_full = jnp.uint32(cy0) + jnp.uint32(row0) + local_pixel // cw
    pixel = py_full * jnp.uint32(w) + px_full
    sample_idx = jnp.uint32(spp0) + local_lane % spp_chunk
    px = px_full.astype(jnp.float32)
    py = py_full.astype(jnp.float32)

    smp = _SamplerCtx(sampler_kind, key, pixel, sample_idx, spp)
    u_pos = smp.next(10_000, 2)
    u_lens = smp.next(10_001, 2)
    pix_x = px + u_pos[:, 0]
    pix_y = py + u_pos[:, 1]
    uv = jnp.stack([pix_x / w, pix_y / h], axis=-1)

    o, d = sensors_mod.sample_ray(sensor, uv, u_lens)
    if mode == "spectral" and film_cfg.srfs is not None:
        # specfilm with per-channel sensor response functions
        # (`specfilm.cpp`): wavelengths importance-sampled from the
        # COMBINED SRF, channels weighted by their own SRF / pdf
        from . import spectra as srf_mod
        u_wl = smp.next(20_000, 1)[..., 0]
        wavelengths, wl_pdf = srf_mod.srf_sample_wavelengths(
            film_cfg.srfs, u_wl, 4)
        spec_radiance = _path_sample(scene, o, d, smp, max_depth,
                                     rr_depth, mode, wavelengths,
                                     vma_axes=vma_axes, kinds=kinds,
                                     nmaps=nmaps, tkinds=tkinds)
        radiance = srf_mod.srf_accumulate(
            film_cfg.srfs, wavelengths,
            spec_radiance / jnp.maximum(wl_pdf, 1e-12))
    elif mode == "spectral" and film_cfg.bands is not None:
        # specfilm path (reference `src/films/specfilm.cpp`): hero
        # wavelengths sampled uniformly over the band range; each output
        # channel accumulates its band's radiance estimate
        from ..ops import spectrum as spec_mod
        edges = film_cfg.bands
        lo, hi = float(edges[0]), float(edges[-1])
        u_wl = smp.next(20_000, 1)[..., 0]
        shifted = spec_mod.sample_shifted(u_wl, 4)
        wavelengths = lo + (hi - lo) * shifted
        wl_weight = hi - lo                     # 1 / uniform pdf
        spec_radiance = _path_sample(scene, o, d, smp, max_depth,
                                     rr_depth, mode, wavelengths,
                                     vma_axes=vma_axes, kinds=kinds,
                                     nmaps=nmaps, tkinds=tkinds)
        radiance = film_mod.spectral_band_accumulate(
            wavelengths, spec_radiance * wl_weight, jnp.asarray(edges))
        # per-band mean -> spectral radiance density: divide by band width
        widths = jnp.asarray(edges)[1:] - jnp.asarray(edges)[:-1]
        radiance = radiance / widths
    elif mode == "spectral":
        # hero-wavelength transport: 4 stratified wavelengths per path,
        # importance-sampled for RGB sensor response (the reference's
        # `sample_rgb_spectrum`, `spectrum.h:445-455`), converted to sRGB
        # at splat time via the CIE tables.
        from ..ops import spectrum as spec_mod
        u_wl = smp.next(20_000, 1)[..., 0]
        shifted = spec_mod.sample_shifted(u_wl, 4)
        wavelengths, wl_weight = spec_mod.sample_rgb_spectrum(shifted)
        spec_radiance = _path_sample(scene, o, d, smp, max_depth,
                                     rr_depth, mode, wavelengths,
                                     vma_axes=vma_axes, kinds=kinds,
                                     nmaps=nmaps, tkinds=tkinds)
        radiance = spec_mod.spectrum_to_srgb(spec_radiance * wl_weight,
                                             wavelengths)
    else:
        radiance = _path_sample(scene, o, d, smp, max_depth,
                                rr_depth, mode, None, vma_axes=vma_axes,
                                kinds=kinds, nmaps=nmaps, tkinds=tkinds)
    radiance = jnp.where(jnp.isfinite(radiance), radiance, 0.0)

    block_film = film_mod.Film(n_rows, cw, film_cfg.n_channels,
                               film_cfg.rfilter)
    if film_cfg.rfilter == "box":
        # lanes are pixel-ordered by construction: dense reduction, no
        # scatter (film.splat_ordered) — ~20x faster on TPU
        return film_mod.splat_ordered(block_film, radiance, spp_chunk)
    local_y = pix_y - jnp.float32(cy0 + row0)
    local_x = pix_x - jnp.float32(cx0)
    return film_mod.splat(block_film, jnp.stack([local_x, local_y], -1),
                          radiance)


def render_rows(scene, sensor, film_cfg, key, spp, max_depth, rr_depth,
                mode, row0, n_rows, vma_axes=(), max_lanes=(1 << 20),
                sampler_kind="independent", kinds=None, nmaps=False,
                tkinds=None):
    """Render a block of film rows -> (n_rows, W, C+1).

    Bounds the live wavefront to `max_lanes` lanes by scanning over spp
    chunks; XLA reuses the chunk buffers across scan iterations. (The
    reference bounds its wavefront the same way with multi-pass splitting,
    `integrator.cpp:247-265`.)
    """
    w = film_mod.crop_extent(film_cfg)[2]
    chunk_cap = max(1, min(spp, max_lanes // max(n_rows * w, 1)))
    # smallest divisor-of-spp chunking whose chunk fits the lane budget
    spp_chunk = next(c for c in range(chunk_cap, 0, -1) if spp % c == 0)
    n_chunks = spp // spp_chunk

    if n_chunks == 1:
        return _render_rows_chunk(scene, sensor, film_cfg, key, spp, 0, spp,
                                  max_depth, rr_depth, mode, row0, n_rows,
                                  vma_axes, sampler_kind, kinds, nmaps,
                                  tkinds)

    def chunk(accum, ci):
        a = _render_rows_chunk(scene, sensor, film_cfg, key, spp,
                               ci * spp_chunk, spp_chunk, max_depth,
                               rr_depth, mode, row0, n_rows, vma_axes,
                               sampler_kind, kinds, nmaps, tkinds)
        return accum + a, None

    init = jnp.zeros((n_rows, w, film_cfg.n_channels + 1))
    if vma_axes:
        init = jax.lax.pcast(init, vma_axes, to="varying")
    accum, _ = jax.lax.scan(chunk, init, jnp.arange(n_chunks))
    return accum


def _megakernel_ok(scene, sensor, film_cfg, spp, max_depth, mode,
                   sampler_kind, kinds, rr_depth=1000) -> bool:
    """Static eligibility for the fused direct-illumination megakernel
    (ops/pallas/megakernel.py). Everything checked here is pytree aux
    data / Python config — no traced values."""
    import os
    if os.environ.get("TPUSKY_DISABLE_PALLAS") == "1":
        return False
    if jax.default_backend() != "tpu" and not os.environ.get(
            "TPUSKY_MEGAKERNEL_INTERPRET"):
        return False
    from ..models.sunsky.model import SunskyState
    if not (mode == "rgb" and max_depth == 2
            and sampler_kind == "independent"
            and film_cfg.rfilter == "box" and film_cfg.n_channels == 3
            and film_cfg.crop_size is None):
        return False
    # the megakernel has no Russian-roulette logic; require that RR can
    # never trigger before the path terminates (depth 2 -> RR off)
    if rr_depth <= max_depth - 1:
        return False
    if not isinstance(scene.env, SunskyState):
        return False
    if (scene.mesh is not None or scene.sdf is not None
            or scene.curve is not None or scene.medium is not None
            or scene.textures is not None or scene.spot_lights):
        return False
    if kinds is None or kinds != ((0,), False):   # diffuse-only, no masks
        return False
    if any(k not in (0, 1, 2) for k in scene.shapes.kind):
        return False
    if not isinstance(sensor, sensors_mod.Perspective):
        return False
    # delta/area emitters are traced arrays with static shapes
    if (scene.point_lights.shape[0] or scene.directional_lights.shape[0]
            or scene.area_emitter_shapes.shape[0]):
        return False
    w, h = film_cfg.width, film_cfg.height
    # spp must be a power of two (in-kernel lane->pixel shift); width may
    # be arbitrary (exact f32 div-mod) as long as pixel ids stay exact
    if spp & (spp - 1) or w * h >= (1 << 24):
        return False
    return True


@partial(jax.jit,
         static_argnames=("film_cfg", "spp", "max_depth", "rr_depth",
                          "mode", "sampler_kind", "kinds", "nmaps",
                          "tkinds"))
def _render_impl(scene, sensor, film_cfg, key, spp, max_depth, rr_depth,
                 mode, sampler_kind="independent", kinds=None, nmaps=False,
                 tkinds=None):
    if _megakernel_ok(scene, sensor, film_cfg, spp, max_depth, mode,
                      sampler_kind, kinds, rr_depth):
        import os
        from ..ops.pallas.megakernel import direct_rgb_megakernel

        @jax.custom_jvp
        def mega(sc, se, k):
            h_, w_ = film_cfg.height, film_cfg.width
            hw = h_ * w_
            smaj = hw & (hw - 1) == 0
            rows = direct_rgb_megakernel(
                sc, se, sc.env, k, spp, w_, h_,
                interpret=bool(
                    os.environ.get("TPUSKY_MEGAKERNEL_INTERPRET")),
                lane_major=True, sample_major=smaj)
            # lane-major box splat, no (N, 3) relayout (see
            # direct_rgb_megakernel docstring). sample-major: the spp
            # reduction is spp contiguous chunk adds (vector adds at HBM
            # speed); pixel-major fallback: spp-strided reduce_window.
            if smaj:
                acc = sum(rows[:, s_ * hw:(s_ + 1) * hw]
                          for s_ in range(spp))
            else:
                acc = jax.lax.reduce_window(rows, 0.0, jax.lax.add,
                                            (1, spp), (1, spp), "VALID")
            acc = jnp.where(jnp.isfinite(acc), acc, 0.0)
            img = acc.T.reshape(h_, w_, 3)
            wgt = jnp.full((h_, w_, 1), jnp.float32(spp))
            return jnp.concatenate([img, wgt], -1)

        @mega.defjvp
        def mega_jvp(primals, tangents):
            # AD never touches the kernel: both primal and tangent come
            # from the pure-jnp wavefront path (same estimator)
            def f(sc, se, k):
                return render_rows(sc, se, film_cfg, k, spp, max_depth,
                                   rr_depth, mode, 0,
                                   film_mod.crop_extent(film_cfg)[3],
                                   sampler_kind=sampler_kind, kinds=kinds,
                                   nmaps=nmaps, tkinds=tkinds)
            return jax.jvp(f, primals, tangents)

        return mega(scene, sensor, key)
    return render_rows(scene, sensor, film_cfg, key, spp, max_depth,
                       rr_depth, mode, 0, film_mod.crop_extent(film_cfg)[3],
                       sampler_kind=sampler_kind, kinds=kinds, nmaps=nmaps,
                       tkinds=tkinds)


@partial(jax.jit,
         static_argnames=("film_cfg", "spp", "max_depth", "rr_depth",
                          "mode", "sampler_kind", "kinds", "nmaps"))
def _render_moments_impl(scene, sensor, film_cfg, key, spp, max_depth,
                         rr_depth, mode, sampler_kind="independent",
                         kinds=None, nmaps=False):
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
        # hero-wavelength transport -> sRGB, same streams as _render_impl
        from ..ops import spectrum as spec_mod
        u_wl = smp.next(20_000, 1)[..., 0]
        shifted = spec_mod.sample_shifted(u_wl, 4)
        wavelengths, wl_weight = spec_mod.sample_rgb_spectrum(shifted)
        spec_radiance = _path_sample(scene, o, d, smp, max_depth,
                                     rr_depth, mode, wavelengths,
                                     kinds=kinds, nmaps=nmaps)
        radiance = spec_mod.spectrum_to_srgb(spec_radiance * wl_weight,
                                             wavelengths)
    else:
        radiance = _path_sample(scene, o, d, smp, max_depth, rr_depth,
                                mode, None, kinds=kinds, nmaps=nmaps)
    radiance = jnp.where(jnp.isfinite(radiance), radiance, 0.0)
    both = jnp.concatenate([radiance, radiance * radiance], axis=-1)
    film2 = film_mod.Film(h, w, 2 * film_cfg.n_channels, "box")
    accum = film_mod.splat_ordered(film2, both, spp)
    img = film_mod.develop(accum)
    c = film_cfg.n_channels
    return img[..., :c], img[..., c:]


def render_moments(scene: Scene, sensor, film: film_mod.Film, key,
                   spp: int = 16, max_depth: int = 2, rr_depth: int = 1000,
                   mode: str = "rgb", sampler_kind: str = "independent"):
    """Mean image + per-pixel second moment E[x^2] (the reference's
    `moment.cpp` integrator, used to build the Z-test reference data in
    `test_renders.py:159`). Variance = m2 - mean^2. The mean is bitwise
    identical to `render(...)` at the same seed/spp (same RNG stream)."""
    return _render_moments_impl(scene, sensor, film,
                                jax.random.fold_in(key, 0), spp, max_depth,
                                rr_depth, mode, sampler_kind,
                                kinds=bsdf_mod.table_kinds(scene.bsdfs),
                                nmaps=bsdf_mod.table_normal_maps(
                                    scene.bsdfs))


def render(scene: Scene, sensor, film: film_mod.Film, key, spp: int = 16,
           max_depth: int = 2, rr_depth: int = 1000, mode: str = "rgb",
           passes: int = 1, sampler_kind: str = "independent"):
    """Render an RGB image -> (H, W, C).

    `max_depth` counts vertices excluding the camera (2 = direct
    illumination, matching the reference's convention). For large
    spp, raise `passes` to bound the wavefront size; pass results are
    averaged through the film weights.
    """
    kinds = bsdf_mod.table_kinds(scene.bsdfs)
    nmaps = bsdf_mod.table_normal_maps(scene.bsdfs)
    from .texture import table_texture_kinds
    tkinds = table_texture_kinds(scene.textures)
    accum = None
    for p in range(passes):
        pass_key = jax.random.fold_in(key, p)
        a = _render_impl(scene, sensor, film, pass_key, spp // passes,
                         max_depth, rr_depth, mode, sampler_kind, kinds,
                         nmaps, tkinds)
        accum = a if accum is None else accum + a
    return film_mod.develop(accum)
