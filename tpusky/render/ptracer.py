"""Adjoint particle tracer (light tracing).

TPU-native counterpart of the reference's `ptracer.cpp` /
`AdjointIntegrator` (`integrator.cpp:545`, SURVEY.md H4): particles start
on emitters, random-walk through the scene, and every vertex splats its
contribution through the camera's importance function. The wavefront is
one SoA tensor program; the bounce loop is a `lax.scan` whose carry
includes the flat film accumulator (deterministic `segment_sum` splats).

Measurement convention: the forward tracer defines a pixel's value as the
mean of incident radiance over the pixel footprint, so the importance of
a pinhole perspective camera in solid-angle measure is
``W(omega) = (H*W) / (A * cos^3 theta)`` with ``A = 4 tan^2(fov/2)/aspect``
the film-plane area at unit distance — derived from
``d(uv) = d(omega) / (A cos^3 theta)``.

Supported emitters: area (shape-attached), point, spot/projector,
directional-area (delta direction — the emitter the reference adds
specifically for light tracing), and the environment (sunsky / constant /
envmap, launched inward from the scene bounding sphere). Environment
radiance seen *directly* by camera rays has zero probability of being
sampled by a particle path; combine with a depth-1 forward pass if the
sky is directly visible (the reference ptracer shares this limitation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warp
from ..ops.gather import take_ints
from ..ops.math import Frame, dot
from . import bsdf as bsdf_mod
from . import emitters as em
from . import film as film_mod
from .integrator import _SamplerCtx, _SHADOW_EPS
from .mesh import mesh_intersect, mesh_test
from .scene import Scene
from .sensors import Perspective
from .shapes import ray_intersect, ray_test, sample_position


def _sensor_connect(sensor: Perspective, p):
    """Importance connection p -> pinhole camera.

    Returns (pixel_xy, w_cam, d_to_cam, dist, valid): splat value =
    beta * f*cos(theta_p) * w_cam where w_cam = (H*W normalisation applied
    by the caller) / (A cos^3 theta * dist^2)."""
    cam = sensor.to_world[:3, 3]
    to_cam = cam - p
    dist2 = jnp.sum(to_cam * to_cam, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    d = to_cam / dist[..., None]
    # direction from the camera toward p, in camera space
    d_cam = jnp.einsum("ji,...j->...i", sensor.to_world[:3, :3], -d, precision=jax.lax.Precision.HIGHEST)
    z = d_cam[..., 2]
    valid = z > 1e-6
    zs = jnp.maximum(z, 1e-6)
    x = d_cam[..., 0] / zs
    y = d_cam[..., 1] / zs
    tan_half = jnp.tan(0.5 * jnp.deg2rad(sensor.fov_x_deg))
    u = 0.5 * (x / tan_half + 1.0)
    v = 0.5 * (1.0 - y * sensor.aspect / tan_half)
    inside = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
    area = 4.0 * tan_half * tan_half / sensor.aspect
    w_cam = 1.0 / (area * zs * zs * zs * jnp.maximum(dist2, 1e-12))
    return (jnp.stack([u, v], -1), jnp.where(valid & inside, w_cam, 0.0),
            d, dist, valid & inside)


def _occluded(scene: Scene, o, d, maxt):
    from .scene import scene_occluded
    occ = scene_occluded(scene, o, d, maxt)
    return occ


def _splat(film_cfg, accum, pixel_uv01, value, ok):
    h, w = film_cfg.height, film_cfg.width
    px = jnp.clip((pixel_uv01[..., 0] * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((pixel_uv01[..., 1] * h).astype(jnp.int32), 0, h - 1)
    flat = py * w + px
    contrib = jnp.where(ok[..., None], value, 0.0)
    return accum + jax.ops.segment_sum(contrib, flat, num_segments=h * w)


@partial(jax.jit, static_argnames=("film_cfg", "n_particles", "max_depth",
                                   "strategies", "sampler_kind", "kinds",
                                   "mode"))
def _ptracer_impl(scene, sensor, film_cfg, key, n_particles, max_depth,
                  strategies, sampler_kind="independent", kinds=None,
                  mode="rgb"):
    h, w = film_cfg.height, film_cfg.width
    n = n_particles
    lane = jnp.arange(n, dtype=jnp.uint32)
    smp = _SamplerCtx(sampler_kind, key, lane, jnp.zeros_like(lane), 1)
    n_strat = len(strategies)
    u_strat = smp.next(50_000, 1)[..., 0]
    strat = jnp.clip((u_strat * n_strat).astype(jnp.int32), 0, n_strat - 1)

    # ---- hero wavelengths (spectral mode; `ptracer.cpp` is variant-
    # generic, SURVEY H4). Env particles importance-sample the emitter's
    # precomputed spectral distribution (`model.sample_wavelengths`,
    # reference `sunsky.cpp:463`); the rest use the RGB-sensor-response
    # distribution the camera-path tracer uses. Each lane's estimator is
    # unbiased under its own wavelength density; splats convert to sRGB.
    wavelengths = None
    wl_weight = None
    n_chan = 3
    emit_cf = None
    if mode == "spectral":
        from ..ops import spectrum as spec_mod
        from ..models.sunsky import model as sunsky_model
        u_wl = smp.next(50_004, 1)[..., 0]
        shifted = spec_mod.sample_shifted(u_wl, 4)
        wavelengths, wl_weight = spec_mod.sample_rgb_spectrum(shifted)
        if "env" in strategies and isinstance(scene.env,
                                              sunsky_model.SunskyState):
            wl_env, pdf_env = sunsky_model.sample_wavelengths(
                scene.env, u_wl)
            env_sel = (strat == strategies.index("env"))[..., None]
            wavelengths = jnp.where(env_sel, wl_env, wavelengths)
            wl_weight = jnp.where(
                env_sel, 1.0 / jnp.maximum(pdf_env, 1e-9), wl_weight)
        n_chan = 4
        from ..ops.rgb2spec import fit_sigmoid_coeffs_jnp as _fit
        emit_cf = dict(
            area=(_fit(scene.area_radiance)
                  if scene.area_emitter_shapes.shape[0] else None),
            dir_area=(_fit(scene.dir_area_radiance)
                      if scene.dir_area_radiance is not None else None),
            point=(_fit(scene.point_lights[:, 3:])
                   if scene.point_lights.shape[0] else None),
            spot=tuple(_fit(light.intensity)
                       for light in scene.spot_lights))

    def to_rgb(spec):
        """Per-lane contribution -> splat RGB."""
        if mode != "spectral":
            return spec
        from ..ops import spectrum as spec_mod
        return spec_mod.spectrum_to_srgb(spec * wl_weight, wavelengths)

    def emit_spec(rgb_rows, coeffs, rows_idx=None):
        """Emitter quantity -> per-lane spectrum (rgb2spec upsampled) or
        the RGB rows unchanged in RGB mode."""
        if mode != "spectral":
            return rgb_rows
        from ..ops.rgb2spec import eval_emitter_coeff_spectrum
        from ..ops.gather import take_rows as _tr
        cf = _tr(coeffs, rows_idx) if rows_idx is not None else coeffs
        return eval_emitter_coeff_spectrum(cf, wavelengths)

    accum = jnp.zeros((h * w, 3))
    o = jnp.zeros((n, 3))
    d = jnp.zeros((n, 3))
    beta = jnp.zeros((n, n_chan))
    u_e = smp.next(50_001, 2)
    u_d = smp.next(50_002, 2)

    for si, name in enumerate(strategies):
        sel = strat == si
        scale = float(n_strat)       # 1 / (1/n_strat strategy pmf)
        if name == "area":
            n_area = scene.area_emitter_shapes.shape[0]
            u_pick = smp.next(50_003, 1)[..., 0]
            pick = jnp.clip((u_pick * n_area).astype(jnp.int32), 0,
                            n_area - 1)
            shape_idx = take_ints(scene.area_emitter_shapes, pick)
            p_e, n_e, inv_area = sample_position(scene.shapes, shape_idx,
                                                 u_e)
            from ..ops.gather import take_rows
            L = take_rows(scene.area_radiance, shape_idx)
            if mode == "spectral":
                L = emit_spec(L, emit_cf["area"], shape_idx)
            # cosine-weighted emission direction about the normal
            frame_e = Frame(n_e)
            d_loc = warp.square_to_cosine_hemisphere(u_d)
            d_e = frame_e.to_world(d_loc)
            # alpha = L cos / (pdf_pos pdf_dir) = L * pi / (inv_area/n_area)
            a0 = L * (jnp.pi / jnp.maximum(inv_area / n_area, 1e-12)
                      )[..., None]
            # direct emitter->camera splat: L cos_e / (pdf_pos d^2) * W
            uv_c, w_c, d_c, dist_c, ok_c = _sensor_connect(sensor, p_e)
            cos_c = jnp.maximum(dot(n_e, d_c), 0.0)
            off = p_e + n_e * _SHADOW_EPS
            occ = _occluded(scene, off, d_c, dist_c * (1 - 1e-3))
            direct = to_rgb(L * (cos_c * w_c / jnp.maximum(
                inv_area / n_area, 1e-12))[..., None] * scale)
            accum = _splat(film_cfg, accum, uv_c, direct,
                           sel & ok_c & ~occ & (cos_c > 0))
            o_s = p_e + n_e * _SHADOW_EPS
        elif name == "dir_area":
            # directional-area (`directionalarea.cpp`): delta direction
            # along the surface normal; alpha = L * A (no cosine term)
            n_shapes = len(scene.shapes.kind)
            u_pick = smp.next(50_003, 1)[..., 0]
            shape_idx = jnp.clip((u_pick * n_shapes).astype(jnp.int32), 0,
                                 n_shapes - 1)
            p_e, n_e, inv_area = sample_position(scene.shapes, shape_idx,
                                                 u_e)
            from ..ops.gather import take_rows
            L = take_rows(scene.dir_area_radiance, shape_idx)
            if mode == "spectral":
                L = emit_spec(L, emit_cf["dir_area"], shape_idx)
            d_e = n_e
            a0 = L * (1.0 / jnp.maximum(inv_area / n_shapes, 1e-12)
                      )[..., None]
            o_s = p_e + n_e * _SHADOW_EPS
        elif name == "point":
            # all point lights, picked uniformly (static unroll)
            n_pt = scene.point_lights.shape[0]
            u_pick = smp.next(50_003, 1)[..., 0]
            pick = jnp.clip((u_pick * n_pt).astype(jnp.int32), 0, n_pt - 1)
            p_e = jnp.zeros((n, 3))
            inten = jnp.zeros((n, n_chan))
            for li in range(n_pt):
                m = (pick == li)[..., None]
                p_e = jnp.where(m, scene.point_lights[li, :3], p_e)
                I_li = (scene.point_lights[li, 3:] if mode != "spectral"
                        else emit_spec(None, emit_cf["point"][li]))
                inten = jnp.where(m, I_li, inten)
            d_e = warp.square_to_uniform_sphere(u_d)
            a0 = inten * (4.0 * jnp.pi * n_pt)
            uv_c, w_c, d_c, dist_c, ok_c = _sensor_connect(sensor, p_e)
            occ = _occluded(scene, p_e, d_c, dist_c * (1 - 1e-3))
            accum = _splat(film_cfg, accum, uv_c,
                           to_rgb(inten * (w_c * n_pt * scale)[..., None]),
                           sel & ok_c & ~occ)
            o_s = p_e
        elif name == "spot":
            n_sp = len(scene.spot_lights)
            u_pick = smp.next(50_003, 1)[..., 0]
            pick = jnp.clip((u_pick * n_sp).astype(jnp.int32), 0, n_sp - 1)
            p_e = jnp.zeros((n, 3))
            d_e = jnp.zeros((n, 3))
            fall = jnp.zeros((n, 3))
            solid = jnp.zeros((n,))
            for li, light in enumerate(scene.spot_lights):
                m = pick == li
                frame_l = Frame(jnp.broadcast_to(light.direction, (n, 3)))
                d_cone = warp.square_to_uniform_cone(u_d, light.cos_cutoff)
                d_w = frame_l.to_world(d_cone)
                p_e = jnp.where(m[..., None], light.position, p_e)
                d_e = jnp.where(m[..., None], d_w, d_e)
                fall = jnp.where(m[..., None], em.spot_falloff(light, d_w),
                                 fall)
                solid = jnp.where(
                    m, 2.0 * jnp.pi * (1.0 - light.cos_cutoff), solid)
            def spot_spec(fall_rgb, pick_v):
                """RGB falloff -> spectral intensity x scalar modulation
                ratio (the camera-path tracer's spot convention)."""
                if mode != "spectral":
                    return fall_rgb
                out = jnp.zeros((n, n_chan))
                for li, light in enumerate(scene.spot_lights):
                    ratio = (jnp.sum(fall_rgb, -1)
                             / jnp.maximum(jnp.sum(light.intensity), 1e-12))
                    I_s = (emit_spec(None, emit_cf["spot"][li])
                           * ratio[..., None])
                    out = jnp.where((pick_v == li)[..., None], I_s, out)
                return out

            a0 = spot_spec(fall, pick) * (solid * n_sp)[..., None]
            uv_c, w_c, d_c, dist_c, ok_c = _sensor_connect(sensor, p_e)
            fall_c = jnp.zeros((n, 3))
            for li, light in enumerate(scene.spot_lights):
                fall_c = jnp.where((pick == li)[..., None],
                                   em.spot_falloff(light, d_c), fall_c)
            occ = _occluded(scene, p_e, d_c, dist_c * (1 - 1e-3))
            accum = _splat(film_cfg, accum, uv_c,
                           to_rgb(spot_spec(fall_c, pick)
                                  * (w_c * n_sp * scale)[..., None]),
                           sel & ok_c & ~occ)
            o_s = p_e
        else:  # environment: inward from the bounding sphere
            d_sky, pdf_dir = em.env_sample_direction(scene.env,
                                                     scene.env_to_world, u_e)
            L = em.env_eval(scene.env, d_sky, scene.env_to_world,
                            wavelengths=wavelengths, mode=mode)
            r = scene.bsphere_radius
            frame_s = Frame(d_sky)
            disk = warp.square_to_uniform_disk_concentric(u_d) * r
            o_disk = (scene.bsphere_center + r * d_sky
                      + frame_s.to_world(jnp.concatenate(
                          [disk, jnp.zeros_like(disk[..., :1])], -1)))
            d_e = -d_sky
            pdf_pos = 1.0 / (jnp.pi * r * r)
            a0 = L / jnp.maximum(pdf_dir * pdf_pos, 1e-20)[..., None]
            p_e = o_disk
            o_s = o_disk

        o = jnp.where(sel[..., None], o_s, o)
        d = jnp.where(sel[..., None], d_e, d)
        beta = jnp.where(sel[..., None], a0 * scale, beta)

    active0 = jnp.any(beta > 0, axis=-1)

    def bounce(carry, depth):
        o, d, beta, active, accum = carry
        t, p, ng, _uv, shape_idx, hit = ray_intersect(scene.shapes, o, d)
        mesh_mat = None
        if scene.mesh is not None:
            tm, nm, matm, _b1, _b2, _tri, hitm = mesh_intersect(scene.mesh,
                                                                o, d)
            use_mesh = hitm & (tm < t)
            t = jnp.where(use_mesh, tm, t)
            p = jnp.where(use_mesh[..., None], o + tm[..., None] * d, p)
            ng = jnp.where(use_mesh[..., None], nm, ng)
            shape_idx = jnp.where(use_mesh, -2, shape_idx)
            hit = hit | hitm
            mesh_mat = (use_mesh, matm)
        sdf_sel = None
        if scene.sdf is not None:
            from .sdf import sdf_intersect
            ts_, ns_, hs_ = sdf_intersect(scene.sdf, o, d)
            use_sdf = hs_ & (ts_ < t)
            t = jnp.where(use_sdf, ts_, t)
            p = jnp.where(use_sdf[..., None], o + ts_[..., None] * d, p)
            ng = jnp.where(use_sdf[..., None], ns_, ng)
            shape_idx = jnp.where(use_sdf, -3, shape_idx)
            hit = hit | use_sdf
            sdf_sel = use_sdf
        active = active & hit

        frame = Frame(ng)
        wi_local = frame.to_local(-d)
        mat_idx = take_ints(scene.shapes.bsdf_idx, jnp.maximum(shape_idx, 0))
        if mesh_mat is not None:
            mat_idx = jnp.where(mesh_mat[0], mesh_mat[1], mat_idx)
        if sdf_sel is not None:
            mat_idx = jnp.where(sdf_sel, scene.sdf.bsdf_idx, mat_idx)

        # connect this vertex to the camera
        uv_c, w_c, d_c, dist_c, ok_c = _sensor_connect(sensor, p)
        wo_c = frame.to_local(d_c)
        f_c, _ = bsdf_mod.eval_pdf(scene.bsdfs, mat_idx, wi_local, wo_c,
                                   wavelengths, kinds=kinds)
        off = p + jnp.sign(dot(ng, d_c))[..., None] * ng * _SHADOW_EPS
        occ = _occluded(scene, off, d_c, dist_c * (1 - 1e-3))
        accum = _splat(film_cfg, accum, uv_c,
                       to_rgb(beta * f_c * w_c[..., None]),
                       active & ok_c & ~occ)

        # continue the walk
        u_b = smp.next(60_000 + 3 * depth, 3)
        wo, weight, pdf_b, _is_delta = bsdf_mod.sample(
            scene.bsdfs, mat_idx, wi_local, u_b[..., :2], u_b[..., 2],
            wavelengths, kinds=kinds)
        d_next = frame.to_world(wo)
        beta = beta * weight
        active = active & (pdf_b > 0.0) & jnp.any(beta > 0, axis=-1)
        off_n = p + jnp.sign(dot(ng, d_next))[..., None] * ng * _SHADOW_EPS
        o = jnp.where(active[..., None], off_n, o)
        d = jnp.where(active[..., None], d_next, d)
        return (o, d, beta, active, accum), None

    if max_depth > 1:
        (o, d, beta, active, accum), _ = jax.lax.scan(
            bounce, (o, d, beta, active0, accum),
            jnp.arange(max_depth - 1))

    norm = float(h * w) / float(n_particles)
    img = accum.reshape(h, w, 3) * norm
    return img


def render_ptracer(scene: Scene, sensor, film_cfg, key,
                   n_particles: int = 1 << 20, max_depth: int = 4,
                   sampler_kind: str = "independent", mode: str = "rgb"):
    """Light-traced image (H, W, 3); perspective sensor.

    mode='spectral' runs hero-wavelength transport (4 wavelengths per
    particle, env particles importance-sampled from the sunsky spectral
    distribution) and converts to sRGB at splat time — the reference's
    `ptracer.cpp` is variant-generic (SURVEY H4)."""
    if not isinstance(sensor, Perspective):
        raise TypeError("ptracer supports the perspective sensor")
    strategies = []
    if scene.area_emitter_shapes.shape[0] > 0:
        strategies.append("area")
    if scene.point_lights.shape[0] > 0:
        strategies.append("point")
    if len(scene.spot_lights) > 0:
        strategies.append("spot")
    if scene.dir_area_radiance is not None and bool(
            np.any(np.asarray(jax.device_get(scene.dir_area_radiance)) > 0)):
        strategies.append("dir_area")
    if scene.env is not None:
        strategies.append("env")
    if not strategies:
        return jnp.zeros((film_cfg.height, film_cfg.width, 3))
    return _ptracer_impl(scene, sensor, film_cfg, key, n_particles,
                         max_depth, tuple(strategies), sampler_kind,
                         kinds=bsdf_mod.table_kinds(scene.bsdfs),
                         mode=mode)
