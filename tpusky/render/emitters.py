"""Emitters: environment (sunsky / constant) and shape-attached area lights.

Counterpart of the reference's emitter plugins (SURVEY.md H6). The
environment emitter is dispatched statically on the pytree type — a scene
has one environment, so no vectorised virtual calls are needed (the
reference needs Dr.Jit vcalls for this, `scene.cpp:315`).

All directions here are world-space; the sunsky state's local frame is
reached through the scene's `env_to_world` rotation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.sunsky import model as sunsky
from ..ops import warp
from ..ops.gather import take_ints, take_scalars


class ConstantEnv(NamedTuple):
    """Uniform environment radiance from an RGB COLOR (reference
    `src/emitters/constant.cpp` with an srgb_d65 radiance): spectral eval
    routes through rgb2spec x D65 (the emitter convention)."""
    radiance: jnp.ndarray       # (C,)


class UniformEnv(NamedTuple):
    """Constant environment with a FLAT SPECTRUM (a scalar / uniform
    spectrum property — the reference's `uniform.cpp` texture on
    `constant.cpp`): in spectral mode the value holds at every
    wavelength, with no upsampling and no illuminant factor. A separate
    type (not a flag) so the distinction stays static under jit —
    NamedTuple fields are pytree LEAVES and a bool leaf would be
    traced."""
    radiance: jnp.ndarray       # (C,) equal channels


def env_eval(env, d_world, env_to_world, wavelengths=None, mode="rgb"):
    """Environment radiance toward world direction d (pointing at the sky)."""
    if isinstance(env, sunsky.SunskyState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world, precision=jax.lax.Precision.HIGHEST)
        return sunsky.eval(env, d_local, wavelengths=wavelengths, mode=mode)
    if isinstance(env, UniformEnv):
        shape = d_world.shape[:-1]
        if wavelengths is not None:
            # flat spectrum: the scalar radiance at every wavelength
            # (`uniform.cpp`) — no upsampling, no illuminant
            return jnp.broadcast_to(jnp.mean(env.radiance),
                                    wavelengths.shape)
        return jnp.broadcast_to(env.radiance, shape + env.radiance.shape)
    if isinstance(env, ConstantEnv):
        shape = d_world.shape[:-1]
        if wavelengths is not None:
            # rgb2spec upsampling (`srgb.cpp:14-38`) with the srgb_d65
            # emitter factor: fit once per trace (loop-invariant),
            # evaluate at the hero wavelengths
            from ..ops.rgb2spec import (eval_emitter_coeff_spectrum,
                                        fit_sigmoid_coeffs_jnp)
            cf = fit_sigmoid_coeffs_jnp(env.radiance)
            return jnp.broadcast_to(
                eval_emitter_coeff_spectrum(cf, wavelengths),
                wavelengths.shape)
        return jnp.broadcast_to(env.radiance, shape + env.radiance.shape)
    if isinstance(env, EnvMapState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world, precision=jax.lax.Precision.HIGHEST)
        if wavelengths is not None:
            if env.coeff is not None:
                # nearest-texel rgb2spec spectrum at the hero wavelengths
                from ..ops.rgb2spec import eval_emitter_coeff_spectrum
                h, w = env.bitmap.shape[:2]
                u, v = _envmap_uv(d_local)
                col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
                row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
                cf = env.coeff.reshape(-1, 4)[row * w + col]
                return env.scale * eval_emitter_coeff_spectrum(cf,
                                                               wavelengths)
            rgb = envmap_eval(env, d_local)
            return jnp.broadcast_to(jnp.mean(rgb, -1, keepdims=True),
                                    wavelengths.shape)
        return envmap_eval(env, d_local)
    raise TypeError(f"unknown environment {type(env)}")


def env_sample_direction(env, env_to_world, sample2):
    """Importance-sample a world direction toward the environment.

    Returns (d_world, pdf). For sunsky this is the TGMM+cone mixture; for a
    constant environment, uniform sphere.
    """
    if isinstance(env, sunsky.SunskyState):
        d_local, pdf = sunsky.sample_direction(env, sample2)
        d_world = jnp.einsum("ij,...j->...i", env_to_world, d_local, precision=jax.lax.Precision.HIGHEST)
        return d_world, pdf
    if isinstance(env, (ConstantEnv, UniformEnv)):
        d = warp.square_to_uniform_sphere(sample2)
        pdf = jnp.full(d.shape[:-1], warp.INV_FOUR_PI)
        return d, pdf
    if isinstance(env, EnvMapState):
        d_local, pdf = envmap_sample_direction(env, sample2)
        d_world = jnp.einsum("ij,...j->...i", env_to_world, d_local, precision=jax.lax.Precision.HIGHEST)
        return d_world, pdf
    raise TypeError(f"unknown environment {type(env)}")


def env_eval_pdf(env, d_world, env_to_world, wavelengths=None, mode="rgb",
                 pdf_detached=False):
    """(radiance, solid-angle pdf) toward d_world in one call — fused into
    a single Pallas pass for sunsky RGB (the emitter-hit MIS block).
    pdf_detached=True declares the render contract (pdf only used under
    stop_gradient) so the sunsky adjoint skips the pdf transpose."""
    if isinstance(env, sunsky.SunskyState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world, precision=jax.lax.Precision.HIGHEST)
        return sunsky.eval_pdf(env, d_local, wavelengths=wavelengths,
                               mode=mode, pdf_detached=pdf_detached)
    pdf = env_pdf_direction(env, env_to_world, d_world)
    if pdf_detached:
        pdf = jax.lax.stop_gradient(pdf)
    return (env_eval(env, d_world, env_to_world, wavelengths=wavelengths,
                     mode=mode), pdf)


def env_sample_eval(env, env_to_world, sample2, wavelengths=None,
                    mode="rgb", pdf_detached=False):
    """Importance-sample a world direction AND evaluate its radiance +
    pdf — the NEE block, fused into one Pallas pass for sunsky RGB.
    The returned direction is detached (sample placement); pdf_detached
    declares the render contract (see env_eval_pdf)."""
    if isinstance(env, sunsky.SunskyState):
        d_local, rad, pdf = sunsky.sample_eval(env, sample2,
                                               wavelengths=wavelengths,
                                               mode=mode,
                                               pdf_detached=pdf_detached)
        d_world = jnp.einsum("ij,...j->...i", env_to_world, d_local, precision=jax.lax.Precision.HIGHEST)
        return jnp.asarray(jax.lax.stop_gradient(d_world)), rad, pdf
    d_world, pdf = env_sample_direction(env, env_to_world, sample2)
    d_world = jnp.asarray(jax.lax.stop_gradient(d_world))
    if pdf_detached:
        pdf = jax.lax.stop_gradient(pdf)
    rad = env_eval(env, d_world, env_to_world, wavelengths=wavelengths,
                   mode=mode)
    return d_world, rad, pdf


def env_pdf_direction(env, env_to_world, d_world):
    if isinstance(env, sunsky.SunskyState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world, precision=jax.lax.Precision.HIGHEST)
        return sunsky.pdf_direction(env, d_local)
    if isinstance(env, (ConstantEnv, UniformEnv)):
        return jnp.full(d_world.shape[:-1], warp.INV_FOUR_PI)
    if isinstance(env, EnvMapState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world, precision=jax.lax.Precision.HIGHEST)
        return envmap_pdf_direction(env, d_local)
    raise TypeError(f"unknown environment {type(env)}")


# ---------------------------------------------------------------------------
# Delta position emitters: spot / projector
# ---------------------------------------------------------------------------


class SpotLight(NamedTuple):
    """Spot light with optional texture projection.

    Covers the reference's `spot.cpp` (cone with linear falloff between
    `cos_beam` and `cos_cutoff`, optional texture) and `projector.cpp`
    (perspective texture projection: set cos_beam == cos_cutoff for a hard
    frustum edge and attach a texture). One static NamedTuple per light —
    the scene holds a tuple, so the integrator unrolls them branch-free.
    """
    position: jnp.ndarray     # (3,)
    direction: jnp.ndarray    # (3,) unit, beam axis
    frame_x: jnp.ndarray      # (3,) beam-local frame for texture uv
    frame_y: jnp.ndarray      # (3,)
    intensity: jnp.ndarray    # (C,) radiant intensity at beam center
    cos_cutoff: jnp.ndarray   # () outer cone angle cosine (0 outside)
    cos_beam: jnp.ndarray     # () inner cone angle cosine (1 inside)
    texture: jnp.ndarray = None  # (Th, Tw, 3) | None — projected pattern


def make_spot(position, direction, intensity, cutoff_angle_deg=20.0,
              beam_width_deg=None, texture=None) -> SpotLight:
    import numpy as np
    d = np.asarray(direction, np.float32)
    d = d / np.linalg.norm(d)
    up = (np.array([0.0, 0.0, 1.0], np.float32)
          if abs(d[2]) < 0.999 else np.array([1.0, 0.0, 0.0], np.float32))
    fx = np.cross(up, d)
    fx = fx / np.linalg.norm(fx)
    fy = np.cross(d, fx)
    if beam_width_deg is None:
        beam_width_deg = cutoff_angle_deg * 0.75  # reference spot default
    tex = None if texture is None else jnp.asarray(texture, jnp.float32)
    return SpotLight(
        jnp.asarray(position, jnp.float32), jnp.asarray(d),
        jnp.asarray(fx), jnp.asarray(fy),
        jnp.atleast_1d(jnp.asarray(intensity, jnp.float32)),
        jnp.asarray(np.cos(np.deg2rad(cutoff_angle_deg)), jnp.float32),
        jnp.asarray(np.cos(np.deg2rad(beam_width_deg)), jnp.float32),
        tex)


def spot_falloff(light: SpotLight, d_out):
    """Angular falloff * texture toward world direction `d_out` (from the
    light). Returns (..., C)."""
    cos_t = jnp.sum(d_out * light.direction, axis=-1)
    ramp = ((cos_t - light.cos_cutoff)
            / jnp.maximum(light.cos_beam - light.cos_cutoff, 1e-6))
    falloff = jnp.clip(ramp, 0.0, 1.0)
    falloff = jnp.where(cos_t <= light.cos_cutoff, 0.0, falloff)
    falloff = jnp.where(cos_t >= light.cos_beam, 1.0, falloff)
    out = falloff[..., None] * light.intensity
    if light.texture is not None:
        # perspective uv in the beam frame, spanned by the cutoff angle
        x = jnp.sum(d_out * light.frame_x, axis=-1)
        y = jnp.sum(d_out * light.frame_y, axis=-1)
        z = jnp.maximum(cos_t, 1e-6)
        tan_half = jnp.sqrt(jnp.maximum(
            1.0 - light.cos_cutoff ** 2, 1e-12)) / jnp.maximum(
                light.cos_cutoff, 1e-6)
        u = 0.5 * (x / (z * tan_half) + 1.0)
        v = 0.5 * (y / (z * tan_half) + 1.0)
        th, tw = light.texture.shape[:2]
        xi = jnp.clip((u * tw).astype(jnp.int32), 0, tw - 1)
        yi = jnp.clip((v * th).astype(jnp.int32), 0, th - 1)
        texel = light.texture.reshape(-1, light.texture.shape[-1])[
            yi * tw + xi]
        inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
        out = out * jnp.where(inside[..., None], texel, 0.0)
    return out


# ---------------------------------------------------------------------------
# Area emitters (shape-attached)
# ---------------------------------------------------------------------------


def area_sample_direction(scene, p_ref, u2, u1):
    """Sample a direction toward one of the scene's area emitters.

    Picks an emitter shape uniformly (reference scene emitter selection,
    `scene.cpp:311`), samples its surface uniformly in area, converts to
    the solid-angle measure. Returns (d, dist, pdf_solid, radiance (..,3),
    n_emit, shape_idx) with pdf 0 when the sampled point faces away.
    """
    from .shapes import sample_position
    n_area = scene.area_emitter_shapes.shape[0]
    pick = jnp.clip((u1 * n_area).astype(jnp.int32), 0, n_area - 1)
    shape_idx = take_ints(scene.area_emitter_shapes, pick)
    p_emit, n_emit, pdf_area = sample_position(scene.shapes, shape_idx, u2)

    to_emit = p_emit - p_ref
    dist2 = jnp.sum(to_emit * to_emit, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    d = to_emit / dist[..., None]
    cos_emit = jnp.sum(n_emit * -d, axis=-1)

    pdf_solid = jnp.where(cos_emit > 1e-6,
                          pdf_area * dist2 / jnp.maximum(cos_emit, 1e-6)
                          / n_area, 0.0)
    from ..ops.gather import take_rows
    radiance = take_rows(scene.area_radiance, shape_idx)
    return d, dist, pdf_solid, radiance, n_emit, shape_idx


def area_pdf_direction(scene, p_ref, p_hit, n_hit, shape_idx):
    """Solid-angle pdf that `area_sample_direction` would produce the
    direction hitting shape `shape_idx` at `p_hit` (for MIS on emitter
    hits, cf. reference `scene.cpp:351`)."""
    n_area = scene.area_emitter_shapes.shape[0]
    to_hit = p_hit - p_ref
    dist2 = jnp.sum(to_hit * to_hit, axis=-1)
    d = to_hit / jnp.sqrt(jnp.maximum(dist2, 1e-12))[..., None]
    cos_emit = jnp.sum(n_hit * -d, axis=-1)
    pdf_area = 1.0 / take_scalars(scene.shapes.area, shape_idx)
    is_emitter = take_ints(scene.shapes.emitter_idx, shape_idx) >= 0
    pdf = jnp.where(is_emitter & (cos_emit > 1e-6),
                    pdf_area * dist2 / jnp.maximum(cos_emit, 1e-6) / n_area,
                    0.0)
    return pdf


# ---------------------------------------------------------------------------
# Bitmap environment emitter (lat-long) with marginal-2D importance sampling
# ---------------------------------------------------------------------------


class EnvMapState(NamedTuple):
    """Lat-long environment map (reference `src/emitters/envmap.cpp`) with
    a BILINEAR-continuous importance warp (the counterpart of the
    reference's `Hierarchical2D<0>` over bilinear texels,
    `envmap.cpp:103,:233`; `include/mitsuba/core/distr_2d.h:344`) — the
    sampled density interpolates the sin-weighted luminance between
    texel vertices, so `envmap_pdf_direction` is continuous and can
    serve as a reference pdf for TGMM cross-validation
    (`sky_data_test.py:72-85`). Warp machinery: `ops/distr2d.Bilinear2D`
    (marginal formulation — exact closed-form inverse, no pyramid
    walk)."""
    bitmap: jnp.ndarray      # (H, W, 3)
    warp: object             # distr2d.Bilinear2D over (H+1, W+1) vertices
    scale: jnp.ndarray       # () radiance scale
    coeff: jnp.ndarray = None  # (H, W, 4) rgb2spec sigmoid coeffs+scale
    #                            (spectral mode; `srgb.cpp:14-38`)


def make_envmap(bitmap, scale=1.0, spectral=False) -> EnvMapState:
    """Build an envmap emitter from an (H, W, 3) radiance bitmap.

    Convention: u = phi / 2pi (x axis at u=0), v = theta / pi (zenith at
    v=0) — matching the spherical sensor. With spectral=True every texel
    is rgb2spec-upsampled at build time (vectorised sigmoid fit; ~10 s
    per megatexel on the host) so spectral-mode evaluation interpolates
    per-texel spectra instead of the channel mean.
    """
    import numpy as np
    from ..ops.distr2d import make_bilinear_2d
    bm = jnp.asarray(np.asarray(bitmap, np.float32))
    h, w = bm.shape[:2]
    lum = (0.212671 * bm[..., 0] + 0.715160 * bm[..., 1]
           + 0.072169 * bm[..., 2])
    # (H+1, W+1) vertex grid: average of adjacent texel centres (edge
    # rows clamp, columns wrap) x sin(theta at the vertex) — the poles
    # get exactly zero weight from the jacobian
    row_pad = jnp.concatenate([lum[:1], lum, lum[-1:]], axis=0)
    vy = 0.5 * (row_pad[:-1] + row_pad[1:])             # (H+1, W)
    col_pad = jnp.concatenate([vy[:, -1:], vy], axis=1)
    vx = 0.5 * (col_pad[:, :-1] + col_pad[:, 1:])       # (H+1, W)
    vtx = jnp.concatenate([vx, vx[:, :1]], axis=1)      # wrap u=1 == u=0
    theta_v = jnp.arange(h + 1) / h * jnp.pi
    vtx = vtx * jnp.sin(theta_v)[:, None]
    coeff = None
    if spectral:
        from ..ops.rgb2spec import fit_sigmoid_coeffs
        rgb = np.asarray(bm, np.float64).reshape(-1, 3)
        cscale = np.maximum(rgb.max(-1), 1.0)
        cscale = np.where(rgb.max(-1) <= 0.0, 0.0, cscale)
        c3 = fit_sigmoid_coeffs(rgb / np.where(cscale > 0, cscale,
                                               1.0)[:, None])
        coeff = jnp.asarray(np.concatenate(
            [c3, cscale[:, None]], -1).reshape(h, w, 4), jnp.float32)
    return EnvMapState(bm, make_bilinear_2d(vtx),
                       jnp.asarray(scale, jnp.float32), coeff)


def _envmap_uv(d):
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    from ..ops.math import safe_acos
    theta = safe_acos(d[..., 2])
    u = jnp.mod(phi / (2.0 * jnp.pi), 1.0)
    v = theta / jnp.pi
    return u, v


def envmap_eval(env: EnvMapState, d):
    """Bilinear radiance lookup toward direction d -> (..., 3)."""
    h, w = env.bitmap.shape[:2]
    u, v = _envmap_uv(d)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    tx = x - x0
    ty = y - jnp.floor(y)
    x0 = jnp.mod(x0, w)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    c00 = env.bitmap[y0, x0]
    c10 = env.bitmap[y0, x1]
    c01 = env.bitmap[y1, x0]
    c11 = env.bitmap[y1, x1]
    top = c00 * (1 - tx)[..., None] + c10 * tx[..., None]
    bot = c01 * (1 - tx)[..., None] + c11 * tx[..., None]
    return env.scale * (top * (1 - ty)[..., None] + bot * ty[..., None])


def envmap_sample_direction(env: EnvMapState, sample2):
    """Bilinear-continuous luminance-importance sample -> (d, pdf)."""
    from ..ops.distr2d import bilinear_sample
    xy, pdf_uv = bilinear_sample(env.warp, sample2)
    phi = xy[..., 0] * 2.0 * jnp.pi
    theta = xy[..., 1] * jnp.pi
    st = jnp.sin(theta)
    d = jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st,
                   jnp.cos(theta)], -1)
    pdf = pdf_uv / (2.0 * jnp.pi * jnp.pi * jnp.maximum(st, 1e-6))
    return d, pdf


def envmap_pdf_direction(env: EnvMapState, d):
    from ..ops.distr2d import bilinear_pdf
    u, v = _envmap_uv(d)
    pdf_uv = bilinear_pdf(env.warp, jnp.stack([u, v], -1))
    st = jnp.sqrt(jnp.maximum(1.0 - d[..., 2] ** 2, 0.0))
    return pdf_uv / (2.0 * jnp.pi * jnp.pi * jnp.maximum(st, 1e-6))
