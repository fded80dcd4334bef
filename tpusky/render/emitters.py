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

import jax.numpy as jnp

from ..models.sunsky import model as sunsky
from ..ops import warp
from ..ops.gather import take_ints, take_scalars


class ConstantEnv(NamedTuple):
    """Uniform environment radiance (reference `src/emitters/constant.cpp`)."""
    radiance: jnp.ndarray       # (C,)


def env_eval(env, d_world, env_to_world, wavelengths=None, mode="rgb"):
    """Environment radiance toward world direction d (pointing at the sky)."""
    if isinstance(env, sunsky.SunskyState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world)
        return sunsky.eval(env, d_local, wavelengths=wavelengths, mode=mode)
    if isinstance(env, ConstantEnv):
        shape = d_world.shape[:-1]
        if wavelengths is not None:
            return jnp.broadcast_to(env.radiance[..., :1],
                                    wavelengths.shape)
        return jnp.broadcast_to(env.radiance, shape + env.radiance.shape)
    raise TypeError(f"unknown environment {type(env)}")


def env_sample_direction(env, env_to_world, sample2):
    """Importance-sample a world direction toward the environment.

    Returns (d_world, pdf). For sunsky this is the TGMM+cone mixture; for a
    constant environment, uniform sphere.
    """
    if isinstance(env, sunsky.SunskyState):
        d_local, pdf = sunsky.sample_direction(env, sample2)
        d_world = jnp.einsum("ij,...j->...i", env_to_world, d_local)
        return d_world, pdf
    if isinstance(env, ConstantEnv):
        d = warp.square_to_uniform_sphere(sample2)
        pdf = jnp.full(d.shape[:-1], warp.INV_FOUR_PI)
        return d, pdf
    raise TypeError(f"unknown environment {type(env)}")


def env_pdf_direction(env, env_to_world, d_world):
    if isinstance(env, sunsky.SunskyState):
        d_local = jnp.einsum("ji,...j->...i", env_to_world, d_world)
        return sunsky.pdf_direction(env, d_local)
    if isinstance(env, ConstantEnv):
        return jnp.full(d_world.shape[:-1], warp.INV_FOUR_PI)
    raise TypeError(f"unknown environment {type(env)}")


# ---------------------------------------------------------------------------
# Area emitters (shape-attached)
# ---------------------------------------------------------------------------


def area_sample_direction(scene, p_ref, u2, u1):
    """Sample a direction toward one of the scene's area emitters.

    Picks an emitter shape uniformly (reference scene emitter selection,
    `scene.cpp:311`), samples its surface uniformly in area, converts to
    the solid-angle measure. Returns (d, dist, pdf_solid, radiance (..,3),
    n_emit) with pdf 0 when the sampled point faces away.
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
    return d, dist, pdf_solid, radiance, n_emit


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
