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
