"""Interaction / sample record pytrees (SoA over ray batches).

JAX counterparts of the reference's record structs
(`include/mitsuba/render/interaction.h`, `records.h`): plain NamedTuples of
arrays, one lane per ray, with validity masks instead of null pointers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

INVALID_T = jnp.inf


class Ray(NamedTuple):
    o: jnp.ndarray        # (..., 3) origin
    d: jnp.ndarray        # (..., 3) unit direction
    maxt: jnp.ndarray     # (...,)


class SurfaceInteraction(NamedTuple):
    """Hit record. `valid` False => environment / escaped ray."""
    t: jnp.ndarray            # (...,) hit distance (inf if none)
    p: jnp.ndarray            # (..., 3) hit point
    n: jnp.ndarray            # (..., 3) geometric normal (unit)
    uv: jnp.ndarray           # (..., 2)
    wi_world: jnp.ndarray     # (..., 3) direction toward the origin (=-ray.d)
    shape_idx: jnp.ndarray    # (...,) int32 global shape index (-1 = none)
    valid: jnp.ndarray        # (...,) bool


class DirectionSample(NamedTuple):
    """Result of sampling a direction toward an emitter."""
    d: jnp.ndarray            # (..., 3) world direction
    pdf: jnp.ndarray          # (...,) solid-angle pdf
    dist: jnp.ndarray         # (...,) distance to the emitter surface
    radiance: jnp.ndarray     # (..., C) emitted radiance along -d
