"""Sensors: ray generation from film-plane samples.

Counterparts of the reference's sensor plugins (SURVEY.md H8): perspective
(`src/sensors/perspective.cpp`), the fork's equal-area spherical sensor
(`sunsky-testing/rendering/spherical_sensor.py:6-31`), plus orthographic.
A sensor is a NamedTuple config + a pure `sample_ray(sensor, uv)` mapping
film coordinates in [0,1]^2 to world rays — trivially vmappable/shardable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.math import normalize


class Perspective(NamedTuple):
    to_world: jnp.ndarray     # (4, 4) camera-to-world
    fov_x_deg: jnp.ndarray    # () horizontal field of view
    aspect: jnp.ndarray       # () width / height
    near: jnp.ndarray = jnp.float32(1e-2)


def make_perspective(origin, target, up=(0, 0, 1), fov_x_deg=45.0,
                     aspect=1.0) -> Perspective:
    """Look-at constructor (matches Mitsuba's convention: camera looks
    down +z in camera space, x right, y up-ish)."""
    origin = np.asarray(origin, np.float32)
    fwd = np.asarray(target, np.float32) - origin
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float32), fwd)
    right = right / np.linalg.norm(right)
    new_up = np.cross(fwd, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, new_up, fwd, origin
    return Perspective(jnp.asarray(m), jnp.asarray(fov_x_deg, jnp.float32),
                       jnp.asarray(aspect, jnp.float32))


def perspective_ray(sensor: Perspective, uv):
    """uv (..., 2) in [0,1]^2 -> (origin (...,3), direction (...,3))."""
    tan_half = jnp.tan(0.5 * jnp.deg2rad(sensor.fov_x_deg))
    x = (2.0 * uv[..., 0] - 1.0) * tan_half
    y = (1.0 - 2.0 * uv[..., 1]) * tan_half / sensor.aspect
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d = jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], d_cam)
    d = normalize(d)
    o = jnp.broadcast_to(sensor.to_world[:3, 3], d.shape)
    return o, d


class Spherical(NamedTuple):
    """Full-sphere lat-long sensor at a point (validation renders)."""
    origin: jnp.ndarray       # (3,)


def make_spherical(origin=(0.0, 0.0, 0.0)) -> Spherical:
    return Spherical(jnp.asarray(origin, jnp.float32))


def spherical_ray(sensor: Spherical, uv):
    """Equirectangular mapping: u -> phi in [0, 2pi), v -> theta in [0, pi].

    Row v=0 is the zenith (+z), matching the reference test renders' layout
    (they build directions with theta from pi..0 and flip via -si.wi).
    """
    phi = 2.0 * jnp.pi * uv[..., 0]
    theta = jnp.pi * uv[..., 1]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    d = jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, ct], axis=-1)
    o = jnp.broadcast_to(sensor.origin, d.shape)
    return o, d


class ThinLens(NamedTuple):
    """Perspective camera with a finite aperture (depth of field);
    reference `src/sensors/thinlens.cpp`."""
    to_world: jnp.ndarray
    fov_x_deg: jnp.ndarray
    aspect: jnp.ndarray
    aperture_radius: jnp.ndarray
    focus_distance: jnp.ndarray


def thinlens_ray(sensor: ThinLens, uv, lens_uv):
    """uv: film coords; lens_uv: aperture samples (..., 2)."""
    from ..ops.warp import square_to_uniform_disk_concentric
    tan_half = jnp.tan(0.5 * jnp.deg2rad(sensor.fov_x_deg))
    x = (2.0 * uv[..., 0] - 1.0) * tan_half
    y = (1.0 - 2.0 * uv[..., 1]) * tan_half / sensor.aspect
    # point on the focal plane (camera space, +z forward)
    focus = jnp.stack([x, y, jnp.ones_like(x)], -1) * sensor.focus_distance
    lens = square_to_uniform_disk_concentric(lens_uv) * sensor.aperture_radius
    o_cam = jnp.stack([lens[..., 0], lens[..., 1],
                       jnp.zeros_like(lens[..., 0])], -1)
    d_cam = focus - o_cam
    d = jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], d_cam)
    d = normalize(d)
    o = (jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], o_cam)
         + sensor.to_world[:3, 3])
    return o, d


class Orthographic(NamedTuple):
    to_world: jnp.ndarray     # (4, 4)
    scale: jnp.ndarray        # () half-extent of the film in world units


def orthographic_ray(sensor: Orthographic, uv):
    x = (2.0 * uv[..., 0] - 1.0) * sensor.scale
    y = (1.0 - 2.0 * uv[..., 1]) * sensor.scale
    o_cam = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    o = (jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], o_cam)
         + sensor.to_world[:3, 3])
    d = jnp.broadcast_to(sensor.to_world[:3, 2], o.shape)
    return o, d


def sample_ray(sensor, uv, lens_uv=None):
    """Dispatch on the sensor pytree type (static under jit)."""
    if isinstance(sensor, ThinLens):
        if lens_uv is None:
            lens_uv = jnp.full(uv.shape, 0.5)
        return thinlens_ray(sensor, uv, lens_uv)
    if isinstance(sensor, Perspective):
        return perspective_ray(sensor, uv)
    if isinstance(sensor, Spherical):
        return spherical_ray(sensor, uv)
    if isinstance(sensor, Orthographic):
        return orthographic_ray(sensor, uv)
    raise TypeError(f"unknown sensor {type(sensor)}")
