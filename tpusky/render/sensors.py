"""Sensors: ray generation from film-plane samples.

Counterparts of the reference's sensor plugins (SURVEY.md H8): perspective
(`src/sensors/perspective.cpp`), the fork's equal-area spherical sensor
(`sunsky-testing/rendering/spherical_sensor.py:6-31`), plus orthographic.
A sensor is a NamedTuple config + a pure `sample_ray(sensor, uv)` mapping
film coordinates in [0,1]^2 to world rays — trivially vmappable/shardable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
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
    d = jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], d_cam, precision=jax.lax.Precision.HIGHEST)
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
    d = jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], d_cam, precision=jax.lax.Precision.HIGHEST)
    d = normalize(d)
    o = (jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], o_cam, precision=jax.lax.Precision.HIGHEST)
         + sensor.to_world[:3, 3])
    return o, d


class Orthographic(NamedTuple):
    to_world: jnp.ndarray     # (4, 4)
    scale: jnp.ndarray        # () half-extent of the film in world units


def orthographic_ray(sensor: Orthographic, uv):
    x = (2.0 * uv[..., 0] - 1.0) * sensor.scale
    y = (1.0 - 2.0 * uv[..., 1]) * sensor.scale
    o_cam = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    o = (jnp.einsum("ij,...j->...i", sensor.to_world[:3, :3], o_cam, precision=jax.lax.Precision.HIGHEST)
         + sensor.to_world[:3, 3])
    d = jnp.broadcast_to(sensor.to_world[:3, 2], o.shape)
    return o, d


class Distant(NamedTuple):
    """Parallel rays from outside the scene along a fixed direction
    (reference `src/sensors/distant.cpp`): film coordinates map to a
    world-aligned square of half-extent `extent` perpendicular to the
    direction, pushed back beyond the scene bounding sphere."""
    direction: jnp.ndarray    # (3,) unit, pointing INTO the scene
    frame_x: jnp.ndarray      # (3,) film-plane basis
    frame_y: jnp.ndarray      # (3,)
    center: jnp.ndarray       # (3,) scene bsphere center
    radius: jnp.ndarray       # () bsphere radius (ray origins at 2r back)
    extent: jnp.ndarray       # () half-extent of the film square


def make_distant(direction, center=(0.0, 0.0, 0.0), radius=1.0,
                 extent=None) -> Distant:
    d = np.asarray(direction, np.float32)
    d = d / np.linalg.norm(d)
    up = (np.array([0.0, 0.0, 1.0], np.float32)
          if abs(d[2]) < 0.999 else np.array([1.0, 0.0, 0.0], np.float32))
    fx = np.cross(up, d)
    fx = fx / np.linalg.norm(fx)
    fy = np.cross(d, fx)
    if extent is None:
        extent = float(radius)
    return Distant(jnp.asarray(d), jnp.asarray(fx), jnp.asarray(fy),
                   jnp.asarray(center, jnp.float32),
                   jnp.asarray(radius, jnp.float32),
                   jnp.asarray(extent, jnp.float32))


def distant_ray(sensor: Distant, uv):
    x = (2.0 * uv[..., 0] - 1.0) * sensor.extent
    y = (1.0 - 2.0 * uv[..., 1]) * sensor.extent
    base = (sensor.center - 2.0 * sensor.radius * sensor.direction)
    o = (base + x[..., None] * sensor.frame_x
         + y[..., None] * sensor.frame_y)
    d = jnp.broadcast_to(sensor.direction, o.shape)
    return o, d


class RadianceMeter(NamedTuple):
    """Single-ray radiance probe (reference `src/sensors/radiancemeter.cpp`):
    every film sample traces the same (origin, direction) ray."""
    origin: jnp.ndarray       # (3,)
    direction: jnp.ndarray    # (3,) unit


def radiancemeter_ray(sensor: RadianceMeter, uv):
    shape = uv.shape[:-1] + (3,)
    return (jnp.broadcast_to(sensor.origin, shape),
            jnp.broadcast_to(sensor.direction, shape))


class IrradianceMeter(NamedTuple):
    """Surface irradiance probe (reference `src/sensors/irradiancemeter.cpp`):
    film u,v samples a point on a rectangle patch, the lens sample picks a
    cosine-weighted hemisphere direction about its normal; the measured
    quantity integrates L cos(theta) — cosine and hemisphere-pdf cancel up
    to the pi factor, which is folded into the ray weight by callers."""
    origin: jnp.ndarray       # (3,) patch center
    frame_x: jnp.ndarray      # (3,) patch basis (half-extent included)
    frame_y: jnp.ndarray      # (3,)
    normal: jnp.ndarray       # (3,) unit


def make_irradiancemeter(origin, normal, half_extent=1.0) -> IrradianceMeter:
    n = np.asarray(normal, np.float32)
    n = n / np.linalg.norm(n)
    up = (np.array([0.0, 0.0, 1.0], np.float32)
          if abs(n[2]) < 0.999 else np.array([1.0, 0.0, 0.0], np.float32))
    fx = np.cross(up, n)
    fx = fx / np.linalg.norm(fx)
    fy = np.cross(n, fx)
    return IrradianceMeter(jnp.asarray(origin, jnp.float32),
                           jnp.asarray(fx * half_extent),
                           jnp.asarray(fy * half_extent),
                           jnp.asarray(n))


def irradiancemeter_ray(sensor: IrradianceMeter, uv, lens_uv):
    from ..ops.warp import square_to_cosine_hemisphere
    x = 2.0 * uv[..., 0] - 1.0
    y = 2.0 * uv[..., 1] - 1.0
    o = (sensor.origin + x[..., None] * sensor.frame_x
         + y[..., None] * sensor.frame_y)
    d_local = square_to_cosine_hemisphere(lens_uv)
    fx = sensor.frame_x / jnp.linalg.norm(sensor.frame_x)
    fy = sensor.frame_y / jnp.linalg.norm(sensor.frame_y)
    d = (d_local[..., 0:1] * fx + d_local[..., 1:2] * fy
         + d_local[..., 2:3] * sensor.normal)
    return o, d


class Batch(NamedTuple):
    """Side-by-side composition of sub-sensors over the film's width
    (reference `src/sensors/batch.cpp`): film column block i is rendered by
    sub-sensor i. Sub-sensors must be of homogeneous pytree structure per
    entry (any mix of types is fine — dispatch is static)."""
    sensors: tuple            # static tuple of sensor pytrees


def batch_ray(sensor: Batch, uv, lens_uv=None):
    k = len(sensor.sensors)
    seg = jnp.clip((uv[..., 0] * k).astype(jnp.int32), 0, k - 1)
    u_local = uv[..., 0] * k - seg.astype(uv.dtype)
    uv_local = jnp.stack([u_local, uv[..., 1]], axis=-1)
    o = jnp.zeros(uv.shape[:-1] + (3,))
    d = jnp.zeros(uv.shape[:-1] + (3,))
    for i, sub in enumerate(sensor.sensors):
        oi, di = sample_ray(sub, uv_local, lens_uv)
        sel = (seg == i)[..., None]
        o = jnp.where(sel, oi, o)
        d = jnp.where(sel, di, d)
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
    if isinstance(sensor, Distant):
        return distant_ray(sensor, uv)
    if isinstance(sensor, RadianceMeter):
        return radiancemeter_ray(sensor, uv)
    if isinstance(sensor, IrradianceMeter):
        if lens_uv is None:
            lens_uv = jnp.full(uv.shape, 0.5)
        return irradiancemeter_ray(sensor, uv, lens_uv)
    if isinstance(sensor, Batch):
        return batch_ray(sensor, uv, lens_uv)
    raise TypeError(f"unknown sensor {type(sensor)}")
