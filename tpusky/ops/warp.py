"""Warps mapping the unit square to common sampling domains, with pdfs.

JAX ports of the standard low-distortion warps the renderer needs
(cf. reference `include/mitsuba/core/warp.h` for the catalogue); all
functions broadcast over leading batch dims. `sample` arguments are
uniform in [0, 1)^2 with a trailing axis of size 2.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt

INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 1.0 / (2.0 * jnp.pi)
INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_disk_concentric(sample):
    """Concentric (Shirley-Chiu) square-to-disk mapping."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * jnp.pi * rp / jnp.where(is_zero, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * jnp.pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_cone(sample, cos_cutoff):
    """Uniform direction in a cone around +z with cos(angle) >= cos_cutoff.

    Low-distortion concentric-disk based variant (the one the reference
    compiles, `warp.h:543-551`).
    """
    one_minus = 1.0 - cos_cutoff
    p = square_to_uniform_disk_concentric(sample)
    pn = jnp.sum(p * p, axis=-1)
    z = cos_cutoff + one_minus * (1.0 - pn)
    scale = safe_sqrt(one_minus * (2.0 - one_minus * pn))
    return jnp.stack([p[..., 0] * scale, p[..., 1] * scale, z], axis=-1)


def square_to_uniform_cone_pdf(v, cos_cutoff):
    """Solid-angle pdf of `square_to_uniform_cone` (constant inside cone)."""
    del v
    return INV_TWO_PI / (1.0 - cos_cutoff)


def square_to_cosine_hemisphere(sample):
    """Cosine-weighted hemisphere direction around +z (Malley's method)."""
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - jnp.sum(p * p, axis=-1))
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return INV_PI * jnp.maximum(v[..., 2], 0.0)


def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(v):
    del v
    return INV_FOUR_PI


def square_to_uniform_hemisphere(sample):
    p = square_to_uniform_disk_concentric(sample)
    pn = jnp.sum(p * p, axis=-1)
    z = 1.0 - pn
    scale = safe_sqrt(2.0 - pn)
    return jnp.stack([p[..., 0] * scale, p[..., 1] * scale, z], axis=-1)


def square_to_uniform_hemisphere_pdf(v):
    del v
    return INV_TWO_PI


def square_to_std_normal_pdf(p):
    """Pdf of a 2D standard normal at p (trailing axis 2)."""
    return INV_TWO_PI * jnp.exp(-0.5 * jnp.sum(p * p, axis=-1))


def square_to_uniform_triangle(sample):
    """Uniform barycentric sample on a triangle -> (b1, b2)."""
    t = safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)
