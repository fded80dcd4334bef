"""Numerically-stable geometric/math primitives shared across the renderer.

All functions are pure jnp, broadcast over leading batch dimensions, and are
safe under jit/vmap/grad. Conventions: directions are unit 3-vectors with a
trailing axis of size 3; the local "up" axis is +z; spherical angles are
(phi, theta) with theta measured from +z.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x):
    """sqrt clamped to zero below; gradient is zero (not inf/NaN) at x <= 0.

    Double-where pattern: the inner where keeps the non-positive branch out
    of the sqrt's gradient entirely (plain sqrt(max(x, 0)) still has an
    infinite derivative at x == 0, which poisons masked lanes under AD).
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_acos(x):
    """arccos clamped to [-1, 1] with a FINITE gradient at the clamp.

    `arccos(clip(x))` is a NaN factory under AD: at |x| clipped to
    exactly 1 the chain rule multiplies clip's zero tangent by arccos's
    infinite derivative (0 * inf = NaN), poisoning whole backward
    sweeps through shared subexpressions. Double-where keeps the
    boundary lanes out of arccos entirely."""
    ok = jnp.abs(x) < 1.0
    xs = jnp.where(ok, x, 0.0)
    return jnp.where(ok, jnp.arccos(xs),
                     jnp.where(x >= 1.0, 0.0, jnp.pi))


def safe_asin(x):
    """arcsin with the same double-where NaN guard as `safe_acos`."""
    ok = jnp.abs(x) < 1.0
    xs = jnp.where(ok, x, 0.0)
    return jnp.where(ok, jnp.arcsin(xs),
                     jnp.where(x >= 1.0, 0.5 * jnp.pi, -0.5 * jnp.pi))


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm(v, keepdims: bool = False):
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=keepdims))


def normalize(v):
    return v / norm(v, keepdims=True)


def sph_dir(theta, phi):
    """Spherical angles -> unit vector (theta from +z)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([cp * st, sp * st, ct], axis=-1)


def dir_to_sph(v):
    """Unit vector -> (phi, theta), theta via the stable unit-angle form."""
    return jnp.arctan2(v[..., 1], v[..., 0]), unit_angle_z(v)


def unit_angle(a, b):
    """Angle between two unit vectors, accurate for small and near-pi angles.

    Uses 2*asin(|b - a| / 2) (resp. the mirrored form past 90 degrees),
    which is far more precise than acos(dot) near 0 and pi.
    """
    dot_ab = dot(a, b)
    temp = 2.0 * safe_asin(0.5 * norm(b - jnp.where(dot_ab[..., None] >= 0, a, -a)))
    return jnp.where(dot_ab >= 0, temp, jnp.pi - temp)


def unit_angle_z(v):
    """Angle between a unit vector and +z (stable near the poles)."""
    temp = 2.0 * safe_asin(
        0.5 * jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2
                       + (jnp.abs(v[..., 2]) - 1.0) ** 2))
    return jnp.where(v[..., 2] >= 0, temp, jnp.pi - temp)


def coordinate_system(n):
    """Build an orthonormal basis (s, t) around unit normal n.

    Branchless construction (Duff et al. 2017, "Building an Orthonormal
    Basis, Revisited"), matching the frame the reference uses for local
    shading/sampling spaces.
    """
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack([n[..., 0] ** 2 * a * sign + 1.0, b * sign, -n[..., 0] * sign],
                  axis=-1)
    t = jnp.stack([b, n[..., 1] ** 2 * a + sign, -n[..., 1]], axis=-1)
    return s, t


def mat3_apply(m, v):
    """(3, 3) matrix times (..., 3) vectors with explicit elementwise
    arithmetic. NEVER lower small geometry transforms to `@`/einsum: XLA
    routes those onto the MXU whose default f32 precision is bf16-truncated
    inputs (~2e-3 relative) — enough to break shadow-ray occlusion
    predicates. Explicit muls/adds stay on the VPU in full f32."""
    return jnp.stack([v[..., 0] * m[0, 0] + v[..., 1] * m[0, 1]
                      + v[..., 2] * m[0, 2],
                      v[..., 0] * m[1, 0] + v[..., 1] * m[1, 1]
                      + v[..., 2] * m[1, 2],
                      v[..., 0] * m[2, 0] + v[..., 1] * m[2, 1]
                      + v[..., 2] * m[2, 2]], axis=-1)


def mat3_apply_t(m, v):
    """Transpose apply: m^T @ v for (3, 3) m, (..., 3) v (VPU-exact)."""
    return jnp.stack([v[..., 0] * m[0, 0] + v[..., 1] * m[1, 0]
                      + v[..., 2] * m[2, 0],
                      v[..., 0] * m[0, 1] + v[..., 1] * m[1, 1]
                      + v[..., 2] * m[2, 1],
                      v[..., 0] * m[0, 2] + v[..., 1] * m[1, 2]
                      + v[..., 2] * m[2, 2]], axis=-1)


class Frame:
    """Orthonormal frame around a normal; to_local/to_world helpers.

    A lightweight struct-of-arrays; all fields broadcast over batch dims.
    """

    def __init__(self, n):
        self.n = n
        self.s, self.t = coordinate_system(n)

    def to_local(self, v):
        return jnp.stack([dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1)

    def to_world(self, v):
        return (v[..., 0:1] * self.s + v[..., 1:2] * self.t
                + v[..., 2:3] * self.n)


def erfinv(x):
    """Inverse error function with one Newton polish step.

    XLA:TPU lowers `erfinv` to a coarse polynomial — measured |err| up to
    3.0e-5 vs 1e-7 on CPU — which systematically displaces inverse-CDF
    samples enough to fail the reference-scale sampling chi^2 (N=1e8,
    res 215, `test_sunsky.py:256`). One Newton step against erf
    (y -= (erf(y) - x) * sqrt(pi)/2 * exp(y^2)) restores ~1e-6 accuracy
    wherever the probability mass lives, on every backend.
    """
    from jax.scipy.special import erfinv as _erfinv, erf as _erf
    y0 = _erfinv(x)
    yc = jnp.clip(y0, -5.9, 5.9)          # exp(y^2) stays finite in f32
    y = yc - (_erf(yc) - x) * (jnp.sqrt(jnp.pi) / 2.0) * jnp.exp(yc * yc)
    return jnp.where(jnp.isfinite(y0) & (jnp.abs(y0) < 5.9), y, y0)


def gaussian_cdf(mu, sigma, x):
    """CDF of a normal distribution N(mu, sigma) at x."""
    from jax.scipy.special import erf
    inv_sqrt2 = 0.7071067811865475
    return 0.5 * (1.0 + erf(inv_sqrt2 * (x - mu) / sigma))


def lerp(a, b, t):
    return (1.0 - t) * a + t * b


def poly_powers(x, n: int):
    """[1, x, x^2, ..., x^(n-1)] along a new trailing axis.

    Built with cumprod instead of `x ** arange(n)`: the latter has a NaN
    gradient at x == 0 for the constant term (0 * x^-1), which poisons
    backprop through masked lanes (e.g. cos_psi == 0 outside the sun disc).
    """
    xs = jnp.broadcast_to(x[..., None], x.shape + (n - 1,))
    return jnp.concatenate([jnp.ones_like(x)[..., None],
                            jnp.cumprod(xs, axis=-1)], axis=-1)
