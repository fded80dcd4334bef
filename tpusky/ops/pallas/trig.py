"""Mosaic-safe transcendental approximations for Pallas TPU kernels.

The Mosaic TC lowering implements exp/log/sqrt/sin/cos/tanh but NOT
asin/acos/atan/atan2/erf/erfinv/cbrt (each raises NotImplementedError).
These polynomial replacements are f32-accurate (abs err <= ~2e-7) and use
only lowerable primitives; they are plain jnp functions, so the same code
runs under `interpret=True` on CPU for tests (tests/test_pallas.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def asin01(t):
    """asin for t in [0, 1]: Abramowitz & Stegun 4.4.46, |err| <= 2e-8."""
    p = (1.5707963050 + t * (-0.2145988016 + t * (0.0889789874 + t * (
        -0.0501743046 + t * (0.0308918810 + t * (-0.0170881256 + t * (
            0.0066700901 + t * -0.0012624911)))))))
    return 0.5 * jnp.pi - jnp.sqrt(jnp.maximum(1.0 - t, 0.0)) * p


def acos(c):
    """acos for c in [-1, 1] via the odd symmetry of asin."""
    cc = jnp.clip(c, -1.0, 1.0)
    a = asin01(jnp.abs(cc))
    pos = 0.5 * jnp.pi - a
    return jnp.where(cc >= 0.0, pos, jnp.pi - pos)


def asin01_gs(t):
    """`asin01` with a FINITE gradient at t == 1 (double-where on the
    sqrt, mirroring ops.math.safe_asin). Used by the adjoint kernels:
    plain sqrt(1-t) has an infinite derivative at t == 1 that turns
    masked-lane cotangents into NaN via 0*inf."""
    p = (1.5707963050 + t * (-0.2145988016 + t * (0.0889789874 + t * (
        -0.0501743046 + t * (0.0308918810 + t * (-0.0170881256 + t * (
            0.0066700901 + t * -0.0012624911)))))))
    om = 1.0 - t
    pos = om > 0.0
    root = jnp.where(pos, jnp.sqrt(jnp.where(pos, om, 1.0)), 0.0)
    return 0.5 * jnp.pi - root * p


def acos_gs(c):
    """`acos` with finite gradients at |c| == 1 (see asin01_gs)."""
    cc = jnp.clip(c, -1.0, 1.0)
    a = asin01_gs(jnp.abs(cc))
    pos = 0.5 * jnp.pi - a
    return jnp.where(cc >= 0.0, pos, jnp.pi - pos)


def _atan01(t):
    """atan for t in [0, 1]: minimax polynomial in t^2 (|err| < 1e-7)."""
    s = t * t
    p = (0.99997726 + s * (-0.33262347 + s * (0.19354346 + s * (
        -0.11643287 + s * (0.05265332 + s * -0.01172120)))))
    return t * p


def atan2(y, x):
    """Four-quadrant atan2 via octant reduction + _atan01."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    r = _atan01(lo / jnp.maximum(hi, 1e-30))
    r = jnp.where(ay > ax, 0.5 * jnp.pi - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7), odd-extended."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (
        -1.453152027 + t * 1.061405429))))
    v = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x >= 0.0, v, -v)


def erfinv(x):
    """Single-precision erfinv (M. Giles, 2010), |x| < 1. Uses log only."""
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-37))
    # central branch (w < 5)
    wc = w - 2.5
    pc = 2.81022636e-08
    pc = 3.43273939e-07 + pc * wc
    pc = -3.5233877e-06 + pc * wc
    pc = -4.39150654e-06 + pc * wc
    pc = 0.00021858087 + pc * wc
    pc = -0.00125372503 + pc * wc
    pc = -0.00417768164 + pc * wc
    pc = 0.246640727 + pc * wc
    pc = 1.50140941 + pc * wc
    # tail branch (w >= 5)
    wt = jnp.sqrt(jnp.maximum(w, 0.0)) - 3.0
    pt = -0.000200214257
    pt = 0.000100950558 + pt * wt
    pt = 0.00134934322 + pt * wt
    pt = -0.00367342844 + pt * wt
    pt = 0.00573950773 + pt * wt
    pt = -0.0076224613 + pt * wt
    pt = 0.00943887047 + pt * wt
    pt = 1.00167406 + pt * wt
    pt = 2.83297682 + pt * wt
    return jnp.where(w < 5.0, pc, pt) * x
