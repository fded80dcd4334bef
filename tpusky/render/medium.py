"""Participating media and phase functions (reference: SURVEY.md H19).

Reference parity: ``src/media/homogeneous.cpp`` (homogeneous medium:
``sigma_t`` / ``albedo`` scaled extinction, analytic transmittance),
``src/phase/isotropic.cpp`` and ``src/phase/hg.cpp`` (Henyey-Greenstein),
and the free-flight sampling used by ``src/integrators/volpath.cpp``
(``Medium::sample_interaction``, ``include/mitsuba/render/medium.h``).

TPU-native design decisions:

* The medium region is a **convex boundary shape** (unit sphere or unit
  cube under a rigid+scale transform). Because the region is convex, a
  ray's overlap with it is ONE interval [t0, t1] computed in closed form —
  so the integrator needs **no inside/outside state and no null-BSDF
  boundary events**: every lane clips its segment against the interval
  each bounce. (The reference instead tracks ``MediumPtr`` per ray and
  performs null-boundary transitions, ``volpath.cpp`` ``medium`` loop
  state — a data-dependent pointer chase that maps badly to SPMD.)
  ``kind = -1`` means a global (infinite) medium.
* Distance sampling uses the channel-averaged extinction ``sigma_bar``
  (the reference samples one random channel per interaction,
  ``homogeneous.cpp``; averaging is the zero-variance choice for gray
  media and unbiased for colored ones via the pdf ratio kept in
  ``throughput``).
* Phase sampling/eval are branch-free jnp; HG inverse-CDF per
  ``warp.square_to_hg`` math (hg.cpp:103-127).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import safe_sqrt

__all__ = ["Medium", "make_medium", "hg_pdf", "hg_sample",
           "medium_interval", "transmittance"]

_INF = jnp.inf

GLOBAL, SPHERE, CUBE = -1, 0, 1   # boundary kinds (static)


class Medium(NamedTuple):
    """``kind`` is registered as pytree aux data (static under jit) so the
    interval computation specializes per boundary type — see
    ``tree_flatten`` below."""
    sigma_t: jnp.ndarray      # (C,) extinction coefficient
    albedo: jnp.ndarray       # (C,) single-scattering albedo sigma_s/sigma_t
    g: jnp.ndarray            # ()  HG asymmetry (0 == isotropic)
    to_local: jnp.ndarray     # (4, 4) world -> unit-shape space
    kind: int = SPHERE        # static: GLOBAL | SPHERE | CUBE


# `kind` must be STATIC (Python `if` on it inside traced code), so Medium
# flattens to (dynamic leaves, kind-as-aux). NamedTuples auto-flatten all
# fields; override with an explicit registration.
jax.tree_util.register_pytree_node(
    Medium,
    lambda m: ((m.sigma_t, m.albedo, m.g, m.to_local), m.kind),
    lambda kind, leaves: Medium(*leaves, kind=kind))


def make_medium(sigma_t, albedo, g=0.0, to_world=None,
                kind: str = "sphere") -> Medium:
    """Host-side constructor. ``kind`` in {'global','sphere','cube'};
    ``to_world`` maps the unit sphere (radius 1) / unit cube ([-1,1]^3)
    onto the medium region (Mitsuba shape convention, `sphere.cpp`,
    `cube` mesh)."""
    k = {"global": GLOBAL, "sphere": SPHERE, "cube": CUBE}[kind]
    t2w = np.eye(4, dtype=np.float32) if to_world is None \
        else np.asarray(to_world, np.float32)
    return Medium(
        sigma_t=jnp.atleast_1d(jnp.asarray(sigma_t, jnp.float32)),
        albedo=jnp.atleast_1d(jnp.asarray(albedo, jnp.float32)),
        g=jnp.asarray(g, jnp.float32),
        to_local=jnp.asarray(np.linalg.inv(t2w), jnp.float32),
        kind=k)


# ---------------------------------------------------------------------------
# boundary interval
# ---------------------------------------------------------------------------

def medium_interval(med: Medium, o, d):
    """Overlap [t0, t1] of rays (o, d) with the medium region, clamped to
    t >= 0; empty intervals return t0 == t1. Closed-form because the
    region is convex (module docstring)."""
    if med.kind == GLOBAL:
        zeros = jnp.zeros(o.shape[:-1])
        return zeros, jnp.full(o.shape[:-1], _INF)
    A = med.to_local
    ol = o @ A[:3, :3].T + A[:3, 3]
    dl = d @ A[:3, :3].T
    if med.kind == SPHERE:
        a = jnp.sum(dl * dl, axis=-1)
        b = 2.0 * jnp.sum(ol * dl, axis=-1)
        c = jnp.sum(ol * ol, axis=-1) - 1.0
        disc = b * b - 4.0 * a * c
        ok = disc > 0.0
        sq = safe_sqrt(disc)   # zero-grad on miss: no NaN cotangents
        t0 = (-b - sq) / (2.0 * a)
        t1 = (-b + sq) / (2.0 * a)
    else:  # CUBE: slab test against [-1, 1]^3
        inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-12,
                              jnp.where(dl >= 0, 1e-12, -1e-12), dl)
        ta = (-1.0 - ol) * inv
        tb = (1.0 - ol) * inv
        t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
        t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
        ok = t0 <= t1
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.maximum(t1, 0.0)
    empty = ~ok | (t1 <= t0)
    t0 = jnp.where(empty, 0.0, t0)
    t1 = jnp.where(empty, 0.0, t1)
    return t0, t1


def transmittance(med: Medium, o, d, t_max):
    """Analytic per-channel transmittance along (o, d) up to t_max
    (homogeneous.cpp ``eval_transmittance``): exp(-sigma_t * overlap)."""
    t0, t1 = medium_interval(med, o, d)
    seg = jnp.clip(jnp.minimum(t1, t_max) - jnp.minimum(t0, t_max),
                   0.0, None)
    return jnp.exp(-med.sigma_t * seg[..., None])


# ---------------------------------------------------------------------------
# Henyey-Greenstein phase function (g == 0 degenerates to isotropic)
# ---------------------------------------------------------------------------

def hg_pdf(g, cos_theta):
    """HG phase value == pdf per solid angle (normalized; hg.cpp:86-101).

    ``cos_theta = dot(d_prop, wo)`` — the PROPAGATION convention (g > 0
    peaks forward at cos_theta = +1). The reference uses BSDF-style
    ``dot(si.wi, wo)`` with ``si.wi = -d_prop`` (hg.cpp:90), which is the
    same function with the sign of cos_theta flipped."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) \
        / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def hg_sample(g, d_prop, u):
    """Sample wo ~ HG around the propagation direction ``d_prop``
    (forward-peaked for g > 0); returns (wo, pdf) with
    ``pdf == hg_pdf(g, dot(d_prop, wo))`` exactly.

    Inverse CDF (hg.cpp:103-127):
      cosθ = (1 + g² − ((1−g²)/(1−g+2gu))²) / (2g),  isotropic when |g|≈0.
    """
    u1, u2 = u[..., 0], u[..., 1]
    g_ = jnp.broadcast_to(jnp.asarray(g), u1.shape)
    sqr = (1.0 - g_ * g_) / (1.0 - g_ + 2.0 * g_ * u1)
    cos_hg = (1.0 + g_ * g_ - sqr * sqr) / (2.0 * jnp.where(
        jnp.abs(g_) < 1e-4, 1.0, g_))
    cos_iso = 1.0 - 2.0 * u1
    cos_t = jnp.where(jnp.abs(g_) < 1e-4, cos_iso, cos_hg)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u2
    # build frame around the forward (propagation) direction
    fwd = d_prop
    a = jnp.where(jnp.abs(fwd[..., 2:3]) < 0.999,
                  jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), fwd.shape),
                  jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), fwd.shape))
    t1v = jnp.cross(a, fwd)
    t1v = t1v / jnp.maximum(
        jnp.linalg.norm(t1v, axis=-1, keepdims=True), 1e-12)
    t2v = jnp.cross(fwd, t1v)
    wo = (sin_t * jnp.cos(phi))[..., None] * t1v \
        + (sin_t * jnp.sin(phi))[..., None] * t2v \
        + cos_t[..., None] * fwd
    return wo, hg_pdf(g_, cos_t)
