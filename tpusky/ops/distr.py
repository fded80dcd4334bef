"""Sampling distributions (discrete, piecewise-linear continuous, irregular).

Functional JAX counterparts of the reference's distribution classes
(`include/mitsuba/core/distr_1d.h`): state is a small pytree built by a
``make_*`` function from (possibly traced) weights, so distribution
parameters stay differentiable and update "for free" when re-traced.
Sampling uses `jnp.searchsorted` over the CDF — ideal shape for XLA since
the tables involved here are tiny (tens of entries) and replicated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math import safe_sqrt

# ---------------------------------------------------------------------------
# Discrete distribution over a fixed number of outcomes
# ---------------------------------------------------------------------------


class DiscreteDistribution(NamedTuple):
    pmf: jnp.ndarray      # (n,) unnormalised weights
    cdf: jnp.ndarray      # (n,) inclusive prefix sums
    total: jnp.ndarray    # () sum of weights


def make_discrete(pmf) -> DiscreteDistribution:
    pmf = jnp.asarray(pmf)
    cdf = jnp.cumsum(pmf, axis=-1)
    return DiscreteDistribution(pmf, cdf, cdf[..., -1])


def discrete_sample_reuse(d: DiscreteDistribution, u):
    """Sample an index; return (index, rescaled-uniform-sample).

    The sample is rescaled to [0, 1) within the chosen bin so it can be
    reused by the caller (matches the reference's `sample_reuse`,
    `distr_1d.h:173`).
    """
    scaled = u * d.total
    idx = jnp.clip(jnp.searchsorted(d.cdf, scaled, side="right"),
                   0, d.pmf.shape[-1] - 1)
    cdf_prev = jnp.where(idx > 0, d.cdf[jnp.maximum(idx - 1, 0)], 0.0)
    pmf_i = jnp.maximum(d.pmf[idx], 1e-37)
    reused = jnp.clip((scaled - cdf_prev) / pmf_i, 0.0, 1.0)
    return idx, reused


def discrete_pmf_normalized(d: DiscreteDistribution, idx):
    return d.pmf[idx] / d.total


# ---------------------------------------------------------------------------
# Piecewise-linear continuous distribution on a uniform grid
# ---------------------------------------------------------------------------


class ContinuousDistribution(NamedTuple):
    pdf: jnp.ndarray        # (n,) node values (unnormalised density)
    cdf: jnp.ndarray        # (n-1,) trapezoid cumulative integral at nodes 1..n-1
    x_min: jnp.ndarray      # ()
    interval: jnp.ndarray   # () node spacing
    integral: jnp.ndarray   # ()


def make_continuous(values, x_min, x_max) -> ContinuousDistribution:
    values = jnp.asarray(values)
    n = values.shape[-1]
    interval = (x_max - x_min) / (n - 1)
    cdf = interval * jnp.cumsum(0.5 * (values[..., 1:] + values[..., :-1]), axis=-1)
    return ContinuousDistribution(values, cdf, jnp.asarray(x_min, values.dtype),
                                  jnp.asarray(interval, values.dtype),
                                  cdf[..., -1])


def continuous_sample_pdf(d: ContinuousDistribution, u):
    """Warp u ~ U[0,1] to the distribution; return (position, normalized pdf).

    Inverts the piecewise-quadratic CDF per segment (same quadratic solve
    as the reference, `distr_1d.h:468-499`).
    """
    scaled = u * d.integral
    idx = jnp.clip(jnp.searchsorted(d.cdf, scaled, side="left"),
                   0, d.pdf.shape[-1] - 2)
    c0 = jnp.where(idx > 0, d.cdf[jnp.maximum(idx - 1, 0)], 0.0)
    y0 = d.pdf[idx]
    y1 = d.pdf[idx + 1]
    s = (scaled - c0) / d.interval
    dy = y1 - y0
    t_linear = (y0 - safe_sqrt(y0 * y0 + 2.0 * s * dy)) / jnp.where(dy == 0, 1.0, -dy)
    t_const = s / jnp.maximum(y0, 1e-37)
    t = jnp.clip(jnp.where(dy == 0, t_const, t_linear), 0.0, 1.0)
    position = d.x_min + (idx + t) * d.interval
    pdf = (y0 + t * dy) / d.integral
    return position, pdf


def continuous_pdf(d: ContinuousDistribution, x):
    """Normalized density at x (0 outside the support)."""
    n = d.pdf.shape[-1]
    rel = (x - d.x_min) / d.interval
    inside = (rel >= 0) & (rel <= n - 1)
    idx = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, n - 2)
    t = rel - idx
    val = (1.0 - t) * d.pdf[idx] + t * d.pdf[idx + 1]
    return jnp.where(inside, val / d.integral, 0.0)


# ---------------------------------------------------------------------------
# Piecewise-linear distribution on an irregular grid (spectra)
# ---------------------------------------------------------------------------


class IrregularContinuousDistribution(NamedTuple):
    nodes: jnp.ndarray    # (n,)
    pdf: jnp.ndarray      # (n,)
    cdf: jnp.ndarray      # (n-1,)
    integral: jnp.ndarray


def make_irregular(nodes, values) -> IrregularContinuousDistribution:
    nodes = jnp.asarray(nodes)
    values = jnp.asarray(values)
    seg = 0.5 * (values[..., 1:] + values[..., :-1]) * jnp.diff(nodes)
    cdf = jnp.cumsum(seg, axis=-1)
    return IrregularContinuousDistribution(nodes, values, cdf, cdf[..., -1])


def irregular_eval(d: IrregularContinuousDistribution, x):
    """Piecewise-linear interpolation of the stored values at x (0 outside)."""
    n = d.nodes.shape[-1]
    idx = jnp.clip(jnp.searchsorted(d.nodes, x, side="right") - 1, 0, n - 2)
    x0, x1 = d.nodes[idx], d.nodes[idx + 1]
    t = (x - x0) / (x1 - x0)
    inside = (x >= d.nodes[0]) & (x <= d.nodes[-1])
    return jnp.where(inside, (1 - t) * d.pdf[idx] + t * d.pdf[idx + 1], 0.0)
