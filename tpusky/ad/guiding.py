"""Boundary-sample guiding for the projective estimators.

Reference parity for `src/python/python/ad/guiding.py:1-569`: the
reference accumulates projective boundary samples into a guiding
structure (uniform grid or octree over the sample domain) and
importance-samples subsequent boundary queries from it, because most of
the discontinuity-curve domain carries ~zero contribution (non-
silhouette segments, occluded curves, regions where the adjoint image is
zero) while the expensive part of each sample — the two-sided radiance
probes — costs the same everywhere.

TPU-native design: the projective machinery in `ad/projective.py`
parameterises every discontinuity-curve family by a single scalar curve
parameter t in [0, t_len) (silhouette angle, edge arclength, mesh-edge
CDF position), so the guiding domain collapses to 1D and the reference's
uniform-grid variant becomes an exact histogram density: a cheap SEED
pass scores |jump| * |tau| on a uniform-stratified t grid, the scores are
binned, and the MAIN pass draws t from the normalised histogram (mixed
with a uniform floor so no bin has zero density — the same defensive
mixture `guiding.py` uses), dividing each sample's contribution by the
guided density. Everything is static-shape jnp; no data-dependent
control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CurveGuide(NamedTuple):
    """Histogram density over a curve parameter t in [0, t_len)."""
    pdf_bins: jnp.ndarray    # (bins,) density per unit t (integrates to 1)
    cdf: jnp.ndarray         # (bins,) inclusive bin CDF
    t_len: jnp.ndarray       # ()


def build_curve_guide(scores, t_samples, t_len, n_bins: int = 64,
                      uniform_mix: float = 0.1) -> CurveGuide:
    """Bin |contribution| scores of seed samples into a guide density.

    scores (K,) nonnegative; t_samples (K,) in [0, t_len). uniform_mix
    blends a uniform floor into the histogram (matches the reference's
    defensive mixture) so every region stays reachable and the guided
    estimator stays unbiased after the 1/pdf division.
    """
    t_len = jnp.asarray(t_len, jnp.float32)
    scores = jnp.maximum(jnp.asarray(scores, jnp.float32), 0.0)
    scores = jnp.where(jnp.isfinite(scores), scores, 0.0)
    bins = jnp.clip((t_samples / t_len * n_bins).astype(jnp.int32),
                    0, n_bins - 1)
    hist = jax.ops.segment_sum(scores, bins, num_segments=n_bins)
    total = jnp.sum(hist)
    # all-zero seed pass (no discontinuity found) -> pure uniform
    hist = jnp.where(total > 0, hist / jnp.maximum(total, 1e-30),
                     jnp.full((n_bins,), 1.0 / n_bins))
    mass = (1.0 - uniform_mix) * hist + uniform_mix / n_bins   # sums to 1
    width = t_len / n_bins
    pdf_bins = mass / width
    cdf = jnp.cumsum(mass)
    return CurveGuide(pdf_bins, cdf, t_len)


def sample_curve_guide(guide: CurveGuide, u):
    """Inverse-CDF sample of the guide; u (K,) uniform -> (t (K,), pdf (K,)).

    Stratification within bins comes from the caller's stratified u; the
    bin pick + in-bin position reuse one uniform (`sample_reuse`,
    `distr_1d.h:173` style)."""
    n_bins = guide.cdf.shape[0]
    b = jnp.clip(jnp.searchsorted(guide.cdf, u, side="right"), 0,
                 n_bins - 1)
    lo = jnp.where(b > 0, guide.cdf[jnp.maximum(b - 1, 0)], 0.0)
    mass_b = jnp.maximum(guide.cdf[b] - lo, 1e-12)
    frac = jnp.clip((u - lo) / mass_b, 0.0, 1.0)
    width = guide.t_len / n_bins
    t = (b.astype(jnp.float32) + frac) * width
    pdf = guide.pdf_bins[b]
    return t, pdf
