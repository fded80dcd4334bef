"""Per-pixel Z-test for statistical render regression.

Counterpart of the reference's `z_test` harness
(`src/render/tests/test_renders.py:159-224`): a candidate image (mean of
`spp` samples) is compared against a stored reference mean + variance
image; each pixel's deviation is normalised by the expected standard error
and converted to a two-sided p-value, with a Šidák correction for the
number of simultaneous tests.
"""

from __future__ import annotations

import math

import numpy as np


def z_test(mean, sample_count, reference, reference_var, alpha=0.01):
    """Two-sided per-pixel Z-test.

    mean: (H, W, C) candidate image averaged over `sample_count` samples.
    reference / reference_var: per-pixel mean and *per-sample* variance of
    the reference estimator (e.g. from the moment integrator:
    var = m2 - mean^2). Returns (passed, n_failed, min_p, alpha_corrected).
    """
    mean = np.asarray(mean, np.float64)
    reference = np.asarray(reference, np.float64)
    reference_var = np.asarray(reference_var, np.float64)

    sigma = np.sqrt(np.maximum(reference_var, 0.0) / sample_count)
    # guard pixels with (near-)zero variance like the reference (epsilon
    # floor keeps black-sky pixels from producing infinite z-scores)
    sigma = np.maximum(sigma, 1e-4 * np.maximum(np.abs(reference), 1e-4))
    z = np.abs(mean - reference) / sigma
    # two-sided p-value: erfc(z / sqrt(2))
    p = np.vectorize(math.erfc)(z / math.sqrt(2.0))

    n_tests = p.size
    alpha_corr = 1.0 - (1.0 - alpha) ** (1.0 / n_tests)   # Šidák
    failed = p < alpha_corr
    return (not failed.any(), int(failed.sum()), float(p.min()),
            float(alpha_corr))


def render_regression(render_fn, moments_fn, spp_candidate=64,
                      spp_reference=256, alpha=0.01):
    """Convenience wrapper: build the reference mean+variance with the
    moment integrator and Z-test a fresh render against it.

    render_fn(seed, spp) -> image; moments_fn(seed, spp) -> (mean, m2).
    """
    ref_mean, ref_m2 = moments_fn(0, spp_reference)
    ref_mean = np.asarray(ref_mean, np.float64)
    var = np.asarray(ref_m2, np.float64) - ref_mean ** 2
    img = np.asarray(render_fn(1, spp_candidate), np.float64)
    return z_test(img, spp_candidate, ref_mean, var, alpha=alpha)
