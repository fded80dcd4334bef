"""Sampling correctness: chi-square tests of the TGMM sky sampler and the
joint sun+sky mixture, plus the sun-cone aperture property.

Mirrors reference `src/emitters/tests/test_sunsky.py:201-293` (which runs
N=1e8 at res 215 on GPU; here scaled to CPU budgets while keeping the same
statistical machinery). The domain is cropped below the zenith singularity
exactly like the reference's `CroppedSphericalDomain` (SIN_OFFSET=0.00775).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusky.models.sunsky import model as M
from tpusky.models.sunsky import tables as T
from tpusky.utils.chi2 import chi2_test

SIN_OFFSET = 0.00775  # reference test_sunsky.py:9


def _make_state(turb, sun_theta, sun_phi=-4 * np.pi / 5, sun_scale=0.0,
                aperture_deg=None, albedo=0.5):
    kw = {}
    if aperture_deg is not None:
        kw["sun_aperture_deg"] = aperture_deg
    params = M.make_params(
        turbidity=turb, albedo=albedo,
        sun_direction=[np.cos(sun_phi) * np.sin(sun_theta),
                       np.sin(sun_phi) * np.sin(sun_theta),
                       np.cos(sun_theta)],
        sun_scale=sun_scale, mode="rgb", **kw)
    return jax.jit(lambda p: M.precompute(T.load_tables("rgb"), p, "rgb"))(
        params)


def _run_chi2(state, n=4_000_000):
    sample = jax.jit(lambda k, u: M.sample_direction(state, u)[0])
    pdf = jax.jit(lambda d: M.pdf_direction(state, d))

    def sample_fn(key, n):
        u = jax.random.uniform(key, (n, 2))
        return sample(key, u)

    cos_bound = float(np.sqrt(1 - SIN_OFFSET ** 2))
    return chi2_test(sample_fn, pdf, key=jax.random.PRNGKey(0),
                     sample_count=n, res_phi=128, res_cos=64,
                     cos_range=(0.0, cos_bound), ires=32)


@pytest.mark.parametrize("turb", [2.2, 6.0])
@pytest.mark.parametrize("sun_theta", [np.deg2rad(20), np.deg2rad(50)])
def test_sky_sampling_chi2(turb, sun_theta):
    state = _make_state(turb, sun_theta, sun_scale=0.0)
    p_value, ok, info = _run_chi2(state)
    assert ok, f"chi2 failed: p={p_value:.4g} {info}"


@pytest.mark.parametrize("turb", [2.2, 6.0])
def test_sun_and_sky_sampling_chi2(turb):
    # widened 30-degree aperture, like the reference (chi2 resolution)
    state = _make_state(turb, np.deg2rad(50), sun_scale=1.0,
                        aperture_deg=30.0)
    p_value, ok, info = _run_chi2(state)
    assert ok, f"chi2 failed: p={p_value:.4g} {info}"


@pytest.mark.parametrize("sun_theta", np.linspace(0, np.pi / 2, 5))
def test_sun_sampling_in_cone(sun_theta):
    """All sun-strategy samples lie inside the aperture cone
    (reference test05, `test_sunsky.py:201-225`)."""
    sun_phi = -np.pi / 5
    sun_dir = np.array([np.cos(sun_phi) * np.sin(sun_theta),
                        np.sin(sun_phi) * np.sin(sun_theta),
                        np.cos(sun_theta)], np.float32)
    state = _make_state(4.0, sun_theta, sun_phi=sun_phi, sun_scale=1.0,
                        albedo=0.0)
    u = jax.random.uniform(jax.random.PRNGKey(0), (10_000, 2))
    d = np.array(M.sample_sun(state, u))
    cos_ap = np.cos(np.deg2rad(0.5388 / 2.0))
    eps = np.finfo(np.float32).eps
    assert np.all(d @ sun_dir >= cos_ap - eps)


def test_sample_pdf_consistency():
    """pdf_direction matches the pdf implied by sample_direction EXACTLY
    away from the sun-cone FP boundary: lanes whose direction lies
    within one f32 ulp-band of cos(aperture) may land on either side of
    the cone predicate in the two code paths, so that known band is
    masked explicitly instead of budgeting arbitrary mismatches."""
    state = _make_state(4.0, np.deg2rad(40), sun_scale=1.0)
    u = jax.random.uniform(jax.random.PRNGKey(1), (100_000, 2))
    d, pdf = M.sample_direction(state, u)
    pdf2 = M.pdf_direction(state, d)
    cos_cut = float(np.cos(np.asarray(state.params.sun_half_aperture)))
    dot_sun = np.array(d) @ np.array(state.sun_frame_n)
    boundary = np.abs(dot_sun - cos_cut) < 4.0 * np.float32(cos_cut) \
        * np.finfo(np.float32).eps
    mism = np.abs(np.array(pdf) - np.array(pdf2)) > 1e-3 * np.maximum(
        np.array(pdf), 1.0)
    off_boundary = mism & ~boundary
    assert off_boundary.sum() == 0, (
        f"{off_boundary.sum()} mismatched lanes away from the cone "
        f"boundary (boundary-band lanes: {int(boundary.sum())})")
