"""Tests for the 2D sampling distributions (reference `distr_2d.h`:
Marginal2D :838, Hierarchical2D :344) and the chi² adapter surface
(`chi2.py:477,530`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusky.ops.distr2d import (hierarchical_pdf, hierarchical_sample,
                                make_hierarchical_2d, make_marginal_2d,
                                marginal_pdf, marginal_sample)
from tpusky.utils.chi2 import BSDFAdapter, EmitterAdapter, chi2_test_2d


def _random_density(h, w, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.uniform(0.05, 1.0, (h, w)) ** 2
    v[h // 3: h // 2, : w // 4] *= 25.0        # a hot patch
    return v


@pytest.mark.parametrize("maker,sampler,pdf_fn", [
    (make_marginal_2d, marginal_sample, marginal_pdf),
    (make_hierarchical_2d, hierarchical_sample, hierarchical_pdf),
], ids=["marginal", "hierarchical"])
def test_2d_distribution_chi2(maker, sampler, pdf_fn):
    d = maker(_random_density(32, 64))

    def sample_fn(key, n):
        xy, _ = sampler(d, jax.random.uniform(key, (n, 2)))
        return xy

    p, ok, info = chi2_test_2d(sample_fn, lambda xy: pdf_fn(d, xy),
                               key=jax.random.PRNGKey(3),
                               sample_count=2_000_000, res_x=64, res_y=32)
    assert ok, (p, info)


@pytest.mark.parametrize("maker,sampler,pdf_fn", [
    (make_marginal_2d, marginal_sample, marginal_pdf),
    (make_hierarchical_2d, hierarchical_sample, hierarchical_pdf),
], ids=["marginal", "hierarchical"])
def test_2d_pdf_normalized_and_consistent(maker, sampler, pdf_fn):
    d = maker(_random_density(16, 16, seed=5))
    # cell-constant density integrates to 1
    fx = (np.arange(64) + 0.5) / 64
    gx, gy = np.meshgrid(fx, fx)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    integral = float(np.mean(np.asarray(pdf_fn(d, pts))))
    assert integral == pytest.approx(1.0, rel=1e-3)
    # sample() returns pdf equal to pdf() at the sampled point
    xy, p = sampler(d, jax.random.uniform(jax.random.PRNGKey(0), (4096, 2)))
    np.testing.assert_allclose(np.array(p), np.array(pdf_fn(d, xy)),
                               rtol=1e-5)
    assert (np.array(xy) >= 0).all() and (np.array(xy) <= 1).all()


def test_hierarchical_requires_pow2():
    with pytest.raises(ValueError):
        make_hierarchical_2d(np.ones((12, 16)))


def test_emitter_adapter_constant_env():
    from tpusky.render.emitters import ConstantEnv
    ad = EmitterAdapter(ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    p, ok, info = ad.run(sample_count=1_000_000)
    assert ok, (p, info)


def test_bsdf_adapter_diffuse():
    from tpusky.render.bsdf import make_material_table
    bsdfs = make_material_table(albedos=np.asarray([[0.8, 0.8, 0.8]],
                                                   np.float32))
    ad = BSDFAdapter(bsdfs, 0, [0.3, 0.1, 0.95])
    p, ok, info = ad.run(sample_count=1_000_000)
    assert ok, (p, info)
