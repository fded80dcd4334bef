"""Sampler tests: stream determinism, stratification quality (variance
reduction vs independent sampling), and QMC uniformity."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import integrator, sampler
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.transform import scale


def test_sampler_streams_deterministic_and_uniform():
    key = jax.random.PRNGKey(0)
    pix = jnp.arange(4096, dtype=jnp.uint32) // 16
    smp = jnp.arange(4096, dtype=jnp.uint32) % 16
    for kind in ("independent", "stratified", "qmc", "multijitter"):
        a = np.array(sampler.lane_samples(kind, key, pix, smp, 16, 3, 2))
        b = np.array(sampler.lane_samples(kind, key, pix, smp, 16, 3, 2))
        assert np.array_equal(a, b), kind
        assert a.min() >= 0.0 and a.max() < 1.0, kind
        assert abs(a.mean() - 0.5) < 0.02, (kind, a.mean())


def test_qmc_stratification_beats_independent():
    """Per-pixel integration error of a smooth function is lower for the
    (0,2)-sequence than for independent samples."""
    key = jax.random.PRNGKey(1)
    n_pix, spp = 256, 64
    pix = jnp.repeat(jnp.arange(n_pix, dtype=jnp.uint32), spp)
    smp = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_pix)

    def pixel_error(kind):
        u = np.array(sampler.lane_samples(kind, key, pix, smp, spp, 0, 2))
        f = u[:, 0] * u[:, 1]  # integral = 1/4
        means = f.reshape(n_pix, spp).mean(-1)
        return np.abs(means - 0.25).mean()

    err_ind = pixel_error("independent")
    err_qmc = pixel_error("qmc")
    err_strat = pixel_error("stratified")
    assert err_qmc < err_ind * 0.5, (err_qmc, err_ind)
    assert err_strat < err_ind, (err_strat, err_ind)


def test_render_with_each_sampler():
    scene = make_scene(shapes=[dict(kind=1, to_world=scale(50), bsdf_idx=0)],
                       bsdf_albedos=[[0.5, 0.5, 0.5]],
                       env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective(origin=[0, 0, 3], target=[0.01, 0, 0],
                              fov_x_deg=30)
    film = Film(8, 8, 3)
    for kind in ("independent", "stratified", "qmc", "multijitter"):
        img = np.array(integrator.render(scene, sensor, film,
                                         jax.random.PRNGKey(0), spp=128,
                                         max_depth=2, sampler_kind=kind))
        assert np.isfinite(img).all()
        assert abs(img.mean() - 0.5) < 0.03, (kind, img.mean())


def test_multijitter_cmj_stratification():
    """CMJ pairs are stratified on BOTH the spp fine grid (each axis) and
    the m x n coarse grid — the defining property of correlated
    multi-jitter (Kensler memo 13-01)."""
    key = jax.random.PRNGKey(7)
    spp = 16          # m = n = 4
    for pix_id in (0, 3, 1234):
        pix = jnp.full((spp,), pix_id, jnp.uint32)
        smp = jnp.arange(spp, dtype=jnp.uint32)
        u = np.array(sampler.lane_samples("multijitter", key, pix, smp,
                                          spp, 5, 2))
        # fine stratification: one sample per 1/spp stratum on each axis
        fx = np.floor(u[:, 0] * spp).astype(int)
        fy = np.floor(u[:, 1] * spp).astype(int)
        assert sorted(fx) == list(range(spp)), fx
        assert sorted(fy) == list(range(spp)), fy
        # coarse 4x4 jittered grid: exactly one sample per cell
        cx = np.floor(u[:, 0] * 4).astype(int)
        cy = np.floor(u[:, 1] * 4).astype(int)
        cells = sorted(cx * 4 + cy)
        assert cells == list(range(16)), cells


def test_multijitter_beats_stratified_on_2d():
    """On a smooth 2D integrand CMJ error is at most stratified error
    (it adds Latin-hypercube fine stratification on top)."""
    key = jax.random.PRNGKey(11)
    n_pix, spp = 256, 16

    def pixel_error(kind):
        pix = jnp.repeat(jnp.arange(n_pix, dtype=jnp.uint32), spp)
        smp = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_pix)
        u = np.array(sampler.lane_samples(kind, key, pix, smp, spp, 0, 2))
        f = u[:, 0] * u[:, 1]
        means = f.reshape(n_pix, spp).mean(-1)
        return np.abs(means - 0.25).mean()

    err_mj = pixel_error("multijitter")
    err_ind = pixel_error("independent")
    assert err_mj < 0.6 * err_ind, (err_mj, err_ind)


def test_orthogonal_oa_property():
    """Bose OA strength 2: for spp = p^2 (p prime), any two dimensions
    with distinct multipliers place exactly one point per p x p cell
    (reference `orthogonal.cpp` construction)."""
    key = jax.random.PRNGKey(3)
    spp = 25; p = 5
    pix = jnp.zeros((spp,), jnp.uint32)
    smp = jnp.arange(spp, dtype=jnp.uint32)
    u = np.array(sampler.lane_samples("orthogonal", key, pix, smp, spp,
                                      0, 2))
    # 2D pairwise stratification at p x p
    cx = (u[:, 0] * p).astype(int)
    cy = (u[:, 1] * p).astype(int)
    cells = set(zip(cx.tolist(), cy.tolist()))
    assert len(cells) == spp, len(cells)
    # 1D projections are Latin-hypercube at spp strata
    for c in range(2):
        strata = np.unique((u[:, c] * spp).astype(int))
        assert len(strata) == spp, (c, strata)
    # determinism + range
    u2 = np.array(sampler.lane_samples("orthogonal", key, pix, smp, spp,
                                       0, 2))
    assert np.array_equal(u, u2)
    assert u.min() >= 0 and u.max() < 1


def test_orthogonal_falls_back_and_renders():
    key = jax.random.PRNGKey(0)
    pix = jnp.arange(64, dtype=jnp.uint32) // 16
    smp = jnp.arange(64, dtype=jnp.uint32) % 16
    u = np.array(sampler.lane_samples("orthogonal", key, pix, smp, 16,
                                      1, 2))   # 16 = 4^2, 4 not prime
    assert u.shape == (64, 2) and u.min() >= 0 and u.max() < 1
    # end-to-end render with the OA sampler
    plane = np.diag([100.0, 100.0, 1.0, 1.0]).astype(np.float32)
    scene = make_scene(shapes=[dict(kind=1, to_world=plane, bsdf_idx=0)],
                       bsdf_albedos=[[0.5, 0.5, 0.5]],
                       env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective(origin=[0, 0, 3.0], target=[0.01, 0, 0],
                              fov_x_deg=30)
    img = np.array(integrator.render(scene, sensor, Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=49,
                                     max_depth=2,
                                     sampler_kind="orthogonal"))
    assert np.allclose(img.mean(), 0.5, rtol=0.03), img.mean()


def test_no_stream_collision_across_adjacent_dims():
    """Streams of dim d channel c must never alias those of dim d' != d.

    Regression for the stride-2 scheme where next(d, 3)[..., 2] was
    bitwise equal to next(d+1, 2)[..., 0] (correlated free-flight and
    medium-NEE draws for 3+ media regions).
    """
    key = jax.random.PRNGKey(7)
    pix = jnp.arange(256, dtype=jnp.uint32)
    smp = jnp.zeros(256, dtype=jnp.uint32)
    for kind in ("independent", "stratified", "qmc"):
        a = np.array(sampler.lane_samples(kind, key, pix, smp, 4,
                                          100_000, 3))
        b = np.array(sampler.lane_samples(kind, key, pix, smp, 4,
                                          100_001, 2))
        for ca in range(3):
            for cb in range(2):
                assert not np.array_equal(a[:, ca], b[:, cb]), \
                    (kind, ca, cb)
