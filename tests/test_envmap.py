"""Environment-map emitter tests: eval lookup, chi-square sampling
consistency, and cross-validation against the constant environment."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render.emitters import (EnvMapState, envmap_eval,
                                    envmap_pdf_direction,
                                    envmap_sample_direction, make_envmap)
from tpusky.utils.chi2 import chi2_test


def _test_bitmap(h=32, w=64):
    """Smooth, asymmetric test radiance."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(w) + 0.5) / w * 2 * np.pi
    pg, tg = np.meshgrid(phi, theta)
    r = 0.2 + np.exp(-((tg - 0.7) ** 2 + (np.cos(pg) - 0.8) ** 2) * 3)
    g = 0.3 + 0.5 * np.cos(tg)
    b = 0.1 + 0.4 * np.sin(pg / 2) ** 2
    return np.stack([r, g, np.abs(b)], -1).astype(np.float32)


def test_envmap_constant_matches_uniform():
    env = make_envmap(np.full((16, 32, 3), 2.5, np.float32))
    d = jax.random.normal(jax.random.PRNGKey(0), (256, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = np.array(envmap_eval(env, d))
    assert np.allclose(out, 2.5, atol=1e-5)


def test_envmap_eval_lookup():
    bm = _test_bitmap()
    env = make_envmap(bm)
    # direction through the centre of texel (row, col)
    h, w = bm.shape[:2]
    row, col = 10, 40
    theta = (row + 0.5) / h * np.pi
    phi = (col + 0.5) / w * 2 * np.pi
    d = jnp.asarray([[np.cos(phi) * np.sin(theta),
                      np.sin(phi) * np.sin(theta), np.cos(theta)]])
    out = np.array(envmap_eval(env, d))[0]
    assert np.allclose(out, bm[row, col], rtol=1e-4), (out, bm[row, col])


def test_envmap_sampling_chi2():
    env = make_envmap(_test_bitmap())

    def sample_fn(key, n):
        u = jax.random.uniform(key, (n, 2))
        return envmap_sample_direction(env, u)[0]

    def pdf_fn(d):
        return envmap_pdf_direction(env, d)

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(0),
                            sample_count=2_000_000, res_phi=64, res_cos=32,
                            cos_range=(-0.99, 0.99), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_envmap_sample_pdf_agree():
    env = make_envmap(_test_bitmap())
    u = jax.random.uniform(jax.random.PRNGKey(1), (50_000, 2))
    d, pdf = envmap_sample_direction(env, u)
    pdf2 = envmap_pdf_direction(env, d)
    rel = np.abs(np.array(pdf) - np.array(pdf2)) / np.maximum(
        np.array(pdf), 1e-9)
    assert np.quantile(rel, 0.99) < 1e-3, np.quantile(rel, 0.99)


def test_tgmm_vs_envmap_cross_validation():
    """The reference validates TGMM sampling against an envmap rasterised
    from the same sky (`sunsky-testing/sky_data_test.py:72-85`): both
    importance samplers must estimate the same hemispherical sky integral.
    """
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables

    state = M.precompute(load_tables("rgb"),
                         ts.make_params(turbidity=4.0, albedo=0.3,
                                        sun_direction=[0.4, 0.1, 0.91],
                                        sun_scale=0.0), "rgb")

    # rasterise the sky into a lat-long bitmap (upper hemisphere)
    h, w = 64, 128
    theta = (jnp.arange(h) + 0.5) / h * jnp.pi
    phi = (jnp.arange(w) + 0.5) / w * 2 * jnp.pi
    pg, tg = jnp.meshgrid(phi, theta)
    d = jnp.stack([jnp.cos(pg) * jnp.sin(tg), jnp.sin(pg) * jnp.sin(tg),
                   jnp.cos(tg)], -1)
    bm = M.eval(state, d.reshape(-1, 3), mode="rgb").reshape(h, w, 3)
    env = make_envmap(np.array(bm))

    def lum(x):
        return 0.212671 * x[..., 0] + 0.715160 * x[..., 1] \
            + 0.072169 * x[..., 2]

    n = 400_000
    u = jax.random.uniform(jax.random.PRNGKey(2), (n, 2))
    # TGMM estimate of integral(lum)
    d_t, pdf_t = M.sample_direction(state, u)
    l_t = lum(np.array(M.eval(state, d_t, mode="rgb")))
    est_tgmm = np.mean(np.where(np.array(pdf_t) > 0,
                                l_t / np.maximum(np.array(pdf_t), 1e-12), 0))
    # envmap estimate
    d_e, pdf_e = envmap_sample_direction(env, u)
    l_e = lum(np.array(M.eval(state, d_e, mode="rgb")))
    est_env = np.mean(l_e / np.maximum(np.array(pdf_e), 1e-12))
    assert abs(est_tgmm - est_env) / est_env < 0.02, (est_tgmm, est_env)


def test_tgmm_pdf_vs_envmap_pdf_pointwise():
    """With the bilinear-continuous envmap warp, the envmap pdf of a
    rasterised sky is a usable *reference pdf* for the TGMM sampler
    pointwise — the reference's `sky_data_test.py:72-85` cross-check.
    The TGMM is a 20-gaussian FIT of the sky, so agreement is
    statistical, not exact: we require high correlation and a bounded
    median relative deviation over the upper hemisphere."""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables

    state = M.precompute(load_tables("rgb"),
                         ts.make_params(turbidity=3.5, albedo=0.3,
                                        sun_direction=[0.35, 0.15, 0.92],
                                        sun_scale=0.0), "rgb")
    h, w = 128, 256
    theta = (jnp.arange(h) + 0.5) / h * jnp.pi
    phi = (jnp.arange(w) + 0.5) / w * 2 * jnp.pi
    pg, tg = jnp.meshgrid(phi, theta)
    dirs = jnp.stack([jnp.cos(pg) * jnp.sin(tg), jnp.sin(pg) * jnp.sin(tg),
                      jnp.cos(tg)], -1)
    bm = M.eval(state, dirs.reshape(-1, 3), mode="rgb").reshape(h, w, 3)
    env = make_envmap(np.array(bm))

    # probe directions away from horizon/zenith
    key = jax.random.PRNGKey(5)
    u = jax.random.uniform(key, (50_000, 2))
    ct = 0.15 + 0.7 * u[:, 0]
    st = jnp.sqrt(1 - ct * ct)
    ph = 2 * jnp.pi * u[:, 1]
    d = jnp.stack([jnp.cos(ph) * st, jnp.sin(ph) * st, ct], -1)
    p_env = np.asarray(envmap_pdf_direction(env, d))
    p_tgmm = np.asarray(M.pdf_direction(state, d))
    m = (p_env > 1e-4) & (p_tgmm > 1e-4)
    rel = np.abs(p_tgmm[m] - p_env[m]) / p_env[m]
    corr = np.corrcoef(np.log(p_tgmm[m]), np.log(p_env[m]))[0, 1]
    assert corr > 0.97, corr
    assert np.median(rel) < 0.25, np.median(rel)


def test_envmap_spectral_rgb2spec_tracks_rgb():
    """Spectral-mode envmap emission routes through per-texel rgb2spec
    spectra (not the channel mean): a strongly coloured envmap keeps its
    colour through the spectral transport."""
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective
    from tpusky.render.film import Film
    from tpusky.render import integrator

    bm = np.zeros((16, 32, 3), np.float32)
    bm[:] = [2.0, 0.7, 0.25]                      # orange sky everywhere
    env = make_envmap(bm, spectral=True)
    assert env.coeff is not None
    scene = make_scene(shapes=[], env=env)
    sensor = make_perspective([0, 0, 1.0], [1, 0, 1.5], fov_x_deg=60)
    film = Film(16, 16, 3)
    img_rgb = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=4,
                                           max_depth=2, mode="rgb"))
    img_spec = np.asarray(integrator.render(scene, sensor, film,
                                            jax.random.PRNGKey(0), spp=128,
                                            max_depth=2, mode="spectral"))
    m_rgb = img_rgb.mean((0, 1))
    m_spec = img_spec.mean((0, 1))
    rel = np.abs(m_spec - m_rgb) / (m_rgb + 1e-6)
    # channel-mean emission would render grey (~1.0 on all channels:
    # rel err ~0.5 on red); rgb2spec keeps the ratio
    assert np.all(rel < 0.2), (m_spec, m_rgb, rel)
