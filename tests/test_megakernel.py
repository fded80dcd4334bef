"""Direct-illumination megakernel vs the wavefront path.

The megakernel mirrors `_path_sample`'s estimator including the exact
RNG stream ids, so on an eligible scene the two paths consume identical
samples and must agree to transcendental-polynomial round-off — a far
stronger check than a statistical z-test.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpusky as ts
from tpusky.models.sunsky import model as M
from tpusky.models.sunsky.tables import load_tables
from tpusky.render import film as film_mod
from tpusky.render import integrator
from tpusky.render.bsdf import table_kinds
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective


@pytest.fixture()
def mega_env(monkeypatch):
    monkeypatch.setenv("TPUSKY_MEGAKERNEL_INTERPRET", "1")
    monkeypatch.delenv("TPUSKY_DISABLE_PALLAS", raising=False)


def _scene():
    tables = load_tables("rgb")
    p = ts.make_params(turbidity=3.0, albedo=0.3,
                       sun_direction=[0.3, 0.2, 0.93])
    state = M.precompute(tables, p, "rgb")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    disk = np.eye(4, dtype=np.float32)
    disk[0, 3] = 2.5
    disk[2, 3] = 0.05
    sc = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1),
                dict(kind=2, to_world=disk, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]], env=state)
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    return sc, sensor


def test_megakernel_matches_wavefront(mega_env):
    sc, sensor = _scene()
    h = w = 64
    spp = 4
    film = Film(h, w, 3)
    kinds = table_kinds(sc.bsdfs)
    assert integrator._megakernel_ok(sc, sensor, film, spp, 2, "rgb",
                                     "independent", kinds)
    key = jax.random.PRNGKey(7)
    img_m = film_mod.develop(integrator._render_impl(
        sc, sensor, film, key, spp, 2, 1000, "rgb", kinds=kinds))
    img_w = film_mod.develop(integrator.render_rows(
        sc, sensor, film, key, spp, 2, 1000, "rgb", 0, h, kinds=kinds))
    a, b = np.asarray(img_m), np.asarray(img_w)
    # identical RNG streams -> only polynomial-trig differences remain
    assert np.abs(a - b).max() < 1e-3 * max(b.max(), 1.0)


def test_megakernel_ineligible_configs(mega_env):
    sc, sensor = _scene()
    film = Film(64, 64, 3)
    kinds = table_kinds(sc.bsdfs)
    ok = integrator._megakernel_ok
    assert not ok(sc, sensor, film, 4, 3, "rgb", "independent", kinds)
    assert not ok(sc, sensor, film, 4, 2, "spectral", "independent", kinds)
    assert not ok(sc, sensor, film, 4, 2, "rgb", "stratified", kinds)
    assert not ok(sc, sensor, film, 3, 2, "rgb", "independent", kinds)
    assert not ok(sc._replace(env=None), sensor, film, 4, 2, "rgb",
                  "independent", kinds)
    assert not ok(sc, sensor, Film(64, 64, 3, "gaussian"), 4, 2, "rgb",
                  "independent", kinds)
    # non-diffuse materials
    assert not ok(sc, sensor, film, 4, 2, "rgb", "independent",
                  ((0, 1), False))


def test_megakernel_ad_fallback(mega_env):
    """jax.grad through an eligible render must not touch the kernel
    (custom_jvp reroutes to the wavefront path) and must produce the
    same gradient as the wavefront path."""
    sc, sensor = _scene()
    h = w = 32
    spp = 2
    film = Film(h, w, 3)
    kinds = table_kinds(sc.bsdfs)
    tables = load_tables("rgb")
    p = ts.make_params(turbidity=3.0, albedo=0.3,
                       sun_direction=[0.3, 0.2, 0.93])
    key = jax.random.PRNGKey(3)

    def loss_fast(t):
        env = M.precompute(tables, p._replace(turbidity=t), "rgb")
        img = film_mod.develop(integrator._render_impl(
            sc._replace(env=env), sensor, film, key, spp, 2, 1000,
            "rgb", kinds=kinds))
        return img.mean()

    def loss_wave(t):
        env = M.precompute(tables, p._replace(turbidity=t), "rgb")
        img = film_mod.develop(integrator.render_rows(
            sc._replace(env=env), sensor, film, key, spp, 2, 1000,
            "rgb", 0, h, kinds=kinds))
        return img.mean()

    g_fast = float(jax.grad(loss_fast)(jnp.float32(3.0)))
    g_wave = float(jax.grad(loss_wave)(jnp.float32(3.0)))
    assert np.isfinite(g_fast)
    np.testing.assert_allclose(g_fast, g_wave, rtol=1e-5)
