"""Renderer integration tests: analytic checks, determinism, mesh
invariance, and gradient-vs-finite-difference correctness.

These play the role of the reference's `test_renders.py` (statistical
regression) and `test_ad_integrators.py` (AD vs FD, bars mean<=0.05
`test_ad_integrators.py:52-58`) — adapted to analytic oracles instead of
stored images where possible, plus the multi-chip equivalence tests the
reference never had (SURVEY.md §4 item 7).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tpusky as ts
from tpusky.models.sunsky import model as M
from tpusky.models.sunsky.tables import load_tables
from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film, develop
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.parallel.render import make_mesh, render_sharded


def _sunsky_scene(turbidity=3.0):
    env = M.precompute(load_tables("rgb"),
                       ts.make_params(turbidity=turbidity, albedo=0.3,
                                      sun_direction=[0.3, 0.2, 0.93]), "rgb")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]],
        env=env)
    sensor = make_perspective(origin=[4, -4, 2.0], target=[0, 0, 1.0],
                              fov_x_deg=45)
    return scene, sensor


def test_diffuse_plane_under_constant_env():
    """A diffuse plane under a uniform environment reflects albedo * L
    (analytic check of NEE + BSDF-sample MIS combination)."""
    plane = np.diag([100.0, 100.0, 1.0, 1.0]).astype(np.float32)
    scene = make_scene(shapes=[dict(kind=1, to_world=plane, bsdf_idx=0)],
                       bsdf_albedos=[[0.5, 0.5, 0.5]],
                       env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective(origin=[0, 0, 3.0], target=[0.01, 0, 0],
                              fov_x_deg=30)
    film = Film(16, 16, 3)
    img = np.array(integrator.render(scene, sensor, film,
                                     jax.random.PRNGKey(0), spp=512,
                                     max_depth=2))
    assert np.allclose(img.mean(axis=(0, 1)), 0.5, rtol=0.02), img.mean((0, 1))


def test_render_deterministic():
    scene, sensor = _sunsky_scene()
    film = Film(32, 32, 3)
    a = np.array(integrator.render(scene, sensor, film,
                                   jax.random.PRNGKey(7), spp=4))
    b = np.array(integrator.render(scene, sensor, film,
                                   jax.random.PRNGKey(7), spp=4))
    assert np.array_equal(a, b)


def test_spp_chunking_invariance():
    """Chunked rendering (bounded wavefront) equals one-shot rendering."""
    scene, sensor = _sunsky_scene()
    film = Film(16, 16, 3)
    key = jax.random.PRNGKey(3)
    full = integrator.render_rows(scene, sensor, film, key, 8, 2, 1000,
                                  "rgb", 0, 16, max_lanes=1 << 21)
    chunked = integrator.render_rows(scene, sensor, film, key, 8, 2, 1000,
                                     "rgb", 0, 16, max_lanes=16 * 16 * 2)
    assert np.allclose(np.array(full), np.array(chunked), atol=1e-4)


def test_multichip_matches_single_chip():
    """8-device sharded render equals the single-device render (same key)."""
    from tpusky.render.film import develop
    scene, sensor = _sunsky_scene()
    film = Film(32, 32, 3)
    key = jax.random.PRNGKey(11)
    single = np.array(develop(integrator.render_rows(
        scene, sensor, film, key, 4, 2, 1000, "rgb", 0, 32)))
    mesh = make_mesh(jax.devices()[:8])
    sharded = np.array(render_sharded(scene, sensor, film, key, 4, mesh,
                                      max_depth=2))
    assert np.allclose(single, sharded, atol=1e-5), (
        np.abs(single - sharded).max())


def test_gradient_vs_finite_differences_direct():
    """AD == FD on a direct sky-dome render (deterministic path: camera ray
    hits the environment; no sampling variance involved)."""
    tables = load_tables("rgb")

    def dome(t):
        params = ts.make_params(turbidity=t, albedo=0.3,
                                sun_direction=[0.3, 0.2, 0.93])
        env = M.precompute(tables, params, "rgb")
        phi, th = np.meshgrid(np.linspace(0, 2 * np.pi, 24),
                              np.linspace(0.05, np.pi / 2 - 0.05, 12))
        d = np.stack([np.cos(phi) * np.sin(th), np.sin(phi) * np.sin(th),
                      np.cos(th)], -1).astype(np.float32)
        return M.eval(env, jnp.asarray(d), mode="rgb")

    grad_ad = np.array(jax.jacfwd(dome)(jnp.float32(4.3)))
    eps = 1e-2
    fd = (np.array(dome(jnp.float32(4.3 + eps)))
          - np.array(dome(jnp.float32(4.3 - eps)))) / (2 * eps)
    scale = np.abs(fd).mean() + 1e-9
    err = np.abs(grad_ad - fd).mean() / scale
    assert err <= 5e-3, f"AD vs FD mean rel err {err}"


def test_gradient_vs_finite_differences_render():
    """Detached-AD image gradient matches a high-spp FD estimate on the full
    path-traced render (both estimators are unbiased but only agree in
    expectation; reference bar mean err <= 0.05,
    `test_ad_integrators.py:52-58`)."""
    tables = load_tables("rgb")
    base_scene, sensor = _sunsky_scene()
    film = Film(8, 8, 3)

    def render_t(t, key, spp):
        params = ts.make_params(turbidity=t, albedo=0.3,
                                sun_direction=[0.3, 0.2, 0.93])
        env = M.precompute(tables, params, "rgb")
        scene = base_scene._replace(env=env)
        return integrator.render(scene, sensor, film, key, spp=spp,
                                 max_depth=2)

    key = jax.random.PRNGKey(0)
    grad_ad = np.array(jax.jacfwd(
        lambda t: render_t(t, key, 128))(jnp.float32(4.3)))
    eps = 0.25  # large FD step averages out sample-motion noise
    fd = np.zeros_like(grad_ad)
    n_keys = 4
    for i in range(n_keys):
        k = jax.random.PRNGKey(100 + i)
        fd += (np.array(render_t(jnp.float32(4.3 + eps), k, 128))
               - np.array(render_t(jnp.float32(4.3 - eps), k, 128)))
    fd /= (2 * eps * n_keys)
    # Both estimators are unbiased but carry independent MC noise; check
    # agreement statistically rather than pointwise.
    corr = np.corrcoef(grad_ad.ravel(), fd.ravel())[0, 1]
    ratio = np.abs(grad_ad).mean() / (np.abs(fd).mean() + 1e-12)
    assert corr > 0.9, f"AD/FD correlation {corr}"
    assert 0.7 < ratio < 1.3, f"AD/FD magnitude ratio {ratio}"


def test_train_step_reduces_loss():
    """A few Adam steps on turbidity move the render toward the target."""
    import optax
    from tpusky.parallel.render import make_train_step
    tables = load_tables("rgb")
    base_scene, sensor = _sunsky_scene()
    film = Film(16, 16, 3)
    mesh = make_mesh(jax.devices()[:4])

    def scene_builder(params):
        return base_scene._replace(env=M.precompute(tables, params, "rgb"))

    target_params = ts.make_params(turbidity=6.0, albedo=0.3,
                                   sun_direction=[0.3, 0.2, 0.93])
    target = render_sharded(scene_builder(target_params), sensor, film,
                            jax.random.PRNGKey(5), 8, mesh, max_depth=2)

    optimizer = optax.adam(0.2)
    step = make_train_step(tables, scene_builder, sensor, film, 8, mesh,
                           optimizer, max_depth=2)
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    opt_state = optimizer.init(params)
    for i in range(15):
        # fresh sample set each iteration (stochastic gradient descent)
        opt_state, params, loss = step(opt_state, params, target,
                                       jax.random.fold_in(
                                           jax.random.PRNGKey(5), i))
        assert np.isfinite(float(loss))
    # turbidity should move noticeably toward the target value 6.0
    assert float(params.turbidity) > 4.0, float(params.turbidity)


def test_many_light_single_sample_selection_unbiased():
    """>2 delta lights switch NEE to single-sample emitter selection over
    `sampling_weight` (`scene.cpp:100-119,295-345`): a 16-point-light
    render agrees with the sum of per-light renders (each taking the
    unrolled path) under a per-pixel Z-test, with one BSDF eval + one
    shadow ray per vertex regardless of the light count."""
    import numpy as np
    import jax
    from tpusky.render import integrator
    from tpusky.render.film import Film
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective

    rng = np.random.default_rng(0)
    lights = []
    for i in range(16):
        pos = np.asarray([rng.uniform(-3, 3), rng.uniform(-3, 3),
                          rng.uniform(1.0, 3.0)])
        inten = rng.uniform(0.5, 4.0, size=3)
        lights.append(np.concatenate([pos, inten]))
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, size=16)

    def scene_of(light_rows, w=None):
        return make_scene(
            shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
            bsdf_albedos=[[0.6, 0.5, 0.4]], env=None,
            point_lights=np.stack(light_rows),
            delta_light_weights=w)

    sensor = make_perspective([0, 0, 4.0], [0, 0.01, 0], fov_x_deg=50)
    film = Film(16, 16, 3)

    # reference: sum of per-light renders (unrolled path; light transport
    # is linear in the emitters) — K independent runs so ITS noise enters
    # the Z denominator too
    K = 6
    ref_runs = []
    for k in range(K):
        acc = np.zeros((16, 16, 3))
        for li in range(16):
            acc += np.asarray(integrator.render(
                scene_of([lights[li]]), sensor, film,
                jax.random.PRNGKey(1000 * k + 11), spp=32, max_depth=2))
        ref_runs.append(acc)
    ref_runs = np.stack(ref_runs)
    ref_mean, ref_var = ref_runs.mean(0), ref_runs.var(0, ddof=1)

    # the selection estimator is SPIKY (a small-pmf light can dominate a
    # pixel), so cross-run sample variance underestimates badly whenever
    # the spike is undersampled; use the estimator's own second moment
    # (`render_moments`, the reference's moment.cpp machinery) for an
    # honest per-pixel variance like `test_renders.py:159` does.
    spp_ss = 4096
    mean, m2 = integrator.render_moments(
        scene_of(lights, weights), sensor, film, jax.random.PRNGKey(100),
        spp=spp_ss, max_depth=2)
    mean = np.asarray(mean)
    var1 = np.maximum(np.asarray(m2) - mean ** 2, 0.0)
    z = np.abs(mean - ref_mean) / np.sqrt(
        var1 / spp_ss + ref_var / K + 1e-8)
    import scipy.stats as st
    thresh = st.norm.ppf(1 - 0.5 * (1 - (1 - 0.01) ** (1 / z.size)))
    bad = int((z > 1.5 * thresh).sum())
    rel = abs(mean.mean() - ref_mean.mean()) / ref_mean.mean()
    assert bad == 0 and rel < 0.02, (bad, float(z.max()), rel)

    # uniform weights agree too (weights only reshape variance)
    img_u = np.asarray(integrator.render(
        scene_of(lights), sensor, film, jax.random.PRNGKey(500),
        spp=512, max_depth=2))
    rel_u = abs(img_u.mean() - ref_mean.mean()) / ref_mean.mean()
    assert rel_u < 0.05, rel_u
