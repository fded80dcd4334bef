"""Participating-media tests (reference H19: `src/media/homogeneous.cpp`,
`src/phase/{isotropic,hg}.cpp`, `src/integrators/volpath.cpp`).

Analytic oracles:
- Beer-Lambert transmittance through a convex homogeneous region
  (absorption-only: zero-variance exponential attenuation).
- The scattering furnace: a non-absorbing medium inside an isotropic
  uniform environment leaves the radiance field exactly L everywhere,
  for ANY phase function (energy conservation of multiple scattering).
- HG phase: pdf quadrature == 1, sample/pdf chi² consistency, g=0 ==
  isotropic 1/4π.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.medium import (hg_pdf, hg_sample, make_medium,
                                  medium_interval, transmittance)
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.chi2 import chi2_test


# ---------------------------------------------------------------------------
# phase function
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("g", [0.0, 0.35, -0.6, 0.85])
def test_hg_pdf_normalized(g):
    th = np.linspace(0, np.pi, 100_001)
    vals = np.array(hg_pdf(g, jnp.cos(th))) * np.sin(th) * 2 * np.pi
    assert np.trapezoid(vals, th) == pytest.approx(1.0, abs=1e-4)


def test_hg_g0_is_isotropic():
    np.testing.assert_allclose(
        np.array(hg_pdf(0.0, jnp.linspace(-1, 1, 7))), 1 / (4 * np.pi),
        rtol=1e-6)


@pytest.mark.parametrize("g", [0.3, -0.5, 0.8])
def test_hg_sample_pdf_chi2(g):
    fwd = jnp.asarray([0.0, 0.0, 1.0])

    def sample_fn(key, count):
        u = jax.random.uniform(key, (count, 2))
        wo, _ = hg_sample(g, jnp.broadcast_to(fwd, (count, 3)), u)
        return wo

    def pdf_fn(d):
        return hg_pdf(g, d[..., 2])

    p, passed, info = chi2_test(sample_fn, pdf_fn,
                                key=jax.random.PRNGKey(0),
                                sample_count=1_000_000)
    assert passed, (p, info)


def test_hg_sample_pdf_self_consistent():
    """pdf returned by hg_sample equals hg_pdf of the returned direction."""
    u = jax.random.uniform(jax.random.PRNGKey(1), (4096, 2))
    d = jnp.tile(jnp.asarray([[0.6, 0.0, 0.8]]), (4096, 1))
    wo, pdf = hg_sample(0.5, d, u)
    np.testing.assert_allclose(np.array(pdf),
                               np.array(hg_pdf(0.5, jnp.sum(wo * d, -1))),
                               rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# medium geometry
# ---------------------------------------------------------------------------

def test_interval_sphere_scaled():
    import numpy as _np
    t2w = _np.diag([3.0, 3.0, 3.0, 1.0]).astype(_np.float32)
    med = make_medium(0.5, 0.0, to_world=t2w, kind="sphere")
    o = jnp.asarray([[-10.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t0, t1 = medium_interval(med, o, d)
    assert float(t0[0]) == pytest.approx(7.0, abs=1e-4)
    assert float(t1[0]) == pytest.approx(13.0, abs=1e-4)
    T = transmittance(med, o, d, jnp.asarray([jnp.inf]))
    assert float(T[0, 0]) == pytest.approx(np.exp(-0.5 * 6.0), rel=1e-5)


def test_interval_cube():
    med = make_medium(1.0, 0.0, kind="cube")
    o = jnp.asarray([[0.0, 0.0, -5.0], [3.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t0, t1 = medium_interval(med, o, d)
    np.testing.assert_allclose(np.array(t0), [4.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.array(t1), [6.0, 0.0], atol=1e-5)


# ---------------------------------------------------------------------------
# renders
# ---------------------------------------------------------------------------

def _medium_scene(sigma_t, albedo, g=0.0, radius=2.0, L=1.0):
    t2w = np.diag([radius, radius, radius, 1.0]).astype(np.float32)
    med = make_medium(sigma_t, albedo, g=g, to_world=t2w, kind="sphere")
    scene = make_scene(env=ConstantEnv(jnp.asarray([L, L, L])), medium=med)
    # camera at the sphere center looking out (NOT along the up axis,
    # which would degenerate the look-at basis)
    sensor = make_perspective(origin=[0, 0, 0], target=[1, 0.2, 0.1],
                              fov_x_deg=60)
    return scene, sensor


def test_absorption_only_beer_lambert():
    """Camera at the center of an absorbing fog ball: every ray sees
    exp(-sigma_t * R) * L_env — exact, zero variance (analytic
    transmittance on emissive hits)."""
    sigma, R = 0.7, 2.0
    scene, sensor = _medium_scene(sigma, albedo=0.0, radius=R)
    img = np.array(integrator.render(scene, sensor, Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=4,
                                     max_depth=2))
    want = np.exp(-sigma * R)
    np.testing.assert_allclose(img, want, rtol=1e-4)


@pytest.mark.parametrize("g", [0.0, 0.5])
def test_scattering_furnace(g):
    """Non-absorbing medium in a uniform environment: radiance stays
    exactly L everywhere for any phase function. Exercises free-flight
    sampling, phase sampling, medium NEE and their MIS jointly."""
    scene, sensor = _medium_scene(sigma_t=1.0, albedo=1.0, g=g, radius=1.5)
    img = np.array(integrator.render(scene, sensor, Film(8, 8, 3),
                                     jax.random.PRNGKey(1), spp=256,
                                     max_depth=64, rr_depth=1000))
    assert img.mean() == pytest.approx(1.0, rel=0.015), img.mean()
    assert np.abs(img - 1.0).max() < 0.15


def test_fog_over_diffuse_floor():
    """A diffuse floor seen through fog: brightness must decrease
    monotonically with extinction and agree with Beer-Lambert in the
    absorption-only limit."""
    floor = np.diag([50.0, 50.0, 1.0, 1.0]).astype(np.float32)
    t2w = np.diag([4.0, 4.0, 4.0, 1.0]).astype(np.float32)
    t2w[2, 3] = 4.0   # fog ball floating above the floor

    def render_with(sigma):
        med = (None if sigma == 0.0 else
               make_medium(sigma, 0.0, to_world=t2w, kind="sphere"))
        scene = make_scene(
            shapes=[dict(kind=1, to_world=floor, bsdf_idx=0)],
            bsdf_albedos=[[0.8, 0.8, 0.8]],
            env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])), medium=med)
        sensor = make_perspective(origin=[0, 0, 10.0], target=[0.01, 0, 0],
                                  fov_x_deg=20)
        return np.array(integrator.render(scene, sensor, Film(8, 8, 3),
                                          jax.random.PRNGKey(2), spp=128,
                                          max_depth=3))

    base = render_with(0.0)
    fogged = render_with(0.25)
    # camera ray crosses the 8-long fog diameter going down, and the
    # shadow/NEE rays going back up cross ~the same; direct floor term
    # attenuates by ~exp(-0.25*8) each way
    assert fogged.mean() < base.mean() * 0.35
    assert fogged.mean() > 0.0


def test_medium_scene_differentiable():
    """Gradient of the image w.r.t. sigma_t is finite and matches FD
    (the whole medium path is plain traced math — H19 differentiable
    for free, unlike the reference where volpath needs prbvolpath)."""
    def mean_img(sigma):
        R = 2.0
        t2w = jnp.diag(jnp.asarray([R, R, R, 1.0]))
        from tpusky.render.medium import Medium
        med = Medium(sigma_t=jnp.atleast_1d(sigma),
                     albedo=jnp.asarray([0.0]), g=jnp.asarray(0.0),
                     to_local=jnp.linalg.inv(t2w), kind=0)
        scene = make_scene(env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])),
                           medium=med)
        sensor = make_perspective(origin=[0, 0, 0], target=[1, 0.2, 0.1],
                                  fov_x_deg=60)
        return integrator.render(scene, sensor, Film(4, 4, 3),
                                 jax.random.PRNGKey(0), spp=4,
                                 max_depth=2).mean()

    g = float(jax.grad(mean_img)(jnp.float32(0.7)))
    eps = 1e-3
    fd = (float(mean_img(jnp.float32(0.7 + eps)))
          - float(mean_img(jnp.float32(0.7 - eps)))) / (2 * eps)
    assert np.isclose(g, fd, rtol=5e-3), (g, fd)
    # Beer-Lambert: d/dsigma exp(-sigma R) = -R exp(-sigma R)
    assert np.isclose(g, -2.0 * np.exp(-0.7 * 2.0), rtol=5e-3)


# ---------------------------------------------------------------------------
# loader integration
# ---------------------------------------------------------------------------

def test_load_dict_volpath_fog():
    """`volpath` integrator + shape-bound `interior` homogeneous medium
    through the dict loader (reference scene syntax, `xml_v.cpp` +
    `homogeneous.cpp` props)."""
    from tpusky.render.loader import load_dict
    from tpusky.utils.transform import look_at, scale
    b = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 16},
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": look_at([0, -6, 1.0], [0, 0, 1.0]),
                   "film": {"width": 16, "height": 12},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "emitter": {"type": "constant", "radiance": 1.0},
        "floor": {"type": "rectangle", "to_world": scale(20)},
        "fog": {"type": "sphere", "to_world": scale(2.5),
                "interior": {"type": "homogeneous", "sigma_t": 0.6,
                             "albedo": 0.9,
                             "phase": {"type": "hg", "g": 0.4}}},
    })
    assert b._scene_static.medium is not None
    assert float(b._scene_static.medium.g) == pytest.approx(0.4)
    img = np.array(b.render(seed=0))
    assert img.shape == (12, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0.1


# ---------------------------------------------------------------------------
# heterogeneous (grid-density) media — `heterogeneous.cpp` + `grid.cpp`
# ---------------------------------------------------------------------------

from tpusky.render.medium import eval_density, line_density, \
    sample_interaction


def test_grid_density_trilinear_ramp():
    """A grid linear in z interpolates exactly (trilinear is exact for
    per-axis-linear fields), and its line integral matches the analytic
    value (midpoint rule is exact for linear integrands)."""
    z = np.linspace(0.0, 1.0, 5, dtype=np.f4 if hasattr(np, "f4")
                    else np.float32)
    grid = np.broadcast_to(z[:, None, None], (5, 4, 3)).copy()
    med = make_medium([2.0], [0.0], kind="cube", density=grid, n_steps=32)
    # density(p) = (z_local + 1)/2
    p = jnp.asarray([[0.0, 0.0, 0.5], [0.3, -0.2, -1.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.array(eval_density(med, p)),
                               [0.75, 0.0, 1.0], atol=1e-6)
    # vertical ray through the cube: D = ∫_{-1}^{1} (z+1)/2 dz = 1
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    D = line_density(med, o, d, jnp.asarray([jnp.inf]))
    assert float(D[0]) == pytest.approx(1.0, abs=1e-5)
    T = transmittance(med, o, d, jnp.asarray([jnp.inf]))
    assert float(T[0, 0]) == pytest.approx(np.exp(-2.0), rel=1e-5)


def test_grid_constant_matches_homogeneous():
    """Unit grid density reproduces the homogeneous medium exactly:
    same free-flight distances, weights, and transmittance."""
    hom = make_medium([0.4, 0.8, 1.2], [0.6, 0.6, 0.6], kind="cube")
    het = make_medium([0.4, 0.8, 1.2], [0.6, 0.6, 0.6], kind="cube",
                      density=np.ones((4, 4, 4), np.float32), n_steps=16)
    o = jnp.asarray([[0.0, -0.1, -5.0]] * 64)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 64)
    t0, t1 = medium_interval(hom, o, d)
    seg = t1 - t0
    u = jax.random.uniform(jax.random.PRNGKey(0), (64,))
    sc_h, s_h, T_h, wp_h, ws_h = sample_interaction(hom, o, d, t0, seg, u)
    sc_g, s_g, T_g, wp_g, ws_g = sample_interaction(het, o, d, t0, seg, u)
    np.testing.assert_allclose(np.array(s_g), np.array(s_h), atol=1e-4)
    assert (np.array(sc_g) == np.array(sc_h)).all()
    np.testing.assert_allclose(np.array(T_g), np.array(T_h), rtol=1e-5)
    np.testing.assert_allclose(np.array(wp_g), np.array(wp_h), rtol=1e-5)
    np.testing.assert_allclose(np.array(ws_g), np.array(ws_h), rtol=1e-4)


def test_grid_scattering_furnace():
    """Energy conservation with a NON-UNIFORM density: a non-absorbing
    grid medium inside a uniform environment leaves radiance = L
    everywhere (any density, any phase function) — validates the
    free-flight inversion and both ratio weights."""
    rng = np.random.default_rng(3)
    grid = rng.uniform(0.2, 2.0, size=(8, 8, 8)).astype(np.float32)
    t2w = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    med = make_medium([1.0, 1.0, 1.0], [1.0, 1.0, 1.0], g=0.3,
                      to_world=t2w, kind="cube", density=grid, n_steps=48)
    scene = make_scene(env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])),
                       medium=med)
    sensor = make_perspective(origin=[0, 0, 0], target=[1, 0.2, 0.1],
                              fov_x_deg=60)
    img = np.array(integrator.render(scene, sensor, Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=192,
                                     max_depth=24))
    np.testing.assert_allclose(img.mean(), 1.0, rtol=0.015)
    np.testing.assert_allclose(img, 1.0, rtol=0.2)   # per-pixel MC noise


def test_grid_medium_load_dict():
    """Loader path: cube shape with a heterogeneous interior (inline
    gridvolume) renders finite and darker at higher scale."""
    grid = np.ones((4, 4, 4), np.float32)
    grid[:, :2] = 3.0

    def bundle(scale):
        from tpusky.render.loader import load_dict
        return load_dict({
            "type": "scene",
            "integrator": {"type": "volpath", "max_depth": 6},
            "sensor": {"type": "perspective", "fov": 60,
                       "to_world": {"type": "look_at",
                                    "origin": [0, -6, 0],
                                    "target": [0, 0, 0], "up": [0, 0, 1]},
                       "film": {"height": 8, "width": 8},
                       "sampler": {"sample_count": 32}},
            "env": {"type": "constant", "radiance": 1.0},
            "fog": {"type": "cube",
                    "to_world": {"scale": [1.5, 1.5, 1.5]},
                    "interior": {"type": "heterogeneous",
                                 "sigma_t": {"type": "gridvolume",
                                             "grid": grid},
                                 "scale": scale,
                                 "albedo": 0.3,
                                 "phase": {"type": "hg", "g": 0.4}}},
        })
    im1 = np.asarray(bundle(0.5).render(seed=0))
    im2 = np.asarray(bundle(2.5).render(seed=0))
    assert np.isfinite(im1).all() and np.isfinite(im2).all()
    assert im2.mean() < im1.mean()


def test_grid_medium_differentiable():
    """d(image)/d(density grid) is finite and nonzero — the march is
    differentiable end-to-end (inverse volume rendering)."""
    t2w = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    base = np.full((4, 4, 4), 0.8, np.float32)
    sensor = make_perspective(origin=[0, -6, 0], target=[0, 0, 0],
                              fov_x_deg=40)

    def loss(grid):
        med = make_medium([1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
                          to_world=t2w, kind="cube", density=grid,
                          n_steps=16)
        scene = make_scene(env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])),
                           medium=med)
        img = integrator.render(scene, sensor, Film(4, 4, 3),
                                jax.random.PRNGKey(0), spp=4, max_depth=2)
        return jnp.mean(img)

    g = jax.grad(loss)(jnp.asarray(base))
    g = np.array(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    assert (g <= 1e-9).all()   # denser fog can only darken a furnace view


# ---------------------------------------------------------------------------
# Rayleigh phase (`src/phase/rayleigh.cpp`) + Catmull-Rom rfilter
# ---------------------------------------------------------------------------

from tpusky.render.medium import rayleigh_pdf, rayleigh_sample


def test_rayleigh_pdf_normalized():
    th = np.linspace(0, np.pi, 100_001)
    vals = np.array(rayleigh_pdf(jnp.cos(th))) * np.sin(th) * 2 * np.pi
    assert np.trapezoid(vals, th) == pytest.approx(1.0, abs=1e-4)


def test_rayleigh_sample_pdf_chi2():
    fwd = jnp.asarray([0.0, 0.0, 1.0])

    def sample_fn(key, count):
        u = jax.random.uniform(key, (count, 2))
        wo, _ = rayleigh_sample(jnp.broadcast_to(fwd, (count, 3)), u)
        return wo

    def pdf_fn(d):
        return rayleigh_pdf(d[..., 2])

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(2),
                            sample_count=1_000_000, res_phi=32, res_cos=32,
                            cos_range=(-1.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_rayleigh_scattering_furnace():
    """Energy conservation with the Rayleigh phase: albedo-1 medium in a
    uniform environment keeps radiance = L."""
    t2w = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    med = make_medium([0.8] * 3, [1.0] * 3, to_world=t2w, kind="sphere",
                      phase="rayleigh")
    scene = make_scene(env=ConstantEnv(jnp.asarray([1.0] * 3)), medium=med)
    sensor = make_perspective(origin=[0, 0, 0], target=[1, 0.2, 0.1],
                              fov_x_deg=60)
    img = np.array(integrator.render(scene, sensor, Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=128,
                                     max_depth=24))
    np.testing.assert_allclose(img.mean(), 1.0, rtol=0.02)


def test_rayleigh_loader():
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 6},
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": {"type": "look_at", "origin": [0, -6, 0],
                                "target": [0, 0, 0], "up": [0, 0, 1]},
                   "film": {"height": 8, "width": 8,
                            "rfilter": {"type": "catmullrom"}},
                   "sampler": {"sample_count": 16}},
        "env": {"type": "constant", "radiance": 1.0},
        "fog": {"type": "sphere",
                "to_world": {"scale": [1.5, 1.5, 1.5]},
                "interior": {"type": "homogeneous", "sigma_t": 0.7,
                             "albedo": 0.6,
                             "phase": {"type": "rayleigh"}}},
    })
    img = np.asarray(bundle.render(seed=0))
    assert np.isfinite(img).all() and img.max() > 0


@pytest.mark.slow
def test_grid_sigma_gradient_depth6_fd():
    """prbvolpath-parity check (VERDICT r3 item 8; reference
    `ad/integrators/prbvolpath.py:1-434`): gradients of renders w.r.t. a
    heterogeneous density grid, with the backward pass memory-bounded by
    the `jax.checkpoint`-ed bounce scan (each bounce's density march is
    rematerialised, never stored for all 6 bounces at once).

    Three gates, from exact to statistical:
      1. estimator-level: the detached-sampling ratio weights' grid
         gradient matches the ANALYTIC derivative of their expectation
         (pure-absorption pass weight E=T(D), and absorption+scatter
         mixture E = T + 0.5(1-T)) to MC accuracy. This is the part a
         previous implementation silently lost (it cancelled dens(x_s)
         between value and pdf analytically; AD came out 100x low).
      2. depth-1 render: radiance = env * T_seg is analytic in the grid
         (no sampling events) -> AD == FD tightly.
      3. depth-6 render on a 64^3 grid: the full adjoint runs with
         bounded memory, is finite, nonzero, and descends the loss.
    """
    from tpusky.render.medium import (sample_interaction, medium_interval,
                                      line_density)

    rng = np.random.default_rng(5)

    # ---- 1. estimator vs analytic expectation (16^3 grid) ----
    g16 = (0.5 + 0.5 * rng.random((8, 8, 8))).astype(np.float32)
    N = 100_000
    u = jnp.asarray(rng.random(N).astype(np.float32))
    o = jnp.broadcast_to(jnp.asarray([0.0, -2.0, 0.1]), (N, 3))
    dd = np.asarray([0.0, 1.0, 0.05]) / np.linalg.norm([0, 1, 0.05])
    d = jnp.broadcast_to(jnp.asarray(dd, jnp.float32), (N, 3))
    v = rng.normal(size=g16.shape).astype(np.float32)

    def est_mix(grid):
        m = make_medium([1.3] * 3, [1.0] * 3, kind="cube", density=grid,
                        n_steps=16)
        t0, t1 = medium_interval(m, o, d)
        seg = jnp.maximum(t1 - t0, 0.0)
        sc, s, T, wp, ws = sample_interaction(m, o, d, t0, seg, u)
        return jnp.mean(jnp.where(sc[..., None], 0.5 * ws, wp)[..., 0])

    def analytic_mix(grid):
        m = make_medium([1.3] * 3, [1.0] * 3, kind="cube", density=grid,
                        n_steps=16)
        D = line_density(m, o[:1], d[:1], jnp.asarray([1e9]))
        T = jnp.exp(-1.3 * D)[0]
        return T + 0.5 * (1.0 - T)

    ad = float(jnp.sum(jax.grad(est_mix)(jnp.asarray(g16)) * v))
    ref = float(jnp.sum(jax.grad(analytic_mix)(jnp.asarray(g16)) * v))
    assert abs(ad - ref) <= 0.08 * abs(ref) + 1e-6, (ad, ref)

    # ---- 2. depth-1 render is analytic in the grid: AD == FD ----
    med = make_medium([1.4] * 3, [0.75] * 3, g=0.2, kind="cube",
                      density=g16, n_steps=16)
    scene = make_scene(env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])),
                       medium=med)
    sensor = make_perspective([0, -3.0, 0.0], [0, 0, 0.0], fov_x_deg=40)
    film = Film(16, 16, 3)
    key = jax.random.PRNGKey(3)

    def loss_d1(grid):
        sc = scene._replace(medium=scene.medium._replace(density=grid))
        return jnp.mean(integrator.render(sc, sensor, film, key, spp=8,
                                          max_depth=1))

    gr = jax.grad(loss_d1)(jnp.asarray(g16))
    ad1 = float(jnp.sum(gr * v))
    f = jax.jit(loss_d1)
    eps = 0.01
    fd1 = (float(f(jnp.asarray(g16 + eps * v)))
           - float(f(jnp.asarray(g16 - eps * v)))) / (2 * eps)
    assert abs(ad1 - fd1) <= 0.03 * abs(fd1) + 1e-7, (ad1, fd1)

    # ---- 3. depth-6, 64^3 grid: memory-bounded full adjoint ----
    g64 = (0.4 + 0.6 * rng.random((64, 64, 64))).astype(np.float32)
    med64 = make_medium([1.4] * 3, [0.75] * 3, g=0.2, kind="cube",
                        density=g64, n_steps=32)
    scene64 = make_scene(env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])),
                         medium=med64)

    def loss_d6(grid):
        sc = scene64._replace(medium=scene64.medium._replace(density=grid))
        return jnp.mean(integrator.render(sc, sensor, film, key, spp=16,
                                          max_depth=6))

    grad64 = np.asarray(jax.grad(loss_d6)(jnp.asarray(g64)))
    assert np.isfinite(grad64).all()
    assert np.abs(grad64).max() > 0.0
    # denser medium in front of a constant env -> less radiance overall:
    # the mean gradient must be negative (single-sided, high-SNR check;
    # a per-direction FD here would measure MC event-flip noise, not the
    # derivative — see the estimator-level gate above for exactness)
    assert grad64.sum() < 0.0, grad64.sum()
