"""Emitter correctness: analytic oracles for area, point, and directional
lights, and MIS consistency between light and BSDF sampling strategies.
(Counterpart of the reference's emitter plugin tests, SURVEY.md H6.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import integrator
from tpusky.render.film import Film
from tpusky.render.loader import load_dict
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.transform import compose, look_at, rotate, scale, translate


def _floor_camera():
    """Narrow-fov camera straight down at the floor centre."""
    return make_perspective(origin=[0, 1e-4, 2.0], target=[0, 0, 0],
                            fov_x_deg=4)


def test_sphere_light_analytic():
    """Radiance off a diffuse floor directly below a spherical emitter:
    rho * L * sin^2(alpha), sin(alpha) = r/d (exact for a uniform sphere
    source)."""
    r, h, L, rho = 0.5, 4.0, 10.0, 0.5
    light_tw = compose(translate([0, 0, h]), scale(r))
    scene = make_scene(
        shapes=[dict(kind=1, to_world=scale(5), bsdf_idx=0),
                dict(kind=0, to_world=light_tw, bsdf_idx=0, emitter_idx=0)],
        bsdf_albedos=[[rho, rho, rho]],
        area_radiance=np.array([[0, 0, 0], [L, L, L]], np.float32))
    img = np.array(integrator.render(scene, _floor_camera(), Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=1024,
                                     max_depth=2,
                                     sampler_kind="stratified"))
    expected = rho * L * (r / h) ** 2
    got = img[4, 4].mean()
    assert abs(got - expected) / expected < 0.02, (got, expected)


def test_point_light_analytic():
    """rho/pi * I / h^2 directly below a point light."""
    h, I, rho = 3.0, 20.0, 0.6
    scene = make_scene(
        shapes=[dict(kind=1, to_world=scale(5), bsdf_idx=0)],
        bsdf_albedos=[[rho, rho, rho]],
        point_lights=[[0, 0, h, I, I, I]])
    img = np.array(integrator.render(scene, _floor_camera(), Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=16,
                                     max_depth=2))
    expected = rho / np.pi * I / h ** 2
    got = img[4, 4].mean()
    assert abs(got - expected) / expected < 0.01, (got, expected)


def test_directional_light_analytic():
    """rho/pi * E * cos(theta) for a directional light at angle theta."""
    rho, E = 0.5, 4.0
    theta = np.deg2rad(30)
    d = [np.sin(theta), 0.0, -np.cos(theta)]
    scene = make_scene(
        shapes=[dict(kind=1, to_world=scale(5), bsdf_idx=0)],
        bsdf_albedos=[[rho, rho, rho]],
        directional_lights=[d + [E, E, E]])
    img = np.array(integrator.render(scene, _floor_camera(), Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=16,
                                     max_depth=2))
    expected = rho / np.pi * E * np.cos(theta)
    got = img[4, 4].mean()
    assert abs(got - expected) / expected < 0.01, (got, expected)


def test_small_rect_light_analytic():
    """Small one-sided rectangle light above a diffuse floor: the centre
    pixel converges to the point-source limit rho/pi * L * A / h^2.
    Exercises area-NEE sampling, the solid-angle pdf conversion, and MIS
    with BSDF sampling together."""
    s, h, L, rho = 0.1, 3.0, 50.0, 0.5
    area = 4 * s * s
    light_tw = compose(translate([0, 0, h]), rotate([1, 0, 0], 180),
                       scale([s, s, 1]))
    scene = make_scene(
        shapes=[dict(kind=1, to_world=scale(5), bsdf_idx=0),
                dict(kind=1, to_world=light_tw, bsdf_idx=0, emitter_idx=0)],
        bsdf_albedos=[[rho, rho, rho]],
        area_radiance=np.array([[0, 0, 0], [L, L, L]], np.float32))
    img = np.array(integrator.render(scene, _floor_camera(), Film(8, 8, 3),
                                     jax.random.PRNGKey(0), spp=512,
                                     max_depth=2,
                                     sampler_kind="stratified"))
    expected = rho / np.pi * L * area / h ** 2
    got = img[4, 4].mean()
    assert abs(got - expected) / expected < 0.02, (got, expected)


def test_point_light_via_loader():
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective",
                   "to_world": look_at([0, 1e-4, 2], [0, 0, 0]), "fov": 4,
                   "film": {"width": 8, "height": 8},
                   "sampler": {"sample_count": 16}},
        "floor": {"type": "rectangle", "to_world": scale(5),
                  "bsdf": {"type": "diffuse", "reflectance": 0.6}},
        "lamp": {"type": "point", "position": [0, 0, 3],
                 "intensity": [20, 20, 20]},
    })
    img = np.array(bundle.render(seed=0))
    expected = 0.6 / np.pi * 20 / 9.0
    assert abs(img[4, 4].mean() - expected) / expected < 0.01


def test_constant_env_spectral_conventions():
    """UniformEnv (scalar radiance = flat spectrum, `uniform.cpp`) vs
    ConstantEnv (RGB color = srgb_d65 emitter convention): the flat
    spectrum is exactly constant across wavelengths; the RGB one
    round-trips through the spectral pipeline back to its RGB value."""
    import jax
    import jax.numpy as jnp
    from tpusky.render.emitters import ConstantEnv, UniformEnv, env_eval
    from tpusky.ops import spectrum as spec_mod

    eye = jnp.eye(3)
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    wl = jnp.asarray([[400.0, 500.0, 600.0, 700.0]])

    u = UniformEnv(jnp.full((3,), 2.0))
    out_u = np.asarray(env_eval(u, d, eye, wavelengths=wl,
                                mode="spectral"))
    np.testing.assert_allclose(out_u, 2.0, rtol=1e-6)

    c = ConstantEnv(jnp.asarray([2.0, 0.8, 0.4]))
    n = 4096
    us = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    wls, wgt = spec_mod.sample_rgb_spectrum(us[:, None])
    s = env_eval(c, jnp.broadcast_to(d, (n, 3)), eye, wavelengths=wls,
                 mode="spectral")
    back = np.asarray(spec_mod.spectrum_to_srgb(s * wgt, wls).mean(axis=0))
    np.testing.assert_allclose(back, [2.0, 0.8, 0.4], rtol=0.01)
