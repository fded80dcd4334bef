"""Tests for the extended plugin set: plastic / roughdielectric / null /
mask BSDFs, spot & projector lights, directional-area emitters, the
moment & ptracer integrators, and the distant / radiancemeter /
irradiancemeter / batch sensors.

Analytic oracles follow the reference's test strategy (SURVEY.md §4):
white-furnace energy conservation, closed-form direct lighting, and
cross-integrator consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusky.render import bsdf as bsdf_mod
from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv, make_spot, spot_falloff
from tpusky.render.film import Film
from tpusky.render.loader import load_dict
from tpusky.render.scene import make_scene
from tpusky.render.sensors import (Batch, RadianceMeter, make_distant,
                                   make_irradiancemeter, make_perspective,
                                   make_spherical)
from tpusky.utils.transform import look_at, scale, translate


def _furnace_scene(bsdf_kind, L=1.0, **mat):
    """Unit sphere of the given material inside a constant environment."""
    kw = dict(bsdf_kinds=[mat.pop("kind")], env=ConstantEnv(
        jnp.full(3, jnp.float32(L))))
    if mat.pop("twoside", False):
        kw["bsdf_twosided"] = [True]
    albedo = mat.pop("albedo", [1.0, 1.0, 1.0])
    kw.update({f"bsdf_{k}s": [v] for k, v in mat.items()})
    sphere = np.eye(4, dtype=np.float32)
    return make_scene(shapes=[dict(kind=0, to_world=sphere, bsdf_idx=0)],
                      bsdf_albedos=[albedo], **kw)


def _render_furnace(scene, spp=256, max_depth=16):
    sensor = make_perspective([0, -4, 0], [0, 0, 0], fov_x_deg=30)
    film = Film(32, 32, 3)
    img = integrator.render(scene, sensor, film, jax.random.PRNGKey(0),
                            spp=spp, max_depth=max_depth, rr_depth=1000)
    return np.asarray(img)


class TestNewBSDFs:
    def test_null_is_invisible(self):
        """A null sphere in a constant furnace transmits exactly."""
        from tpusky.render.bsdf import NULL_BSDF
        scene = _furnace_scene(None, kind=NULL_BSDF)
        img = _render_furnace(scene, spp=16, max_depth=4)
        assert np.allclose(img, 1.0, atol=1e-3), img.mean()

    def test_mask_half_opacity_furnace(self):
        """opacity 0.5 white-diffuse sphere: energy conserved (<=1) and
        brighter than an opaque white sphere's furnace value."""
        from tpusky.render.bsdf import DIFFUSE
        scene = _furnace_scene(None, kind=DIFFUSE, opacitie=0.5,
                               twoside=True, albedo=[1.0, 1.0, 1.0])
        img = _render_furnace(scene, spp=512, max_depth=32)
        assert abs(img.mean() - 1.0) < 3e-2, img.mean()

    def test_plastic_energy_conservation(self):
        from tpusky.render.bsdf import PLASTIC
        scene = _furnace_scene(None, kind=PLASTIC,
                               albedo=[1.0, 1.0, 1.0], ior=1.49)
        img = _render_furnace(scene, spp=512)
        # plastic absorbs a little internally; must never gain energy in
        # the mean (per-pixel tails are MC noise: NEE samples reach ~4x)
        assert img.mean() <= 1.0 + 1e-2, img.mean()
        assert img.mean() > 0.75
        # hemispherical sampled albedo <= 1 for every incident angle
        table = bsdf_mod.make_material_table(
            kinds=[PLASTIC], albedos=[[1.0, 1.0, 1.0]], iors=[1.49])
        key = jax.random.PRNGKey(7)
        for cos_i in (0.95, 0.6, 0.2):
            n = 400_000
            s = np.sqrt(1 - cos_i ** 2)
            wi = jnp.broadcast_to(
                jnp.asarray([s, 0, cos_i], jnp.float32), (n, 3))
            u2 = jax.random.uniform(key, (n, 2))
            u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
            _wo, w, _p, _d = bsdf_mod.sample(
                table, jnp.zeros((n,), jnp.int32), wi, u2, u1)
            alb = float(jnp.mean(w[..., 0]))
            assert alb <= 1.0 + 5e-3, (cos_i, alb)

    def test_plastic_sample_pdf_consistency(self):
        """E[f*cos/pdf] over sampled dirs == hemisphere integral of f*cos
        (computed by quadrature with eval_pdf)."""
        from tpusky.render.bsdf import PLASTIC
        table = bsdf_mod.make_material_table(
            kinds=[PLASTIC], albedos=[[0.6, 0.4, 0.2]], iors=[1.49])
        n = 200_000
        key = jax.random.PRNGKey(2)
        wi = jnp.broadcast_to(
            jnp.asarray([0.3, 0.1, np.sqrt(1 - 0.1)], jnp.float32), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        mat = jnp.zeros((n,), jnp.int32)
        u2 = jax.random.uniform(key, (n, 2))
        u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
        wo, w, pdf, is_delta = bsdf_mod.sample(table, mat, wi, u2, u1)
        # sampled-estimate of total reflectance
        refl_sampled = np.asarray(jnp.mean(w, axis=0))
        # quadrature over the hemisphere of the non-delta part + delta part
        m = 256
        th = (jnp.arange(m) + 0.5) / m * (jnp.pi / 2)
        ph = (jnp.arange(m) + 0.5) / m * (2 * jnp.pi)
        TH, PH = jnp.meshgrid(th, ph, indexing="ij")
        wo_q = jnp.stack([jnp.sin(TH) * jnp.cos(PH),
                          jnp.sin(TH) * jnp.sin(PH),
                          jnp.cos(TH)], -1).reshape(-1, 3)
        k = wo_q.shape[0]
        f_q, _ = bsdf_mod.eval_pdf(
            table, jnp.zeros((k,), jnp.int32),
            jnp.broadcast_to(wi[0], (k, 3)), wo_q)
        d_omega = (jnp.pi / 2 / m) * (2 * jnp.pi / m)
        integral = np.asarray(jnp.sum(
            f_q * (jnp.sin(TH).reshape(-1, 1)) * d_omega, axis=0))
        # delta part: Fresnel reflection probability (weight 1)
        from tpusky.render.bsdf import fresnel_dielectric
        f_i = float(fresnel_dielectric(wi[0, 2], table.ior[0])[0])
        expected = integral + f_i
        assert np.allclose(refl_sampled, expected, rtol=0.03), (
            refl_sampled, expected)

    def test_roughdielectric_furnace(self):
        """GGX glass sphere in a uniform furnace: transmits+reflects all
        energy (value 1 everywhere, up to MC noise + multiple-scattering
        loss of the uncompensated Smith model)."""
        from tpusky.render.bsdf import ROUGH_DIELECTRIC
        scene = _furnace_scene(None, kind=ROUGH_DIELECTRIC,
                               alpha=0.25, ior=1.5)
        img = _render_furnace(scene, spp=512, max_depth=32)
        assert img.mean() <= 1.0 + 2e-2, img.mean()
        assert img.mean() > 0.80, img.mean()  # Smith-G loss only, no gain
        # sampled POWER albedo (undo the 1/eta^2 radiance compression on
        # transmitted samples: reflect + eta^2 * transmit) <= 1, and close
        # to 1 up to single-scatter Smith shadowing loss
        table = bsdf_mod.make_material_table(
            kinds=[ROUGH_DIELECTRIC], albedos=[[1, 1, 1]], alphas=[0.25],
            iors=[1.5])
        key = jax.random.PRNGKey(8)
        for cos_i in (0.95, 0.5):
            n = 400_000
            s = np.sqrt(1 - cos_i ** 2)
            wi = jnp.broadcast_to(
                jnp.asarray([s, 0, cos_i], jnp.float32), (n, 3))
            u2 = jax.random.uniform(key, (n, 2))
            u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
            wo, w, _p, _d = bsdf_mod.sample(
                table, jnp.zeros((n,), jnp.int32), wi, u2, u1)
            transmitted = np.asarray(wo)[..., 2] < 0
            eta2 = 1.5 ** 2
            power = np.asarray(w)[..., 0] * np.where(transmitted, eta2, 1.0)
            alb = power.mean()
            assert alb <= 1.0 + 1e-2, (cos_i, alb)
            assert alb > 0.80, (cos_i, alb)  # Smith G single-scatter loss

    def test_roughdielectric_eval_sample_agree(self):
        """pdf returned by sample() == pdf from eval_pdf() at the sampled
        direction; value/pdf == weight."""
        from tpusky.render.bsdf import ROUGH_DIELECTRIC
        table = bsdf_mod.make_material_table(
            kinds=[ROUGH_DIELECTRIC], albedos=[[1, 1, 1]], alphas=[0.3],
            iors=[1.5])
        n = 50_000
        key = jax.random.PRNGKey(3)
        wi = jnp.broadcast_to(
            jnp.asarray([0.4, -0.2, 0.89], jnp.float32), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        mat = jnp.zeros((n,), jnp.int32)
        u2 = jax.random.uniform(key, (n, 2))
        u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
        wo, w, pdf, _d = bsdf_mod.sample(table, mat, wi, u2, u1)
        val, pdf_e = bsdf_mod.eval_pdf(table, mat, wi, wo)
        ok = np.asarray(pdf) > 1e-3
        rel_pdf = np.abs(np.asarray(pdf_e) - np.asarray(pdf))[ok] \
            / np.asarray(pdf)[ok]
        assert np.median(rel_pdf) < 5e-3, np.median(rel_pdf)
        w_ref = np.asarray(val)[..., 0] / np.maximum(np.asarray(pdf), 1e-9)
        rel_w = np.abs(w_ref - np.asarray(w)[..., 0])[ok] \
            / np.maximum(np.asarray(w)[..., 0][ok], 1e-3)
        assert np.median(rel_w) < 2e-2, np.median(rel_w)


class TestSpotProjector:
    def test_spot_analytic_direct(self):
        """Pixel under the beam axis: value = albedo/pi * I/d^2 * cos."""
        spot = make_spot([0, 0, 4], [0, 0, -1], [10.0, 10.0, 10.0],
                         cutoff_angle_deg=40, beam_width_deg=30)
        ground = np.diag([4.0, 4.0, 1.0, 1.0]).astype(np.float32)
        scene = make_scene(shapes=[dict(kind=1, to_world=ground)],
                           bsdf_albedos=[[0.5, 0.5, 0.5]],
                           spot_lights=(spot,))
        sensor = make_perspective([0, -5, 3], [0, 0, 0], fov_x_deg=40)
        film = Film(48, 48, 3)
        img = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=32,
                                           max_depth=2))
        # center ray hits the floor near the origin (on-axis, full beam)
        # value = albedo/pi * I * cos(theta=0) / d^2, d=4
        expect = 0.5 / np.pi * 10.0 / 16.0
        # find the brightest pixel: directly under the light
        got = img[..., 0].max()
        assert abs(got - expect) / expect < 0.05, (got, expect)

    def test_spot_falloff_shape(self):
        spot = make_spot([0, 0, 0], [0, 0, -1], [1.0, 1.0, 1.0],
                         cutoff_angle_deg=30, beam_width_deg=20)
        inside = spot_falloff(spot, jnp.asarray([[0.0, 0.0, -1.0]]))
        assert np.allclose(np.asarray(inside), 1.0)
        cos35 = np.cos(np.deg2rad(35))
        sin35 = np.sin(np.deg2rad(35))
        outside = spot_falloff(spot, jnp.asarray([[sin35, 0.0, -cos35]]))
        assert np.allclose(np.asarray(outside), 0.0)
        cos25 = np.cos(np.deg2rad(25))
        sin25 = np.sin(np.deg2rad(25))
        mid = np.asarray(spot_falloff(spot,
                                      jnp.asarray([[sin25, 0.0, -cos25]])))
        assert 0.0 < mid[0, 0] < 1.0

    def test_projector_texture_quadrants(self):
        """A 2x2 texture projected straight down lights quadrants with the
        matching colors."""
        tex = np.zeros((2, 2, 3), np.float32)
        tex[0, 0] = [1, 0, 0]
        tex[0, 1] = [0, 1, 0]
        tex[1, 0] = [0, 0, 1]
        tex[1, 1] = [1, 1, 0]
        bundle = load_dict({
            "type": "scene",
            "integrator": {"type": "direct"},
            "sensor": {"type": "perspective", "fov": 60,
                       "to_world": look_at([0, 0, 6], [0, 0, 0],
                                           up=[0, 1, 0]),
                       "film": {"width": 32, "height": 32},
                       "sampler": {"sample_count": 16}},
            "floor": {"type": "rectangle", "to_world": scale(4),
                      "bsdf": {"type": "diffuse", "reflectance": 1.0}},
            "proj": {"type": "projector", "position": [0, 0, 4],
                     "direction": [0, 0, -1], "irradiance": 20.0,
                     "fov": 60, "texture": {"bitmap": tex}},
        })
        img = np.asarray(bundle.render(seed=0))
        h, w = img.shape[:2]
        q = img[: h // 2, : w // 2]  # v<0.5, u<0.5 -> texel [0, 0]-ish
        # the dominant channel in each quadrant matches the texel color
        assert q.mean(axis=(0, 1)).argmax() in (0, 2)
        assert img.sum() > 0


class TestDirectionalArea:
    def test_ptracer_sees_directionalarea(self):
        """directionalarea panel shining straight down lights the floor
        under it in the ptracer (and is invisible to the path tracer —
        delta direction)."""
        from tpusky.render.ptracer import render_ptracer
        light = np.eye(4, dtype=np.float32)
        light[2, 3] = 2.0
        light[:3, :3] = np.diag([1.0, -1.0, -1.0])  # normal -z
        ground = np.diag([4.0, 4.0, 1.0, 1.0]).astype(np.float32)
        dir_rad = np.zeros((2, 3), np.float32)
        dir_rad[1] = 5.0
        scene = make_scene(
            shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                    dict(kind=1, to_world=light, bsdf_idx=0)],
            bsdf_albedos=[[0.6, 0.6, 0.6]],
            dir_area_radiance=dir_rad)
        sensor = make_perspective([0, -6, 2.5], [0, 0, 0.5], fov_x_deg=50)
        film = Film(32, 32, 3)
        img_p = np.asarray(render_ptracer(scene, sensor, film,
                                          jax.random.PRNGKey(0),
                                          n_particles=1 << 18, max_depth=3))
        assert img_p.sum() > 0.0
        img_f = np.asarray(integrator.render(scene, sensor, film,
                                             jax.random.PRNGKey(0), spp=8,
                                             max_depth=3))
        assert img_f.sum() == 0.0  # delta emitter: invisible to BSDF/NEE


class TestIntegrators:
    def _simple_scene(self):
        light = np.eye(4, dtype=np.float32)
        light[2, 3] = 3.0
        light[:3, :3] = np.diag([1.0, -1.0, -1.0])
        ground = np.diag([4.0, 4.0, 1.0, 1.0]).astype(np.float32)
        scene = make_scene(
            shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                    dict(kind=1, to_world=light, bsdf_idx=1, emitter_idx=0)],
            bsdf_albedos=[[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]],
            area_radiance=[[0, 0, 0], [5.0, 5.0, 5.0]])
        sensor = make_perspective([0, -6, 2.5], [0, 0, 1.0], fov_x_deg=50)
        return scene, sensor

    def test_area_light_vs_quadrature_oracle(self):
        """Regression for the MXU-bf16 ray-transform bug: the pixel looking
        at the floor point under an area light must match 2D quadrature.
        (Before the VPU-exact transforms, shadow rays toward area lights
        falsely self-occluded ~34% of the time on TPU.)"""
        scene, sensor = self._simple_scene()
        film = Film(64, 64, 3)
        img = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=1024,
                                           max_depth=2))
        # quadrature oracle at the floor point seen by pixel (40, 32)
        from tpusky.render.sensors import perspective_ray
        uv = jnp.asarray([[32.5 / 64, 40.5 / 64]])
        o, d = perspective_ray(sensor, uv)
        o, d = np.asarray(o)[0], np.asarray(d)[0]
        q = o - (o[2] / d[2]) * d
        n = 200
        xs = (np.arange(n) + 0.5) / n * 2 - 1
        X, Y = np.meshgrid(xs, xs)
        pl = np.stack([X.ravel(), Y.ravel(), np.full(n * n, 3.0)], -1)
        to_l = pl - q
        d2 = (to_l ** 2).sum(-1)
        w = to_l / np.sqrt(d2)[:, None]
        cos1 = np.maximum(w[:, 2], 0)
        oracle = (0.5 / np.pi) * 5.0 * np.sum(cos1 * cos1 / d2) * (2.0 / n) ** 2
        got = img[40, 32, 0]
        assert abs(got - oracle) / oracle < 0.03, (got, oracle)

    def test_moment_integrator(self):
        scene, sensor = self._simple_scene()
        film = Film(32, 32, 3)
        mean, m2 = integrator.render_moments(scene, sensor, film,
                                             jax.random.PRNGKey(0), spp=64,
                                             max_depth=2)
        mean, m2 = np.asarray(mean), np.asarray(m2)
        var = m2 - mean ** 2
        assert (var >= -1e-5).all()
        img = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=64,
                                           max_depth=2))
        assert np.allclose(mean, img, atol=5e-2)

    @pytest.mark.slow
    def test_ptracer_matches_path_tracer(self):
        from tpusky.render.ptracer import render_ptracer
        scene, sensor = self._simple_scene()
        film = Film(48, 48, 3)
        img_f = np.asarray(integrator.render(scene, sensor, film,
                                             jax.random.PRNGKey(0), spp=1024,
                                             max_depth=3))
        img_p = np.asarray(render_ptracer(scene, sensor, film,
                                          jax.random.PRNGKey(1),
                                          n_particles=1 << 23, max_depth=3))
        m = img_f.mean(-1) > 0.05
        rel = abs(img_p[m].mean() - img_f[m].mean()) / img_f[m].mean()
        assert rel < 0.03, rel


class TestSensors:
    def test_radiancemeter_reads_env(self):
        env = ConstantEnv(jnp.asarray([0.25, 0.5, 0.75]))
        scene = make_scene(shapes=[], env=env)
        sensor = RadianceMeter(jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]))
        film = Film(1, 1, 3)
        img = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=4,
                                           max_depth=2))
        assert np.allclose(img[0, 0], [0.25, 0.5, 0.75], atol=1e-4)

    def test_irradiancemeter_constant_env(self):
        """In a constant-L environment, the cosine-weighted mean equals L."""
        env = ConstantEnv(jnp.asarray([0.6, 0.6, 0.6]))
        scene = make_scene(shapes=[], env=env)
        sensor = make_irradiancemeter([0, 0, 0], [0, 0, 1], half_extent=0.1)
        film = Film(4, 4, 3)
        img = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=64,
                                           max_depth=2))
        assert np.allclose(img, 0.6, atol=1e-3)

    def test_distant_sensor_orthographic_projection(self):
        """Distant sensor sees the unit sphere as a centred disc."""
        sphere = np.eye(4, dtype=np.float32)
        scene = make_scene(
            shapes=[dict(kind=0, to_world=sphere, bsdf_idx=0)],
            bsdf_albedos=[[1.0, 0.0, 0.0]],
            env=ConstantEnv(jnp.ones(3)))
        sensor = make_distant([0, 0, -1], radius=2.0, extent=2.0)
        film = Film(33, 33, 3)
        img = np.asarray(integrator.render(scene, sensor, film,
                                           jax.random.PRNGKey(0), spp=16,
                                           max_depth=2))
        # center pixel shows the lit sphere (red-ish), corner shows sky
        assert img[16, 16, 0] > img[16, 16, 2]
        assert np.allclose(img[0, 0], 1.0, atol=1e-3)

    def test_batch_sensor_halves(self):
        env = ConstantEnv(jnp.asarray([0.3, 0.3, 0.3]))
        scene = make_scene(shapes=[], env=env)
        batch = Batch((make_perspective([0, -4, 0], [0, 0, 0]),
                       make_spherical()))
        film = Film(16, 32, 3)
        img = np.asarray(integrator.render(scene, batch, film,
                                           jax.random.PRNGKey(0), spp=8,
                                           max_depth=2))
        assert np.allclose(img, 0.3, atol=1e-3)

    def test_loader_builds_new_sensors(self):
        for desc in [{"type": "distant", "direction": [0, 0, -1]},
                     {"type": "radiancemeter"},
                     {"type": "irradiancemeter"},
                     {"type": "batch",
                      "a": {"type": "perspective"},
                      "b": {"type": "spherical"}}]:
            desc = dict(desc, film={"width": 8, "height": 8},
                        sampler={"sample_count": 2})
            b = load_dict({"type": "scene", "sensor": desc,
                           "env": {"type": "constant", "radiance": 0.5},
                           "integrator": {"type": "direct"}})
            img = np.asarray(b.render(seed=0))
            assert np.isfinite(img).all()


class TestLoaderIntegrators:
    def test_moment_and_ptracer_types_accepted(self):
        d = {"type": "scene",
             "integrator": {"type": "moment"},
             "sensor": {"type": "perspective",
                        "to_world": look_at([0, -5, 2], [0, 0, 0.5]),
                        "film": {"width": 16, "height": 16},
                        "sampler": {"sample_count": 4}},
             "floor": {"type": "rectangle", "to_world": scale(4)},
             "light": {"type": "sphere", "to_world": translate([0, 0, 3]),
                       "emitter": {"type": "area", "radiance": 5.0}}}
        b = load_dict(d)
        out = b.render(seed=0)
        mean, m2 = out
        assert np.isfinite(np.asarray(mean)).all()
        d2 = dict(d, integrator={"type": "ptracer"})
        b2 = load_dict(d2)
        img = np.asarray(b2.render(seed=0))
        assert np.isfinite(img).all() and img.sum() > 0


class TestForwardMode:
    def test_render_forward_equals_reverse(self):
        """Forward-mode AD through the full render (the reference's
        `render_forward`, `ad/integrators/common.py:495`) agrees with
        reverse mode: jvp with unit turbidity tangent == the turbidity
        component of grad on a scalar loss."""
        import tpusky as ts
        from tpusky.models.sunsky import model as M
        from tpusky.models.sunsky.tables import load_tables

        tables = load_tables("rgb")
        ground = np.diag([6.0, 6.0, 1.0, 1.0]).astype(np.float32)
        base = make_scene(shapes=[dict(kind=1, to_world=ground)],
                          bsdf_albedos=[[0.4, 0.4, 0.4]])
        sensor = make_perspective([0, -5, 2], [0, 0, 0.5], fov_x_deg=45)
        film = Film(16, 16, 3)

        def loss(t):
            params = ts.make_params(turbidity=t, albedo=0.3,
                                    sun_direction=[0.3, 0.2, 0.93])
            env = M.precompute(tables, params, "rgb")
            scene = base._replace(env=env)
            img = integrator.render(scene, sensor, film,
                                    jax.random.PRNGKey(0), spp=4,
                                    max_depth=2)
            return img.mean()

        g_rev = float(jax.grad(loss)(jnp.float32(3.4)))
        _, g_fwd = jax.jvp(loss, (jnp.float32(3.4),), (jnp.float32(1.0),))
        assert np.isfinite(g_rev) and abs(g_rev) > 0
        assert abs(g_rev - float(g_fwd)) / abs(g_rev) < 1e-4, (
            g_rev, float(g_fwd))
