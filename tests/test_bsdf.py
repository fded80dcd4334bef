"""BSDF tests: GGX sample/pdf chi-square consistency, conductor Fresnel
sanity, and white-furnace energy checks through the full renderer.
(Counterpart of the reference's BSDF chi2 adapters, `chi2.py:477`.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import bsdf as B
from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.chi2 import chi2_test
from tpusky.utils.transform import scale, translate


def _table(kind, alpha=0.3, eta=None, k=None):
    return B.make_material_table(
        kinds=[kind], albedos=[[1.0, 1.0, 1.0]], alphas=[alpha],
        etas=eta and [eta], ks=k and [k])


def test_ggx_sample_pdf_chi2():
    """GGX reflection lobe: histogram of samples matches eval_pdf."""
    table = _table(B.ROUGH_CONDUCTOR, alpha=0.3)
    wi = jnp.asarray([0.4, 0.1, 0.91])
    wi = wi / jnp.linalg.norm(wi)
    mat = jnp.zeros((), jnp.int32)

    def sample_fn(key, n):
        u = jax.random.uniform(key, (n, 2))
        wi_b = jnp.broadcast_to(wi, (n, 3))
        wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi_b, u,
                                 jnp.zeros((n,)), None)
        return wo

    def pdf_fn(d):
        n = d.shape[0]
        wi_b = jnp.broadcast_to(wi, (n, 3))
        _, pdf = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi_b, d)
        return pdf

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(0),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(0.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_fresnel_conductor_limits():
    """Perfect mirror (k -> inf) reflects ~1; grazing incidence -> 1."""
    f = B._fresnel_conductor(jnp.asarray(0.7), jnp.asarray([0.0]),
                             jnp.asarray([1e4]))
    assert abs(float(f[0]) - 1.0) < 1e-4
    f_grazing = B._fresnel_conductor(jnp.asarray(1e-5),
                                     jnp.asarray([0.143]),
                                     jnp.asarray([3.983]))
    assert float(f_grazing[0]) > 0.99


def test_fresnel_dielectric_energy():
    """R + T = 1 and total internal reflection beyond the critical angle."""
    f, cos_t, eta_rel = B.fresnel_dielectric(jnp.asarray(0.8),
                                             jnp.asarray(1.5))
    assert 0.0 < float(f) < 1.0 and float(eta_rel) == 1.5
    # from inside beyond critical angle: TIR
    f_tir, _, _ = B.fresnel_dielectric(jnp.asarray(-0.2), jnp.asarray(1.5))
    assert float(f_tir) == 1.0


def _furnace(kind, alpha=0.1, max_depth=8, eta=None, k=None, spp=256):
    """Sphere of the given material inside a unit constant environment."""
    scene = make_scene(
        shapes=[dict(kind=0, to_world=translate([0, 0, 0]), bsdf_idx=0)],
        bsdf_albedos=[[1.0, 1.0, 1.0]],
        bsdf_kinds=[kind],
        bsdf_alphas=[alpha],
        bsdf_etas=eta and [eta], bsdf_ks=k and [k],
        env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective(origin=[0, -4, 0], target=[0, 0, 0],
                              fov_x_deg=18)
    img = np.array(integrator.render(scene, sensor, Film(16, 16, 3),
                                     jax.random.PRNGKey(0), spp=spp,
                                     max_depth=max_depth))
    return img


def test_furnace_mirror():
    """Perfect smooth mirror in a white furnace: exactly 1 everywhere."""
    img = _furnace(B.CONDUCTOR, eta=[0.0, 0.0, 0.0], k=[1e4, 1e4, 1e4],
                   max_depth=3, spp=32)
    assert np.allclose(img, 1.0, atol=1e-3), (img.min(), img.max())


def test_furnace_dielectric():
    """Glass sphere in a white furnace: energy preserved (reflection +
    refraction chains), within a few % given bounded depth."""
    img = _furnace(B.DIELECTRIC, max_depth=16, spp=128)
    assert img.mean() > 0.93, img.mean()
    assert img.max() < 1.25


def test_furnace_rough_conductor():
    """Perfect-reflector GGX sphere: near 1, below by the single-scattering
    energy loss at this roughness."""
    img = _furnace(B.ROUGH_CONDUCTOR, alpha=0.2, eta=[0.0] * 3,
                   k=[1e4] * 3, max_depth=6, spp=256)
    assert 0.88 < img.mean() <= 1.02, img.mean()


def test_furnace_diffuse():
    """Diffuse unit-albedo sphere in a white furnace -> 1 at high depth."""
    img = _furnace(B.DIFFUSE, max_depth=24, spp=256)
    assert 0.95 < img.mean() < 1.05, img.mean()


def test_furnace_thindielectric():
    """Thin glass sheet material on a sphere in a white furnace: the
    reflect/transmit split conserves energy exactly (both lobes delta)."""
    img = _furnace(B.THIN_DIELECTRIC, max_depth=16, spp=64)
    assert 0.97 < img.mean() < 1.03, img.mean()


def test_furnace_rough_plastic():
    """Unit-albedo rough plastic in a white furnace: close to 1 (small loss
    from single-scattering GGX energy at this roughness)."""
    img = _furnace(B.ROUGH_PLASTIC, alpha=0.25, max_depth=24, spp=256)
    assert 0.9 < img.mean() <= 1.05, img.mean()


def test_rough_plastic_sample_pdf_chi2():
    """Rough-plastic combined lobe: sample histogram matches eval_pdf."""
    table = _table(B.ROUGH_PLASTIC, alpha=0.4)
    wi = jnp.asarray([0.3, -0.2, 0.93])
    wi = wi / jnp.linalg.norm(wi)

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        u2 = jax.random.uniform(k1, (n, 2))
        u1 = jax.random.uniform(k2, (n,))
        wi_b = jnp.broadcast_to(wi, (n, 3))
        wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi_b,
                                 u2, u1, None)
        return wo

    def pdf_fn(d):
        n = d.shape[0]
        wi_b = jnp.broadcast_to(wi, (n, 3))
        _, pdf = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi_b, d)
        return pdf

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(3),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(0.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_principled_sample_pdf_chi2():
    """Principled with all three lobes active: histogram matches pdf."""
    table = B.make_material_table(
        kinds=[B.PRINCIPLED], albedos=[[0.8, 0.4, 0.2]], alphas=[0.5],
        extras=[[0.3, 0.5, 0.4, 0.5, 0.8, 0.7, 0.2, 0.0]])
    wi = jnp.asarray([0.3, -0.2, 0.93])
    wi = wi / jnp.linalg.norm(wi)

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        u2 = jax.random.uniform(k1, (n, 2))
        u1 = jax.random.uniform(k2, (n,))
        wi_b = jnp.broadcast_to(wi, (n, 3))
        wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi_b,
                                 u2, u1, None)
        return wo

    def pdf_fn(d):
        n = d.shape[0]
        wi_b = jnp.broadcast_to(wi, (n, 3))
        _, pdf = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi_b, d)
        return pdf

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(5),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(0.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_principled_metallic_vs_diffuse_limits():
    """metallic=0, roughness=1, no coat reduces to ~Burley diffuse (finite,
    reciprocal-ish); metallic=1 kills the diffuse lobe."""
    wi = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.6, 0.0, 0.8]])
    mk = lambda met: B.make_material_table(
        kinds=[B.PRINCIPLED], albedos=[[0.5, 0.5, 0.5]], alphas=[1.0],
        extras=[[met, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    v0, _ = B.eval_pdf(mk(0.0), jnp.zeros((1,), jnp.int32), wi, wo)
    v1, _ = B.eval_pdf(mk(1.0), jnp.zeros((1,), jnp.int32), wi, wo)
    # diffuse part ~ albedo/pi * cos_o modulated by Burley retro factors
    assert float(v0[0, 0]) > 0.5 / np.pi * 0.8 * 0.5
    # specular=0 and metallic=1 -> Fresnel = base colour, tiny at alpha=1
    assert float(v1[0, 0]) < float(v0[0, 0])


def test_furnace_principled():
    """Principled metallic sphere (base 1) in a white furnace: energy
    bounded by 1, above 0.8 (single-scatter GGX loss)."""
    img = _furnace_extra([1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                         alpha=0.4)
    assert 0.8 < img.mean() <= 1.02, img.mean()


def _furnace_extra(extra, alpha, spp=256, max_depth=12):
    scene = make_scene(
        shapes=[dict(kind=0, to_world=translate([0, 0, 0]), bsdf_idx=0)],
        bsdf_albedos=[[1.0, 1.0, 1.0]],
        bsdf_kinds=[B.PRINCIPLED],
        bsdf_alphas=[alpha],
        bsdf_extras=[extra],
        env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective(origin=[0, -4, 0], target=[0, 0, 0],
                              fov_x_deg=18)
    return np.array(integrator.render(scene, sensor, Film(16, 16, 3),
                                      jax.random.PRNGKey(0), spp=spp,
                                      max_depth=max_depth))


def test_principled_loader():
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -4, 1],
                                "target": [0, 0, 0], "up": [0, 0, 1]},
                   "film": {"height": 16, "width": 16},
                   "sampler": {"sample_count": 8}},
        "env": {"type": "constant", "radiance": 1.0},
        "ball": {"type": "sphere",
                 "bsdf": {"type": "principled", "base_color": [0.7, 0.3, 0.2],
                          "roughness": 0.3, "metallic": 0.8,
                          "clearcoat": 1.0, "sheen": 0.5}},
    })
    img = np.asarray(bundle.render(seed=0))
    assert np.isfinite(img).all() and img.max() > 0


# ---- blendbsdf (kind 10, `blendbsdf.cpp`) ----


def _blend_table(w=0.3, kinds=(B.DIFFUSE, B.ROUGH_CONDUCTOR)):
    """Row 0/1 = children, row 2 = blend of them with weight w."""
    return B.make_material_table(
        kinds=[kinds[0], kinds[1], B.BLEND],
        albedos=[[0.8, 0.2, 0.1], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5]],
        alphas=[0.1, 0.3, 0.1],
        blend_children=[(0, 0), (0, 0), (0, 1)],
        blend_weights=[0.0, 0.0, w])


def test_blend_eval_is_lerp_of_children():
    table = _blend_table(w=0.3)
    wi = jnp.asarray([[0.3, -0.2, 0.93]]) / np.linalg.norm([0.3, -0.2, 0.93])
    wo = jnp.asarray([[-0.5, 0.1, 0.86]]) / np.linalg.norm([-0.5, 0.1, 0.86])
    kinds = B.table_kinds(table)
    va, pa = B.eval_pdf(table, jnp.asarray([0]), wi, wo, kinds=kinds)
    vb, pb = B.eval_pdf(table, jnp.asarray([1]), wi, wo, kinds=kinds)
    vm, pm = B.eval_pdf(table, jnp.asarray([2]), wi, wo, kinds=kinds)
    assert np.allclose(vm, 0.7 * np.array(va) + 0.3 * np.array(vb),
                       rtol=1e-5)
    assert np.allclose(pm, 0.7 * np.array(pa) + 0.3 * np.array(pb),
                       rtol=1e-5)


def test_blend_sample_pdf_chi2():
    """Blend of diffuse + GGX: samples match the blended pdf."""
    table = _blend_table(w=0.4)
    wi = jnp.asarray([0.4, 0.1, 0.91])
    wi = wi / jnp.linalg.norm(wi)
    kinds = B.table_kinds(table)

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (n, 2))
        s1 = jax.random.uniform(k2, (n,))
        wi_b = jnp.broadcast_to(wi, (n, 3))
        wo, w, pdf, _ = B.sample(table, jnp.full((n,), 2, jnp.int32), wi_b,
                                 u, s1, kinds=kinds)
        return wo

    def pdf_fn(d):
        n = d.shape[0]
        wi_b = jnp.broadcast_to(wi, (n, 3))
        _, pdf = B.eval_pdf(table, jnp.full((n,), 2, jnp.int32), wi_b, d,
                            kinds=kinds)
        return pdf

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(7),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(0.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_blend_sample_weight_consistency():
    """E[weight] over samples == integral of f*cos == white-furnace albedo
    for a blend of two grey diffuse lobes."""
    table = B.make_material_table(
        kinds=[B.DIFFUSE, B.DIFFUSE, B.BLEND],
        albedos=[[0.2, 0.2, 0.2], [0.8, 0.8, 0.8], [0.0, 0.0, 0.0]],
        blend_children=[(0, 0), (0, 0), (0, 1)],
        blend_weights=[0.0, 0.0, 0.25])
    n = 200_000
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n, 2))
    s1 = jax.random.uniform(k2, (n,))
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    kinds = B.table_kinds(table)
    wo, w, pdf, _ = B.sample(table, jnp.full((n,), 2, jnp.int32), wi, u, s1,
                             kinds=kinds)
    # expected directional albedo = 0.75*0.2 + 0.25*0.8 = 0.35
    assert np.allclose(np.array(w).mean(), 0.35, rtol=0.01)


def test_blend_loader_end_to_end():
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -4, 1],
                                "target": [0, 0, 0], "up": [0, 0, 1]},
                   "film": {"height": 16, "width": 16},
                   "sampler": {"sample_count": 16}},
        "env": {"type": "constant", "radiance": 1.0},
        "ball": {"type": "sphere",
                 "bsdf": {"type": "blendbsdf", "weight": 0.6,
                          "a": {"type": "diffuse",
                                "reflectance": [0.9, 0.1, 0.1]},
                          "b": {"type": "roughconductor", "alpha": 0.25,
                                "material": "Au"}}},
    })
    img = np.asarray(bundle.render(seed=0))
    assert np.isfinite(img).all() and img.max() > 0
