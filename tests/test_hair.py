"""Hair BCSDF (Chiang et al. 2016; reference `hair.cpp`): energy
conservation, sampling consistency, chi2, pigmentation, and curve-shape
integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusky.render import bsdf as B
from tpusky.render import loader
from tpusky.utils.chi2 import chi2_test

_WI = jnp.asarray([0.4, 0.3, 0.866])
_WI = _WI / jnp.linalg.norm(_WI)


def _table(sigma=(0.0, 0.0, 0.0), beta_m=0.3, beta_n=0.3, tilt=2.0,
           eta=1.55):
    t = B.make_material_table(kinds=[B.HAIR], albedos=[list(sigma)],
                              alphas=[beta_m], iors=[eta])
    ex = np.zeros((1, 8), np.float32)
    ex[0, 0] = beta_n
    ex[0, 1] = tilt
    return t._replace(extra=jnp.asarray(ex))


def test_hair_white_furnace():
    """sigma_a = 0: the attenuation series a_p sums to 1 exactly, so the
    sampled weight is 1 (the d'Eon energy-conservation property)."""
    table = _table()
    key = jax.random.PRNGKey(0)
    n = 200_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wib = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wib, u2,
                             u1, None)
    live = pdf > 1e-9
    assert float(jnp.mean(live)) > 0.999
    energy = float(jnp.mean(jnp.where(live, w[:, 0], 0.0)))
    assert energy == pytest.approx(1.0, abs=5e-3)


def test_hair_sample_eval_consistency():
    table = _table(sigma=(0.2, 0.4, 0.8))
    key = jax.random.PRNGKey(3)
    n = 100_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wib = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wib, u2,
                             u1, None)
    val, pdf2 = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wib, wo,
                           None)
    live = pdf > 1e-9
    assert float(jnp.abs(jnp.where(live, pdf - pdf2, 0.0)).max()) < 1e-6
    assert float(jnp.abs(jnp.where(live[:, None], w * pdf[:, None] - val,
                                   0.0)).max()) < 1e-5


def test_hair_sample_pdf_chi2():
    table = _table(sigma=(0.3, 0.5, 0.9))

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        u2 = jax.random.uniform(k1, (n, 2))
        u1 = jax.random.uniform(k2, (n,))
        wib = jnp.broadcast_to(_WI, (n, 3))
        wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wib,
                                 u2, u1, None)
        return jnp.where((pdf > 1e-9)[:, None], wo,
                         jnp.array([0.0, 0.0, 2.0]))

    def pdf_fn(d):
        n = d.shape[0]
        wib = jnp.broadcast_to(_WI, (n, 3))
        _, pdf = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wib, d)
        return pdf

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(17),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(-1.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_hair_absorption_color():
    """Eumelanin-style absorption (higher in blue): red survives most."""
    table = _table(sigma=(0.419, 0.697, 1.37))
    key = jax.random.PRNGKey(5)
    n = 200_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wib = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wib, u2,
                             u1, None)
    live = (pdf > 1e-9)[:, None]
    rgb = np.asarray(jnp.mean(jnp.where(live, w, 0.0), axis=0))
    assert rgb[0] > rgb[1] > rgb[2] > 0.0
    assert rgb[0] < 1.0


def test_hair_longitudinal_lobe_direction():
    """With low roughness and sigma_a -> inf (R lobe only), scattering
    concentrates near the specular cone sin_theta_o ~ -sin_theta_i
    (tilted by the scale angle)."""
    table = _table(sigma=(50.0, 50.0, 50.0), beta_m=0.1, beta_n=0.1,
                   tilt=0.0)
    key = jax.random.PRNGKey(9)
    n = 100_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wi = jnp.asarray([0.6, 0.5, 0.6245])      # sin_theta_i = wi.y = 0.5
    wi = wi / jnp.linalg.norm(wi)
    wib = jnp.broadcast_to(wi, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wib, u2,
                             u1, None)
    live = pdf > 1e-9
    mean_sin_o = float(jnp.sum(jnp.where(live, wo[:, 1], 0.0))
                       / jnp.sum(live))
    assert mean_sin_o == pytest.approx(-float(wi[1]), abs=0.05)


def test_hair_on_curve_render():
    """End-to-end: hair-shaded b-spline curves under the sunsky."""
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -3, 1.2],
                                "target": [0, 0, 0.5], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 16, "height": 16}},
        "strand": {"type": "bsplinecurve",
                   "points": [[-0.8, 0, 0.2], [-0.3, 0, 0.9],
                              [0.3, 0, 0.9], [0.8, 0, 0.2]],
                   "radius": 0.12,
                   "bsdf": {"type": "hair", "eumelanin": 0.8,
                            "pheomelanin": 0.4}},
        "ground": {"type": "rectangle", "to_world": {"scale": [3, 3, 1]},
                   "bsdf": {"type": "diffuse"}},
        "env": {"type": "sunsky", "turbidity": 3.0},
    })
    img = np.asarray(b.render(seed=1, spp=8))
    assert np.isfinite(img).all() and img.max() > 0


def test_hair_loader_validation():
    with pytest.raises(ValueError):
        loader.load_dict({
            "type": "scene",
            "sensor": {"type": "perspective",
                       "film": {"type": "hdrfilm", "width": 2,
                                "height": 2}},
            "s": {"type": "sphere",
                  "bsdf": {"type": "hair", "sigma_a": [0.1, 0.2, 0.3],
                           "eumelanin": 1.0}},
            "env": {"type": "constant"},
        })
