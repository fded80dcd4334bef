"""Thin Disney BSDF (`principledthin.cpp`): lobe consistency, two-sided
symmetry, and loader integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusky.render import bsdf as B
from tpusky.render import loader
from tpusky.utils.chi2 import chi2_test


def _table(spec_trans=0.5, diff_trans=0.3, sheen=0.4, sheen_tint=0.5,
           flatness=0.3, spec_tint=0.4, alpha=0.4,
           albedo=(0.6, 0.4, 0.3)):
    t = B.make_material_table(kinds=[B.PRINCIPLED_THIN],
                              albedos=[list(albedo)], alphas=[alpha],
                              iors=[1.5])
    ex = np.zeros((1, 8), np.float32)
    ex[0] = [spec_trans, diff_trans, sheen, sheen_tint, flatness,
             spec_tint, 0, 0]
    return t._replace(extra=jnp.asarray(ex))


_WI = jnp.asarray([0.3, -0.2, 0.93])
_WI = _WI / jnp.linalg.norm(_WI)


def test_principledthin_sample_pdf_chi2():
    table = _table()

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        u2 = jax.random.uniform(k1, (n, 2))
        u1 = jax.random.uniform(k2, (n,))
        wi_b = jnp.broadcast_to(_WI, (n, 3))
        wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi_b,
                                 u2, u1, None)
        # rejected (zero-pdf) samples leave the measured domain, like the
        # reference's weight-0 convention in its chi2 adapters
        return jnp.where((pdf > 1e-12)[:, None], wo,
                         jnp.array([0.0, 0.0, 2.0]))

    def pdf_fn(d):
        n = d.shape[0]
        wi_b = jnp.broadcast_to(_WI, (n, 3))
        _, pdf = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi_b, d)
        return pdf

    # full sphere: the thin sheet transmits
    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(13),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(-1.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_principledthin_weight_consistency():
    table = _table()
    key = jax.random.PRNGKey(0)
    n = 100_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wi = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi, u2,
                             u1, None)
    val, pdf2 = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi, wo, None)
    ok = pdf > 1e-9
    assert float(jnp.abs(jnp.where(ok, pdf - pdf2, 0.0)).max()) < 1e-6
    assert float(jnp.abs(jnp.where(ok[:, None], w * pdf[:, None] - val,
                                   0.0)).max()) < 1e-5
    assert float(jnp.mean((wo[:, 2] < 0) & ok)) > 0.2     # transmits


def test_principledthin_two_sided_symmetry():
    """The thin model is symmetric under flipping both directions
    (`principledthin.cpp:443-446`)."""
    table = _table()
    key = jax.random.PRNGKey(4)
    n = 10_000
    wo = jax.random.normal(key, (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.broadcast_to(_WI, (n, 3))
    flip = jnp.array([1.0, 1.0, -1.0])
    v_f, p_f = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi, wo, None)
    v_b, p_b = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wi * flip,
                          wo * flip, None)
    np.testing.assert_allclose(v_f, v_b, atol=1e-7)
    np.testing.assert_allclose(p_f, p_b, atol=1e-7)


def test_principledthin_no_trans_matches_diffuse_limit():
    """spec_trans = diff_trans = sheen = flatness = 0, roughness -> 0:
    reduces toward a Lambertian with Fresnel-ish weights; at least: no
    transmitted energy, reflection only."""
    table = _table(spec_trans=0.0, diff_trans=0.0, sheen=0.0,
                   flatness=0.0, spec_tint=0.0)
    key = jax.random.PRNGKey(7)
    n = 50_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wi = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi, u2,
                             u1, None)
    live = pdf > 1e-9
    assert float(jnp.mean((wo[:, 2] < 0) & live)) == 0.0


def test_principledthin_loader_end_to_end():
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -4, 1.5],
                                "target": [0, 0, 0.5], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 12, "height": 12}},
        "sheet": {"type": "rectangle",
                  "to_world": {"transforms": [
                      {"rotate": {"axis": [1, 0, 0], "angle": 90}},
                      {"translate": [0, -1.5, 1.0]}]},
                  "bsdf": {"type": "principledthin", "roughness": 0.3,
                           "spec_trans": 0.6, "diff_trans": 0.8,
                           "sheen": 0.4, "eta": 1.4,
                           "base_color": {"type": "rgb",
                                          "value": [0.8, 0.6, 0.4]}}},
        "ball": {"type": "sphere", "center": [0, 0, 0.8], "radius": 0.8,
                 "bsdf": {"type": "diffuse"}},
        "env": {"type": "sunsky", "turbidity": 3.0},
    })
    img = np.asarray(b.render(seed=2, spp=8))
    assert np.isfinite(img).all() and img.max() > 0
