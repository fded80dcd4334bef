"""Extra phase functions: tabphase, SGGX microflakes, blendphase.

Reference parity: `src/phase/tabphase.cpp`, `src/phase/sggx.cpp` +
`include/mitsuba/render/microflake.h`, `src/phase/blendphase.cpp`, and
the reference's chi2 phase adapters (`chi2.py:570`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusky.render.medium import (hg_pdf, make_medium, phase_pdf,
                                  phase_sample, sggx_pdf,
                                  sggx_projected_area, sggx_sample,
                                  tab_pdf, tab_sample)
from tpusky.utils.chi2 import chi2_test

FWD = jnp.asarray([0.0, 0.0, 1.0])


def _mc_integral(pdf_fn, n=400_000, seed=0):
    """Monte-Carlo ∫ pdf dΩ with uniform sphere samples."""
    u = jax.random.uniform(jax.random.PRNGKey(seed), (n, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * jnp.pi * u[:, 1]
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    return float(jnp.mean(pdf_fn(d)) * 4.0 * jnp.pi)


# ---------------------------------------------------------------------------
# tabphase
# ---------------------------------------------------------------------------

TAB = jnp.asarray([0.5, 1.0, 3.0, 2.0, 0.25], jnp.float32)


def test_tab_pdf_normalized():
    assert abs(_mc_integral(lambda d: tab_pdf(TAB, d[:, 2])) - 1.0) < 5e-3


def test_tab_uniform_matches_isotropic():
    c = jnp.linspace(-1, 1, 9)
    np.testing.assert_allclose(np.array(tab_pdf(jnp.ones(4), c)),
                               1 / (4 * np.pi), rtol=1e-6)


def test_tab_sample_pdf_chi2():
    def sample_fn(key, count):
        u = jax.random.uniform(key, (count, 2))
        wo, _ = tab_sample(TAB, jnp.broadcast_to(FWD, (count, 3)), u)
        return wo

    p, passed, info = chi2_test(sample_fn, lambda d: tab_pdf(TAB, d[..., 2]),
                                key=jax.random.PRNGKey(0),
                                sample_count=1_000_000)
    assert passed, (p, info)


def test_tab_sample_pdf_self_consistent():
    u = jax.random.uniform(jax.random.PRNGKey(1), (4096, 2))
    d = jnp.tile(jnp.asarray([[0.6, 0.0, 0.8]]), (4096, 1))
    wo, pdf = tab_sample(TAB, d, u)
    np.testing.assert_allclose(np.array(pdf),
                               np.array(tab_pdf(TAB, jnp.sum(wo * d, -1))),
                               rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# SGGX
# ---------------------------------------------------------------------------

S_ISO = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], jnp.float32)
# fiber-like: small projected area along z (surfels in the xy plane)
S_FIBER = jnp.asarray([1.0, 1.0, 0.04, 0.0, 0.0, 0.0], jnp.float32)
S_SKEW = jnp.asarray([1.0, 0.6, 0.3, 0.2, 0.1, -0.05], jnp.float32)


def test_sggx_projected_area_iso():
    d = jnp.asarray([[1.0, 0, 0], [0, 0, 1.0],
                     [0.577350, 0.577350, 0.577350]])
    np.testing.assert_allclose(np.array(sggx_projected_area(d, S_ISO)), 1.0,
                               rtol=1e-5)


def test_sggx_projected_area_fiber():
    np.testing.assert_allclose(
        float(sggx_projected_area(jnp.asarray([0.0, 0.0, 1.0]), S_FIBER)),
        0.2, rtol=1e-5)


@pytest.mark.parametrize("s", [S_ISO, S_FIBER, S_SKEW])
def test_sggx_pdf_normalized(s):
    wi = jnp.asarray([0.36, 0.48, 0.8])
    val = _mc_integral(
        lambda d: sggx_pdf(jnp.broadcast_to(wi, d.shape), d, s), n=2_000_000)
    assert abs(val - 1.0) < 2e-2, val


@pytest.mark.parametrize("s", [S_ISO, S_SKEW])
def test_sggx_sample_pdf_chi2(s):
    wi = jnp.asarray([0.0, 0.6, 0.8])

    def sample_fn(key, count):
        u = jax.random.uniform(key, (count, 2))
        wo, _ = sggx_sample(jnp.broadcast_to(wi, (count, 3)), u, s)
        return wo

    def pdf_fn(d):
        return sggx_pdf(jnp.broadcast_to(wi, d.shape), d, s)

    p, passed, info = chi2_test(sample_fn, pdf_fn,
                                key=jax.random.PRNGKey(2),
                                sample_count=1_000_000)
    assert passed, (p, info)


def test_sggx_sample_weight_is_one():
    """Specular SGGX VNDF sampling is exact: returned pdf == phase value
    (`sggx.cpp::sample` returns weight 1)."""
    u = jax.random.uniform(jax.random.PRNGKey(3), (4096, 2))
    wi = jnp.tile(jnp.asarray([[0.28, -0.21, 0.936]]), (4096, 1))
    wo, pdf = sggx_sample(wi, u, S_SKEW)
    # f32 half-vector reconstruction (wh = normalize(wi+wo)) is noisy for
    # near-backscatter lanes; the chi2 test covers exactness statistically
    np.testing.assert_allclose(np.array(pdf),
                               np.array(sggx_pdf(wi, wo, S_SKEW)),
                               rtol=0.12, atol=1e-5)


# ---------------------------------------------------------------------------
# blendphase + medium dispatch
# ---------------------------------------------------------------------------

def _blend_medium():
    return make_medium([1.0], [0.5], g=0.7, g2=0.0, phase_w=0.3,
                       phase=("blend", "hg", "hg2"), kind="sphere")


def test_blend_pdf_is_lerp():
    med = _blend_medium()
    d = jnp.asarray([0.0, 0.0, 1.0])
    wo = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]])
    got = phase_pdf(med, jnp.broadcast_to(d, wo.shape), wo)
    want = 0.7 * hg_pdf(0.7, wo[:, 2]) + 0.3 * hg_pdf(0.0, wo[:, 2])
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5)


def test_blend_sample_pdf_chi2():
    med = _blend_medium()

    def sample_fn(key, count):
        u = jax.random.uniform(key, (count, 2))
        wo, _ = phase_sample(med, jnp.broadcast_to(FWD, (count, 3)), u)
        return wo

    def pdf_fn(d):
        return phase_pdf(med, jnp.broadcast_to(FWD, d.shape), d)

    p, passed, info = chi2_test(sample_fn, pdf_fn,
                                key=jax.random.PRNGKey(4),
                                sample_count=1_000_000)
    assert passed, (p, info)


def test_sggx_extinction_is_directional():
    """Microflake media attenuate by σ(-d): a fiber distribution with tiny
    z-projected area is nearly transparent along z and opaque across
    (`homogeneous.cpp:156`)."""
    from tpusky.render.medium import transmittance
    med = make_medium([2.0], [0.0], phase="sggx", sggx_s=S_FIBER,
                      kind="sphere")
    o_z = jnp.asarray([[0.0, 0.0, -5.0]])
    d_z = jnp.asarray([[0.0, 0.0, 1.0]])
    o_x = jnp.asarray([[-5.0, 0.0, 0.0]])
    d_x = jnp.asarray([[1.0, 0.0, 0.0]])
    t_inf = jnp.full((1,), jnp.inf)
    tz = float(transmittance(med, o_z, d_z, t_inf)[0, 0])
    tx = float(transmittance(med, o_x, d_x, t_inf)[0, 0])
    np.testing.assert_allclose(tz, np.exp(-2.0 * 2.0 * 0.2), rtol=1e-4)
    np.testing.assert_allclose(tx, np.exp(-2.0 * 2.0 * 1.0), rtol=1e-4)


# ---------------------------------------------------------------------------
# loader plumbing
# ---------------------------------------------------------------------------

def _fog_scene(phase_desc):
    return {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 4},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, -6, 0],
                                "target": [0, 0, 0], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "light": {"type": "constant", "radiance": 1.0},
        "fog": {"type": "sphere",
                "interior": {"type": "homogeneous", "sigma_t": 0.5,
                             "albedo": 0.8, "phase": phase_desc}},
    }


@pytest.mark.parametrize("phase_desc", [
    {"type": "tabphase", "values": "0.5 1.0 2.0 1.0 0.5"},
    {"type": "sggx", "S": {"type": "constvolume",
                           "value": [1.0, 1.0, 0.2, 0.0, 0.0, 0.0]}},
    {"type": "blendphase", "weight": 0.4,
     "a": {"type": "hg", "g": 0.6}, "b": {"type": "rayleigh"}},
    {"type": "blendphase", "weight": 0.25,
     "a": {"type": "hg", "g": 0.6}, "b": {"type": "hg", "g": -0.3}},
])
def test_load_dict_phase_variants(phase_desc):
    from tpusky.render.loader import load_dict
    b = load_dict(_fog_scene(phase_desc))
    img = np.array(b.render(seed=0))
    assert img.shape == (8, 8, 3)
    assert np.all(np.isfinite(img)) and img.mean() > 0.1


def test_load_dict_constvolume_sigma():
    from tpusky.render.loader import load_dict
    sc = _fog_scene({"type": "isotropic"})
    sc["fog"] = {"type": "cube",
                 "interior": {"type": "heterogeneous",
                              "sigma_t": {"type": "constvolume",
                                          "value": 0.5},
                              "albedo": 0.8, "scale": 2.0}}
    b = load_dict(sc)
    img = np.array(b.render(seed=0))
    assert np.all(np.isfinite(img))


def test_srgb_spectrum_plugin():
    from tpusky.render.loader import spectrum_to_channels
    rgb = spectrum_to_channels({"type": "srgb", "color": [0.2, 0.5, 0.8]},
                               "rgb")
    np.testing.assert_allclose(rgb, [0.2, 0.5, 0.8])
    spec = spectrum_to_channels({"type": "srgb", "color": [0.2, 0.5, 0.8]},
                                "spectral")
    assert spec.shape == (11,) and np.all(spec >= 0) and np.all(spec <= 1.3)


def test_merge_shape_flattens():
    from tpusky.render.loader import load_dict
    b = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective",
                   "film": {"width": 4, "height": 4},
                   "to_world": {"type": "look_at", "origin": [0, -4, 0],
                                "target": [0, 0, 0], "up": [0, 0, 1]}},
        "m": {"type": "merge",
              "a": {"type": "sphere",
                    "to_world": {"translate": [-1.5, 0, 0]}},
              "b": {"type": "sphere",
                    "to_world": {"translate": [1.5, 0, 0]}}},
        "light": {"type": "constant", "radiance": 1.0},
    })
    hoisted = [k for k in b.scene_desc if k.startswith("m.")]
    assert len(hoisted) == 2 and "m" not in b.scene_desc
    img = np.array(b.render(seed=0))
    assert np.all(np.isfinite(img))
