"""Polarized transport tests: Mueller algebra, polarized Fresnel,
closed-form optics chains (Malus's law, wave plates) and the stokes
integrator (counterparts of the reference's `mueller.h` docstring
examples and `stokes.cpp` output conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusky.ops import mueller as mu
from tpusky.render import bsdf as B
from tpusky.render import loader
from tpusky.utils.chi2 import chi2_test


# ---------------------------------------------------------------------------
# Mueller algebra unit tests (mueller.h docstring examples)
# ---------------------------------------------------------------------------


def test_rotator_example():
    """mueller.h:157-159: R(45deg) @ [1,1,0,0] == [1,0,-1,0]."""
    s = jnp.array([1.0, 1.0, 0.0, 0.0])
    out = mu.apply_stokes(mu.rotator(jnp.deg2rad(45.0)), s)
    np.testing.assert_allclose(out, [1.0, 0.0, -1.0, 0.0], atol=1e-6)


def test_rotate_stokes_basis_example():
    """mueller.h:296-298: horizontal light in basis x re-expressed in a
    -45deg basis becomes +45deg linear polarized [1,0,1,0]."""
    fwd = jnp.array([0.0, 0.0, 1.0])
    cur = jnp.array([1.0, 0.0, 0.0])
    tgt = jnp.array([0.70710678, -0.70710678, 0.0])
    out = mu.apply_stokes(mu.rotate_stokes_basis(fwd, cur, tgt),
                          jnp.array([1.0, 1.0, 0.0, 0.0]))
    np.testing.assert_allclose(out, [1.0, 0.0, 1.0, 0.0], atol=1e-6)


def test_linear_polarizer_malus_closed_form():
    """Two ideal polarizers at relative angle t transmit cos^2(t)/2."""
    s_unpol = jnp.array([1.0, 0.0, 0.0, 0.0])
    for t in (0.0, 30.0, 45.0, 60.0, 90.0):
        m2 = mu.rotated_element(jnp.deg2rad(t), mu.linear_polarizer(1.0))
        out = mu.apply_stokes(
            mu.matmul(m2, mu.linear_polarizer(1.0)), s_unpol)
        np.testing.assert_allclose(
            out[0], 0.5 * np.cos(np.deg2rad(t)) ** 2, atol=1e-6)


def test_quarter_wave_plate_makes_circular():
    """Linear light through a quarter-wave retarder at 45deg becomes
    fully circular (|S3| = S0)."""
    lin = mu.apply_stokes(mu.linear_polarizer(1.0),
                          jnp.array([1.0, 0.0, 0.0, 0.0]))
    qwp = mu.rotated_element(jnp.deg2rad(45.0),
                             mu.linear_retarder(jnp.deg2rad(90.0)))
    out = mu.apply_stokes(qwp, lin)
    assert abs(float(out[3])) == pytest.approx(float(out[0]), abs=1e-6)
    assert float(out[1]) == pytest.approx(0.0, abs=1e-6)


def test_circular_polarizer_idempotent_and_crossed():
    r = mu.right_circular_polarizer()
    l = mu.left_circular_polarizer()
    np.testing.assert_allclose(mu.matmul(r, r), r, atol=1e-7)
    s = mu.apply_stokes(mu.matmul(l, r), jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(s, 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# Polarized Fresnel
# ---------------------------------------------------------------------------


def test_specular_reflection_m00_matches_scalar_dielectric():
    """The (0,0) entry is the unpolarized Fresnel average — must agree
    with the scalar `fresnel_dielectric` used by the main renderer."""
    cos_i = jnp.linspace(0.05, 1.0, 32)
    m = mu.specular_reflection(cos_i, jnp.full((32,), 1.5))
    f, _, _ = B.fresnel_dielectric(cos_i, jnp.full((32,), 1.5))
    np.testing.assert_allclose(m[:, 0, 0], f, atol=1e-5)


def test_brewster_full_polarization():
    ior = 1.5
    cb = float(np.cos(np.arctan(ior)))
    m = mu.specular_reflection(jnp.array(cb), jnp.array(ior))
    dop = abs(float(m[0, 1])) / float(m[0, 0])
    assert dop == pytest.approx(1.0, abs=1e-5)


def test_tir_and_energy_conservation():
    ior = 1.5
    m_tir = mu.specular_reflection(jnp.array(-0.2), jnp.array(ior))
    assert float(m_tir[0, 0]) == pytest.approx(1.0, abs=1e-5)
    for ci in (0.3, 0.6, 0.95):
        r = float(mu.specular_reflection(jnp.array(ci),
                                         jnp.array(ior))[0, 0])
        t = float(mu.specular_transmission(jnp.array(ci),
                                           jnp.array(ior))[0, 0])
        assert r + t == pytest.approx(1.0, abs=1e-5)


def test_conductor_phase_shift_present():
    """Metals shift the phase between s and p: the 2x2 lower-right block
    must pick up off-diagonal (circular) terms, unlike dielectrics."""
    m = mu.specular_reflection(jnp.array(0.5), jnp.array(0.143),
                               jnp.array(3.983))
    assert abs(float(m[2, 3])) > 1e-3
    m_d = mu.specular_reflection(jnp.array(0.5), jnp.array(1.5))
    assert abs(float(m_d[2, 3])) < 1e-7


# ---------------------------------------------------------------------------
# Rendered optics chains (stokes integrator end-to-end)
# ---------------------------------------------------------------------------


def _filter_scene(elements, nested_depth=5):
    """Camera at z=+3 looking down -z through a stack of filter
    rectangles (first element closest to the camera), constant white
    environment behind."""
    d = {
        "type": "scene",
        "integrator": {"type": "stokes",
                       "nested": {"type": "path",
                                  "max_depth": nested_depth}},
        "sensor": {"type": "radiancemeter", "origin": [0, 0, 3],
                   "direction": [0, 0, -1],
                   "film": {"type": "hdrfilm", "width": 2, "height": 2}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
    }
    for i, bsdf in enumerate(elements):
        d[f"f{i}"] = {"type": "rectangle",
                      "to_world": {"translate": [0, 0, 2 - i]},
                      "bsdf": bsdf}
    return loader.load_dict(d)


def test_malus_law_rendered():
    for t in (0.0, 30.0, 45.0, 60.0, 90.0):
        img = _filter_scene([{"type": "polarizer", "theta": 0.0},
                             {"type": "polarizer", "theta": t}]).render(
                                 spp=1)
        s0 = float(np.asarray(img)[0, 0, 0].mean())
        assert s0 == pytest.approx(0.5 * np.cos(np.deg2rad(t)) ** 2,
                                   abs=1e-4)


def test_single_polarizer_rendered_dop_one():
    img = np.asarray(_filter_scene(
        [{"type": "polarizer", "theta": 0.0}]).render(spp=1))
    s = img[0, 0]      # (4, 3)
    assert s[0].mean() == pytest.approx(0.5, abs=1e-4)
    dop = np.linalg.norm(s[1:], axis=0) / s[0]
    np.testing.assert_allclose(dop, 1.0, atol=1e-4)


def test_quarter_wave_chain_rendered():
    """polarizer -> quarter-wave plate at 45deg (camera side) yields
    circular light: |S3| == S0, S1 == S2 == 0."""
    img = np.asarray(_filter_scene(
        [{"type": "retarder", "theta": 45.0, "delta": 90.0},
         {"type": "polarizer", "theta": 0.0}]).render(spp=1))
    s = img[0, 0]
    assert s[0].mean() == pytest.approx(0.5, abs=1e-4)
    np.testing.assert_allclose(np.abs(s[3]), s[0], atol=1e-4)
    np.testing.assert_allclose(s[1:3], 0.0, atol=1e-4)


def test_crossed_circular_polarizers_rendered():
    img_same = np.asarray(_filter_scene(
        [{"type": "circular"}, {"type": "circular"}]).render(spp=1))
    img_cross = np.asarray(_filter_scene(
        [{"type": "circular", "left_handed": True},
         {"type": "circular"}]).render(spp=1))
    assert img_same[0, 0, 0].mean() == pytest.approx(0.5, abs=1e-4)
    assert img_cross[0, 0, 0].mean() == pytest.approx(0.0, abs=1e-5)


def _ball_scene(ball_bsdf, integrator):
    return loader.load_dict({
        "type": "scene",
        "integrator": integrator,
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at",
                                "origin": [0, -4, 1.5],
                                "target": [0, 0, 0.5], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 16, "height": 16}},
        "ground": {"type": "rectangle", "to_world": {"scale": [3, 3, 1]},
                   "bsdf": {"type": "diffuse",
                            "reflectance": {"type": "rgb",
                                            "value": [0.4, 0.5, 0.6]}}},
        "ball": {"type": "sphere", "center": [0, 0, 0.8], "radius": 0.8,
                 "bsdf": ball_bsdf},
        "env": {"type": "sunsky", "turbidity": 3.0},
    })


def test_stokes_s0_matches_scalar_render():
    """With only depolarizing BSDFs the Stokes S0 image equals the scalar
    render bit-for-bit (same RNG stream, same estimators) and S1..S3
    vanish identically."""
    stokes_b = _ball_scene({"type": "diffuse"},
                           {"type": "stokes",
                            "nested": {"type": "path", "max_depth": 4}})
    scalar_b = _ball_scene({"type": "diffuse"},
                           {"type": "path", "max_depth": 4})
    st = np.asarray(stokes_b.render(seed=3, spp=8))
    sc = np.asarray(scalar_b.render(seed=3, spp=8))
    assert st.shape == (16, 16, 4, 3)
    np.testing.assert_allclose(st[..., 0, :], sc, atol=2e-7)
    assert float(np.abs(st[..., 1:, :]).max()) == 0.0


def test_conductor_reflection_polarizes():
    """Oblique reflections off a gold sphere produce partially polarized
    light, with S0 still matching the scalar render."""
    integ = {"type": "stokes", "nested": {"type": "path", "max_depth": 4}}
    ball = {"type": "roughconductor", "material": "Au", "alpha": 0.1}
    st = np.asarray(_ball_scene(ball, integ).render(seed=3, spp=16))
    sc = np.asarray(_ball_scene(
        ball, {"type": "path", "max_depth": 4}).render(seed=3, spp=16))
    np.testing.assert_allclose(st[..., 0, :], sc, atol=1e-5)
    dop = (np.linalg.norm(st[..., 1:, :], axis=-2)
           / np.maximum(st[..., 0, :], 1e-6))
    assert float(dop.max()) > 0.1
    # physical Stokes vectors: degree of polarization can never exceed 1
    assert float(dop.max()) <= 1.0 + 1e-4


def test_pplastic_renders_and_polarizes():
    integ = {"type": "stokes", "nested": {"type": "path", "max_depth": 4}}
    ball = {"type": "pplastic", "alpha": 0.08,
            "diffuse_reflectance": {"type": "rgb",
                                    "value": [0.3, 0.2, 0.1]}}
    st = np.asarray(_ball_scene(ball, integ).render(seed=5, spp=16))
    assert np.isfinite(st).all()
    dop = (np.linalg.norm(st[..., 1:, :], axis=-2)
           / np.maximum(st[..., 0, :], 1e-6))
    assert float(dop.max()) > 0.02
    assert float(dop.max()) <= 1.0 + 1e-4


# ---------------------------------------------------------------------------
# pplastic scalar radiometry (sampling consistency + loader)
# ---------------------------------------------------------------------------


def test_pplastic_sample_pdf_chi2():
    table = B.make_material_table(kinds=[B.PPLASTIC],
                                  albedos=[[0.5, 0.5, 0.5]], alphas=[0.35])
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

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(11),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(0.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_pplastic_energy_below_one():
    """pplastic is not energy conserving by design but must stay below
    unity for reasonable parameters (`pplastic.cpp` docs)."""
    table = B.make_material_table(kinds=[B.PPLASTIC],
                                  albedos=[[1.0, 1.0, 1.0]], alphas=[0.3])
    key = jax.random.PRNGKey(2)
    n = 200_000
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wi = jnp.broadcast_to(jnp.array([0.0, 0.4, 0.9165151]), (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wi, u2, u1,
                             None)
    albedo_est = float(jnp.mean(w[:, 0]))
    assert albedo_est < 1.0


def test_polarization_bsdfs_via_loader():
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "stokes", "nested": {"type": "path"}},
        "sensor": {"type": "radiancemeter", "origin": [0, 0, 3],
                   "direction": [0, 0, -1],
                   "film": {"type": "hdrfilm", "width": 2, "height": 2}},
        "f0": {"type": "rectangle", "to_world": {"translate": [0, 0, 1]},
               "bsdf": {"type": "retarder", "theta": 10.0, "delta": 180.0,
                        "transmittance": 0.9}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
    })
    img = np.asarray(b.render(spp=1))
    # a retarder passes unpolarized light through (attenuated only)
    assert img[0, 0, 0].mean() == pytest.approx(0.9, abs=1e-4)
    np.testing.assert_allclose(img[0, 0, 1:], 0.0, atol=1e-5)


def test_spectral_polarized_mode():
    """`mode="spectral"` runs hero-wavelength polarized transport (the
    reference's *_spectral_polarized variants): S0 approximates the RGB
    render; polarization (conductor Fresnel) still shows up."""
    base = {
        "type": "scene",
        "integrator": {"type": "stokes",
                       "nested": {"type": "path", "max_depth": 4}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -4, 1.5],
                                "target": [0, 0, 0.5], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 12, "height": 12}},
        "ball": {"type": "sphere", "center": [0, 0, 0.8], "radius": 0.8,
                 "bsdf": {"type": "conductor", "material": "Au"}},
        "ground": {"type": "rectangle", "to_world": {"scale": [3, 3, 1]},
                   "bsdf": {"type": "diffuse"}},
        "env": {"type": "sunsky", "turbidity": 3.0},
    }
    st = np.asarray(loader.load_dict(base, mode="spectral").render(
        seed=3, spp=16))
    rgb = np.asarray(loader.load_dict(base, mode="rgb").render(
        seed=3, spp=16))
    assert st.shape == (12, 12, 4, 3) and np.isfinite(st).all()
    # spectral and RGB S0 agree in the mean (different transports, same
    # scene; tolerance like the spectral-vs-RGB sunsky study)
    assert abs(st[..., 0, :].mean() - rgb[..., 0, :].mean()) \
        < 0.1 * rgb[..., 0, :].mean()
    dop = (np.linalg.norm(st[..., 1:, :], axis=-2)
           / np.maximum(st[..., 0, :], 1e-6))
    assert 0.03 < float(dop.max()) <= 1.001
