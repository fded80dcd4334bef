"""RGL measured BRDF (`measured.cpp`) + tensor-file I/O: warp
roundtrips, sampling consistency, chi2, and loader integration with a
synthetic dataset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusky.ops.tensorfile import read_tensor_file, write_tensor_file
from tpusky.render import bsdf as B
from tpusky.render import loader
from tpusky.render import measured as M
from tpusky.utils.chi2 import chi2_test


def _synthetic_fields(P=1, T=8, H=32, W=32, jacobian=0):
    theta_i = np.linspace(0, np.pi / 2, T).astype(np.float32)
    phi_i = np.zeros((P,), np.float32)
    ut = np.linspace(0, 1, W)[None, None, None, :]
    up = np.linspace(0, 1, H)[None, None, :, None]
    ti = theta_i[None, :, None, None] / (np.pi / 2)
    vndf = (np.exp(-((ut - 0.3 - 0.3 * ti) / 0.25) ** 2) + 0.15
            + 0.05 * np.cos(2 * np.pi * up))
    # physical VNDFs vanish toward u_theta = 0 (the warped pole maps to a
    # vanishing solid angle, pdf ~ f_u / u^3); keep the synthetic data in
    # that regime so the chi2 cell integrals stay resolvable
    taper = np.clip(ut / 0.2, 0.0, 1.0) ** 2
    vndf = np.broadcast_to(vndf * taper, (P, T, H, W)).astype(np.float32)
    lum = np.broadcast_to(0.5 + 0.5 * ut + 0.2 * up + 0.1 * ti,
                          (P, T, H, W)).astype(np.float32)
    rgb = np.zeros((P, T, 3, H, W), np.float32)
    rgb[:, :, 0] = 0.8
    rgb[:, :, 1] = 0.6
    rgb[:, :, 2] = 0.4
    return dict(theta_i=theta_i, phi_i=phi_i,
                ndf=np.ones((H, W), np.float32),
                sigma=np.full((H, W), 0.25, np.float32),
                vndf=vndf, luminance=lum, rgb=rgb,
                description=np.frombuffer(b"synthetic", np.uint8),
                jacobian=np.array([jacobian], np.uint8))


def test_tensorfile_roundtrip(tmp_path):
    fields = _synthetic_fields()
    p = tmp_path / "synth.bsdf"
    write_tensor_file(str(p), fields)
    back = read_tensor_file(str(p))
    assert set(back) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])


def test_warp_sample_invert_roundtrip():
    rng = np.random.default_rng(0)
    data = (rng.random((1, 8, 32, 32)) + 0.1).astype(np.float32)
    warp = M._build_warp(data)
    m = M.MeasuredBRDF(jnp.zeros(1), jnp.linspace(0, np.pi / 2, 8), None,
                       None, None, warp, warp, None, True, False, 1)
    n = 100_000
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    slices = M._slice_weights(m, jnp.zeros(n), jnp.full((n,), 0.6))
    pos, pdf = M._warp_sample(warp, slices, u)
    u2, pdf2 = M._warp_invert(warp, slices, pos)
    assert float(jnp.abs(u - u2).max()) < 1e-5
    assert float((jnp.abs(pdf - pdf2)
                  / jnp.maximum(pdf, 1e-9)).max()) < 1e-4
    # normalized density
    posu = jax.random.uniform(jax.random.PRNGKey(2), (n, 2))
    _, pdfu = M._warp_invert(warp, slices, posu)
    assert float(jnp.mean(pdfu)) == pytest.approx(1.0, abs=5e-3)


_WI = jnp.asarray([0.3, -0.1, 0.95])
_WI = _WI / jnp.linalg.norm(_WI)


def _brdf(jacobian=0):
    return M.load_measured(_synthetic_fields(jacobian=jacobian))


def test_measured_sample_eval_consistency():
    m = _brdf()
    n = 200_000
    key = jax.random.PRNGKey(0)
    u2 = jax.random.uniform(key, (n, 2))
    wib = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf = M.measured_sample(m, wib, u2, None)
    live = pdf > 1e-9
    val, pdf2 = M.measured_eval_pdf(m, wib, wo, None)
    rel = jnp.abs(jnp.where(live, pdf - pdf2, 0.0)) \
        / jnp.maximum(pdf, 1e-6)
    assert float(jnp.mean(rel)) < 1e-3
    assert float(jnp.abs(jnp.where(live[:, None], w * pdf[:, None] - val,
                                   0.0)).max()) < 1e-5
    # jacobian flag off + constant spectra: eval returns the constants
    np.testing.assert_allclose(
        np.asarray(val[live][:100]),
        np.broadcast_to([0.8, 0.6, 0.4], (100, 3)), atol=1e-5)
    # pdf mass matches the acceptance rate
    mq = 200_000
    d = jax.random.normal(jax.random.fold_in(key, 3), (mq, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d.at[:, 2].set(jnp.abs(d[:, 2]))
    _, pd = M.measured_eval_pdf(m, jnp.broadcast_to(_WI, (mq, 3)), d,
                                None)
    mass = float(jnp.mean(pd)) * 2 * np.pi
    assert mass == pytest.approx(float(jnp.mean(live)), abs=0.02)


def test_measured_sample_pdf_chi2():
    m = _brdf()

    def sample_fn(key, n):
        u2 = jax.random.uniform(key, (n, 2))
        wib = jnp.broadcast_to(_WI, (n, 3))
        wo, w, pdf = M.measured_sample(m, wib, u2, None)
        return jnp.where((pdf > 1e-9)[:, None], wo,
                         jnp.array([0.0, 0.0, 2.0]))

    def pdf_fn(d):
        n = d.shape[0]
        wib = jnp.broadcast_to(_WI, (n, 3))
        _, pdf = M.measured_eval_pdf(m, wib, d)
        return pdf

    p, ok, info = chi2_test(sample_fn, pdf_fn, key=jax.random.PRNGKey(23),
                            sample_count=1_000_000, res_phi=64, res_cos=32,
                            cos_range=(0.0, 1.0), ires=16)
    assert ok, f"chi2 p={p} {info}"


def test_measured_via_bsdf_dispatch():
    """Kind-17 rows route through the generic eval_pdf/sample."""
    m = _brdf()
    table = B.make_material_table(kinds=[B.MEASURED],
                                  albedos=[[1.0, 1.0, 1.0]],
                                  measured=m)
    n = 50_000
    key = jax.random.PRNGKey(4)
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wib = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, is_delta = B.sample(table, jnp.zeros((n,), jnp.int32),
                                    wib, u2, u1, None)
    val, pdf2 = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wib, wo,
                           None)
    live = pdf > 1e-9
    assert float(jnp.mean(live)) > 0.5
    assert not bool(is_delta.any())
    assert float(jnp.abs(jnp.where(live[:, None], w * pdf[:, None] - val,
                                   0.0)).max()) < 1e-5


def test_measured_loader_render(tmp_path):
    p = tmp_path / "synth.bsdf"
    write_tensor_file(str(p), _synthetic_fields(jacobian=1))
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -4, 1.5],
                                "target": [0, 0, 0.5], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 12, "height": 12}},
        "ball": {"type": "sphere", "center": [0, 0, 0.8], "radius": 0.8,
                 "bsdf": {"type": "measured", "filename": str(p)}},
        "ground": {"type": "rectangle", "to_world": {"scale": [3, 3, 1]},
                   "bsdf": {"type": "diffuse"}},
        "env": {"type": "sunsky", "turbidity": 3.0},
    })
    img = np.asarray(b.render(seed=2, spp=8))
    assert np.isfinite(img).all() and img.max() > 0


# ---------------------------------------------------------------------------
# measured_polarized (`measured_polarized.cpp`)
# ---------------------------------------------------------------------------


def _synthetic_pbsdf(a=0.5, b=0.2):
    """Constant diattenuator-style Mueller data over the Rusinkiewicz
    grids: M = [[a,b,0,0],[b,a,0,0],[0,0,c,0],[0,0,0,c]]."""
    Pd, Td, Th, L = 4, 5, 6, 5
    c = np.sqrt(max(a * a - b * b, 0.0))
    M = np.zeros((Pd, Td, Th, L, 4, 4), np.float32)
    M[..., 0, 0] = a
    M[..., 0, 1] = b
    M[..., 1, 0] = b
    M[..., 1, 1] = a
    M[..., 2, 2] = c
    M[..., 3, 3] = c
    return dict(
        phi_d=np.linspace(-np.pi, np.pi, Pd, dtype=np.float32)[None],
        theta_d=np.linspace(0, np.pi / 2, Td, dtype=np.float32)[None],
        theta_h=np.linspace(0, np.pi / 2, Th, dtype=np.float32)[None],
        wvls=np.linspace(400, 700, L).astype(np.uint16),
        M=M)


def test_measured_polarized_eval_and_dop(tmp_path):
    p = tmp_path / "synth.pbsdf"
    write_tensor_file(str(p), _synthetic_pbsdf())
    mp = M.load_measured_polarized(read_tensor_file(str(p)),
                                   alpha_sample=0.2)
    n = 1000
    key = jax.random.PRNGKey(0)
    wo = jax.random.normal(key, (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wo = wo.at[:, 2].set(jnp.abs(wo[:, 2]) + 0.05)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.broadcast_to(_WI, (n, 3))
    mm = M.mp_eval_mueller(mp, wi, wo, None)
    cos_o = np.asarray(wo[:, 2])
    # M00 = a * cos_o (rotations preserve the (0,0) entry)
    np.testing.assert_allclose(
        np.asarray(mm[..., 0, 0]),
        np.broadcast_to(0.5 * cos_o[:, None], (n, 3)), atol=1e-4)
    # degree of polarization of reflected unpolarized light = |b| / a
    s = np.asarray(mm[..., :, 0])                # first column
    dop = np.linalg.norm(s[..., 1:], axis=-1) / np.maximum(s[..., 0],
                                                           1e-9)
    np.testing.assert_allclose(dop, 0.2 / 0.5, atol=1e-3)
    # scalar eval agrees with M00 and the mixture pdf integrates
    val, pdf = M.mp_eval_pdf(mp, wi, wo, None)
    np.testing.assert_allclose(
        np.asarray(val),
        np.broadcast_to(0.5 * cos_o[:, None], (n, 3)), atol=1e-4)


def test_measured_polarized_sampling_consistency():
    mp = M.load_measured_polarized(_synthetic_pbsdf(), alpha_sample=0.3)
    table = B.make_material_table(kinds=[B.MEASURED_POL],
                                  albedos=[[1.0, 1.0, 1.0]],
                                  measured_pol=mp)
    n = 200_000
    key = jax.random.PRNGKey(5)
    u2 = jax.random.uniform(key, (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    wib = jnp.broadcast_to(_WI, (n, 3))
    wo, w, pdf, _ = B.sample(table, jnp.zeros((n,), jnp.int32), wib, u2,
                             u1, None)
    val, pdf2 = B.eval_pdf(table, jnp.zeros((n,), jnp.int32), wib, wo,
                           None)
    live = pdf > 1e-9
    assert float(jnp.abs(jnp.where(live, pdf - pdf2, 0.0)).max()) < 1e-5
    # estimated reflectance = a (BRDF f*cos integrates M00 * cos over
    # the pdf): the mixture estimator converges to the albedo 0.5
    est = float(jnp.mean(jnp.where(live, w[:, 0], 0.0)))
    # integral of 0.5*cos over hemisphere = 0.5*pi; estimator averages
    # f cos/pdf with proper pdf -> integral value
    assert est == pytest.approx(0.5 * np.pi, rel=0.02)


def test_measured_polarized_stokes_render(tmp_path):
    p = tmp_path / "synth.pbsdf"
    write_tensor_file(str(p), _synthetic_pbsdf())
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "stokes",
                       "nested": {"type": "path", "max_depth": 3}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -4, 1.5],
                                "target": [0, 0, 0.5], "up": [0, 0, 1]},
                   "film": {"type": "hdrfilm", "width": 12, "height": 12}},
        "ball": {"type": "sphere", "center": [0, 0, 0.8], "radius": 0.8,
                 "bsdf": {"type": "measured_polarized",
                          "filename": str(p), "alpha_sample": 0.3}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1, 1, 1]}},
    })
    img = np.asarray(b.render(seed=2, spp=16))
    assert img.shape == (12, 12, 4, 3) and np.isfinite(img).all()
    dop = (np.linalg.norm(img[..., 1:, :], axis=-2)
           / np.maximum(img[..., 0, :], 1e-6))
    assert float(dop.max()) > 0.1          # the diattenuator polarizes
    assert float(dop.max()) <= 1.0 + 1e-3
