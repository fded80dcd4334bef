"""Tests for the tpusky.ad package: optimizers (SGD/Adam incl. masked and
uniform variants), the ADIntegrator-style render_forward/render_backward
surface, the prb/prb_basic integrator aliases, and LargeSteps.

Reference test analogues: `src/python/python/ad/optimizers.py` semantics,
`test_ad_integrators.py` (fwd/bwd consistency), `largesteps.py` solve
quality."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusky.ad import (SGD, Adam, LargeSteps, mesh_laplacian_edges,
                       render_backward, render_forward, render_primal)
from tpusky.render.loader import load_dict
from tpusky.utils.transform import look_at, scale


# ---------------------------------------------------------------------------
# optimizers vs a straight NumPy oracle
# ---------------------------------------------------------------------------

def _numpy_adam(x, grads, lr, b1=0.9, b2=0.999, eps=1e-8):
    m = np.zeros_like(x); v = np.zeros_like(x); xs = []
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** t)
        vh = v / (1 - b2 ** t)
        x = x - lr * mh / (np.sqrt(vh) + eps)
        xs.append(x.copy())
    return xs


def test_adam_matches_oracle():
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=5).astype(np.float32)
    grads = [rng.normal(size=5).astype(np.float32) for _ in range(7)]
    opt = Adam(lr=0.1)
    p = jnp.asarray(x0); st = opt.init(p)
    ref = _numpy_adam(x0, grads, 0.1)
    for g, want in zip(grads, ref):
        p, st = opt.step(p, jnp.asarray(g), st)
        np.testing.assert_allclose(np.array(p), want, rtol=1e-5, atol=1e-6)


def test_sgd_momentum_matches_oracle():
    x = np.float32(1.0); v = 0.0
    opt = SGD(lr=0.2, momentum=0.9)
    p = jnp.float32(1.0); st = opt.init(p)
    for k in range(6):
        g = float(p) * 2.0          # grad of x^2
        gn = x * 2.0
        v = 0.9 * v + gn
        x = x - 0.2 * v
        p, st = opt.step(p, jnp.float32(g), st)
        assert np.allclose(float(p), x, rtol=1e-6)


def test_adam_uniform_direction_parallel_to_momentum():
    """uniform=True divides by a per-tensor scalar, so the update is
    exactly parallel to the bias-corrected first moment (UniformAdam,
    reference optimizers.py:239-243)."""
    opt = Adam(lr=0.1, uniform=True)
    g = jnp.asarray([1.0, 2.0, -4.0])
    p = jnp.zeros(3); st = opt.init(p)
    updates, _ = opt.update(g, st, p)
    u = np.array(updates)
    # first step: m_hat == g, so update ∝ -g
    cos = np.dot(u, -np.array(g)) / (np.linalg.norm(u) * np.linalg.norm(g))
    assert cos > 0.999999


def test_adam_masked_updates():
    """mask_updates=True: zero-gradient elements keep value AND state
    (reference optimizers.py:234-238)."""
    opt = Adam(lr=0.5, mask_updates=True)
    p = jnp.asarray([1.0, 1.0]); st = opt.init(p)
    p1, st = opt.step(p, jnp.asarray([1.0, 0.0]), st)
    assert float(p1[1]) == 1.0 and float(p1[0]) != 1.0
    m, v, t = st
    assert float(t[1]) == 0.0 and float(t[0]) == 1.0
    # second step updates only the other lane; first lane unchanged
    p2, st = opt.step(p1, jnp.asarray([0.0, -1.0]), st)
    assert float(p2[0]) == float(p1[0]) and float(p2[1]) != 1.0


def test_per_parameter_learning_rate():
    opt = SGD(lr=1.0)
    opt.set_learning_rate(turbidity=0.0)  # freeze one named leaf
    # params as a dict so names address leaves
    params = {"turbidity": jnp.float32(3.0), "albedo": jnp.float32(0.5)}
    grads = {"turbidity": jnp.float32(1.0), "albedo": jnp.float32(1.0)}
    st = opt.init(params)
    new, _ = opt.step(params, grads, st)
    assert float(new["turbidity"]) == 3.0
    assert float(new["albedo"]) == pytest.approx(-0.5)


# ---------------------------------------------------------------------------
# ADIntegrator surface: render_forward / render_backward
# ---------------------------------------------------------------------------

def _tiny_bundle(integrator="prb"):
    return load_dict({
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": look_at([0, -4, 1.5], [0, 0, 0.8]),
                   "film": {"width": 12, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "emitter": {"type": "sunsky", "turbidity": 4.3, "albedo": 0.3,
                    "sun_direction": [0.3, 0.2, 0.93]},
        "floor": {"type": "rectangle", "to_world": scale(8)},
    })


def test_prb_alias_matches_path():
    b_prb = _tiny_bundle("prb")
    b_path = _tiny_bundle("path")
    i1 = np.array(b_prb.render(seed=3))
    i2 = np.array(b_path.render(seed=3))
    np.testing.assert_array_equal(i1, i2)


def test_prb_basic_forces_direct_depth():
    b = _tiny_bundle("prb_basic")
    assert b.max_depth == 2 and b.integrator == "path"


def test_forward_backward_consistency():
    """<vjp(δL), t> == <δL, jvp(t)> — the fwd and bwd ADIntegrator paths
    agree on every direction (the identity `test04_render_custom_op`
    checks via the CustomOp plumbing, common.py)."""
    b = _tiny_bundle()
    params = b.params
    rng = np.random.default_rng(1)
    tangents = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=np.shape(p)), jnp.float32),
        params)
    img, dimg = render_forward(b, params, tangents, seed=5)
    dL = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    img2, grads = render_backward(b, dL, params, seed=5)
    np.testing.assert_allclose(np.array(img), np.array(img2), atol=1e-6)
    lhs = float(jnp.vdot(dL, dimg))
    rhs = sum(float(jnp.vdot(g, t)) for g, t in
              zip(jax.tree.leaves(grads), jax.tree.leaves(tangents)))
    assert np.isclose(lhs, rhs, rtol=2e-3), (lhs, rhs)


def test_render_primal_detached():
    b = _tiny_bundle()
    img = render_primal(b, seed=0)
    assert np.isfinite(np.array(img)).all() and img.shape == (8, 12, 3)


# ---------------------------------------------------------------------------
# LargeSteps
# ---------------------------------------------------------------------------

def _octahedron():
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                  [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return v, f


def test_mesh_laplacian_edges():
    _, f = _octahedron()
    e = mesh_laplacian_edges(f)
    assert e.shape == (12, 2)                     # octahedron has 12 edges
    assert (e[:, 0] < e[:, 1]).all()


def test_largesteps_roundtrip():
    v, f = _octahedron()
    ls = LargeSteps(v, f, lambda_=19.0)
    u = ls.to_differential(v)
    v2 = np.array(ls.from_differential(u))
    np.testing.assert_allclose(v2, v, atol=1e-4)


def test_largesteps_laplacian_values():
    """Every octahedron vertex has 4 neighbours that average to
    -center/2... degree*v - sum(neigh) computed against dense oracle."""
    v, f = _octahedron()
    ls = LargeSteps(v, f, lambda_=1.0)
    # dense Laplacian oracle
    n = len(v)
    L = np.zeros((n, n), np.float32)
    for a, b in np.asarray(mesh_laplacian_edges(f)):
        L[a, b] -= 1; L[b, a] -= 1
        L[a, a] += 1; L[b, b] += 1
    want = v + L @ v
    got = np.array(ls.to_differential(v))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_largesteps_smooth_gradient_distribution():
    """A u-space step from a single-vertex v-space gradient moves the
    neighbours too (the whole point of the preconditioner)."""
    v, f = _octahedron()
    ls = LargeSteps(v, f, lambda_=19.0)
    u = ls.to_differential(v)

    def loss(u_):
        v_ = ls.from_differential(u_)
        return v_[4, 2]            # depends on ONE vertex coordinate
    g = jax.grad(loss)(u)
    v_new = np.array(ls.from_differential(u - 1.0 * g))
    moved = np.abs(v_new - v).sum(axis=1)
    assert moved[4] > 0            # the vertex itself moved
    assert (moved[:4] > 1e-6).all()  # ... and its 4 equatorial neighbours


# ---------------------------------------------------------------------------
# Sun-disc surrogate gradient: AD == FD across the disc edge
# ---------------------------------------------------------------------------

def test_disc_edge_gradient_matches_fd():
    """Pin the `_disc_weight` straight-through surrogate
    (`models/sunsky/model.py`): the AD derivative of a pixel-integrated
    radiance w.r.t. the sun elevation must match central finite
    differences ACROSS the disc edge, where pointwise AD of the hard
    cone test would be exactly zero. (BASELINE.md round-3 claimed
    'AD==FD away from lerp knots' in prose only; this makes a silent
    regression impossible.)"""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables

    tables = load_tables("rgb")
    # a fine direction grid straddling the disc edge: the "pixel" is the
    # mean radiance over the grid, whose dependence on the sun elevation
    # includes the boundary (disc-crossing) term
    ap = 0.5 * np.radians(0.5358)
    el0 = np.radians(30.0)
    # fine grid: the limb-darkening sqrt has an integrable singularity at
    # the limb; coarse grids (96 pts) overestimate the AD sum by ~80%
    # while 4096 pts resolve it (measured: ratio converges to ~1.08)
    n = 4096
    els = np.linspace(el0 - 3.5 * ap, el0 + 3.5 * ap, n)
    d = np.stack([np.cos(els), np.zeros(n), np.sin(els)], -1)
    d = jnp.asarray(d, jnp.float32)

    def mean_rad(elev):
        sd = jnp.stack([jnp.cos(elev), jnp.zeros_like(elev),
                        jnp.sin(elev)])
        p = ts.make_params(turbidity=3.0, albedo=0.3, sun_direction=sd)
        state = M.precompute(tables, p, "rgb")
        return jnp.mean(M._eval_rgb_jnp(state, d))

    elev = jnp.float32(el0)
    g_ad = float(jax.grad(mean_rad)(elev))
    # FD step spanning several ramp widths so the hard-edge transitions
    # are integrated, not straddled
    h = 2e-4
    f = jax.jit(mean_rad)
    g_fd = (float(f(elev + h)) - float(f(elev - h))) / (2 * h)
    # The surrogate systematically overestimates the boundary term by
    # ~8% (the ramp kernel averages limb-darkened radiance over
    # [0.7ap, 1.2ap] instead of sampling it exactly at the limb, and
    # radiance rises steeply just inside). Pin sign + magnitude within
    # 12% — well inside the reference's own AD-vs-FD bars (mean 0.05 is
    # per-pixel-averaged; max allows 0.5, `test_ad_integrators.py:52`).
    assert abs(g_ad - g_fd) <= 0.12 * abs(g_fd) + 1e-3, (g_ad, g_fd)
    # and the gradient is genuinely disc-dominated here (the sky-only
    # gradient is orders of magnitude smaller)
    def mean_rad_nodisc(elev):
        sd = jnp.stack([jnp.cos(elev), jnp.zeros_like(elev),
                        jnp.sin(elev)])
        p = ts.make_params(turbidity=3.0, albedo=0.3, sun_direction=sd,
                           sun_scale=0.0)
        state = M.precompute(tables, p, "rgb")
        return jnp.mean(M._eval_rgb_jnp(state, d))
    g_sky = float(jax.grad(mean_rad_nodisc)(elev))
    assert abs(g_ad) > 10 * abs(g_sky), (g_ad, g_sky)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="256p/8spp joint recovery needs the TPU "
                           "(~30 CPU-min; sub-pixel discs at CPU-sized "
                           "films defeat the surrogate) — the driver "
                           "runs the same recipe as bench.py --gradsun")
def test_joint_sun_recovery_gradients_only():
    """Joint (turbidity, sun) recovery from 5 deg off purely by
    gradients (VERDICT r4 item 8): the widened straight-through disc
    ramp (`SunskyParams.disc_softness`, soft=2000 is a ~5 deg tangent
    bump) plus a two-phase adam schedule lands within the measured
    surrogate-equilibrium floor (~1 deg) — no grid/direct search."""
    from bench import bench_grad_sun_recovery
    import io
    import contextlib
    import json as _json
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_grad_sun_recovery()
    rec = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["value"] < 1.5, rec            # sun error (deg) from 5.0
    assert rec["turbidity_abs_err"] < 0.4, rec
