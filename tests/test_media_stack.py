"""Per-shape media stacks and spectral channel-MIS distance sampling.

Reference parity: `src/integrators/volpath.cpp` tracks a per-ray
``MediumPtr`` through null-boundary events to support per-shape
interior media, and samples free flight per random channel with a
balance-heuristic mixture pdf (spectral MIS). The TPU design replaces
the pointer walk with Poisson superposition over K static convex
regions (`medium.stack_sample`) and exposes the spectral strategy as
the static ``channel_mis`` flag — these tests pin the physics both
designs must agree on:

* superposition: two overlapping identical regions with extinctions
  σ_a, σ_b render like ONE region with σ_a+σ_b (first-collision
  densities add);
* tiling: two disjoint half-regions render like their union;
* estimator equivalence: channel-MIS and channel-mean sampling are
  both unbiased (means agree);
* the traverse()/params surface reaches each region independently and
  gradients flow (AD == FD).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusky.render.loader import load_dict
from tpusky.render.medium import Medium, as_stack


def _scene(media_shapes, w=32, h=32):
    d = {"type": "scene",
         "integrator": {"type": "volpath", "max_depth": 6},
         "sensor": {"type": "perspective", "fov": 60,
                    "to_world": {"look_at": {"origin": [0, -6, 1],
                                             "target": [0, 0, 1],
                                             "up": [0, 0, 1]}},
                    "film": {"width": w, "height": h}},
         "light": {"type": "constant", "radiance": 1.0},
         "floor": {"type": "rectangle",
                   "to_world": {"transforms": [{"scale": [10, 10, 10]}]},
                   "bsdf": {"type": "diffuse",
                            "reflectance": [0.5, 0.5, 0.5]}}}
    d.update(media_shapes)
    return d


def _med_cube(center, scale, sigma, albedo=0.8, cmis=False, g=0.3):
    if np.isscalar(scale):
        scale = [scale] * 3
    return {"type": "cube",
            "to_world": {"transforms": [{"scale": scale},
                                        {"translate": center}]},
            "interior": {"type": "homogeneous", "sigma_t": sigma,
                         "albedo": albedo, "channel_mis": cmis,
                         "phase": {"type": "hg", "g": g}}}


def test_stack_loader_shapes():
    b1 = load_dict(_scene({"m": _med_cube([0, 0, 1.0], 1.0, [0.6] * 3)}))
    assert isinstance(b1._scene_static.medium, Medium)
    b2 = load_dict(_scene({"ma": _med_cube([0, 0, 1.0], 1.0, [0.4] * 3),
                           "mb": _med_cube([0, 0, 1.0], 1.0, [0.8] * 3)}))
    med = b2._scene_static.medium
    assert not isinstance(med, Medium) and len(as_stack(med)) == 2


def test_superposition_overlapping_regions():
    """Two coincident regions (σ_a, σ_b) == one region (σ_a+σ_b) with the
    scattering coefficients added (σ_s adds => combined albedo)."""
    sA, sB = 0.4, 0.8
    alb = 0.8   # same albedo on both => combined albedo is also 0.8
    b2 = load_dict(_scene({"ma": _med_cube([0, 0, 1.0], 1.0, [sA] * 3, alb),
                           "mb": _med_cube([0, 0, 1.0], 1.0, [sB] * 3, alb)}))
    bref = load_dict(_scene({"m": _med_cube([0, 0, 1.0], 1.0,
                                            [sA + sB] * 3, alb)}))
    i2 = np.asarray(b2.render(seed=0, spp=96))
    ir = np.asarray(bref.render(seed=1, spp=96))
    assert abs(i2.mean() - ir.mean()) / ir.mean() < 0.01


def test_disjoint_tiles_match_union():
    bd = load_dict(_scene({"ma": _med_cube([-0.5, 0, 1.0], 0.5, [0.9] * 3),
                           "mb": _med_cube([0.5, 0, 1.0], 0.5, [0.9] * 3)}))
    bu = load_dict(_scene({"m": _med_cube([0, 0, 1.0], [1.0, 0.5, 0.5],
                                          [0.9] * 3)}))
    i_d = np.asarray(bd.render(seed=4, spp=96))
    i_u = np.asarray(bu.render(seed=5, spp=96))
    assert abs(i_d.mean() - i_u.mean()) / i_u.mean() < 0.01


def test_channel_mis_unbiased():
    """Spectral channel-MIS sampling agrees with the channel-mean
    estimator per channel on a strongly colored medium."""
    sig = [0.2, 0.6, 1.2]
    b1 = load_dict(_scene({"m": _med_cube([0, 0, 1.0], 1.0, sig,
                                          cmis=False)}))
    b2 = load_dict(_scene({"m": _med_cube([0, 0, 1.0], 1.0, sig,
                                          cmis=True)}))
    m1 = np.asarray(b1.render(seed=2, spp=96)).mean(axis=(0, 1))
    m2 = np.asarray(b2.render(seed=3, spp=96)).mean(axis=(0, 1))
    assert np.all(np.abs(m1 - m2) / m1 < 0.01), (m1, m2)


def test_stack_traverse_and_grad():
    """traverse() exposes each region's sigma_t independently; gradients
    through one region's extinction match finite differences.

    Distance sampling follows the DETACHED discipline (the prbvolpath
    scheme, `render/medium.py sample_interaction`): AD equals the
    derivative of the expectation, while a common-random-numbers FD
    follows the pathwise (events-move) estimator — the two agree only up
    to MC noise, so the FD here runs at higher spp with a statistical
    tolerance (the exact-expectation anchor lives in
    test_volpath.test_grid_sigma_gradient_depth6_fd gate 1)."""
    bundle = load_dict(_scene(
        {"ma": _med_cube([-0.5, 0, 1.0], 0.5, [0.5] * 3, albedo=0.0),
         "mb": _med_cube([0.5, 0, 1.0], 0.5, [1.0] * 3, albedo=0.0)},
        w=8, h=8))
    params = bundle.traverse()
    assert "ma.sigma_t" in params and "mb.sigma_t" in params
    assert float(params["mb.sigma_t"][0]) == pytest.approx(1.0)

    def mean_img(s):
        p = dict(params)
        p["ma.sigma_t"] = jnp.full((3,), s)
        return jnp.mean(bundle.render(seed=7, spp=96, params=p))

    g = float(jax.grad(mean_img)(jnp.float32(0.5)))
    eps = 1e-3
    fd = (float(mean_img(jnp.float32(0.5 + eps)))
          - float(mean_img(jnp.float32(0.5 - eps)))) / (2 * eps)
    assert g < 0.0   # thicker fog over half the frame => darker image
    assert np.isclose(g, fd, rtol=0.08, atol=1e-5), (g, fd)
