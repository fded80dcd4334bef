"""Curve shapes (reference H20: `bsplinecurve.cpp`, `linearcurve.cpp`) —
rounded-cone intersection oracles, B-spline flattening, shadow tests, and
an end-to-end render through the loader."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import integrator
from tpusky.render.curve import (curve_intersect, curve_test,
                                 make_curve_table, _bspline_flatten)
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective


def _seg_table(pa, pb, ra, rb, mat=0):
    return make_curve_table([dict(points=np.asarray([pa, pb], np.float32),
                                  radii=np.asarray([ra, rb], np.float32),
                                  kind="linear", bsdf_idx=mat)])


def test_cylinder_body_hit():
    """Constant-radius segment along x, ray along -z through its middle:
    t = dist - r, normal = +z."""
    tab = _seg_table([-1, 0, 0], [1, 0, 0], 0.25, 0.25)
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, n, mat, hit, tg = curve_intersect(tab, o, d)
    assert bool(hit[0])
    assert float(t[0]) == jax.numpy.asarray(4.75).item() or \
        abs(float(t[0]) - 4.75) < 1e-4
    np.testing.assert_allclose(np.array(n[0]), [0, 0, 1], atol=1e-5)


def test_cap_hit_and_radius_lerp():
    """Ray aimed beyond the endpoint hits the end sphere cap; a cone with
    r: 0.1 -> 0.5 is hit at the lerped radius at mid-span."""
    tab = _seg_table([-1, 0, 0], [1, 0, 0], 0.3, 0.3)
    o = jnp.asarray([[1.25, 0.0, 5.0]])      # beyond pb + inside cap r
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, n, _, hit, _tg = curve_intersect(tab, o, d)
    assert bool(hit[0])
    # sphere cap at (1,0,0) r=0.3: z = sqrt(0.3^2 - 0.25^2)
    z = np.sqrt(0.3 ** 2 - 0.25 ** 2)
    assert abs(float(t[0]) - (5.0 - z)) < 1e-4
    # cone: radius lerps along the axis
    cone = _seg_table([-1, 0, 0], [1, 0, 0], 0.1, 0.5)
    o2 = jnp.asarray([[0.0, 0.0, 5.0]])
    t2, _, _, hit2, _tg2 = curve_intersect(cone, o2, d)
    assert bool(hit2[0])
    # at x=0 the swept-sphere envelope radius is close to lerp = 0.3
    # (the true envelope of a rounded cone is slightly offset)
    assert 0.27 < 5.0 - float(t2[0]) < 0.33


def test_miss_and_shadow():
    tab = _seg_table([-1, 0, 0], [1, 0, 0], 0.2, 0.2)
    o = jnp.asarray([[0.0, 2.0, 5.0], [0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, _, _, hit, _tg3 = curve_intersect(tab, o, d)
    assert not bool(hit[0]) and bool(hit[1])
    occ = curve_test(tab, o, d, jnp.asarray([jnp.inf, jnp.inf]))
    assert not bool(occ[0]) and bool(occ[1])
    # maxt shorter than the hit distance -> unoccluded
    occ2 = curve_test(tab, o, d, jnp.asarray([1.0, 1.0]))
    assert not bool(occ2[1])


def test_bspline_flatten_straight_line():
    """Collinear control points flatten onto the same line with radii
    interpolated by the cubic B-spline basis (partition of unity)."""
    pts = np.stack([np.linspace(0, 3, 7), np.zeros(7), np.zeros(7)], -1)
    radii = np.linspace(0.1, 0.4, 7).astype(np.float32)
    fp, fr = _bspline_flatten(pts.astype(np.float32), radii, subdiv=4)
    assert np.abs(fp[:, 1:]).max() < 1e-6
    assert fp[:, 0].min() >= 0.0 and fp[:, 0].max() <= 3.0
    assert np.all(np.diff(fp[:, 0]) > 0)           # monotone along the line
    assert fr.min() >= 0.1 - 1e-6 and fr.max() <= 0.4 + 1e-6


def test_curve_render_loader_end_to_end():
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -5, 0],
                                "target": [0, 0, 0], "up": [0, 0, 1]},
                   "film": {"height": 32, "width": 32},
                   "sampler": {"sample_count": 16}},
        "env": {"type": "constant", "radiance": 1.0},
        "hair": {"type": "bsplinecurve",
                 "points": [[-2, 0, -1], [-1, 0, 0.5], [1, 0, -0.5],
                            [2, 0, 1], [3, 0, 0]],
                 "radius": 0.3,
                 "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.1, 0.1]}},
    })
    img = np.asarray(bundle.render(seed=0))
    assert np.isfinite(img).all()
    # the red curve must be visible: some pixels clearly red-dominant
    red = (img[..., 0] > 1.5 * img[..., 2] + 0.05).sum()
    assert red > 10, red


def test_curve_shadowing_in_render():
    """A thick curve floating over a white floor darkens the pixels under
    it (NEE shadow rays hit the curve)."""
    plane = np.diag([50.0, 50.0, 1.0, 1.0]).astype(np.float32)
    curves = [dict(points=np.asarray([[-4, 0, 1.0], [4, 0, 1.0]],
                                     np.float32),
                   radii=np.asarray([0.5, 0.5], np.float32),
                   kind="linear", bsdf_idx=0)]
    scene = make_scene(
        shapes=[dict(kind=1, to_world=plane, bsdf_idx=0)],
        bsdf_albedos=[[0.8, 0.8, 0.8]],
        curves=curves,
        point_lights=[[0.0, 0.0, 6.0, 60.0, 60.0, 60.0]])
    sensor = make_perspective(origin=[0, -6, 4], target=[0, 0, 0],
                              fov_x_deg=40)
    img = np.array(integrator.render(scene, sensor, Film(32, 32, 3),
                                     jax.random.PRNGKey(0), spp=16,
                                     max_depth=2))
    assert np.isfinite(img).all() and img.max() > 0
    # the curve runs along image x: its lit top is a bright band, the
    # floor beneath it a dark shadow band, the far floor lit
    lit_curve = img[7:9, :, 0].mean()
    shadow = img[14:18, :, 0].mean()
    floor = img[24:30, :, 0].mean()
    assert shadow < 0.3 * floor, (shadow, floor)
    assert lit_curve > floor, (lit_curve, floor)
