"""Cylinder shape tests (reference `src/shapes/cylinder.cpp`: canonical
unit-radius open cylinder with z in [0, 1]; p0/p1/radius loader props)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render.shapes import (CYLINDER, make_shape_table, ray_intersect,
                                  sample_position)


def test_cylinder_intersection():
    tab = make_shape_table([dict(kind=CYLINDER, to_world=np.eye(4))])
    o = jnp.asarray([[3.0, 0.0, 0.5], [3.0, 0.0, 2.0], [0.0, 0.0, -1.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    t, p, n, uv, idx, valid = ray_intersect(tab, o, d)
    assert abs(float(t[0]) - 2.0) < 1e-5
    assert not bool(valid[1])      # passes above the z in [0,1] extent
    assert not bool(valid[2])      # along the axis: open-ended, no caps
    np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-5)
    assert abs(float(uv[0, 1]) - 0.5) < 1e-5


def test_cylinder_inside_hit():
    tab = make_shape_table([dict(kind=CYLINDER, to_world=np.eye(4))])
    t, _, n, _, _, valid = ray_intersect(tab, jnp.asarray([[0.0, 0.0, 0.5]]),
                                         jnp.asarray([[0.0, 1.0, 0.0]]))
    assert bool(valid[0]) and abs(float(t[0]) - 1.0) < 1e-5


def test_cylinder_sample_position():
    tab = make_shape_table([dict(kind=CYLINDER, to_world=np.eye(4))])
    u = jax.random.uniform(jax.random.PRNGKey(0), (256, 2))
    ps, ns, inv_a = sample_position(tab, jnp.zeros((256,), jnp.int32), u)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ns), axis=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps)[:, :2], np.asarray(ns)[:, :2],
                               atol=1e-5)
    assert abs(float(inv_a[0]) - 1.0 / (2 * np.pi)) < 1e-5


def test_cylinder_loader_p0_p1_radius():
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": {"type": "look_at", "origin": [0, -5, 0.0],
                         "target": [0, 0, 0], "up": [0, 0, 1]},
            "film": {"height": 24, "width": 24},
            "sampler": {"sample_count": 8},
        },
        "env": {"type": "constant", "radiance": 1.0},
        "cyl": {"type": "cylinder", "p0": [-1, 0, 0], "p1": [1, 0, 0],
                "radius": 0.5,
                "bsdf": {"type": "diffuse", "reflectance": 0.8}},
    })
    img = np.asarray(bundle.render(seed=0))
    # a horizontal cylinder should occupy the middle rows, not the corners
    assert img[10:14, 8:16].mean() != img[0:2, 0:2].mean()
    assert np.isfinite(img).all()
