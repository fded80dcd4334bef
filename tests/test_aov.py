"""AOV integrator tests: exact depth/normal/albedo oracles."""

import numpy as np
import jax.numpy as jnp

from tpusky.render.aov import render_aovs
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.transform import scale, translate


def test_aov_depth_normal_albedo():
    scene = make_scene(
        shapes=[dict(kind=1, to_world=scale(10), bsdf_idx=0),
                dict(kind=0, to_world=translate([0, 0, 1]), bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.8, 0.1, 0.1]])
    sensor = make_perspective(origin=[0, 0, 5], target=[1e-4, 0, 1],
                              fov_x_deg=30)
    aov = {k: np.array(v) for k, v in render_aovs(scene, sensor,
                                                  33, 33).items()}
    # centre ray hits the sphere top: depth = 5 - 2 = 3, normal +z
    c = 16
    assert abs(aov["depth"][c, c] - 3.0) < 1e-2, aov["depth"][c, c]
    assert aov["normal"][c, c, 2] > 0.99
    assert np.allclose(aov["albedo"][c, c], [0.8, 0.1, 0.1])
    assert aov["shape_idx"][c, c] == 1
    # corner rays hit the ground plane: albedo gray, shape 0
    assert aov["shape_idx"][0, 0] == 0
    assert np.allclose(aov["albedo"][0, 0], 0.4)
    assert abs(aov["normal"][0, 0, 2] - 1.0) < 1e-5


def test_profiling_utils():
    import jax
    from tpusky.utils.profiling import cost_analysis, time_fn

    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((128, 128))
    dt = time_fn(f, x, iters=3)
    assert dt > 0
    ca = cost_analysis(lambda x: x @ x, x)
    assert ca is None or "flops" in ca or isinstance(ca, dict)
