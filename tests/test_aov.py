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


def test_aov_spec_and_nested_child_integrator():
    """Reference `aov.cpp` semantics: the `aovs` spec string selects named
    channels (uv / prim_index / sh_normal join the set, :111-147) and a
    NESTED sampling integrator's image is emitted alongside (:126-137)."""
    import numpy as np
    from tpusky.render.loader import load_dict
    from tpusky.utils.transform import look_at, scale

    b = load_dict({
        "type": "scene",
        "integrator": {"type": "aov",
                       "aovs": "dd.y:depth,nn:sh_normal,uvs:uv,"
                               "pi:prim_index",
                       "img": {"type": "path", "max_depth": 2}},
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": look_at([0, -4, 1.5], [0, 0, 0.8]),
                   "film": {"width": 16, "height": 12},
                   "sampler": {"sample_count": 4}},
        "emitter": {"type": "sunsky", "turbidity": 3.0,
                    "sun_direction": [0.3, 0.2, 0.93]},
        "floor": {"type": "rectangle", "to_world": scale(8)},
    })
    out = b.render(seed=0)
    assert set(out.keys()) == {"dd.y", "nn", "uvs", "pi", "path"}
    assert out["dd.y"].shape == (12, 16)
    assert out["nn"].shape == (12, 16, 3)
    assert out["uvs"].shape == (12, 16, 2)
    assert out["pi"].shape == (12, 16)
    assert out["path"].shape == (12, 16, 3)
    assert np.isfinite(np.asarray(out["path"])).all()
    # floor pixels: shading normal +z, prim -1 (analytic shape)
    nn = np.asarray(out["nn"])
    hit = np.asarray(out["dd.y"]) > 0
    assert hit.any()
    assert np.allclose(np.abs(nn[hit][:, 2]), 1.0, atol=1e-5)
    assert (np.asarray(out["pi"])[hit] == -1).all()


def test_aov_mesh_channels():
    """uv / prim_index / geo vs sh normal on a triangle mesh."""
    import numpy as np
    from tpusky.render import aov as aov_mod
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective

    pos = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                     np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    scene = make_scene(shapes=[], bsdf_albedos=[[0.5, 0.5, 0.5]],
                       meshes=[dict(positions=pos, indices=idx, uvs=uvs,
                                    bsdf_idx=0)], env=None)
    sensor = make_perspective([0, 0, 3], [0, 0.01, 0], fov_x_deg=40)
    out = aov_mod.render_aovs(scene, sensor, 8, 8)
    hit = np.asarray(out["depth"]) > 0
    assert hit.any()
    pi = np.asarray(out["prim_index"])[hit]
    assert set(pi.tolist()) <= {0, 1}
    uv = np.asarray(out["uv"])[hit]
    assert (uv >= 0).all() and (uv <= 1).all() and uv.std() > 0.01
    gn = np.asarray(out["geo_normal"])[hit]
    assert np.allclose(np.abs(gn[:, 2]), 1.0, atol=1e-5)
