"""Scene-dictionary loader tests (the `mi.load_dict` equivalent)."""

import numpy as np
import pytest
import jax

from tpusky.render.loader import load_dict, spectrum_to_channels
from tpusky.utils.transform import compose, look_at, rotate, scale, translate


def _sunsky_scene_dict(**emitter_overrides):
    emitter = {"type": "sunsky", "hour": 12.0, "turbidity": 4.0,
               "albedo": 0.3}
    emitter.update(emitter_overrides)
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": look_at([4, -4, 2], [0, 0, 1]),
            "film": {"type": "hdrfilm", "width": 32, "height": 32},
            "sampler": {"type": "independent", "sample_count": 8},
        },
        "emitter": emitter,
        "ground": {"type": "rectangle", "to_world": scale([10, 10, 1]),
                   "bsdf": {"type": "diffuse",
                            "reflectance": [0.4, 0.4, 0.4]}},
        "ball": {"type": "sphere", "to_world": translate([0, 0, 1]),
                 "bsdf": {"type": "twosided",
                          "nested": {"type": "diffuse",
                                     "reflectance": [0.6, 0.2, 0.2]}}},
    }


def test_load_and_render_sunsky_scene():
    bundle = load_dict(_sunsky_scene_dict())
    img = np.array(bundle.render(seed=0))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_parameter_update_rerenders():
    """SceneParameters-style updates: replace a leaf, re-render."""
    bundle = load_dict(_sunsky_scene_dict())
    img = np.array(bundle.render(seed=0))
    p2 = bundle.params._replace(turbidity=bundle.params.turbidity * 0 + 9.0)
    img2 = np.array(bundle.render(seed=0, env_params=p2))
    assert np.abs(img - img2).mean() > 1e-4


def test_area_emitter_scene():
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective",
                   "to_world": look_at([0, -3, 1], [0, 0, 0.5]),
                   "film": {"width": 16, "height": 16},
                   "sampler": {"sample_count": 64}},
        "light": {"type": "rectangle",
                  "to_world": compose(translate([0, 0, 3]),
                                      rotate([1, 0, 0], 180)),
                  "emitter": {"radiance": {"type": "rgb",
                                           "value": [5, 5, 5]}}},
        "floor": {"type": "rectangle", "to_world": scale(5),
                  "bsdf": {"type": "diffuse", "reflectance": 0.5}},
    })
    img = np.array(bundle.render(seed=1))
    assert img.max() > 0.01


def test_unknown_plugin_raises():
    with pytest.raises(ValueError, match="unknown plugin"):
        load_dict({"type": "scene", "x": {"type": "unobtanium"}})


def test_sunsky_validation():
    with pytest.raises(ValueError, match="turbidity"):
        load_dict({"type": "scene",
                   "emitter": {"type": "sunsky", "turbidity": 12}})
    with pytest.raises(ValueError, match="sun_direction or time"):
        load_dict({"type": "scene",
                   "emitter": {"type": "sunsky", "hour": 10,
                               "sun_direction": [0, 0, 1]}})


def test_spectrum_parsing():
    assert np.allclose(spectrum_to_channels(0.3, "rgb"), 0.3)
    assert spectrum_to_channels(0.3, "spectral").shape == (11,)
    irr = {"type": "irregular",
           "wavelengths": "320, 720", "values": "0.0, 1.0"}
    out = spectrum_to_channels(irr, "spectral")
    assert out[0] == 0.0 and abs(out[-1] - 1.0) < 1e-6
    assert abs(out[5] - 0.5) < 1e-6
    reg = {"type": "regular", "lambda_min": 320, "lambda_max": 720,
           "values": [1.0, 3.0]}
    out = spectrum_to_channels(reg, "spectral")
    assert abs(out[0] - 1.0) < 1e-6 and abs(out[-1] - 3.0) < 1e-6


def test_spectral_mode_loading():
    bundle = load_dict(_sunsky_scene_dict(), mode="spectral")
    img = np.array(bundle.render(seed=0))
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    assert img.max() > 0


def test_shapegroup_instance_expansion():
    """Instances expand into transformed copies of the group's shapes
    (reference `shapegroup.cpp`/`instance.cpp`)."""
    import numpy as np
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, -8, 0],
                                "target": [0, 0, 0], "up": [0, 0, 1]},
                   "film": {"height": 16, "width": 16},
                   "sampler": {"sample_count": 4}},
        "env": {"type": "constant", "radiance": 1.0},
        "pair": {"type": "shapegroup",
                 "a": {"type": "sphere",
                       "bsdf": {"type": "diffuse", "reflectance": 0.5}},
                 "b": {"type": "cube",
                       "to_world": {"transforms": [
                           {"scale": 0.5}, {"translate": [2, 0, 0]}]},
                       "bsdf": {"type": "diffuse", "reflectance": 0.5}}},
        "i1": {"type": "instance", "group": "pair"},
        "i2": {"type": "instance", "group": "pair",
               "to_world": {"transforms": [{"translate": [-4, 0, 0]}]}},
    })
    # 2 instances x 2 shapes = 4 shapes in the table
    assert len(bundle._scene_static.shapes.kind) == 4
    img = np.asarray(bundle.render(seed=0))
    assert np.isfinite(img).all() and img.max() > 0


def test_variant_config_object():
    """The single Variant config object (SURVEY.md variant system;
    VERDICT r3 'config system' partial): parses Mitsuba variant names,
    exposes the derived channel counts, and routes load_dict."""
    import jax.numpy as jnp
    from tpusky.config import Variant, resolve

    v = Variant.from_name("llvm_ad_spectral_polarized")
    assert v.mode == "spectral" and v.polarized and v.dtype == jnp.float32
    assert v.n_channels == 11 and v.n_hero == 4
    assert "spectral" in v.name and "polarized" in v.name

    assert resolve("rgb") == Variant()
    assert resolve("cuda_ad_rgb_double").dtype == jnp.float64
    assert resolve(v) is v

    import pytest as _pt
    with _pt.raises(ValueError):
        Variant(mode="cmyk")
    with _pt.raises(ValueError):
        Variant.from_name("llvm_ad")          # no color mode
    with _pt.raises(RuntimeError):
        Variant(dtype=jnp.float64).require_x64()

    # variant-name routing through the public loader: polarized variant
    # upgrades the default path integrator to stokes transport
    import numpy as np
    import tpusky as ts
    d = {"type": "scene",
         "light": {"type": "constant",
                   "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
         "shape": {"type": "rectangle",
                   "to_world": np.diag([5.0, 5.0, 1.0, 1.0]),
                   "bsdf": {"type": "diffuse"}},
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": {"type": "lookat",
                                 "origin": [0, -3, 1], "target": [0, 0, 0],
                                 "up": [0, 0, 1]},
                    "film": {"type": "hdrfilm", "width": 8, "height": 8}}}
    b = ts.load_dict(d, mode="llvm_ad_rgb_polarized")
    assert b.integrator == "stokes"
    b2 = ts.load_dict(d, mode="llvm_ad_rgb")
    assert b2.integrator == "path"


def test_sampling_weight_loader_key():
    """`sampling_weight` on delta emitters populates the scene's emitter
    selection distribution (`scene.cpp:100-119`)."""
    import numpy as np
    from tpusky.render.loader import load_dict
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "film": {"width": 8, "height": 8},
                   "sampler": {"sample_count": 4}},
        "floor": {"type": "rectangle"},
    }
    for i in range(4):
        d[f"l{i}"] = {"type": "point", "position": [i, 0, 2],
                      "intensity": 1.0, "sampling_weight": float(i + 1)}
    d["ldir"] = {"type": "directional", "direction": [0, 0, -1],
                 "irradiance": 0.5}
    b = load_dict(d)
    w = np.asarray(b._scene_static.delta_light_weights)
    np.testing.assert_allclose(w, [1.0, 2.0, 3.0, 4.0, 1.0])
    img = b.render(seed=0)
    assert np.isfinite(np.asarray(img)).all()
