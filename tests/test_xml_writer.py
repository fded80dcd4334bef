"""XML writer roundtrip tests (reference `src/python/python/xml.py`
dict_to_xml / `mitsuba -u` save-back): dict -> XML -> xml_to_dict ->
load_dict must reproduce the original render bitwise."""

import numpy as np
import pytest
import jax

from tpusky.render.loader import load_dict
from tpusky.render.xml_loader import load_file, xml_to_dict
from tpusky.render.xml_writer import dict_to_xml, write_xml
from tpusky.utils.transform import look_at, scale


def _scene_dict():
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": np.asarray(look_at([0, -5, 2], [0, 0, 1])),
                   "film": {"type": "hdrfilm", "width": 16, "height": 12},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "emitter": {"type": "sunsky", "turbidity": 4.0, "albedo": 0.25,
                    "sun_direction": [0.3, 0.2, 0.93]},
        "floor": {"type": "rectangle", "to_world": np.asarray(scale(10)),
                  "bsdf": {"type": "diffuse",
                           "reflectance": [0.5, 0.4, 0.3]}},
        "ball": {"type": "sphere",
                 "bsdf": {"type": "roughconductor", "alpha": 0.2,
                          "material": "Au"}},
    }


def test_xml_roundtrip_bitwise_render(tmp_path):
    d = _scene_dict()
    ref = np.array(load_dict(d).render(seed=1))
    p = tmp_path / "scene.xml"
    write_xml(str(p), d)
    b2 = load_file(str(p))
    img2 = np.array(b2.render(seed=1))
    np.testing.assert_array_equal(ref, img2)


def test_xml_roundtrip_structure():
    d = _scene_dict()
    back = xml_to_dict(dict_to_xml(d))
    assert back["integrator"]["type"] == "path"
    assert back["integrator"]["max_depth"] == 3
    assert back["sensor"]["film"]["width"] == 16
    assert back["emitter"]["turbidity"] == pytest.approx(4.0)
    from tpusky.render.loader import _parse_to_world
    np.testing.assert_allclose(_parse_to_world(back["floor"]["to_world"]),
                               np.asarray(scale(10)), atol=1e-6)
    # rgb triples come back in the loader's {"type": "rgb"} form
    refl = back["floor"]["bsdf"]["reflectance"]
    vals = refl["value"] if isinstance(refl, dict) else refl
    np.testing.assert_allclose(vals, [0.5, 0.4, 0.3])


def test_xml_roundtrip_medium(tmp_path):
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 8},
        "sensor": {"type": "perspective", "fov": 60.0,
                   "to_world": np.asarray(look_at([0, -6, 1], [0, 0, 1])),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "emitter": {"type": "constant", "radiance": 1.0},
        "fog": {"type": "sphere", "to_world": np.asarray(scale(2)),
                "interior": {"type": "homogeneous", "sigma_t": 0.5,
                             "albedo": 0.8,
                             "phase": {"type": "hg", "g": 0.3}}},
    }
    ref = np.array(load_dict(d).render(seed=0))
    p = tmp_path / "fog.xml"
    write_xml(str(p), d)
    b2 = load_file(str(p))
    assert b2._scene_static.medium is not None
    assert float(b2._scene_static.medium.g) == pytest.approx(0.3)
    np.testing.assert_array_equal(ref, np.array(b2.render(seed=0)))
