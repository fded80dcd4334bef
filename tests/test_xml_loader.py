"""Mitsuba-XML scene loading (reference: ``src/core/xml.cpp`` grammar,
dict equivalence with ``src/core/python/xml_v.cpp:116``)."""

import os

import numpy as np
import pytest

from tpusky.render.xml_loader import load_file, xml_to_dict

SCENE_XML = """
<scene version="3.0.0">
    <default name="spp" value="4"/>
    <default name="turb" value="3.0"/>
    <integrator type="path">
        <integer name="max_depth" value="4"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="to_world">
            <lookat origin="0, -5, 2" target="0, 0, 1" up="0, 0, 1"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="32"/>
            <integer name="height" value="24"/>
        </film>
        <sampler type="independent">
            <integer name="sample_count" value="$spp"/>
        </sampler>
    </sensor>
    <emitter type="sunsky">
        <float name="turbidity" value="$turb"/>
        <float name="hour" value="12.0"/>
    </emitter>
    <bsdf type="twosided" id="gray">
        <bsdf type="diffuse">
            <rgb name="reflectance" value="0.4, 0.4, 0.4"/>
        </bsdf>
    </bsdf>
    <shape type="rectangle" id="floor">
        <transform name="to_world">
            <scale value="8"/>
            <rotate x="1" angle="0"/>
            <translate z="0"/>
        </transform>
        <ref id="gray"/>
    </shape>
    <shape type="sphere">
        <point name="center" x="0" y="0" z="1"/>
        <float name="radius" value="1.0"/>
        <bsdf type="roughconductor">
            <string name="material" value="Au"/>
            <float name="alpha" value="0.2"/>
        </bsdf>
    </shape>
</scene>
"""


def test_xml_to_dict_structure():
    d = xml_to_dict(SCENE_XML)
    assert d["type"] == "scene"
    assert d["integrator"]["max_depth"] == 4
    assert d["sensor"]["film"]["width"] == 32
    assert d["sensor"]["sampler"]["sample_count"] == 4      # $spp default
    assert d["emitter"]["turbidity"] == 3.0                 # $turb default
    # ref resolution: floor's bsdf is the shared twosided diffuse
    assert d["floor"]["bsdf"]["type"] == "twosided"
    assert d["floor"]["bsdf"]["bsdf"]["reflectance"]["value"] == [.4, .4, .4]
    # transform chain order preserved
    ops = [list(s)[0] for s in d["floor"]["to_world"]["transforms"]]
    assert ops == ["scale", "rotate", "translate"]
    assert d["shape"]["bsdf"]["material"] == "Au"


def test_parameter_override():
    d = xml_to_dict(SCENE_XML, parameters={"spp": 16, "turb": 7.5})
    assert d["sensor"]["sampler"]["sample_count"] == 16
    assert d["emitter"]["turbidity"] == 7.5


def test_unresolved_parameter_raises():
    bad = '<scene><integrator type="path">' \
          '<integer name="max_depth" value="$nope"/></integrator></scene>'
    with pytest.raises(ValueError, match="unresolved"):
        xml_to_dict(bad)


def test_load_file_renders(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(SCENE_XML)
    bundle = load_file(str(p))
    img = np.asarray(bundle.render(seed=0))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01      # sky is visible


def test_spectrum_pairs_and_include(tmp_path):
    inc = tmp_path / "common.xml"
    inc.write_text("""
<scene version="3.0.0">
    <emitter type="constant">
        <spectrum name="radiance" value="400:0.2, 500:0.8, 600:0.4"/>
    </emitter>
</scene>""")
    main = tmp_path / "main.xml"
    main.write_text("""
<scene version="3.0.0">
    <include filename="common.xml"/>
    <integrator type="direct"/>
</scene>""")
    d = xml_to_dict(str(main))
    assert d["emitter"]["radiance"]["type"] == "irregular"
    assert d["emitter"]["radiance"]["wavelengths"] == [400.0, 500.0, 600.0]
    assert d["integrator"]["type"] == "direct"


def test_reference_showcase_scene(tmp_path):
    """The fork's own demo scene (`sunsky-testing/res/scene/dragon/
    Shader_Dragon.xml`, y-up, top-level sampler, emitter to_world
    rotation) loads and renders through the XML path. The Dragon.obj
    itself is not shipped; the bundled Icosphere stands in."""
    import shutil
    src = "/root/reference/sunsky-testing/res/scene/dragon"
    if not os.path.isdir(src):
        pytest.skip("reference checkout not available")
    shutil.copytree(src + "/meshes", str(tmp_path / "meshes"))
    xml = open(src + "/Shader_Dragon.xml").read()
    xml = xml.replace("Dragon.obj", "Icosphere.obj")
    xml = xml.replace('value="20.0"', 'value="15.0"')   # sun above horizon
    (tmp_path / "scene.xml").write_text(xml)
    b = load_file(str(tmp_path / "scene.xml"))
    assert b.film.width == 1920 and b.film.height == 1080
    assert b.sampler_kind == "independent"
    # emitter to_world: x-rotation by -90 deg (y-up scene)
    rot = np.asarray(b._scene_static.env_to_world)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(rot[:, 2], [0.0, 1.0, 0.0], atol=1e-6)
    import dataclasses
    small = dataclasses.replace(b, film=type(b.film)(27, 48, 3))
    img = np.asarray(small.render(seed=0, spp=2))
    assert np.isfinite(img).all() and float(img.mean()) > 0.01


def test_showcase_scene_night_is_dark(tmp_path):
    """At hour=20 (the scene's own setting) the sun is below the horizon
    and the sunsky emitter goes black, like the reference's eta in
    [0, pi/2] masking (`sunsky.h:230`)."""
    import shutil
    src = "/root/reference/sunsky-testing/res/scene/dragon"
    if not os.path.isdir(src):
        pytest.skip("reference checkout not available")
    shutil.copytree(src + "/meshes", str(tmp_path / "meshes"))
    xml = open(src + "/Shader_Dragon.xml").read()
    xml = xml.replace("Dragon.obj", "Icosphere.obj")
    (tmp_path / "scene.xml").write_text(xml)
    import dataclasses
    b = load_file(str(tmp_path / "scene.xml"))
    small = dataclasses.replace(b, film=type(b.film)(18, 32, 3))
    img = np.asarray(small.render(seed=0, spp=2))
    assert float(np.abs(img).max()) == 0.0
