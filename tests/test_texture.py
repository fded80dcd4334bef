"""Texture system tests (reference `src/textures/{checkerboard,bitmap}.cpp`
behavior: checker rule, bilinear bitmap lookup, wrap modes, to_uv,
spectral upsampling)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpusky.render.texture import (eval_texture, make_texture_table)


def test_checkerboard_rule():
    # default: frac(uv) > 0.5 per axis; equal -> color0 (0.4), else color1
    tex = make_texture_table([dict(kind="checkerboard",
                                   color0=[1.0, 0.0, 0.0],
                                   color1=[0.0, 1.0, 0.0])])
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75],
                      [0.75, 0.75]])
    val, has = eval_texture(tex, jnp.zeros((4,), jnp.int32), uv)
    assert bool(has.all())
    np.testing.assert_allclose(val[0], [1, 0, 0], atol=1e-6)  # both <= .5
    np.testing.assert_allclose(val[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(val[2], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(val[3], [1, 0, 0], atol=1e-6)  # both > .5


def test_checkerboard_to_uv_scale():
    # scaling uv by 2 doubles the checker frequency
    to_uv = np.diag([2.0, 2.0, 1.0])
    tex = make_texture_table([dict(kind="checkerboard", color0=[1, 1, 1],
                                   color1=[0, 0, 0], to_uv=to_uv)])
    uv = jnp.asarray([[0.2, 0.2], [0.45, 0.2]])   # -> (0.4,0.4), (0.9,0.4)
    val, _ = eval_texture(tex, jnp.zeros((2,), jnp.int32), uv)
    np.testing.assert_allclose(val[0], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(val[1], [0, 0, 0], atol=1e-6)


def test_bitmap_nearest_center():
    # sampling exactly at texel centers returns the texel value
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3) / 12.0
    tex = make_texture_table([dict(kind="bitmap", data=img)])
    # texel centers of a 2x2 image: (0.25, 0.25) etc (v down = row index)
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75],
                      [0.75, 0.75]])
    val, _ = eval_texture(tex, jnp.zeros((4,), jnp.int32), uv)
    np.testing.assert_allclose(np.asarray(val), img.reshape(4, 3), atol=1e-6)


def test_bitmap_bilinear_midpoint():
    img = np.zeros((1, 2, 3), np.float32)
    img[0, 1] = 1.0
    tex = make_texture_table([dict(kind="bitmap", data=img, wrap="clamp")])
    val, _ = eval_texture(tex, jnp.zeros((1,), jnp.int32),
                          jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(val)[0], [0.5, 0.5, 0.5],
                               atol=1e-6)


def test_bitmap_wrap_modes():
    img = np.stack([np.zeros((1, 2), np.float32),
                    np.ones((1, 2), np.float32)], -1)
    img = np.concatenate([img, np.zeros((1, 2, 1), np.float32)], -1)
    img[0, 0] = [1, 0, 0]
    img[0, 1] = [0, 1, 0]
    mk = lambda wrap: make_texture_table(
        [dict(kind="bitmap", data=img, wrap=wrap)])
    u_out = jnp.asarray([[1.25, 0.5]])   # past the right edge
    v_rep, _ = eval_texture(mk("repeat"), jnp.zeros((1,), jnp.int32), u_out)
    v_clp, _ = eval_texture(mk("clamp"), jnp.zeros((1,), jnp.int32), u_out)
    # repeat: u=1.25 == u=0.25 -> texel 0; clamp: stays at right -> texel 1
    np.testing.assert_allclose(np.asarray(v_rep)[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_clp)[0], [0, 1, 0], atol=1e-6)


def test_multiple_textures_atlas_offsets():
    img_a = np.full((2, 2, 3), 0.25, np.float32)
    img_b = np.full((4, 4, 3), 0.75, np.float32)
    tex = make_texture_table([dict(kind="bitmap", data=img_a),
                              dict(kind="bitmap", data=img_b)])
    uv = jnp.full((2, 2), 0.5)
    val, _ = eval_texture(tex, jnp.asarray([0, 1], jnp.int32), uv)
    np.testing.assert_allclose(np.asarray(val)[0], [0.25] * 3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(val)[1], [0.75] * 3, atol=1e-6)


def test_negative_index_has_flag():
    tex = make_texture_table([dict(kind="checkerboard")])
    _, has = eval_texture(tex, jnp.asarray([-1, 0], jnp.int32),
                          jnp.zeros((2, 2)))
    assert not bool(has[0]) and bool(has[1])


def test_spectral_bitmap_sigmoid_roundtrip():
    # gray texel: spectrum should be flat at the gray level
    img = np.full((1, 1, 3), 0.5, np.float32)
    tex = make_texture_table([dict(kind="bitmap", data=img)], spectral=True)
    wl = jnp.asarray([[450.0, 550.0, 600.0, 700.0]])
    val, _ = eval_texture(tex, jnp.zeros((1,), jnp.int32),
                          jnp.asarray([[0.5, 0.5]]), wavelengths=wl)
    np.testing.assert_allclose(np.asarray(val)[0], 0.5, atol=0.02)


def test_spectral_checkerboard():
    tex = make_texture_table([dict(kind="checkerboard", color0=[0.8] * 3,
                                   color1=[0.1] * 3)])
    wl = jnp.asarray([[450.0, 550.0, 600.0, 700.0]])
    val, _ = eval_texture(tex, jnp.zeros((1,), jnp.int32),
                          jnp.asarray([[0.25, 0.25]]), wavelengths=wl)
    np.testing.assert_allclose(np.asarray(val)[0], 0.8, atol=0.05)


def test_render_with_checkerboard():
    """End-to-end: checkerboard floor under a constant env shows contrast
    between neighbouring checker cells."""
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": {"type": "look_at", "origin": [0, 0, 3],
                         "target": [0, 0, 0], "up": [0, 1, 0]},
            "film": {"height": 32, "width": 32},
            "sampler": {"sample_count": 16},
        },
        "env": {"type": "constant", "radiance": 1.0},
        "floor": {
            "type": "rectangle",
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "checkerboard",
                                     "color0": [0.9, 0.9, 0.9],
                                     "color1": [0.05, 0.05, 0.05]}},
        },
    })
    img = np.asarray(bundle.render(seed=0))
    # quadrants of the unit rectangle land in different checker cells
    q_tl = img[4:12, 4:12].mean()
    q_tr = img[4:12, 20:28].mean()
    assert abs(q_tl - q_tr) > 0.1, (q_tl, q_tr)
    # and the bright cells reflect much more than the dark ones
    assert max(q_tl, q_tr) > 3 * min(q_tl, q_tr)


def test_render_with_bitmap_png(tmp_path):
    from tpusky.utils.io import write_png
    from tpusky.render.loader import load_dict
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4:] = 1.0   # right half white
    path = str(tmp_path / "tex.png")
    write_png(path, img)
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": {"type": "look_at", "origin": [0, 0, 3],
                         "target": [0, 0, 0], "up": [0, 1, 0]},
            "film": {"height": 32, "width": 32},
            "sampler": {"sample_count": 16},
        },
        "env": {"type": "constant", "radiance": 1.0},
        "floor": {
            "type": "rectangle",
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "bitmap", "filename": path,
                                     "raw": True}},
        },
    })
    out = np.asarray(bundle.render(seed=0))
    # one horizontal half maps to the white texels, the other to black
    # (which half depends on the camera frame's handedness)
    left = out[12:20, 4:12].mean()
    right = out[12:20, 20:28].mean()
    assert max(left, right) > 3 * min(left, right), (left, right)
    assert max(left, right) > 0.5


def test_normalmap_changes_shading():
    """A normal map tilting the floor normals changes the direct lighting
    from an off-axis directional light (reference `normalmap.cpp`)."""
    from tpusky.render.loader import load_dict

    def render(nmap_bsdf):
        bundle = load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                    "target": [0, 0, 0], "up": [0, 1, 0]},
                       "film": {"height": 16, "width": 16},
                       "sampler": {"sample_count": 32}},
            "sun": {"type": "directional", "direction": [1, 0, -1],
                    "irradiance": 3.0},
            "floor": {"type": "rectangle", "bsdf": nmap_bsdf},
        })
        return np.asarray(bundle.render(seed=0)).mean()

    flat = render({"type": "diffuse", "reflectance": 0.5})
    # light travels along (1,0,-1), i.e. comes FROM (-1,0,1): tilt every
    # normal 45 degrees toward -x so it faces the light head-on
    tilt = np.zeros((2, 2, 3), np.float32)
    tilt[..., 0] = 0.5 - 0.5 * np.sqrt(0.5)
    tilt[..., 1] = 0.5
    tilt[..., 2] = 0.5 + 0.5 * np.sqrt(0.5)
    tilted = render({"type": "normalmap",
                     "normalmap": {"type": "bitmap", "data": tilt},
                     "bsdf": {"type": "diffuse", "reflectance": 0.5}})
    # flat sees the light at 45 deg (cos .707); tilted head-on (cos 1)
    assert tilted > flat * 1.3, (flat, tilted)


def test_bumpmap_changes_shading():
    """A height ramp produces tilted normals and changes shading vs flat
    (reference `bumpmap.cpp`)."""
    from tpusky.render.loader import load_dict

    ramp = np.tile(np.linspace(0.0, 1.0, 16,
                               dtype=np.float32)[None, :, None], (16, 1, 1))

    def render(bsdf):
        bundle = load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                    "target": [0, 0, 0], "up": [0, 1, 0]},
                       "film": {"height": 16, "width": 16},
                       "sampler": {"sample_count": 32}},
            "sun": {"type": "directional", "direction": [1, 0, -1],
                    "irradiance": 3.0},
            "floor": {"type": "rectangle", "bsdf": bsdf},
        })
        return np.asarray(bundle.render(seed=0)).mean()

    flat = render({"type": "diffuse", "reflectance": 0.5})
    bumped = render({"type": "bumpmap", "scale": 0.05,
                     "texture": {"type": "bitmap", "data": ramp},
                     "bsdf": {"type": "diffuse", "reflectance": 0.5}})
    assert abs(bumped - flat) > 0.02 * flat, (flat, bumped)
