"""Volume (3D) and mesh_attribute textures (reference
`src/textures/volume.cpp`, `src/textures/mesh_attribute.cpp`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpusky.render import loader
from tpusky.render.texture import (MESH_ATTR, VOLUME, eval_texture,
                                   make_texture_table,
                                   table_texture_kinds)
from tpusky.utils.meshio import read_ply


def test_volume_texture_trilinear():
    """Inline 2x2x2 grid: corner/ center lookups hit the exact values."""
    grid = np.zeros((2, 2, 2, 3), np.float32)
    grid[0, 0, 0] = [1.0, 0.0, 0.0]
    grid[1, 1, 1] = [0.0, 0.0, 1.0]
    tex = make_texture_table([dict(kind="volume", grid=grid)])
    idx = jnp.zeros((3,), jnp.int32)
    uv = jnp.zeros((3, 2))
    p = jnp.array([[0.25, 0.25, 0.25],     # texel (0,0,0) center
                   [0.75, 0.75, 0.75],     # texel (1,1,1) center
                   [0.5, 0.5, 0.5]])       # center: mean of all 8
    val, has = eval_texture(tex, idx, uv, p=p, tkinds=(VOLUME,))
    assert bool(has.all())
    np.testing.assert_allclose(val[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(val[1], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(val[2], grid.mean((0, 1, 2)), atol=1e-6)


def test_volume_texture_to_world():
    """A to_world transform relocates the unit cube."""
    grid = np.ones((1, 1, 1, 3), np.float32) * 0.7
    t2w = np.eye(4, dtype=np.float32)
    t2w[:3, 3] = [10.0, 0.0, 0.0]
    tex = make_texture_table([dict(kind="volume", grid=grid,
                                   to_world=t2w)])
    val, _ = eval_texture(tex, jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 2)),
                          p=jnp.array([[10.5, 0.5, 0.5]]),
                          tkinds=(VOLUME,))
    np.testing.assert_allclose(val[0], 0.7, atol=1e-6)


def test_mesh_attribute_passthrough_scale():
    tex = make_texture_table([dict(kind="mesh_attribute", scale=2.0)])
    attr = jnp.array([[0.1, 0.2, 0.3]])
    val, _ = eval_texture(tex, jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 2)), attr=attr,
                          tkinds=(MESH_ATTR,))
    np.testing.assert_allclose(val[0], [0.2, 0.4, 0.6], atol=1e-6)
    assert table_texture_kinds(tex) == (MESH_ATTR,)


def _write_colored_ply(path):
    """Unit quad in the xy-plane with red/green/blue/white corners."""
    txt = (
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "-1 -1 0 255 0 0\n1 -1 0 0 255 0\n1 1 0 0 0 255\n-1 1 0 255 255 255\n"
        "3 0 1 2\n3 0 2 3\n")
    path.write_text(txt)


def test_ply_vertex_colors(tmp_path):
    p = tmp_path / "quad.ply"
    _write_colored_ply(p)
    pos, nrm, idx, uv, col = read_ply(str(p))
    assert col is not None
    np.testing.assert_allclose(col[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(col[3], [1, 1, 1], atol=1e-6)


def test_mesh_attribute_render_end_to_end(tmp_path):
    """Colored-PLY quad lit by a constant env, diffuse reflectance bound
    to the vertex_color attribute: pixel colors track the interpolated
    vertex colors."""
    p = tmp_path / "quad.ply"
    _write_colored_ply(p)
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {"type": "orthographic",
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"type": "hdrfilm", "width": 8, "height": 8}},
        "quad": {"type": "ply", "filename": str(p),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "mesh_attribute",
                                          "name": "vertex_color"}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1, 1, 1]}},
    })
    img = np.asarray(b.render(seed=0, spp=64))
    assert np.isfinite(img).all() and img.max() > 0
    # the red corner's quadrant must be red-dominated, the green corner's
    # green-dominated (orthographic view preserves orientation up to the
    # film's row order; compare quadrant means per channel)
    h, w, _ = img.shape
    quads = [img[:h // 2, :w // 2].mean((0, 1)),
             img[:h // 2, w // 2:].mean((0, 1)),
             img[h // 2:, :w // 2].mean((0, 1)),
             img[h // 2:, w // 2:].mean((0, 1))]
    dominant = {tuple(np.argsort(q)[::-1][:1]) for q in quads}
    # among the 4 quadrants, some is red-led and some is green-led
    assert (0,) in dominant and (1,) in dominant


def test_volume_texture_render_end_to_end():
    """Rectangle textured by a 3D grid that is red for x<0 and blue for
    x>0 in texture space."""
    grid = np.zeros((1, 1, 2, 3), np.float32)
    grid[0, 0, 0] = [1, 0, 0]
    grid[0, 0, 1] = [0, 0, 1]
    t2w = np.eye(4, dtype=np.float32)
    t2w[:3, :3] = np.diag([4.0, 4.0, 4.0])
    t2w[:3, 3] = [-2.0, -2.0, -2.0]      # world [-2,2]^3 -> unit cube
    b = loader.load_dict({
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {"type": "orthographic",
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"type": "hdrfilm", "width": 8, "height": 8}},
        "quad": {"type": "rectangle",
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "volume",
                                          "grid": grid,
                                          "to_world": t2w}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1, 1, 1]}},
    })
    img = np.asarray(b.render(seed=0, spp=32))
    left = img[:, :3].mean((0, 1))
    right = img[:, 5:].mean((0, 1))
    sides = {tuple(np.argsort(s)[::-1][:1]) for s in (left, right)}
    assert (0,) in sides and (2,) in sides     # one red side, one blue
    assert float(img[..., 1].max()) < 0.05     # green stays dark
