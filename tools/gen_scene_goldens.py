"""Generate stored full-scene golden renders for the Z-test regression.

Reference parity: `src/render/tests/test_renders.py` keeps per-scene
reference mean + variance images (from the `moment` integrator) and
Z-tests every fresh render against them at alpha=0.01 with Šidák
correction (`test_renders.py:159-224`). This script renders the committed
scene set once at high spp with the moment integrator and stores
mean + per-sample variance (+ the exact scene/spp metadata) in
`tests/golden/scene_goldens.npz`, consumed by
`tests/test_render_regression.py`.

    python tools/gen_scene_goldens.py    # regenerates the golden file
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

# set BEFORE any backend query — jax.default_backend() would initialise
# the axon TPU backend first and the cpu override would then be ignored
# (goldens must match the CPU test suite bit-for-bit at the boundary
# pixels where TPU f32 rounding flips grazing intersections)
try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

import numpy as np
import jax.numpy as jnp

import tpusky as ts
from tpusky.models.sunsky import model as M
from tpusky.models.sunsky.tables import load_tables
from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film, develop
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective

SPP_REF = 4096
SIZE = 48


def _sunsky_env(turbidity=3.0, sun_scale=1.0):
    return M.precompute(
        load_tables("rgb"),
        ts.make_params(turbidity=turbidity, albedo=0.3,
                       sun_direction=[0.3, 0.2, 0.93],
                       sun_scale=sun_scale), "rgb")


def scene_sunsky_sphere():
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]],
        env=_sunsky_env())
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    return scene, sensor, 2


def scene_sunsky_sky_only():
    """Sky dome only (no sun disc): smooth radiance field."""
    scene = make_scene(shapes=[], env=_sunsky_env(turbidity=6.0,
                                                  sun_scale=0.0))
    sensor = make_perspective([0, 0, 1.0], [1, 0, 1.4], fov_x_deg=60)
    return scene, sensor, 2


def scene_constant_cube_gi():
    """Cube on a plane under constant light, depth 4 (indirect bounces)."""
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    cube = np.diag([0.6, 0.6, 0.6, 1.0]).astype(np.float32)
    cube[2, 3] = 0.6
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=3, to_world=cube, bsdf_idx=1)],
        bsdf_albedos=[[0.6, 0.6, 0.6], [0.7, 0.3, 0.2]],
        env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective([3, -3, 2.0], [0, 0, 0.6], fov_x_deg=45)
    return scene, sensor, 4


def scene_area_light():
    """Diffuse plane lit by an area-emitter rectangle (NEE + MIS path)."""
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    panel = np.diag([0.8, 0.8, 1.0, 1.0]).astype(np.float32)
    panel[2, 3] = 2.0
    panel[:3, :3] = panel[:3, :3] @ np.diag([1.0, -1.0, -1.0])  # face down
    rad = np.zeros((2, 3), np.float32)
    rad[1] = [8.0, 7.0, 6.0]
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=1, to_world=panel, bsdf_idx=1, emitter_idx=0)],
        bsdf_albedos=[[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]],
        area_radiance=rad, env=None)
    sensor = make_perspective([3, -3, 1.5], [0, 0, 0.5], fov_x_deg=45)
    return scene, sensor, 2


def scene_mesh_gi():
    """Triangle-mesh icosphere on a plane under sunsky, depth 3 (mesh
    intersection + indirect bounce; covers the tiled Moller-Trumbore and
    the ray-reorder path on TPU)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from bench_mesh import icosphere
    pos, idx = icosphere(2)              # 320 tris
    t2w = np.eye(4, dtype=np.float32)
    t2w[2, 3] = 1.0
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
        bsdf_albedos=[[0.5, 0.5, 0.5], [0.3, 0.5, 0.7]],
        meshes=[dict(positions=pos, indices=idx, normals=pos.copy(),
                     to_world=t2w, bsdf_idx=1)],
        env=_sunsky_env())
    sensor = make_perspective([3.5, -3.5, 2.0], [0, 0, 1.0], fov_x_deg=45)
    return scene, sensor, 3


def scene_rough_conductor():
    """Rough-conductor ground under sunsky, depth 4 (microfacet sampling
    + MIS against the sun disc — the glossy-highlight stress case)."""
    from tpusky.render.bsdf import DIFFUSE, ROUGH_CONDUCTOR
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.8, 0.8, 0.8], [0.9, 0.7, 0.4]],
        bsdf_kinds=[ROUGH_CONDUCTOR, DIFFUSE],
        bsdf_alphas=[0.15, 0.0],
        env=_sunsky_env())
    sensor = make_perspective([4, -4, 2.0], [0, 0, 0.6], fov_x_deg=45)
    return scene, sensor, 4


def scene_medium_sphere():
    """Sphere-bounded homogeneous HG medium under constant light, depth 6
    (free-flight sampling, medium NEE, phase sampling)."""
    from tpusky.render.medium import make_medium
    t2w = np.eye(4, dtype=np.float32)
    t2w[2, 3] = 1.2
    med = make_medium([0.8, 1.2, 1.6], [0.7, 0.7, 0.7], g=0.3,
                      to_world=t2w, kind="sphere")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
        bsdf_albedos=[[0.4, 0.4, 0.4]],
        env=ConstantEnv(jnp.asarray([1.0, 0.9, 0.8])), medium=med)
    sensor = make_perspective([3.5, -3.5, 1.6], [0, 0, 1.2], fov_x_deg=45)
    return scene, sensor, 6


def scene_spectral_plane():
    """Spectral-mode sunsky render (4 hero wavelengths -> sRGB develop),
    depth 2 — gates the spectral transport + the fused spectral Pallas
    kernels on TPU."""
    env = M.precompute(
        load_tables("spectral"),
        ts.make_params(turbidity=4.0, albedo=0.3,
                       sun_direction=[0.3, 0.2, 0.93], mode="spectral"),
        "spectral")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]],
        env=env)
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    return scene, sensor, 2, "spectral"


def scene_dielectric_sphere():
    """Smooth dielectric sphere over a diffuse plane with an area panel,
    depth 6 (delta transmission/reflection chains + NEE through glass)."""
    from tpusky.render.bsdf import DIELECTRIC, DIFFUSE
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.diag([0.7, 0.7, 0.7, 1.0]).astype(np.float32)
    sphere[2, 3] = 0.9
    panel = np.diag([1.2, 1.2, 1.0, 1.0]).astype(np.float32)
    panel[2, 3] = 3.0
    panel[:3, :3] = panel[:3, :3] @ np.diag([1.0, -1.0, -1.0])
    rad = np.zeros((3, 3), np.float32)
    rad[2] = [10.0, 9.0, 8.0]
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1),
                dict(kind=1, to_world=panel, bsdf_idx=2, emitter_idx=0)],
        bsdf_albedos=[[0.5, 0.5, 0.5], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]],
        bsdf_kinds=[DIFFUSE, DIELECTRIC, DIFFUSE],
        bsdf_iors=[1.0, 1.5, 1.0],
        area_radiance=rad, env=None)
    sensor = make_perspective([3.2, -3.2, 1.6], [0, 0, 0.9], fov_x_deg=45)
    return scene, sensor, 6


def scene_envmap_lit():
    """Bitmap environment emitter (Bilinear2D importance warp) lighting a
    sphere, depth 2 — gates envmap eval/sample/pdf consistency."""
    from tpusky.render.emitters import make_envmap
    hh, ww = 16, 32
    ys = np.linspace(0, 1, hh)[:, None]
    xs = np.linspace(0, 1, ww)[None, :]
    bmp = np.stack([0.2 + 2.0 * ys * np.ones_like(xs),
                    0.3 + 1.0 * np.sin(np.pi * xs) * np.ones_like(ys),
                    0.8 - 0.5 * ys * np.ones_like(xs)], -1).astype(np.float32)
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.5, 0.5, 0.5], [0.7, 0.5, 0.3]],
        env=make_envmap(bmp))
    sensor = make_perspective([3.5, -3.5, 2.0], [0, 0, 1.0], fov_x_deg=45)
    return scene, sensor, 2


SCENES = {
    "sunsky_sphere": scene_sunsky_sphere,
    "sky_only": scene_sunsky_sky_only,
    "constant_cube_gi": scene_constant_cube_gi,
    "area_light": scene_area_light,
    "mesh_gi": scene_mesh_gi,
    "rough_conductor": scene_rough_conductor,
    "medium_sphere": scene_medium_sphere,
    "spectral_plane": scene_spectral_plane,
    "dielectric_sphere": scene_dielectric_sphere,
    "envmap_lit": scene_envmap_lit,
}


def build(name):
    """(scene, sensor, depth, mode) — builders may omit the mode."""
    out = SCENES[name]()
    return out if len(out) == 4 else out + ("rgb",)


def main():
    out = {}
    film = Film(SIZE, SIZE, 3)
    for name in SCENES:
        scene, sensor, depth, mode = build(name)
        mean, m2 = integrator.render_moments(
            scene, sensor, film, jax.random.PRNGKey(7), spp=SPP_REF,
            max_depth=depth, mode=mode)
        mean = np.asarray(mean, np.float64)
        var = np.asarray(m2, np.float64) - mean ** 2
        out[f"{name}_mean"] = mean.astype(np.float32)
        out[f"{name}_var"] = np.maximum(var, 0.0).astype(np.float32)
        out[f"{name}_depth"] = np.int32(depth)
        print(f"{name}: mean range [{mean.min():.4g}, {mean.max():.4g}]")
    out["spp_ref"] = np.int32(SPP_REF)
    out["size"] = np.int32(SIZE)
    path = os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                        "golden", "scene_goldens.npz")
    np.savez_compressed(path, **out)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
