"""Scene: a pytree bundling geometry, materials and emitters.

The TPU-native replacement for the reference's plugin-tree Scene
(`src/render/scene.cpp`) and `mi.traverse` parameter dictionary
(`src/python/python/util.py:13-331`): the scene IS a pytree, so
"traverse" is `jax.tree_util`, differentiable parameters are just leaves,
and a parameter update is a new pytree (XLA re-traces precompute
automatically — the analogue of `parameters_changed`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from .bsdf import MaterialTable, make_material_table
from .shapes import ShapeTable, make_shape_table


class Scene(NamedTuple):
    shapes: ShapeTable
    bsdfs: MaterialTable
    env: Any                       # SunskyState | ConstantEnv | None
    env_to_world: jnp.ndarray      # (3, 3) env-emitter local->world rotation
    area_radiance: jnp.ndarray     # (n_shapes, C) emitted radiance (0 = none)
    bsphere_center: jnp.ndarray    # (3,)
    bsphere_radius: jnp.ndarray    # ()
    area_emitter_shapes: jnp.ndarray = None  # (n_area,) int32 shape indices
    point_lights: jnp.ndarray = None         # (Np, 6) [position, intensity]
    directional_lights: jnp.ndarray = None   # (Nd, 6) [direction, irradiance]
    mesh: Any = None                         # MeshTable | None
    spot_lights: tuple = ()                  # tuple of emitters.SpotLight
    dir_area_radiance: jnp.ndarray = None    # (n_shapes, C) directionalarea
                                             # radiance (delta in direction;
                                             # only the ptracer sees these,
                                             # cf. `directionalarea.cpp`)
    textures: Any = None                     # texture.TextureTable | None
    medium: Any = None                       # medium.Medium | None
                                             # (homogeneous, convex region;
                                             # see render/medium.py, H19)
    sdf: Any = None                          # sdf.SDFGrid | None (H20)
    curve: Any = None                        # curve.CurveTable | None (H20)
    delta_light_weights: jnp.ndarray = None  # (Np+Nd+Nspot,) per-emitter
                                             # sampling_weight (scene.cpp:
                                             # 100-119); None = uniform


def scene_occluded(scene: "Scene", o, d, maxt):
    """Shadow-ray predicate over every geometry kind in the scene
    (analytic shapes + triangle meshes + SDF grid + curves). The single
    place new geometry kinds hook into every NEE/shadow query."""
    from .shapes import ray_test
    occ = ray_test(scene.shapes, o, d, maxt)
    if scene.mesh is not None:
        from .mesh import mesh_test
        occ = occ | mesh_test(scene.mesh, o, d, maxt)
    if scene.sdf is not None:
        from .sdf import sdf_test
        occ = occ | sdf_test(scene.sdf, o, d, maxt)
    if scene.curve is not None:
        from .curve import curve_test
        occ = occ | curve_test(scene.curve, o, d, maxt)
    return occ


def make_scene(shapes=(), bsdf_albedos=((0.5, 0.5, 0.5),), env=None,
               env_to_world=None, area_radiance=None, n_channels=3,
               bsdf_twosided=None, bsdf_spectral_albedos=None,
               point_lights=None, directional_lights=None, bsdf_kinds=None,
               bsdf_alphas=None, bsdf_etas=None, bsdf_ks=None,
               bsdf_iors=None, meshes=None, spot_lights=(),
               dir_area_radiance=None, bsdf_opacities=None,
               bsdf_tex_indices=None, textures=None,
               spectral_textures=False, bsdf_extras=None,
               bsdf_normal_tex_indices=None, medium=None,
               sdf=None, bsdf_blend_children=None,
               bsdf_blend_weights=None, curves=None,
               measured=None, measured_pol=None,
               delta_light_weights=None) -> Scene:
    """Assemble a scene from host-side descriptions.

    shapes: list of dicts accepted by `make_shape_table`. The scene
    bounding sphere is estimated from shape transforms (for env-emitter
    ray origins, cf. reference `sunsky.cpp:287-301`).
    """
    if len(shapes) == 0:
        # placeholder never-hit shape keeps the table non-empty/static.
        # NaN-safety matters: a near-zero scale would make the inverse
        # transform ~1e12 and the miss-lane intersection outputs inf/NaN,
        # which leak into gradients through `where` product rules — so use
        # a unit sphere far outside any practical scene instead.
        ph = np.eye(4)
        ph[:3, 3] = 3e4
        shapes = [dict(kind=0, to_world=ph, bsdf_idx=0, emitter_idx=-1)]
    table = make_shape_table(shapes)
    bsdfs = make_material_table(
        kinds=bsdf_kinds, albedos=np.asarray(bsdf_albedos, np.float32),
        twosided=bsdf_twosided, spectral_albedos=bsdf_spectral_albedos,
        alphas=bsdf_alphas, etas=bsdf_etas, ks=bsdf_ks, iors=bsdf_iors,
        opacities=bsdf_opacities, tex_indices=bsdf_tex_indices,
        extras=bsdf_extras, normal_tex_indices=bsdf_normal_tex_indices,
        blend_children=bsdf_blend_children, blend_weights=bsdf_blend_weights,
        measured=measured, measured_pol=measured_pol)
    tex_table = None
    if textures:
        from .texture import make_texture_table
        tex_table = make_texture_table(textures, spectral=spectral_textures)
    if area_radiance is None:
        area_radiance = np.zeros((len(shapes), n_channels), np.float32)
    if env_to_world is None:
        env_to_world = np.eye(3, dtype=np.float32)

    # bounding sphere from shape origins + linear-part norms
    t2w = np.asarray(table.to_world)
    centers = t2w[:, :3, 3]
    scales = np.linalg.norm(t2w[:, :3, :3], axis=(1, 2))
    center = centers.mean(axis=0) if len(centers) else np.zeros(3)
    radius = float(np.max(np.linalg.norm(centers - center, axis=-1) + scales,
                          initial=1e-4))
    area_ids = np.asarray([i for i, s in enumerate(shapes)
                           if s.get("emitter_idx", -1) >= 0], np.int32)
    pl = (np.zeros((0, 6), np.float32) if point_lights is None
          else np.asarray(point_lights, np.float32).reshape(-1, 6))
    dl = (np.zeros((0, 6), np.float32) if directional_lights is None
          else np.asarray(directional_lights, np.float32).reshape(-1, 6))
    mesh_table = None
    if meshes:
        from .mesh import make_mesh_table
        mesh_table = make_mesh_table(meshes)
    if dir_area_radiance is None:
        dir_area_radiance = np.zeros((len(shapes), n_channels), np.float32)
    curve_table = None
    if curves:
        from .curve import make_curve_table
        curve_table = make_curve_table(curves)
    dlw = (None if delta_light_weights is None
           else jnp.asarray(delta_light_weights, jnp.float32))
    return Scene(table, bsdfs, env, jnp.asarray(env_to_world, jnp.float32),
                 jnp.asarray(area_radiance, jnp.float32),
                 jnp.asarray(center, jnp.float32),
                 jnp.asarray(radius * (1.0 + 1e-3), jnp.float32),
                 jnp.asarray(area_ids), jnp.asarray(pl), jnp.asarray(dl),
                 mesh_table, tuple(spot_lights),
                 jnp.asarray(dir_area_radiance, jnp.float32), tex_table,
                 medium, sdf, curve_table, dlw)
