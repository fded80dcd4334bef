"""SDF grid shape tests (reference `src/shapes/sdfgrid.cpp`).

Oracle: a sphere baked onto the grid must intersect/shade like the
analytic sphere shape; gradients flow to the grid values through the
implicit-function-theorem Newton step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusky.render.sdf import (make_sdf_grid, sdf_eval, sdf_intersect,
                               sdf_test, sphere_sdf_grid)


def _unit_rays(n, seed=0, origin=(0.5, 0.5, -2.0)):
    rng = np.random.default_rng(seed)
    o = np.tile(np.asarray(origin, np.float32), (n, 1))
    tgt = np.concatenate([rng.uniform(0.3, 0.7, (n, 2)),
                          np.full((n, 1), 0.5)], axis=1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_sdf_sphere_matches_analytic():
    """Sphere-traced grid sphere hits within O(grid resolution) of the
    closed-form sphere intersection."""
    sdf = make_sdf_grid(sphere_sdf_grid(64, radius=0.35))
    o, d = _unit_rays(512)
    t, n, hit = sdf_intersect(sdf, o, d)
    # analytic oracle: sphere center (.5,.5,.5) radius .35
    oc = np.asarray(o) - np.asarray([0.5, 0.5, 0.5])
    b = 2 * np.sum(oc * np.asarray(d), axis=1)
    c = np.sum(oc * oc, axis=1) - 0.35 ** 2
    disc = b * b - 4 * c
    hit_ref = disc > 0
    t_ref = (-b - np.sqrt(np.maximum(disc, 0))) / 2
    assert (np.array(hit) == hit_ref).mean() > 0.98
    both = np.array(hit) & hit_ref
    assert np.abs(np.array(t)[both] - t_ref[both]).max() < 0.01
    # normals point outward along (p - center)
    p = np.array(o) + np.array(t)[:, None] * np.array(d)
    n_ref = p - np.asarray([0.5, 0.5, 0.5])
    n_ref /= np.linalg.norm(n_ref, axis=1, keepdims=True)
    cos = np.sum(np.array(n) * n_ref, axis=1)[both]
    assert cos.min() > 0.995, cos.min()


def test_sdf_miss_and_occlusion():
    sdf = make_sdf_grid(sphere_sdf_grid(32, radius=0.3))
    o = jnp.asarray([[0.5, 0.5, -1.0], [2.5, 2.5, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, n, hit = sdf_intersect(sdf, o, d)
    assert bool(hit[0]) and not bool(hit[1])
    occ = sdf_test(sdf, o, d, jnp.asarray([10.0, 10.0]))
    assert bool(occ[0]) and not bool(occ[1])
    # behind the hit -> not occluded within a short maxt
    occ2 = sdf_test(sdf, o, d, jnp.asarray([0.5, 0.5]))
    assert not bool(occ2[0])


def test_sdf_gradient_flows_to_grid_values():
    """d(t_hit)/d(values): adding a constant to the SDF values SHRINKS the
    zero isosurface, so the hit recedes — IFT rate dt/dc = +1/|<g,d>|
    (= +1 for a head-on unit-gradient SDF)."""
    base = sphere_sdf_grid(48, radius=0.3)
    o = jnp.asarray([[0.5, 0.5, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])

    def t_of(c):
        sdf = make_sdf_grid(base)
        sdf = sdf._replace(values=sdf.values + c)
        t, _, _ = sdf_intersect(sdf, o, d)
        return t[0]

    g = float(jax.grad(t_of)(jnp.float32(0.0)))
    eps = 1e-3
    fd = (float(t_of(jnp.float32(eps))) - float(t_of(jnp.float32(-eps)))) \
        / (2 * eps)
    assert np.isclose(g, fd, rtol=2e-2), (g, fd)
    assert np.isclose(g, 1.0, atol=0.05), g


def test_sdf_in_scene_render():
    """End-to-end: an sdfgrid sphere under a sunsky through load_dict
    renders ~like the analytic sphere scene."""
    from tpusky.render.loader import load_dict
    from tpusky.utils.transform import look_at, scale, translate

    def scene(shape_block):
        return {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": look_at([0, -4, 1.6], [0, 0, 0.7]),
                       "film": {"width": 48, "height": 32},
                       "sampler": {"type": "independent",
                                   "sample_count": 48}},
            "emitter": {"type": "sunsky", "turbidity": 3.0,
                        "sun_direction": [0.3, 0.2, 0.93]},
            "floor": {"type": "rectangle", "to_world": scale(10),
                      "bsdf": {"type": "diffuse",
                               "reflectance": [0.4, 0.4, 0.4]}},
            "obj": shape_block,
        }

    # sdf unit cube spans [0,1]^3; sphere center .5 radius .35 ->
    # world: scale 2, translate (-1,-1,0) => center (0,0,1), radius .7
    t2w = np.asarray(translate([-1, -1, 0]) @ scale(2), np.float32)
    d_sdf = scene({"type": "sdfgrid", "grid": sphere_sdf_grid(48, 0.35),
                   "to_world": t2w,
                   "bsdf": {"type": "diffuse",
                            "reflectance": [0.6, 0.2, 0.2]}})
    sph = np.diag([0.7, 0.7, 0.7, 1.0]).astype(np.float32)
    sph[2, 3] = 1.0
    d_ref = scene({"type": "sphere", "to_world": sph,
                   "bsdf": {"type": "diffuse",
                            "reflectance": [0.6, 0.2, 0.2]}})
    img_sdf = np.array(load_dict(d_sdf).render(seed=0))
    img_ref = np.array(load_dict(d_ref).render(seed=0))
    assert np.isfinite(img_sdf).all()
    err = np.abs(img_sdf - img_ref).mean() / max(img_ref.mean(), 1e-9)
    assert err < 0.05, err


def test_vol_roundtrip(tmp_path):
    from tpusky.utils.io import read_vol, write_vol
    data = sphere_sdf_grid(16)
    p = str(tmp_path / "g.vol")
    write_vol(p, data)
    back, bmin, bmax = read_vol(p)
    np.testing.assert_array_equal(back[..., 0], data)
    np.testing.assert_allclose(bmin, [0, 0, 0])
