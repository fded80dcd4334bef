"""Scene-wide differentiable parameter surface (`SceneBundle.traverse`).

Reference parity: `mi.traverse` -> `SceneParameters`
(`src/python/python/util.py:13-331`) exposes every plugin's parameters by
reference-style string keys (e.g. `'plane.bsdf.reflectance.value'`), and
`params.update()` re-derives dependent state. Here the analogue is
`traverse()` returning a flat {key: leaf} dict and
`render(params=...)`/`build_scene(params=...)` applying it functionally —
everything differentiable, including shape `to_world` (with `to_object`
and `area` re-derived in-trace).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpusky.render.loader import load_dict


def _scene_dict(albedo=(0.4, 0.4, 0.4), sphere_x=0.0, mode="rgb"):
    return {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {
            "type": "perspective",
            "to_world": {"type": "look_at",
                         "origin": [0, -5, 1.2], "target": [0, 0, 1.0]},
            "fov": 40,
            "film": {"type": "hdrfilm", "width": 48, "height": 48},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "sky": {"type": "sunsky", "turbidity": 3.0, "albedo": 0.3,
                "sun_direction": [0.3, 0.2, 0.93], "sun_scale": 0.0},
        "plane": {"type": "rectangle",
                  "to_world": {"scale": [5, 5, 1]},
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": list(albedo)}}},
        "ball": {"type": "sphere",
                 "to_world": {"transforms": [
                     {"translate": [sphere_x, 0.0, 1.0]}]},
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.6, 0.2, 0.2]}}},
    }


def test_traverse_keys_and_roundtrip():
    """traverse() exposes emitter + shape + bsdf leaves with reference-style
    keys, and re-applying the unmodified dict reproduces the render."""
    bundle = load_dict(_scene_dict())
    params = bundle.traverse()
    for key in ("emitter.turbidity", "emitter.albedo",
                "plane.bsdf.reflectance.value", "plane.to_world",
                "ball.bsdf.reflectance.value", "ball.to_world",
                "ball.bsdf.alpha.value"):
        assert key in params, sorted(params)
    img0 = np.asarray(bundle.render(seed=1))
    img1 = np.asarray(bundle.render(seed=1, params=params))
    np.testing.assert_allclose(img1, img0, rtol=1e-5, atol=1e-7)


def test_traverse_albedo_update_matches_rebuild():
    """Setting plane albedo through traverse == loading the scene with
    that albedo (bitwise render equality up to float assembly)."""
    bundle = load_dict(_scene_dict(albedo=(0.4, 0.4, 0.4)))
    params = bundle.traverse()
    params["plane.bsdf.reflectance.value"] = jnp.asarray([0.8, 0.1, 0.3])
    img_upd = np.asarray(bundle.render(seed=2, params=params))
    bundle2 = load_dict(_scene_dict(albedo=(0.8, 0.1, 0.3)))
    img_ref = np.asarray(bundle2.render(seed=2))
    np.testing.assert_allclose(img_upd, img_ref, rtol=1e-5, atol=1e-7)


def test_recover_plane_albedo():
    """Inverse rendering of a BSDF albedo through the public bundle API
    (VERDICT r2 #3a): gradient descent on `plane.bsdf.reflectance.value`
    recovers the target albedo."""
    target_albedo = np.array([0.7, 0.35, 0.15], np.float32)
    bundle = load_dict(_scene_dict())
    p_target = bundle.traverse()
    p_target["plane.bsdf.reflectance.value"] = jnp.asarray(target_albedo)
    target = bundle.render(seed=0, params=p_target)

    base = bundle.traverse()

    @jax.jit
    def step(albedo):
        def loss_fn(a):
            p = dict(base)
            p["plane.bsdf.reflectance.value"] = a
            img = bundle.render(seed=0, params=p)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss_fn)(albedo)

    albedo = jnp.asarray([0.3, 0.3, 0.3])
    opt = optax.adam(0.05)
    state = opt.init(albedo)
    for _ in range(60):
        loss, g = step(albedo)
        upd, state = opt.update(g, state)
        albedo = optax.apply_updates(albedo, upd)
        albedo = jnp.clip(albedo, 0.0, 1.0)
    err = np.abs(np.asarray(albedo) - target_albedo).max()
    assert err < 0.03, (np.asarray(albedo), target_albedo, err)


@pytest.mark.slow
def test_recover_sphere_translation_with_boundary():
    """Inverse rendering of a shape pose through the public bundle API
    (VERDICT r2 #3b): interior grads (jax.grad through render(params=...))
    + projective boundary grads recover a sphere translation."""
    from tpusky.ad import projective as proj
    from tpusky.render.bsdf import table_kinds

    x_target = 0.35
    bundle = load_dict(_scene_dict(sphere_x=x_target))
    target = bundle.render(seed=0)

    bundle0 = load_dict(_scene_dict(sphere_x=0.0))
    base = bundle0.traverse()
    t2w0 = np.asarray(base["ball.to_world"])
    kinds = table_kinds(bundle0._scene_static.bsdfs)
    j_ball = bundle0.param_map["ball"]["shape"]
    npix = target.size

    @jax.jit
    def interior(x):
        def loss_fn(xx):
            t2w = jnp.asarray(t2w0).at[0, 3].add(xx)
            p = dict(base)
            p["ball.to_world"] = t2w
            img = bundle0.render(seed=0, params=p)
            return jnp.mean((img - target) ** 2), img
        (loss, img), g = jax.value_and_grad(loss_fn, has_aux=True)(x)
        return loss, g, img

    def full_grad(x, it):
        loss, g_int, img = interior(x)
        grad_img = 2.0 * (img - target) / npix
        scene = bundle0.build_scene(
            params={**base, "ball.to_world":
                    jnp.asarray(t2w0).at[0, 3].add(x)})
        d_t2w, _ = proj.boundary_grad(
            scene, bundle0.sensor, bundle0.film, grad_img,
            jax.random.PRNGKey(100 + it), n_samples=512, probe_spp=2,
            max_depth=2, kinds=kinds, shape_indices=[j_ball])
        return loss, g_int + d_t2w[j_ball, 0, 3]

    x = jnp.asarray(0.0)
    opt = optax.adam(0.05)
    state = opt.init(x)
    for it in range(25):
        loss, g = full_grad(x, it)
        upd, state = opt.update(g, state)
        x = optax.apply_updates(x, upd)
    err = abs(float(x) - x_target)
    assert err < 0.08, (float(x), x_target, err)
