"""Statistical render-regression harness tests (reference
`test_renders.py:159-224` Z-test + Šidák semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.transform import scale
from tpusky.utils.ztest import render_regression, z_test


def test_z_test_accepts_unbiased_noise():
    rng = np.random.default_rng(0)
    ref = np.full((16, 16, 3), 2.0)
    var = np.full((16, 16, 3), 0.25)
    spp = 64
    mean = ref + rng.normal(0, np.sqrt(0.25 / spp), ref.shape)
    ok, n_failed, min_p, a = z_test(mean, spp, ref, var)
    assert ok, (n_failed, min_p, a)


def test_z_test_rejects_bias():
    ref = np.full((16, 16, 3), 2.0)
    var = np.full((16, 16, 3), 0.25)
    spp = 64
    mean = ref * 1.2          # 20% bias, ~3.2 sigma everywhere
    ok, n_failed, _, _ = z_test(mean, spp, ref, var)
    assert not ok and n_failed > 100


def _scene():
    """Sphere on a bright plane: the sphere's lower half is lit mostly by
    light bounced off the plane, so max_depth visibly changes the image."""
    import numpy as np
    t_sphere = np.eye(4, dtype=np.float32)
    t_sphere[2, 3] = 1.0
    scene = make_scene(shapes=[dict(kind=1, to_world=scale(50), bsdf_idx=0),
                               dict(kind=0, to_world=t_sphere, bsdf_idx=1)],
                       bsdf_albedos=[[0.9, 0.9, 0.9], [0.7, 0.7, 0.7]],
                       env=ConstantEnv(jnp.asarray([1.0, 1.0, 1.0])))
    sensor = make_perspective(origin=[0, -4, 1.2], target=[0, 0, 1.0],
                              fov_x_deg=35)
    return scene, sensor, Film(8, 8, 3)


def test_render_regression_self_consistent():
    """Independent seeds of the same estimator pass the Z-test."""
    scene, sensor, film = _scene()

    def render_fn(seed, spp):
        return integrator.render(scene, sensor, film,
                                 jax.random.PRNGKey(seed), spp=spp,
                                 max_depth=3)

    def moments_fn(seed, spp):
        return integrator.render_moments(scene, sensor, film,
                                         jax.random.PRNGKey(seed), spp=spp,
                                         max_depth=3)

    ok, n_failed, min_p, a = render_regression(render_fn, moments_fn,
                                               spp_candidate=128,
                                               spp_reference=512)
    assert ok, (n_failed, min_p, a)


def test_render_regression_detects_wrong_depth():
    """A depth-2 render against a depth-3 reference is biased (missing
    one bounce of indirect light) and must be rejected."""
    scene, sensor, film = _scene()

    def render_fn(seed, spp):
        return integrator.render(scene, sensor, film,
                                 jax.random.PRNGKey(seed), spp=spp,
                                 max_depth=2)

    def moments_fn(seed, spp):
        return integrator.render_moments(scene, sensor, film,
                                         jax.random.PRNGKey(seed), spp=spp,
                                         max_depth=3)

    ok, n_failed, _, _ = render_regression(render_fn, moments_fn,
                                           spp_candidate=256,
                                           spp_reference=512)
    assert not ok and n_failed > 0
