"""Statistical render regression against stored golden renders.

Reference parity: `src/render/tests/test_renders.py:159-224` — every
scene has a committed reference mean + per-sample variance image
(generated once at high spp by the moment integrator,
`tools/gen_scene_goldens.py`); each fresh render is Z-tested per pixel at
alpha=0.01 with Šidák correction. A bias anywhere in the pipeline
(sampling, MIS weights, film normalisation, RNG reuse) fails the test
even though the fresh render uses a different seed.
"""

import os

import numpy as np
import pytest
import jax

from tpusky.render import integrator
from tpusky.render.film import Film
from tpusky.utils.ztest import z_test

SPP = 64


@pytest.fixture(scope="module")
def goldens():
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "scene_goldens.npz")
    if not os.path.exists(path):
        pytest.skip("scene_goldens.npz not generated")
    with np.load(path) as z:
        return dict(z)


@pytest.mark.parametrize("name", ["sunsky_sphere", "sky_only",
                                  "constant_cube_gi", "area_light"])
def test_render_regression(name, goldens):
    from tools.gen_scene_goldens import SCENES
    scene, sensor, depth = SCENES[name]()
    size = int(goldens["size"])
    film = Film(size, size, 3)
    img = np.asarray(integrator.render(scene, sensor, film,
                                       jax.random.PRNGKey(1234), spp=SPP,
                                       max_depth=depth))
    ok, n_failed, min_p, alpha = z_test(
        img, SPP, goldens[f"{name}_mean"], goldens[f"{name}_var"])
    assert ok, (f"{name}: {n_failed} pixels failed the Z-test "
                f"(min p={min_p:.3g}, alpha_corr={alpha:.3g})")
