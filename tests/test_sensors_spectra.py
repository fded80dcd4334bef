"""Thinlens depth-of-field and extra spectrum plugin tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.loader import load_dict, spectrum_to_channels
from tpusky.render.scene import make_scene
from tpusky.utils.transform import look_at, scale, translate


def test_thinlens_depth_of_field():
    """Focus on the far wall: the out-of-focus sphere silhouette blurs
    with a wide aperture but stays sharp for a pinhole."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "thinlens",
                   "to_world": look_at([0, -5, 1], [0, 0, 1]),
                   "fov": 30, "aperture_radius": 0.3, "focus_distance": 19.0,
                   "film": {"width": 48, "height": 48},
                   "sampler": {"sample_count": 64}},
        "env": {"type": "constant", "radiance": 1.0},
        "ball": {"type": "sphere", "to_world": translate([0, 0, 1]),
                 "bsdf": {"type": "diffuse", "reflectance": 0.1}},
        "wall": {"type": "rectangle",
                 "to_world": translate([0, 14, 0]) @ np.diag(
                     [20.0, 1.0, 20.0, 1.0]).astype(np.float32)
                 @ np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                             [0, 0, 0, 1]], np.float32),
                 "bsdf": {"type": "diffuse", "reflectance": 0.9}},
    }
    img_wide = np.array(load_dict(d).render(seed=0))
    d["sensor"]["aperture_radius"] = 1e-4
    img_pin = np.array(load_dict(d).render(seed=0))

    def peak_gradient(img):
        # max horizontal step: a hard silhouette has a ~full-range jump,
        # defocus spreads it over several pixels (total variation alone is
        # blur-invariant for a monotone edge, so use the peak)
        return np.abs(np.diff(img.mean(-1), axis=1)).max()

    assert peak_gradient(img_wide) < 0.6 * peak_gradient(img_pin), (
        peak_gradient(img_wide), peak_gradient(img_pin))


def test_blackbody_and_d65_spectra():
    bb = spectrum_to_channels({"type": "blackbody", "temperature": 5778},
                              "spectral")
    assert bb.shape == (11,) and np.all(bb > 0)
    # Wien: 5778K peaks near 500nm -> channel 4-5 of the 320..720 grid
    assert 3 <= int(np.argmax(bb)) <= 6
    d65 = spectrum_to_channels({"type": "d65"}, "spectral")
    assert d65.shape == (11,) and np.all(d65 >= 0) and d65.max() > 0
