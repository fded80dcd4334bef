"""RGB->spectrum upsampling (reference: ``src/render/srgb.cpp:14-38``,
``ext/rgb2spec`` — Jakob & Hanika 2019 sigmoid-polynomial model)."""

import numpy as np

from tpusky.models.sunsky import constants as skyC
from tpusky.ops.rgb2spec import rgb_of_spectrum, upsample_rgb


FINE = np.arange(360.0, 831.0, 5.0)


def test_round_trip_in_gamut():
    rng = np.random.default_rng(0)
    rgbs = rng.uniform(0.02, 0.98, (64, 3))
    spec = upsample_rgb(rgbs, FINE)
    back = np.stack([rgb_of_spectrum(s, FINE) for s in spec])
    np.testing.assert_allclose(back, rgbs, atol=5e-4)


def test_gray_is_flat():
    spec = upsample_rgb(np.array([[0.5, 0.5, 0.5]]), FINE)[0]
    assert np.ptp(spec) < 1e-3
    np.testing.assert_allclose(spec, 0.5, atol=1e-3)


def test_bounded_reflectance():
    rng = np.random.default_rng(1)
    rgbs = rng.uniform(0.0, 1.0, (32, 3))
    spec = upsample_rgb(rgbs, FINE)
    assert spec.min() >= 0.0 and spec.max() <= 1.0 + 1e-6


def test_unbounded_scale():
    # emitter-style rgb > 1: chroma fitted at rgb/max, rescaled
    spec = upsample_rgb(np.array([[4.0, 1.0, 0.4]]), FINE)[0]
    back = rgb_of_spectrum(spec, FINE)
    np.testing.assert_allclose(back, [4.0, 1.0, 0.4], rtol=1e-3)


def test_smoothness():
    # the whole point vs. flat/spiky spectra: bounded second differences
    spec = upsample_rgb(np.array([[0.8, 0.3, 0.1]]), FINE)[0]
    d2 = np.diff(spec, 2)
    assert np.abs(d2).max() < 0.01


def test_loader_uses_upsampling():
    from tpusky.render.loader import spectrum_to_channels
    spec = spectrum_to_channels({"type": "rgb", "value": [0.7, 0.2, 0.1]},
                                "spectral")
    assert spec.shape == (len(skyC.WAVELENGTHS),)
    # red-ish: long wavelengths must dominate short ones (not flat mean)
    assert spec[-1] > 2.0 * spec[2]
    back = rgb_of_spectrum(np.interp(FINE, skyC.WAVELENGTHS, spec), FINE)
    assert back[0] > 0.6 and back[1] < 0.3
