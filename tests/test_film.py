"""Film / reconstruction-filter tests (reference `src/rfilters/`,
`imageblock.cpp:174-418` separable splatting semantics)."""

import numpy as np
import jax.numpy as jnp

from tpusky.render.film import Film, develop, splat


def _uniform_field(rfilter, h=16, w=16, spp=8, value=2.0):
    """Uniform-radiance samples jittered in each pixel; any normalized
    filter must reproduce the constant away from the border."""
    rng = np.random.default_rng(0)
    n = h * w * spp
    px = np.repeat(np.arange(w), h * spp)
    py = np.tile(np.repeat(np.arange(h), spp), w)
    uv = jnp.asarray(np.stack([px + rng.random(n), py + rng.random(n)], -1),
                     jnp.float32)
    vals = jnp.full((n, 3), value)
    return np.asarray(develop(splat(Film(h, w, 3, rfilter), uv, vals)))


def test_all_filters_preserve_constant():
    for rf in ("box", "gaussian", "tent", "mitchell", "catmullrom",
               "lanczos"):
        img = _uniform_field(rf)
        interior = img[4:-4, 4:-4]
        assert np.allclose(interior, 2.0, atol=0.02), (rf, interior.mean())


def test_separable_filter_weights():
    """A single sample at a pixel center splats with weight w(dx)*w(dy):
    the diagonal neighbour weight equals the product of the axis ones."""
    film = Film(5, 5, 1, "gaussian")
    uv = jnp.asarray([[2.5, 2.5]])
    acc = np.asarray(splat(film, uv, jnp.ones((1, 1))))
    wgt = acc[..., -1]
    # center (2,2); axis neighbour (2,3) at dx=1; diagonal (3,3)
    assert wgt[2, 2] > 0
    ratio_axis = wgt[2, 3] / wgt[2, 2]
    np.testing.assert_allclose(wgt[3, 3] / wgt[2, 2], ratio_axis ** 2,
                               rtol=1e-5)


def test_lanczos_negative_lobes():
    """Lanczos has negative side lobes (|r| in (1,2)) — the reason the
    reference ships it for sharp downsampling."""
    film = Film(7, 7, 1, "lanczos")
    uv = jnp.asarray([[3.5, 3.5]])
    acc = np.asarray(splat(film, uv, jnp.ones((1, 1))))
    wgt = acc[..., -1]
    assert wgt[3, 3] > 0
    assert wgt[3, 2] < 0 or wgt[3, 4] < 0   # first side lobe is negative


def test_specfilm_band_render():
    """Specfilm path: a uniform-spectrum environment produces equal band
    values matching the radiance, and band channels sum consistently
    (reference `specfilm.cpp` semantics)."""
    import jax
    from tpusky.render.loader import load_dict
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"type": "specfilm", "height": 8, "width": 8,
                            "n_bands": 4, "lambda_min": 360,
                            "lambda_max": 720},
                   "sampler": {"sample_count": 64}},
        "env": {"type": "constant", "radiance": 2.0},
    }, mode="spectral")
    img = np.asarray(bundle.render(seed=0))
    assert img.shape == (8, 8, 4)
    # constant env: every band's mean spectral radiance = 2.0
    np.testing.assert_allclose(img.mean(axis=(0, 1)), 2.0, rtol=0.15)
