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


# ---------------------------------------------------------------------------
# Film crop window (`hdrfilm.cpp:46,137`; reference AD crop config
# `test_ad_integrators.py:249-275` renders a 32x32 crop at offset (32,20))
# ---------------------------------------------------------------------------


def _crop_scene():
    import numpy as np
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render.scene import make_scene
    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    env = M.precompute(tables, params, "rgb")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    return make_scene(shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
                      bsdf_albedos=[[0.4, 0.4, 0.4]],
                      env=None)._replace(env=env)


def test_crop_window_matches_full_render_bitwise():
    """A crop render equals the same window of the full render BITWISE
    (RNG keyed on full-film pixel ids — `hdrfilm.cpp:137` semantics)."""
    import jax
    import numpy as np
    from tpusky.render import integrator
    from tpusky.render.bsdf import table_kinds
    from tpusky.render.film import Film
    from tpusky.render.sensors import make_perspective

    scene = _crop_scene()
    sensor = make_perspective([4, -4, 2.0], [0, 0, 0.5], fov_x_deg=45)
    kinds = table_kinds(scene.bsdfs)
    key = jax.random.PRNGKey(7)
    full = Film(48, 64, 3)
    crop = Film(48, 64, 3, crop_offset=(24, 12), crop_size=(24, 16))
    img_full = np.asarray(integrator._render_impl(
        scene, sensor, full, key, 4, 2, 1000, "rgb", kinds=kinds))
    img_crop = np.asarray(integrator._render_impl(
        scene, sensor, crop, key, 4, 2, 1000, "rgb", kinds=kinds))
    assert img_crop.shape == (16, 24, 4)
    np.testing.assert_array_equal(img_crop, img_full[12:28, 24:48])


def test_crop_window_loader_and_grad():
    """Loader crop keys parse; gradients flow through a crop render (the
    reference's crop AD config exercises exactly this)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpusky.render.loader import load_dict
    from tpusky.utils.transform import look_at, scale

    b = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": look_at([0, -4, 1.5], [0, 0, 0.8]),
                   "film": {"width": 32, "height": 24,
                            "crop_offset_x": 8, "crop_offset_y": 6,
                            "crop_width": 16, "crop_height": 12},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "emitter": {"type": "sunsky", "turbidity": 4.0, "albedo": 0.3,
                    "sun_direction": [0.3, 0.2, 0.93]},
        "floor": {"type": "rectangle", "to_world": scale(8)},
    })
    assert b.film.crop_size == (16, 12)
    img = b.render(seed=1)
    assert img.shape == (12, 16, 3)

    def loss(t):
        p = b.params._replace(turbidity=t) if hasattr(b.params, "_replace") \
            else {**b.params, "turbidity": t}
        return jnp.mean(b.render(seed=1, env_params=p) ** 2)

    g = jax.grad(loss)(jnp.float32(4.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_specfilm_named_srf_channels():
    """Per-channel sensor response functions (`specfilm.cpp` named nested
    spectra, the reference's `spectral_render_test.py:178-227` pattern):
    a constant-spectrum environment yields channel_j = integral of
    srf_j * L; narrow bands therefore estimate L * band width."""
    import numpy as np
    from tpusky.render.loader import load_dict
    film = {"type": "specfilm", "height": 8, "width": 8}
    centers = [420.0, 520.0, 620.0]
    for i, c in enumerate(centers):
        film[f"band_{i:02d}"] = {"type": "regular",
                                 "wavelength_min": c - 10.0,
                                 "wavelength_max": c + 10.0,
                                 "values": [1.0, 1.0]}
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": film,
                   "sampler": {"sample_count": 128}},
        "env": {"type": "constant", "radiance": 2.0},
    }, mode="spectral")
    assert bundle.film.srfs is not None and len(bundle.film.srfs) == 3
    img = np.asarray(bundle.render(seed=0))
    assert img.shape == (8, 8, 3)
    # integral of srf_j * L = 2.0 * 20nm = 40 per channel
    np.testing.assert_allclose(img.mean(axis=(0, 1)), 40.0, rtol=0.15)


def test_srf_eval_and_sampling_consistency():
    """srf_eval interpolates/clips correctly; the combined-SRF sampler's
    (wavelength, pdf) pairs integrate a known function correctly."""
    import jax.numpy as jnp
    import numpy as np
    from tpusky.render import spectra as S

    srf = (400.0, 500.0, (0.0, 1.0, 0.0))   # triangle on [400, 500]
    wl = jnp.asarray([350.0, 400.0, 425.0, 450.0, 475.0, 500.0, 550.0])
    v = np.asarray(S.srf_eval(srf, wl))
    np.testing.assert_allclose(v, [0, 0, 0.5, 1.0, 0.5, 0, 0], atol=1e-6)

    srfs = (srf, (450.0, 650.0, (1.0, 1.0)))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(size=(20000,)).astype(np.float32))
    wl_s, pdf = S.srf_sample_wavelengths(srfs, u, 4)
    # E[f(wl)/pdf] = integral of f over the union support
    f = S.srf_eval(srfs[1], wl_s)           # box: integral = 200
    est = float(jnp.mean(jnp.mean(f / jnp.maximum(pdf, 1e-12), axis=-1)))
    np.testing.assert_allclose(est, 200.0, rtol=0.05)
