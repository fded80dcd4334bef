"""Golden-value tests of the sunsky radiance model.

Mirrors the reference's acceptance bars (reference
`src/emitters/tests/test_sunsky.py`):
  * RGB sky renders vs golden EXRs, mean rel. err <= 0.017   (:115-124)
  * spectral sky renders vs golden EXRs, <= 0.037            (:129-138)
  * sun spectra vs golden .spd files, mean rel. err <= 1e-2  (:154-196)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from tpusky.models.sunsky import model as M
from tpusky.models.sunsky import tables as T
from tpusky.models.sunsky.astronomy import (DateTimeRecord, LocationRecord,
                                            sun_direction)

H, W = 32, 64


def _directions():
    """The reference test's lat-long grid of view directions (toward sky)."""
    phis = np.linspace(0, 2 * np.pi, W)
    thetas = np.linspace(np.pi, 0, H)
    pg, tg = np.meshgrid(phis, thetas)
    v = np.stack([np.cos(pg) * np.sin(tg), np.sin(pg) * np.sin(tg),
                  np.cos(tg)], -1).astype(np.float32)
    return jnp.asarray(-v)


@partial(jax.jit, static_argnames="mode")
def _render(params, wl, mode):
    tables = T.load_tables(mode)
    state = M.precompute(tables, params, mode)
    return M.eval(state, _directions(), wavelengths=wl, mode=mode)


def _mean_rel_err(img, ref):
    return float(np.mean(np.abs(img - ref) / (np.abs(ref) + 0.001)))


_SPEC_WL = jnp.asarray(np.broadcast_to(
    np.array([360 + 47 / 2 + i * 47 for i in range(10)], np.float32),
    (H, W, 10)))


@pytest.mark.parametrize("hour,turb,albedo,key", [
    (9.5, 2, 0.2, "sky_rgb_hour9.50_t2.000_a0.200"),
    (12.25, 5.2, 0.0, "sky_rgb_hour12.25_t5.200_a0.000"),
    (18.3, 9.8, 0.5, "sky_rgb_hour18.30_t9.800_a0.500"),
])
def test_sky_radiance_rgb(golden, hour, turb, albedo, key):
    sd = sun_direction(DateTimeRecord(hour=hour), LocationRecord())
    params = M.make_params(turbidity=turb, albedo=albedo, sun_direction=sd,
                           sun_scale=0.0, mode="rgb")
    img = np.array(_render(params, None, "rgb"))
    assert _mean_rel_err(img, golden[key]) <= 0.017


@pytest.mark.parametrize("eta,turb,key", [
    (np.deg2rad(2), 2, "sky_spec_eta0.035_t2.000_a0.000"),
    (np.deg2rad(20), 5.2, "sky_spec_eta0.349_t5.200_a0.000"),
    (np.deg2rad(45), 9.8, "sky_spec_eta0.785_t9.800_a0.000"),
])
def test_sky_radiance_spectral(golden, eta, turb, key):
    st = np.pi / 2 - eta
    params = M.make_params(turbidity=turb, albedo=0.0,
                           sun_direction=[np.sin(st), 0.0, np.cos(st)],
                           sun_scale=0.0, mode="spectral")
    img = np.array(_render(params, _SPEC_WL, "spectral"))
    assert _mean_rel_err(img, golden[key]) <= 0.037


def test_sky_radiance_spectral_irregular_albedo(golden):
    """Reference test03: spectral sky with an 11-point irregular albedo
    spectrum, vs the stored golden EXR (bar 0.03, `test_sunsky.py:143-145`).
    """
    albedo = np.array([0.56, 0.21, 0.58, 0.24, 0.92, 0.42, 0.53, 0.75,
                       0.54, 0.20, 0.46], np.float32)
    eta = np.deg2rad(60)
    st = np.sin(np.pi / 2 - eta)
    params = M.make_params(turbidity=4.2, albedo=albedo,
                           sun_direction=[st, 0.0, np.cos(np.pi / 2 - eta)],
                           sun_scale=0.0, mode="spectral")
    img = np.array(_render(params, _SPEC_WL, "spectral"))
    assert _mean_rel_err(img, golden["sky_spectrum_special"]) <= 0.03


def test_sun_radiance_spectral(golden):
    """All 80 golden sun spectra (5 turbidities x 4 elevations x 4 gammas)."""
    eps = 1e-4
    half_ap = np.deg2rad(0.5388 / 2.0)
    wavelengths = jnp.asarray(np.linspace(310, 800, 15).astype(np.float32))
    tables = T.load_tables("spectral")

    @jax.jit
    def eval_sun(params, d):
        state = M.precompute(tables, params, "spectral")
        return M.eval(state, d, wavelengths=wavelengths, mode="spectral")

    worst = 0.0
    for turb in np.linspace(1, 10, 5):
        for eta_ray in np.linspace(eps, np.pi / 2 - eps, 4):
            for gamma in np.linspace(0, half_ap - eps, 4):
                phi = np.pi / 5
                theta_ray = np.pi / 2 - eta_ray
                sun_theta = theta_ray - gamma
                if sun_theta < 0:
                    sun_theta = theta_ray + gamma
                sd = [np.cos(phi) * np.sin(sun_theta),
                      np.sin(phi) * np.sin(sun_theta), np.cos(sun_theta)]
                params = M.make_params(turbidity=turb, albedo=0.0,
                                       sun_direction=sd, sky_scale=0.0,
                                       mode="spectral")
                d = jnp.asarray([np.cos(phi) * np.sin(theta_ray),
                                 np.sin(phi) * np.sin(theta_ray),
                                 np.cos(theta_ray)], jnp.float32)
                res = np.array(eval_sun(params, d))
                key = (f"sun_spectrum_t{turb:.1f}_eta{eta_ray:.2f}"
                       f"_gamma{gamma:.3e}")
                rel = np.mean(np.abs(res - golden[key]) / (golden[key] + 1e-6))
                worst = max(worst, rel)
    assert worst <= 1e-2, f"worst mean rel err {worst}"


def test_sun_in_disc_only():
    """Sun term is zero outside the solar disc (aperture test)."""
    st = np.sin(np.pi / 3)
    params = M.make_params(turbidity=3.0, albedo=0.0,
                           sun_direction=[st, 0.0, np.cos(np.pi / 3)],
                           sky_scale=0.0, mode="rgb")
    tables = T.load_tables("rgb")
    state = M.precompute(tables, params, "rgb")
    # direction 1 degree away from the sun: outside the ~0.27 deg half-aperture
    theta = np.pi / 3 + np.deg2rad(1.0)
    d = jnp.asarray([np.sin(theta), 0.0, np.cos(theta)], jnp.float32)
    assert np.all(np.array(M.eval(state, d, mode="rgb")) == 0.0)
    # dead centre: bright
    d = jnp.asarray([st, 0.0, np.cos(np.pi / 3)], jnp.float32)
    assert np.all(np.array(M.eval(state, d, mode="rgb")) > 1.0)
