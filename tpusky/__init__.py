"""tpusky — a TPU-native differentiable renderer built around a
Hosek-Wilkie sun+sky environment emitter.

Quick start (sky-dome rendering)::

    import tpusky as ts
    params = ts.sunsky_params(turbidity=3.0, albedo=0.3, hour=15.0)
    state = ts.sunsky_precompute(params)           # jit/grad-compatible
    img = ts.sunsky_eval(state, directions)        # (..., 3) radiance
    ts.write_exr("sky.exr", img)

See `tpusky.render` for the full scene/integrator API and
`tpusky.parallel` for multi-chip execution.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .models.sunsky import constants as sunsky_constants
from .models.sunsky import model as _sunsky_model
from .models.sunsky.astronomy import (DateTimeRecord, LocationRecord,
                                      sun_direction)
from .models.sunsky.model import (SunskyParams, SunskyState, make_params,
                                  pdf_direction, precompute, sample_direction,
                                  sample_wavelengths)
from .models.sunsky.tables import load_tables
from .utils.io import read_exr, write_exr


def load_dict(d, mode="rgb"):
    """``mi.load_dict`` equivalent (lazy import keeps sky-only use light).

    ``mode`` accepts a mode string ("rgb"/"spectral"), a Mitsuba variant
    name ("llvm_ad_spectral_polarized"), or a `tpusky.Variant`."""
    from .config import resolve
    from .render.loader import load_dict as _ld
    v = resolve(mode)
    bundle = _ld(d, mode=v.mode)
    if v.polarized and bundle.integrator in ("path", "direct"):
        # polarized variants transport Stokes vectors (`mitsuba.conf`
        # *_polarized; the stokes integrator wraps the sampling one)
        import dataclasses
        bundle = dataclasses.replace(bundle, integrator="stokes")
    return bundle


def load_file(path, mode="rgb", parameters=None):
    """``mi.load_file`` equivalent: Mitsuba XML or JSON scene file."""
    from .config import resolve
    from .render.xml_loader import load_file as _lf
    return _lf(path, mode=resolve(mode).mode, parameters=parameters)

__version__ = "0.1.0"


def sunsky_params(turbidity=3.0, albedo=0.3, sun_direction_xyz=None,
                  hour=None, minute=0.0, second=0.0, year=2010, month=7,
                  day=10, latitude=35.6894, longitude=139.6917, timezone=9.0,
                  sky_scale=1.0, sun_scale=1.0,
                  sun_aperture_deg=sunsky_constants.SUN_APERTURE_DEG,
                  mode="rgb", dtype=jnp.float32) -> SunskyParams:
    """Build sunsky parameters from either an explicit sun direction or a
    date/time + location (mirrors the reference plugin's property set,
    reference `sunsky.cpp:21-103`; defaults = Tokyo, 2010-07-10 15:00)."""
    if sun_direction_xyz is not None and hour is not None:
        raise ValueError("give either sun_direction_xyz or time/location, "
                         "not both")
    if sun_direction_xyz is None:
        dt = DateTimeRecord(year=year, month=month, day=day,
                            hour=15.0 if hour is None else hour,
                            minute=minute, second=second)
        loc = LocationRecord(latitude=latitude, longitude=longitude,
                             timezone=timezone)
        sun_direction_xyz = sun_direction(dt, loc)
    return make_params(turbidity=turbidity, albedo=albedo,
                       sun_direction=sun_direction_xyz, sky_scale=sky_scale,
                       sun_scale=sun_scale,
                       sun_aperture_deg=sun_aperture_deg, mode=mode,
                       dtype=dtype)


@partial(jax.jit, static_argnames="mode")
def _sunsky_precompute_jit(params: SunskyParams, mode: str) -> SunskyState:
    return precompute(load_tables(mode, params.turbidity.dtype), params, mode)


def sunsky_precompute(params: SunskyParams, mode: str = None) -> SunskyState:
    """Derive the evaluation state (tables interpolated at the parameters).

    jit-compiled by default: on this path eager dispatch of the many tiny
    precompute ops is far slower than one fused XLA program.

    `mode` defaults to the mode the params were built for (an 11-channel
    albedo means spectral) — passing it explicitly is only needed for
    params built by hand.
    """
    if mode is None:
        mode = ("spectral"
                if params.albedo.shape[-1] == sunsky_constants.N_WAVELENGTHS
                else "rgb")
    return _sunsky_precompute_jit(params, mode)


@partial(jax.jit, static_argnames="mode")
def sunsky_eval(state: SunskyState, directions, wavelengths=None,
                mode: str = "rgb"):
    """Radiance toward `directions` (unit vectors, +z up, pointing at the
    sky). RGB mode -> (..., 3); spectral mode -> same shape as
    `wavelengths`."""
    return _sunsky_model.eval(state, directions, wavelengths=wavelengths,
                              mode=mode)


__all__ = [
    "DateTimeRecord", "LocationRecord", "SunskyParams", "SunskyState",
    "load_tables", "make_params", "pdf_direction", "precompute",
    "read_exr", "sample_direction", "sample_wavelengths", "sun_direction",
    "sunsky_constants", "sunsky_eval", "sunsky_params", "sunsky_precompute",
    "write_exr",
]
