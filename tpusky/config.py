"""Variant configuration — the single config object for
{rgb, spectral} x {f32, f64} x {scalar, polarized}.

Reference counterpart: the compile-time variant matrix
(`resources/mitsuba.conf.template:9-80`, e.g. ``llvm_ad_rgb`` /
``llvm_ad_spectral_polarized``). Mitsuba instantiates every class per
variant at build time; on TPU the same axes are runtime values — JAX
handles vectorization and AD uniformly, dtype is a tracer property, and
polarization selects the Stokes-transport integrator — so the whole
matrix collapses to one small frozen dataclass.

The string `mode` arguments across the API remain supported (they are
the common case and map 1:1 onto `Variant.mode`); `Variant` is the
structured form for code that needs to carry all three axes together,
plus the parser for Mitsuba variant names::

    v = Variant.from_name("llvm_ad_spectral_polarized")
    v.mode        # "spectral"
    v.dtype       # jnp.float32
    v.polarized   # True
    v.n_channels  # 11  (dataset channels; hero-λ transport uses 4)

f64 note: JAX's x64 mode is process-global (`jax.config.jax_enable_x64`)
— `Variant(dtype=jnp.float64)` therefore exposes `require_x64()` which
validates the flag rather than silently producing truncated math, and
the f64 test suite runs in a subprocess (tests/test_f64.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from .models.sunsky import constants as C

_MODES = ("rgb", "spectral", "mono")


@dataclass(frozen=True)
class Variant:
    mode: str = "rgb"
    dtype: Any = jnp.float32
    polarized: bool = False

    def __post_init__(self):
        if self.mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}, "
                             f"got {self.mode!r}")
        if self.dtype not in (jnp.float32, jnp.float64):
            raise ValueError("dtype must be jnp.float32 or jnp.float64")
        if self.polarized and self.mode == "mono":
            raise ValueError("polarized mono variants are not built "
                             "(match the reference's default matrix)")

    # ---- derived properties ------------------------------------------
    @property
    def n_channels(self) -> int:
        """Dataset channel count (3 RGB, 11 spectral, 1 mono)."""
        return {"rgb": 3, "spectral": C.N_WAVELENGTHS, "mono": 1}[self.mode]

    @property
    def n_hero(self) -> int:
        """Transported wavelengths per path in spectral mode
        (`Spectrum<Float, 4>` in the reference)."""
        return 4 if self.mode == "spectral" else self.n_channels

    @property
    def name(self) -> str:
        """Mitsuba-style variant name (backend fixed to the TPU build)."""
        parts = ["tpu", "ad", self.mode]
        if self.polarized:
            parts.append("polarized")
        if self.dtype == jnp.float64:
            parts.append("double")
        return "_".join(parts)

    # ---- constructors -------------------------------------------------
    @classmethod
    def from_name(cls, name: str) -> "Variant":
        """Parse a Mitsuba variant name (`mitsuba.conf` style). The
        backend prefix (scalar/llvm/cuda/tpu) and the `ad` tag are
        accepted and ignored — everything is AD-capable here."""
        parts = name.split("_")
        known_prefix = {"scalar", "llvm", "cuda", "tpu", "ad"}
        parts = [p for p in parts if p not in known_prefix]
        mode = None
        polarized = False
        double = False
        for p in parts:
            if p in _MODES:
                mode = p
            elif p == "polarized":
                polarized = True
            elif p == "double":
                double = True
            elif p == "mono":
                mode = "mono"
            elif p == "spectral":
                mode = "spectral"
            else:
                raise ValueError(f"unknown variant component {p!r} "
                                 f"in {name!r}")
        if mode is None:
            raise ValueError(f"variant {name!r} names no color mode")
        return cls(mode=mode,
                   dtype=jnp.float64 if double else jnp.float32,
                   polarized=polarized)

    def require_x64(self) -> None:
        """Raise unless the process-global x64 flag matches the dtype
        (f64 math silently truncates to f32 otherwise)."""
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "Variant(dtype=float64) needs jax_enable_x64; set "
                "JAX_ENABLE_X64=1 or jax.config.update('jax_enable_x64', "
                "True) at process start (see tests/test_f64.py)")


def resolve(variant) -> Variant:
    """Coerce a mode string / variant name / Variant to a Variant."""
    if isinstance(variant, Variant):
        return variant
    if isinstance(variant, str):
        if variant in _MODES:
            return Variant(mode=variant)
        return Variant.from_name(variant)
    raise TypeError(f"cannot interpret {variant!r} as a Variant")
