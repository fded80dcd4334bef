"""Sunsky model dataset tables.

Loads the Hosek-Wilkie sky/sun coefficient tables and the TGMM sampling
tables from the committed ``data/sunsky/datasets.npz`` bundle (total < 600
KiB — small enough to replicate per chip in HBM/VMEM). Tables are exposed
as a NamedTuple pytree so they can be passed through jit/shard_map
boundaries and device-replicated explicitly.

Axis layouts (cf. reference dataset files, `sunsky.h:515-597`):
  sky_params: (turbidity=10, albedo=2, ctrl_pt=6, channel, param=9)
  sky_rad:    (10, 2, 6, channel)
  sun_rad:    RGB (10, segment=45, 3, ctrl_pt=4, ld=6);
              spectral (10, 45, wavelength=11, ctrl_pt=4)
  sun_ld:     (wavelength=11, ld=6)  [spectral only]
  tgmm:       (turbidity=9, eta=30, gaussian=5, param=5)
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

_DATA_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                          "data", "sunsky", "datasets.npz")


class SunskyTables(NamedTuple):
    sky_params: jnp.ndarray
    sky_rad: jnp.ndarray
    sun_rad: jnp.ndarray
    sun_ld: Optional[jnp.ndarray]   # None in RGB mode (baked into sun_rad)
    tgmm: jnp.ndarray


@lru_cache(maxsize=None)
def _load_numpy(mode: str):
    with np.load(_DATA_PATH) as z:
        if mode == "rgb":
            return (z["sky_params_rgb"], z["sky_rad_rgb"], z["sun_rad_rgb"],
                    None, z["tgmm"])
        elif mode == "spectral":
            return (z["sky_params_spec"], z["sky_rad_spec"],
                    z["sun_rad_spec"], z["sun_ld_spec"], z["tgmm"])
        raise ValueError(f"unknown color mode {mode!r}")


def load_tables(mode: str = "rgb", dtype=jnp.float32) -> SunskyTables:
    """Load tables for a color mode as device arrays of the given dtype."""
    sky_p, sky_r, sun_r, sun_ld, tgmm = _load_numpy(mode)
    cast = lambda a: None if a is None else jnp.asarray(a, dtype)
    return SunskyTables(cast(sky_p), cast(sky_r), cast(sun_r), cast(sun_ld),
                        cast(tgmm))


def n_channels(mode: str) -> int:
    return 3 if mode == "rgb" else 11
