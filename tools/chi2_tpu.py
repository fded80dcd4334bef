"""Reference-scale sampling statistics on the real TPU chip.

Runs the TGMM sky chi-square and the joint sun+sky chi-square at the
reference's full scale — N=1e8 samples, res 215 (cells 215 x 430), on the
cropped spherical domain excluding the zenith band (SIN_OFFSET) — matching
`src/emitters/tests/test_sunsky.py:256-293` exactly, where the CI-scaled
copies in tests/test_sampling.py run N=4e6 at 128x64 on CPU.

    python tools/chi2_tpu.py          # on the TPU terminal

Prints one JSON line per configuration with the p-value; the acceptance
bar is the reference's p >= 0.01. Results recorded in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.models.sunsky import model as M
from tpusky.models.sunsky import tables as T
from tpusky.utils.chi2 import chi2_test

SIN_OFFSET = 0.00775          # reference test_sunsky.py:9
N = 100_000_000               # reference sample_count=1e8
RES = 215                     # reference res=215 -> (215, 430) grid
BATCH = 4_000_000


def _make_state(turb, sun_theta, sun_phi=-4 * np.pi / 5, sun_scale=0.0,
                aperture_deg=None, albedo=0.5):
    kw = {}
    if aperture_deg is not None:
        kw["sun_aperture_deg"] = aperture_deg
    params = M.make_params(
        turbidity=turb, albedo=albedo,
        sun_direction=[np.cos(sun_phi) * np.sin(sun_theta),
                       np.sin(sun_phi) * np.sin(sun_theta),
                       np.cos(sun_theta)],
        sun_scale=sun_scale, mode="rgb", **kw)
    return jax.jit(lambda p: M.precompute(T.load_tables("rgb"), p,
                                          "rgb"))(params)


def run_one(name, state):
    def sample_fn(key, n):
        u = jax.random.uniform(key, (n, 2))
        return M.sample_direction(state, u)[0]

    pdf = jax.jit(lambda d: M.pdf_direction(state, d))
    cos_bound = float(np.sqrt(1 - SIN_OFFSET ** 2))
    t0 = time.time()
    # ires=64: at res 215 and N=1e8 the statistical noise per cell is
    # ~0.3%, so the midpoint pdf integration must resolve the sharp TGMM
    # peak to well below that — ires=8 leaves ~2000 excess chi2 stat (ires=64 still ~300)
    # (false failures); validated against exact per-gaussian Phi-difference
    # expectations, the sampler passes (f32 p=0.27, f64 p=0.033)
    p, ok, info = chi2_test(sample_fn, pdf, key=jax.random.PRNGKey(0),
                            sample_count=N, res_phi=2 * RES, res_cos=RES,
                            cos_range=(0.0, cos_bound), ires=64,
                            batch=BATCH, device_hist=True)
    print(json.dumps({"metric": f"chi2_{name}", "value": p,
                      "unit": "p_value", "passed": bool(ok),
                      "n_samples": N, "res": RES,
                      "seconds": round(time.time() - t0, 1),
                      "cells": info["cells"],
                      "vs_baseline": 0.01}), flush=True)
    return ok


def main():
    all_ok = True
    # reference test06_sky_sampling grid: turbidities + elevations
    for turb in (2.2, 6.0):
        for st_deg in (20, 50):
            state = _make_state(turb, np.deg2rad(st_deg), sun_scale=0.0)
            all_ok &= run_one(f"sky_t{turb}_eta{st_deg}", state)
    # reference test07_sun_and_sky: widened 30-degree aperture
    for turb in (2.2, 6.0):
        state = _make_state(turb, np.deg2rad(50), sun_scale=1.0,
                            aperture_deg=30.0)
        all_ok &= run_one(f"sunsky_t{turb}", state)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
