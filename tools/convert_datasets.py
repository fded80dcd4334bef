"""Convert the reference sunsky dataset .bin files into a single .npz bundle.

Run once (the output is committed to the repo):

    python tools/convert_datasets.py \
        --src /root/reference/resources/sunsky/datasets \
        --dst data/sunsky/datasets.npz

The datasets originate from the published Hosek-Wilkie sky/sun model data
(https://cgg.mff.cuni.cz/projects/SkylightModelling/) and the TGMM fits of
Vitsas et al. 2021; the reference repackaged them into its own .bin tensor
format (layout documented at reference `sunsky.h:515-597`), which
``tpusky.utils.io.read_sunsky_bin`` parses.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpusky.models.sunsky import constants as C
from tpusky.utils.io import read_sunsky_bin


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/resources/sunsky/datasets")
    ap.add_argument("--dst", default="data/sunsky/datasets.npz")
    args = ap.parse_args()

    tables = {
        "sky_params_rgb": ("sky_rgb_params.bin", np.float64, C.SKY_PARAM_SHAPE_RGB),
        "sky_rad_rgb": ("sky_rgb_rad.bin", np.float64, C.SKY_RAD_SHAPE_RGB),
        "sky_params_spec": ("sky_spec_params.bin", np.float64, C.SKY_PARAM_SHAPE_SPEC),
        "sky_rad_spec": ("sky_spec_rad.bin", np.float64, C.SKY_RAD_SHAPE_SPEC),
        "sun_rad_rgb": ("sun_rgb_rad.bin", np.float64, C.SUN_RAD_SHAPE_RGB),
        "sun_rad_spec": ("sun_spec_rad.bin", np.float64, C.SUN_RAD_SHAPE_SPEC),
        "sun_ld_spec": ("sun_spec_ld.bin", np.float64, C.SUN_LD_SHAPE),
        "tgmm": ("tgmm_tables.bin", np.float32, C.TGMM_SHAPE),
    }

    out = {}
    for key, (fname, dtype, shape) in tables.items():
        arr = read_sunsky_bin(os.path.join(args.src, fname), dtype)
        assert arr.shape == shape, f"{fname}: {arr.shape} != {shape}"
        out[key] = arr
        print(f"{key:16s} {arr.shape} {arr.dtype} "
              f"[{arr.min():.4g}, {arr.max():.4g}]")

    os.makedirs(os.path.dirname(args.dst), exist_ok=True)
    np.savez_compressed(args.dst, **out)
    print("wrote", args.dst, f"({os.path.getsize(args.dst)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
