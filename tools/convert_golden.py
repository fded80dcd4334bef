"""Convert reference golden test data (EXR renders, .spd sun spectra) into
a single .npz fixture bundle for the test suite.

    python tools/convert_golden.py \
        --src /root/reference/resources/sunsky/test_data \
        --dst tests/golden/sunsky_golden.npz

Golden EXRs cover sky radiance over (hour|eta, turbidity, albedo) grids;
.spd files cover sun spectral radiance over (turbidity, eta, gamma)
(cf. reference `src/emitters/tests/test_sunsky.py`).
"""

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpusky.utils.io import read_exr, read_spd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/resources/sunsky/test_data")
    ap.add_argument("--dst", default="tests/golden/sunsky_golden.npz")
    args = ap.parse_args()

    out = {}

    for path in sorted(glob.glob(os.path.join(args.src, "renders", "*.exr"))):
        img, names = read_exr(path)
        key = os.path.splitext(os.path.basename(path))[0]
        if names[:3] == ["B", "G", "R"]:  # reorder alphabetical BGR -> RGB
            img = img[..., ::-1]
        out[key] = img
        print(f"{key}: {img.shape} range [{img.min():.4g}, {img.max():.4g}]")

    spd_re = re.compile(r"sun_spectrum_t([\d.]+)_eta([\d.]+)_gamma([\d.e+-]+)\.spd")
    spd_wl = None
    for path in sorted(glob.glob(os.path.join(args.src, "spectrum", "*.spd"))):
        m = spd_re.match(os.path.basename(path))
        assert m, path
        wl, val = read_spd(path)
        if spd_wl is None:
            spd_wl = wl
            out["sun_spectrum_wavelengths"] = wl
        assert np.array_equal(wl, spd_wl)
        out[f"sun_spectrum_t{m[1]}_eta{m[2]}_gamma{m[3]}"] = val

    os.makedirs(os.path.dirname(args.dst), exist_ok=True)
    np.savez_compressed(args.dst, **out)
    n_spd = sum(1 for k in out if k.startswith("sun_spectrum_t"))
    print(f"wrote {args.dst}: {len(out)} arrays ({n_spd} spectra), "
          f"{os.path.getsize(args.dst)/1024:.0f} KiB")


if __name__ == "__main__":
    main()
