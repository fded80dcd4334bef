"""Extract the standard CIE 1931 2-degree observer table (360..830nm, 5nm,
95 samples, X/Y/Z) and the CIE D65 illuminant table into data/cie1931.npz.

These are public standard colorimetric data (CIE 15:2004); the reference
embeds the same tables (reference `src/core/spectrum.cpp:158`,
`include/mitsuba/core/spectrum.h:138`), from which this tool parses the
numeric values once. The output .npz is committed.
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_float_block(text: str, start_marker: str) -> np.ndarray:
    idx = text.index(start_marker)
    body = text[idx:text.index("};", idx)]
    nums = re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?f?", body.split("{", 1)[1])
    return np.array([float(n.rstrip("f")) for n in nums])


def main() -> None:
    spec_cpp = open("/root/reference/src/core/spectrum.cpp").read()
    spec_h = open("/root/reference/include/mitsuba/core/spectrum.h").read()

    cie = parse_float_block(spec_cpp, "cie1931_tbl")
    assert cie.size == 95 * 3, cie.size
    xyz = cie.reshape(3, 95)

    d65 = parse_float_block(spec_h, "d65_table")
    assert d65.size == 95, d65.size

    os.makedirs("data", exist_ok=True)
    np.savez("data/cie1931.npz",
             wavelengths=np.arange(360.0, 831.0, 5.0),
             x=xyz[0], y=xyz[1], z=xyz[2], d65=d65)
    print("X[0..2]:", xyz[0][:3], " Y integral*5:", xyz[1].sum() * 5)


if __name__ == "__main__":
    main()
