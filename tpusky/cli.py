"""Command-line renderer: the counterpart of the reference's `mitsuba`
binary (SURVEY.md H15, `src/mitsuba/mitsuba.cpp`).

    python -m tpusky render scene.json -o out.exr --spp 64 --seed 0
    python -m tpusky render scene.json --mode spectral --png out.png
    python -m tpusky bench

Scene files are JSON versions of the `load_dict` dictionary format, with
the extension that `"to_world"` may be given as
{"look_at": {origin, target, up}} or a nested list matrix.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _decode_transforms(node):
    """Recursively turn {"look_at": {...}} nodes into matrices."""
    from .utils.transform import look_at, rotate, scale, translate, compose
    if isinstance(node, dict):
        if "look_at" in node and len(node) == 1:
            la = node["look_at"]
            return look_at(la["origin"], la["target"], la.get("up", (0, 0, 1)))
        if "transforms" in node and len(node) == 1:
            mats = []
            for step in node["transforms"]:
                (op, arg), = step.items()
                if op == "translate":
                    mats.append(translate(arg))
                elif op == "scale":
                    mats.append(scale(arg))
                elif op == "rotate":
                    mats.append(rotate(arg["axis"], arg["angle"]))
                else:
                    raise ValueError(f"unknown transform op {op!r}")
            return compose(*mats)
        return {k: _decode_transforms(v) for k, v in node.items()}
    return node


def cmd_render(args) -> int:
    import numpy as np
    from .render.loader import load_dict
    from .utils.io import write_exr

    t0 = time.time()
    if args.scene.endswith(".xml"):
        from .render.xml_loader import xml_to_dict
        overrides = dict(kv.split("=", 1) for kv in (args.define or []))
        bundle = load_dict(xml_to_dict(args.scene, overrides),
                           mode=args.mode)
    else:
        with open(args.scene) as f:
            desc = _decode_transforms(json.load(f))
        bundle = load_dict(desc, mode=args.mode)
    img = np.asarray(bundle.render(seed=args.seed, spp=args.spp))
    dt = time.time() - t0
    h, w, _ = img.shape
    spp = args.spp or bundle.spp
    print(f"rendered {w}x{h} @ {spp}spp ({bundle.integrator}, depth "
          f"{bundle.max_depth}, {bundle.mode}) in {dt:.2f}s")

    out = args.output or "output.exr"
    write_exr(out, img, ["R", "G", "B"])
    print(f"wrote {out}")
    if args.png:
        import jax.numpy as jnp
        from .ops.spectrum import srgb_gamma
        scale_v = float(np.percentile(img, 99.5)) or 1.0
        tone = np.asarray(srgb_gamma(jnp.asarray(img / scale_v)))
        try:
            import cv2
            cv2.imwrite(args.png, (tone[..., ::-1] * 255).astype(np.uint8))
            print(f"wrote {args.png}")
        except ImportError:
            print("png output needs cv2", file=sys.stderr)
    return 0


def cmd_bench(_args) -> int:
    from . import __file__ as _  # noqa: F401  (package check)
    import runpy
    import os
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpusky")
    sub = ap.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("render",
                        help="render a JSON or Mitsuba-XML scene file")
    rp.add_argument("scene")
    rp.add_argument("-D", "--define", action="append", metavar="KEY=VALUE",
                    help="override a scene $parameter (XML scenes)")
    rp.add_argument("-o", "--output", default=None, help="output EXR path")
    rp.add_argument("--png", default=None, help="also write a tonemapped PNG")
    rp.add_argument("--spp", type=int, default=None)
    rp.add_argument("--seed", type=int, default=0)
    rp.add_argument("--mode", choices=["rgb", "spectral"], default="rgb")
    rp.set_defaults(fn=cmd_render)

    bp = sub.add_parser("bench", help="run the TPU benchmark")
    bp.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
