"""Megakernel stage-by-stage roofline (VERDICT r3 item 5).

Times the bench config-2 frame with stage groups stubbed out
(TPUSKY_MEGA_STUB, read at trace time inside the kernel), each in a
fresh subprocess so the jit cache cannot serve a stale trace. The
difference full - stubbed is each stage group's cost; the all-stubbed
floor is the raygen+glue structural ceiling.

    python tools/mega_roofline.py
"""

import json
import os
import subprocess
import sys

_CHILD = r'''
import sys, time
sys.path.insert(0, ".")
import jax
import tpusky as ts
from tpusky.models.sunsky import model as M
from tpusky.models.sunsky.tables import load_tables
from tpusky.ops.pallas.megakernel import direct_rgb_megakernel
from tpusky.render.sensors import make_perspective
from bench import _sphere_plane_scene

h = w = 512
spp = 8
tables = load_tables("rgb")
params = ts.make_params(turbidity=3.0, albedo=0.3,
                        sun_direction=[0.3, 0.2, 0.93])
state = jax.jit(lambda p: M.precompute(tables, p, "rgb"))(params)
scene = _sphere_plane_scene()._replace(env=state)
sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
f = lambda k: direct_rgb_megakernel(scene, sensor, state, k, spp, w, h)
out = jax.block_until_ready(f(jax.random.PRNGKey(0)))
keys = [jax.random.PRNGKey(i + 1) for i in range(15)]
jax.block_until_ready(keys)
t0 = time.perf_counter()
for k in keys:
    out = f(k)
jax.block_until_ready(out)
print("MS", (time.perf_counter() - t0) / len(keys) * 1e3)
'''


def run(stub: str) -> float:
    env = dict(os.environ)
    env["TPUSKY_MEGA_STUB"] = stub
    out = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, cwd=os.path.join(
                             os.path.dirname(__file__), ".."))
    for line in out.stdout.splitlines():
        if line.startswith("MS "):
            return float(line.split()[1])
    raise RuntimeError(f"stub={stub!r}: {out.stdout[-400:]}\n"
                       f"{out.stderr[-400:]}")


def main():
    import sys as _sys
    configs = [
        ("", "full frame"),
        ("rand", "RNG stubbed"),
        ("rad,pdf,nee", "all sunsky math stubbed"),
        ("rad,pdf,nee,isect,occ,rand", "everything stubbed (floor)"),
    ] if "--rest" in _sys.argv else [
        ("", "full frame"),
        ("rad", "sunsky radiance x2 stubbed"),
        ("pdf", "TGMM pdf x2 stubbed"),
        ("nee", "TGMM sampling stubbed"),
        ("isect,occ", "intersection x3 stubbed"),
        ("rand", "RNG stubbed"),
        ("rad,pdf,nee", "all sunsky math stubbed"),
        ("rad,pdf,nee,isect,occ,rand", "everything stubbed (floor)"),
    ]
    full = None
    for stub, label in configs:
        ms = run(stub)
        if full is None:
            full = ms
        print(json.dumps({"metric": "mega_roofline", "stub": stub,
                          "label": label, "ms": round(ms, 3),
                          "stage_cost_ms": round(full - ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
