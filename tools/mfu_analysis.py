"""Hardware-utilization proxy for BASELINE.md's "reference value" column.

The reference cannot be built or installed in this environment (no
network egress: `pip install mitsuba` finds no wheels, and
`/root/reference/ext/drjit` — a git submodule — is an EMPTY directory,
so the CMake build cannot even configure). In place of a measured
Mitsuba number, this tool computes a defensible absolute yardstick per
benchmark config: XLA's own cost analysis (FLOPs + HBM bytes accessed)
for the exact compiled program, combined with the measured wall time,
giving achieved FLOP/s, EQUIVALENT HBM bandwidth, and their percentage
of the chip's peaks — the MFU/bandwidth-utilization methodology of the
public "How to Scale Your Model" book. "Equivalent" because the FLOP and
byte counts come from the UNFUSED XLA:CPU lowering of the same math (the
fused Pallas program moves less): the utilisation percentage reads as
"this throughput would require X% of HBM peak without fusion" — at 100%
the pipeline is at the unfused program's memory speed-of-light, and any
further speedup must come from deeper fusion, not scheduling.

Caveats (stated in BASELINE.md): XLA counts a transcendental (exp, log,
sqrt) as ONE flop, so VPU-transcendental-heavy kernels underreport
their true ALU work — the FLOP utilisation printed here is a LOWER
bound on how busy the VPU actually is. Pallas kernel internals are
opaque to cost_analysis; configs whose hot loop is a Pallas megakernel
report the XLA-visible portion only, and the per-stage stub-timing
roofline in BASELINE.md round-3/4 notes covers the rest.

    python tools/mfu_analysis.py          # all configs, one JSON line each
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# Peak numbers for the attached chip. v5e (the driver's bench target):
# 197 TFLOP/s bf16 MXU, ~49 TFLOP/s f32, 819 GB/s HBM (public spec /
# scaling-book "TPU v5e" table). If the attached chip reports a
# different kind, adjust here.
PEAKS = {
    "default": {"f32_tflops": 49.0, "bf16_tflops": 197.0, "hbm_gbps": 819.0},
}


def _cost(fn, *args):
    """Compile on the attached accelerator for timing; count FLOPs from
    an XLA:CPU lowering of the same function (the axon TPU backend's
    cost_analysis exposes no 'flops' key; the CPU lowering runs the pure
    jnp path — TPUSKY_DISABLE_PALLAS — whose op-for-op math matches what
    the fused Pallas kernels compute, so its FLOP count is the honest
    work estimate)."""
    compiled = jax.jit(fn).lower(*args).compile()
    flops = bytes_acc = 0.0
    try:
        os.environ["TPUSKY_DISABLE_PALLAS"] = "1"
        with jax.default_device(jax.devices("cpu")[0]):
            cc = jax.jit(fn).lower(*args).compile()
        ca = cc.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float((ca or {}).get("flops", 0.0))
        bytes_acc = float((ca or {}).get("bytes accessed", 0.0))
    except Exception as e:
        print(json.dumps({"metric": "mfu_cpu_lowering_failed",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
    finally:
        os.environ.pop("TPUSKY_DISABLE_PALLAS", None)
    return compiled, flops, bytes_acc


def _timed(compiled, args, iters=10):
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(tag, fn, args, rays):
    try:
        compiled, flops, bytes_acc = _cost(fn, *args)
    except Exception as e:
        print(json.dumps({"metric": "mfu_proxy", "config": tag,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
        return
    dt = _timed(compiled, args)
    peaks = PEAKS["default"]
    gflops = flops / dt / 1e9
    gbps = bytes_acc / dt / 1e9
    print(json.dumps({
        "metric": "mfu_proxy", "config": tag,
        "rays_per_s": rays / dt,
        "flops_per_ray": flops / rays,
        "bytes_per_ray": bytes_acc / rays,
        "achieved_gflops": round(gflops, 1),
        "flop_util_pct_f32peak": round(100 * gflops / 1e3
                                       / peaks["f32_tflops"], 2),
        "equiv_hbm_gbps": round(gbps, 1),
        "equiv_hbm_util_pct": round(100 * gbps / peaks["hbm_gbps"], 2),
        "wall_ms": round(dt * 1e3, 3),
    }), flush=True)


def main():
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render import integrator, film as film_mod
    from tpusky.render.film import Film
    from tpusky.render.sensors import make_perspective
    from tpusky.render.bsdf import table_kinds
    sys.path.insert(0, ".")
    from bench import _sphere_plane_scene

    dev = jax.devices()[0]
    print(json.dumps({"metric": "mfu_device",
                      "device_kind": getattr(dev, "device_kind", "?"),
                      "platform": dev.platform}), flush=True)

    # config 1: emitter eval
    n = 1 << 21
    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    env = jax.block_until_ready(
        jax.jit(lambda p: M.precompute(tables, p, "rgb"))(params))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    ct = u[:, 0]
    st = jnp.sqrt(1.0 - ct * ct)
    phi = 2.0 * jnp.pi * u[:, 1]
    d = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    report("1_eval", lambda dd: M.eval(env, dd), (d,), n)

    # config 2: depth-2 path frame
    h = w = 512
    spp = 8
    scene = _sphere_plane_scene()._replace(env=env)
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    film = Film(h, w, 3)
    kinds = table_kinds(scene.bsdfs)
    report("2_path",
           lambda k: integrator._render_impl(scene, sensor, film, k, spp,
                                             2, 1000, "rgb", kinds=kinds),
           (jax.random.PRNGKey(1),), h * w * spp * 3)

    # config 3: spectral depth-4
    from tpusky.render.scene import make_scene
    from tpusky.render.bsdf import ROUGH_CONDUCTOR
    tables_s = load_tables("spectral")
    params_s = ts.make_params(turbidity=3.0, albedo=0.3,
                              sun_direction=[0.3, 0.2, 0.93],
                              mode="spectral")
    env_s = jax.block_until_ready(
        jax.jit(lambda p: M.precompute(tables_s, p, "spectral"))(params_s))
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    scene_s = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
        bsdf_albedos=[[0.5, 0.5, 0.5]], bsdf_kinds=[ROUGH_CONDUCTOR],
        bsdf_alphas=[0.2], env=None)._replace(env=env_s)
    kinds_s = table_kinds(scene_s.bsdfs)
    report("3_spectral",
           lambda k: integrator._render_impl(scene_s, sensor, film, k, spp,
                                             4, 1000, "spectral",
                                             kinds=kinds_s),
           (jax.random.PRNGKey(1),), h * w * spp * 7)

    # config 4: fwd+bwd
    base4 = _sphere_plane_scene()

    def loss_and_grad(p, key):
        def loss(diff):
            t, a, sd = diff
            pp = p._replace(turbidity=t, albedo=a,
                            sun_direction=sd / jnp.linalg.norm(sd))
            e = M.precompute(tables, pp, "rgb")
            sc = base4._replace(env=e)
            img = film_mod.develop(integrator.render_rows(
                sc, sensor, film, key, 4, 2, 1000, "rgb", 0, h,
                kinds=kinds))
            return jnp.mean(img ** 2)
        return jax.value_and_grad(loss)(
            (p.turbidity, p.albedo, p.sun_direction))
    report("4_fwd_bwd", loss_and_grad, (params, jax.random.PRNGKey(1)),
           h * w * 4 * 3)


if __name__ == "__main__":
    main()
