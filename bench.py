"""Benchmark: sunsky path-traced render throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config = BASELINE.json config 2 (sky + sun disc with TGMM importance
sampling, RGB, single bounce): a sunsky-lit sphere-on-plane scene rendered
with the wavefront path tracer (direct illumination = NEE + BSDF-sample
MIS). "rays" counts every traced ray segment: camera rays + one NEE shadow
ray and one BSDF continuation ray per path vertex. The reference publishes
no numbers (BASELINE.md), so vs_baseline is null until a local reference
measurement exists.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render import integrator
    from tpusky.render.film import Film
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective

    h = w = 512
    spp = 8
    max_depth = 2

    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])

    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    base_scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]],
        env=None)
    sensor = make_perspective(origin=[4, -4, 2.0], target=[0, 0, 1.0],
                              fov_x_deg=45)
    film = Film(h, w, 3)

    # Emitter precompute happens once, at scene-construction time — same
    # lifecycle as the reference (`SunskyEmitter` ctor `sunsky.cpp:162`;
    # it only re-runs on parameters_changed). It is a separate XLA
    # program from the render because the terminal's tpu compile helper
    # SIGILLs on the fused program (compiler bug, 2026-08). Use
    # `--param-update` to time the inverse-rendering path where the
    # precompute re-runs every frame.
    precompute = jax.jit(lambda p: M.precompute(tables, p, "rgb"))
    from tpusky.render.bsdf import table_kinds
    kinds = table_kinds(base_scene.bsdfs)

    import sys
    per_frame_precompute = "--param-update" in sys.argv

    env0 = jax.block_until_ready(precompute(params))

    def run(p, key):
        env = precompute(p) if per_frame_precompute else env0
        scene = base_scene._replace(env=env)
        return integrator._render_impl(scene, sensor, film, key, spp,
                                       max_depth, 1000, "rgb",
                                       kinds=kinds)

    # warm-up/compile
    out = run(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    # keys made OUTSIDE the timed loop: on this tunnelled TPU terminal a
    # host-side PRNGKey() costs ~2-4 ms of round-trip latency that has
    # nothing to do with render throughput
    iters = 20
    keys = [jax.random.PRNGKey(i + 1) for i in range(iters)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for k in keys:
        out = run(params, k)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    samples = h * w * spp
    # per path sample: camera ray + per-vertex (shadow + continuation);
    # with max_depth=2 that's 1 camera + 1 shadow + 1 continuation
    rays_per_sample = 1 + 2 * (max_depth - 1)
    rays_per_s = samples * rays_per_sample / dt

    print(json.dumps({
        "metric": "sunsky_path_rays_per_s",
        "value": float(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": None,
    }))


def bench_spectral() -> None:
    """BASELINE config 3: spectral sunsky, depth 4, hero wavelengths."""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render import integrator
    from tpusky.render.film import Film
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective
    from tpusky.render.bsdf import ROUGH_CONDUCTOR, table_kinds

    h = w = 512
    spp = 8
    max_depth = 4
    tables = load_tables("spectral")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93],
                            mode="spectral")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    base_scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0)],
        bsdf_albedos=[[0.5, 0.5, 0.5]], bsdf_kinds=[ROUGH_CONDUCTOR],
        bsdf_alphas=[0.2], env=None)
    sensor = make_perspective([4, -4, 2.0], [0, 0, 0.5], fov_x_deg=45)
    film = Film(h, w, 3)
    kinds = table_kinds(base_scene.bsdfs)
    precompute = jax.jit(lambda p: M.precompute(tables, p, "spectral"))

    def run(p, key):
        scene = base_scene._replace(env=precompute(p))
        return integrator._render_impl(scene, sensor, film, key, spp,
                                       max_depth, 1000, "spectral",
                                       kinds=kinds)

    out = run(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    iters = 10
    keys = [jax.random.PRNGKey(i + 1) for i in range(iters)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for k in keys:
        out = run(params, k)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rays = h * w * spp * (1 + 2 * (max_depth - 1))
    print(json.dumps({"metric": "sunsky_spectral_d4_rays_per_s",
                      "value": float(rays / dt), "unit": "rays/s",
                      "vs_baseline": None}))


def bench_grad() -> None:
    """BASELINE config 4: fwd+bwd throughput of d(loss)/d(params)."""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render import integrator
    from tpusky.render.film import Film
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective
    from tpusky.render.bsdf import table_kinds
    from tpusky.render import film as film_mod

    h = w = 512
    spp = 4
    max_depth = 2
    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    base_scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]], env=None)
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    film = Film(h, w, 3)
    kinds = table_kinds(base_scene.bsdfs)

    @jax.jit
    def loss_and_grad(p, key):
        def loss(pp):
            env = M.precompute(tables, pp, "rgb")
            scene = base_scene._replace(env=env)
            img = film_mod.develop(integrator.render_rows(
                scene, sensor, film, key, spp, max_depth, 1000, "rgb",
                0, h, kinds=kinds))
            return jnp.mean(img ** 2)
        return jax.value_and_grad(lambda t: loss(
            p._replace(turbidity=t)))(p.turbidity)

    out = loss_and_grad(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    iters = 10
    keys = [jax.random.PRNGKey(i + 1) for i in range(iters)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for k in keys:
        out = loss_and_grad(params, k)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rays = h * w * spp * (1 + 2 * (max_depth - 1))
    print(json.dumps({"metric": "sunsky_fwd_bwd_rays_per_s",
                      "value": float(rays / dt), "unit": "rays/s",
                      "vs_baseline": None}))


if __name__ == "__main__":
    import sys
    if "--spectral" in sys.argv:
        bench_spectral()
    elif "--grad" in sys.argv:
        bench_grad()
    else:
        main()
