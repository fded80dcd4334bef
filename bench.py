"""Benchmarks: all five BASELINE.json configs on the real TPU chip.

Prints ONE JSON line per config:

  1. sunsky_eval_rays_per_s        — sky-dome direct emitter eval (Pallas)
  2. sunsky_spectral_d4_rays_per_s — spectral sunsky, depth 4
  3. sunsky_fwd_bwd_rays_per_s     — fwd+bwd grads wrt turbidity + albedo
                                     + sun_direction
  4. sunsky_train_step_ms          — full inverse-rendering step (config 5:
                                     precompute + render + grad + adam)
  5. sunsky_path_rays_per_s        — sky+sun TGMM IS, RGB, 1 bounce
                                     (the headline; printed last)

"rays" counts every traced ray segment: camera rays + one NEE shadow ray
and one BSDF continuation ray per path vertex. The reference publishes no
numbers (BASELINE.md), so vs_baseline is null until a local reference
measurement exists.

Flags run one config alone: --eval / --spectral / --grad / --train /
--path; --param-update times config 5's per-frame precompute lifecycle.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": float(value),
                      "unit": unit, "vs_baseline": None}), flush=True)


def _timed(fn, args_list, warmup_args):
    out = jax.block_until_ready(fn(*warmup_args))
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / len(args_list)


def _sphere_plane_scene():
    from tpusky.render.scene import make_scene
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    return make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]], env=None)


def bench_eval() -> None:
    """BASELINE config 1: sky-dome direct emitter eval per ray."""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables

    n = 1 << 21                      # 2M lanes
    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    env = jax.block_until_ready(
        jax.jit(lambda p: M.precompute(tables, p, "rgb"))(params))

    # upper-hemisphere directions, deterministic
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    ct = u[:, 0]
    st = jnp.sqrt(1.0 - ct * ct)
    phi = 2.0 * jnp.pi * u[:, 1]
    d = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    d = jax.block_until_ready(d)

    f = jax.jit(lambda dd: M.eval(env, dd))
    dt = _timed(f, [(d,)] * 20, (d,))
    _emit("sunsky_eval_rays_per_s", n / dt, "rays/s")


def bench_path(emit=True):
    """BASELINE config 2: sky + sun, TGMM IS, RGB, 1 bounce."""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render import integrator
    from tpusky.render.film import Film
    from tpusky.render.sensors import make_perspective
    from tpusky.render.bsdf import table_kinds

    h = w = 512
    spp = 8
    max_depth = 2
    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    base_scene = _sphere_plane_scene()
    sensor = make_perspective(origin=[4, -4, 2.0], target=[0, 0, 1.0],
                              fov_x_deg=45)
    film = Film(h, w, 3)
    kinds = table_kinds(base_scene.bsdfs)

    # Emitter precompute happens once, at scene-construction time — same
    # lifecycle as the reference (`SunskyEmitter` ctor `sunsky.cpp:162`;
    # it only re-runs on parameters_changed). It is a separate XLA
    # program from the render because the terminal's tpu compile helper
    # hangs/SIGILLs on the fused forward program (compiler bug, 2026-08).
    precompute = jax.jit(lambda p: M.precompute(tables, p, "rgb"))
    env0 = jax.block_until_ready(precompute(params))
    scene = base_scene._replace(env=env0)

    def run(key):
        return integrator._render_impl(scene, sensor, film, key, spp,
                                       max_depth, 1000, "rgb", kinds=kinds)

    # keys made OUTSIDE the timed loop: on this tunnelled TPU terminal a
    # host-side PRNGKey() costs ~2-4 ms of round-trip latency
    keys = [jax.random.PRNGKey(i + 1) for i in range(20)]
    jax.block_until_ready(keys)
    dt = _timed(run, [(k,) for k in keys], (jax.random.PRNGKey(0),))

    rays_per_sample = 1 + 2 * (max_depth - 1)
    rate = h * w * spp * rays_per_sample / dt
    if emit:
        _emit("sunsky_path_rays_per_s", rate, "rays/s")
    return rate


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
    env0 = jax.block_until_ready(precompute(params))
    scene = base_scene._replace(env=env0)

    def run(key):
        return integrator._render_impl(scene, sensor, film, key, spp,
                                       max_depth, 1000, "spectral",
                                       kinds=kinds)

    keys = [jax.random.PRNGKey(i + 1) for i in range(10)]
    jax.block_until_ready(keys)
    dt = _timed(run, [(k,) for k in keys], (jax.random.PRNGKey(0),))
    rays = h * w * spp * (1 + 2 * (max_depth - 1))
    _emit("sunsky_spectral_d4_rays_per_s", rays / dt, "rays/s")


def bench_grad() -> None:
    """BASELINE config 4: fwd+bwd throughput of d(loss)/d(params), with
    gradients flowing to turbidity AND albedo AND sun_direction."""
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render import integrator
    from tpusky.render.film import Film
    from tpusky.render.sensors import make_perspective
    from tpusky.render.bsdf import table_kinds
    from tpusky.render import film as film_mod

    h = w = 512
    spp = 4
    max_depth = 2
    tables = load_tables("rgb")
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.3, 0.2, 0.93])
    base_scene = _sphere_plane_scene()
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    film = Film(h, w, 3)
    kinds = table_kinds(base_scene.bsdfs)

    @jax.jit
    def loss_and_grad(p, key):
        def loss(diff):
            t, a, sd = diff
            pp = p._replace(turbidity=t, albedo=a,
                            sun_direction=sd / jnp.linalg.norm(sd))
            env = M.precompute(tables, pp, "rgb")
            scene = base_scene._replace(env=env)
            img = film_mod.develop(integrator.render_rows(
                scene, sensor, film, key, spp, max_depth, 1000, "rgb",
                0, h, kinds=kinds))
            return jnp.mean(img ** 2)
        return jax.value_and_grad(loss)(
            (p.turbidity, p.albedo, p.sun_direction))

    keys = [jax.random.PRNGKey(i + 1) for i in range(10)]
    jax.block_until_ready(keys)
    dt = _timed(loss_and_grad, [(params, k) for k in keys],
                (params, jax.random.PRNGKey(0)))
    rays = h * w * spp * (1 + 2 * (max_depth - 1))
    _emit("sunsky_fwd_bwd_rays_per_s", rays / dt, "rays/s")


def bench_train() -> None:
    """BASELINE config 5: full inverse-rendering train step on the chip
    (sunsky precompute + render + grad + psum-free single-chip adam), and
    a short recovery run (turbidity + sun direction from a target render).
    """
    import optax
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.parallel.render import make_train_step_single
    from tpusky.render.film import Film
    from tpusky.render.sensors import make_perspective

    h = w = 512
    spp = 8          # spp 4 plateaus in a poor basin (measured on-chip:
    #                  T stalls at ~3.2 / sun 42deg; spp 8 recovers
    #                  T +/- 0.02 and sun ~12deg with the same recipe)
    tables = load_tables("rgb")
    base_scene = _sphere_plane_scene()
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    film = Film(h, w, 3)
    # recipe validated on-chip: adam(0.1) x 200 CRN iters
    optimizer = optax.adam(1e-1)

    def scene_builder(params):
        return base_scene._replace(env=M.precompute(tables, params, "rgb"))

    def project(p):
        # keep the recovered sun direction unit-length and params valid
        # (mirror of examples/inverse_sunsky.py post-step projection)
        return p._replace(
            sun_direction=p.sun_direction
            / jnp.linalg.norm(p.sun_direction),
            turbidity=jnp.clip(p.turbidity, 1.0, 10.0),
            albedo=jnp.clip(p.albedo, 0.0, 1.0))

    step = make_train_step_single(scene_builder, sensor, film, spp=spp,
                                  optimizer=optimizer, max_depth=2,
                                  project=project, loss="log_l2_blur")

    true_p = ts.make_params(turbidity=6.5, albedo=0.3,
                            sun_direction=[0.45, 0.30, 0.84])
    # target rendered by the SAME program/key/spp the loss uses
    # (common random numbers: the MC loss then has an exact zero-variance
    # minimum at the true parameters — examples/inverse_sunsky.py)
    from tpusky.render import integrator, film as film_mod
    from tpusky.render.bsdf import table_kinds
    kinds = table_kinds(base_scene.bsdfs)
    crn_key = jax.random.PRNGKey(123)
    env_t = jax.jit(lambda p: M.precompute(tables, p, "rgb"))(true_p)
    target = film_mod.develop(jax.jit(
        lambda sc, k: integrator.render_rows(sc, sensor, film, k, spp, 2,
                                             1000, "rgb", 0, h,
                                             kinds=kinds))(
        base_scene._replace(env=env_t), crn_key))
    target = jax.block_until_ready(target)

    # start within the smooth sky basin (the sun disc itself is a
    # visibility discontinuity the detached-sampling gradient cannot see;
    # cf. examples/inverse_sunsky.py)
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.35, 0.2, 0.91])
    opt_state = optimizer.init(params)

    # timed steps
    out = jax.block_until_ready(step(opt_state, params, target, crn_key))
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(out[0], out[1], target, crn_key)
    jax.block_until_ready(out[2])
    dt = (time.perf_counter() - t0) / 10
    opt_state, params = out[0], out[1]

    # continue to 200 total iterations for the recovery check
    for i in range(11, 200):
        opt_state, params, loss = step(opt_state, params, target, crn_key)
    params = jax.block_until_ready(params)
    t_err = abs(float(params.turbidity) - 6.5)
    sd = np.asarray(params.sun_direction)
    sd = sd / np.linalg.norm(sd)
    sd_true = np.asarray([0.45, 0.30, 0.84])
    sd_true = sd_true / np.linalg.norm(sd_true)
    ang = float(np.degrees(np.arccos(np.clip(np.dot(sd, sd_true), -1, 1))))
    _emit("sunsky_train_step_ms", dt * 1e3, "ms/iter")
    print(json.dumps({"metric": "sunsky_train_recovery",
                      "value": t_err, "unit": "turbidity_abs_err",
                      "sun_dir_err_deg": ang, "iters": 200,
                      "vs_baseline": None}), flush=True)


def main() -> None:
    bench_eval()
    bench_spectral()
    bench_grad()
    bench_train()
    bench_path()          # the headline metric, printed last


if __name__ == "__main__":
    import sys
    if "--eval" in sys.argv:
        bench_eval()
    elif "--spectral" in sys.argv:
        bench_spectral()
    elif "--grad" in sys.argv:
        bench_grad()
    elif "--train" in sys.argv:
        bench_train()
    elif "--path" in sys.argv:
        bench_path()
    else:
        main()
