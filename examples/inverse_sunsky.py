"""Inverse rendering: recover sun position + turbidity from a target image.

BASELINE.json config 5: render a target with unknown-to-the-optimiser
sunsky parameters, then recover them by gradient descent on the image
loss, with rays data-parallel over the device mesh and per-iteration
checkpointing.

NOTE: the PRODUCTION recovery recipe lives in `bench.py --train`
(round 4): global (T x sun-cap) grid initialisation, T+albedo adam
phases with the sun frozen, and nested direct-search sun refinement —
measured to recover T within 0.03 and the sun within 0.25 deg on every
CRN seed, where plain joint adam (this demo) is seed-dependent. This
example stays as the minimal didactic gradient-descent loop.

    python examples/inverse_sunsky.py                  # quick CPU demo
    python examples/inverse_sunsky.py --size 1080 --spp 256   # full config

On CPU this forces an 8-device virtual mesh; on TPU it uses all chips.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--checkpoint", default="/tmp/inverse_sunsky.ckpt")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.parallel.render import (make_mesh, make_train_step,
                                        render_sharded)
    from tpusky.render.film import Film
    from tpusky.render.scene import make_scene
    from tpusky.render.sensors import make_perspective
    from tpusky.utils.checkpoint import load_checkpoint, save_checkpoint

    n_dev = len(jax.devices())
    mesh = make_mesh(jax.devices())
    print(f"devices: {n_dev} ({jax.default_backend()})")

    tables = load_tables("rgb")
    ground = np.diag([10.0, 10.0, 1.0, 1.0]).astype(np.float32)
    sphere = np.eye(4, dtype=np.float32)
    sphere[2, 3] = 1.0
    base_scene = make_scene(
        shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                dict(kind=0, to_world=sphere, bsdf_idx=1)],
        bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]], env=None)
    sensor = make_perspective(origin=[4, -4, 2.0], target=[0, 0, 1.0],
                              fov_x_deg=45)
    h = args.size - args.size % n_dev
    film = Film(h, args.size, 3)

    def scene_builder(params):
        return base_scene._replace(env=M.precompute(tables, params, "rgb"))

    # ---- ground truth ----
    true_params = ts.make_params(turbidity=6.5, albedo=0.3,
                                 sun_direction=[0.45, 0.30, 0.84])
    target = render_sharded(scene_builder(true_params), sensor, film,
                            jax.random.PRNGKey(123), args.spp, mesh,
                            max_depth=2)

    optimizer = optax.adam(args.lr)
    step = make_train_step(tables, scene_builder, sensor, film, args.spp,
                           mesh, optimizer, max_depth=2)

    # NOTE: the sun disc itself is a visibility discontinuity that the
    # detached-sampling gradient cannot see (the reference needs its
    # projective integrators for that, `direct_projective.py`); recovery
    # relies on the smooth sky gradient, so start within the sky basin.
    params = ts.make_params(turbidity=3.0, albedo=0.3,
                            sun_direction=[0.35, 0.2, 0.91])
    opt_state = optimizer.init(params)
    start = 0
    ckpt = load_checkpoint(args.checkpoint)
    if ckpt is not None:
        start, params, opt_state = (ckpt["step"],
                                    jax.tree.map(jnp.asarray,
                                                 ckpt["params"]),
                                    jax.tree.map(jnp.asarray,
                                                 ckpt["opt_state"]))
        print(f"resumed from step {start}")

    t0 = time.time()
    for i in range(start, args.iters):
        opt_state, params, loss = step(opt_state, params, target,
                                       jax.random.PRNGKey(123))
        # keep the recovered sun direction unit-length and turbidity valid
        sd = params.sun_direction
        params = params._replace(
            sun_direction=sd / jnp.linalg.norm(sd),
            turbidity=jnp.clip(params.turbidity, 1.0, 10.0),
            albedo=jnp.clip(params.albedo, 0.0, 1.0))
        if i % 10 == 0 or i == args.iters - 1:
            dt = (time.time() - t0) / max(i - start + 1, 1)
            err_dir = float(jnp.rad2deg(jnp.arccos(jnp.clip(jnp.dot(
                params.sun_direction, true_params.sun_direction), -1, 1))))
            print(f"iter {i:3d} loss {float(loss):.3e} "
                  f"T {float(params.turbidity):.3f} (true 6.5) "
                  f"sun err {err_dir:.2f} deg  {dt * 1e3:.0f} ms/it",
                  flush=True)
            save_checkpoint(args.checkpoint,
                            dict(step=i + 1, params=params,
                                 opt_state=opt_state))

    err_t = abs(float(params.turbidity) - 6.5)
    err_dir = float(jnp.rad2deg(jnp.arccos(jnp.clip(jnp.dot(
        params.sun_direction, true_params.sun_direction), -1, 1))))
    print(f"final: turbidity err {err_t:.3f}, sun direction err "
          f"{err_dir:.2f} deg")


if __name__ == "__main__":
    main()
