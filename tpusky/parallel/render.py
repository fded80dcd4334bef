"""Multi-chip rendering and inverse rendering via shard_map over a Mesh.

The TPU-native replacement for the parallelism the reference lacks
(SURVEY.md §2c): the ray/pixel wavefront is data-parallel across chips.
Design (scaling-book recipe):

* film rows sharded over the mesh axis ``"rays"``; each device renders and
  splats its own row block — forward pass needs **zero** communication,
* scene/emitter state (sunsky tables are ~600 KB) replicated per chip,
* in the backward pass the transpose of the replicated-scene broadcast is
  an automatic `psum` of parameter gradients over the mesh (shard_map
  inserts it), which XLA overlaps with the backward sweep,
* renders are bitwise mesh-shape-invariant because every random number is
  keyed on the global lane index, not the device index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render import film as film_mod
from ..render import integrator

AXIS = "rays"


def make_mesh(devices=None, axis_name: str = AXIS) -> Mesh:
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def render_sharded(scene, sensor, film_cfg: film_mod.Film, key, spp: int,
                   mesh: Mesh, max_depth: int = 2, rr_depth: int = 1000,
                   mode: str = "rgb"):
    """Render with film rows sharded over `mesh`; returns (H, W, C) image.

    H must be divisible by the mesh size. The result is identical (bitwise,
    modulo reduction order inside a row block) to the single-device render.
    """
    n_dev = mesh.devices.size
    h = film_cfg.height
    assert h % n_dev == 0, f"film height {h} not divisible by mesh {n_dev}"
    rows_per = h // n_dev

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=P(AXIS))
    def shard_render(scene_, sensor_, key_):
        i = jax.lax.axis_index(AXIS)
        return integrator.render_rows(scene_, sensor_, film_cfg, key_, spp,
                                      max_depth, rr_depth, mode,
                                      i * rows_per, rows_per,
                                      vma_axes=(AXIS,))

    accum = shard_render(scene, sensor, key)
    return film_mod.develop(accum)


def make_train_step(tables, scene_builder, sensor, film_cfg, spp, mesh,
                    optimizer, max_depth: int = 2, mode: str = "rgb"):
    """Build a jitted inverse-rendering step over a device mesh.

    scene_builder(params) -> Scene: re-derives the scene (including the
    sunsky precompute) from the differentiable parameter pytree — the
    analogue of the reference's `params.update()` -> `parameters_changed`
    retrace (`util.py:186`, `sunsky.cpp:242`).

    Returns step(opt_state, params, target, key) -> (opt_state, params,
    loss). Gradients of the replicated params are psum-reduced across the
    mesh by shard_map's transpose; the optimizer update runs replicated.
    """

    def loss_fn(params, target, key):
        scene = scene_builder(params)
        img = render_sharded(scene, sensor, film_cfg, key, spp, mesh,
                             max_depth=max_depth, mode=mode)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(opt_state, params, target, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, target, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return opt_state, params, loss

    return step
