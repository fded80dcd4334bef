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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..render import film as film_mod
from ..render import integrator

AXIS = "rays"
HOST_AXIS = "hosts"


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, **kw) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` (SURVEY §2c
    "Multi-host execution" — the same SPMD render program then spans ICI
    within a slice and DCN across hosts).

    With no arguments, relies on the cluster environment (TPU pod metadata
    / SLURM / GKE) the way `jax.distributed.initialize()` does; explicit
    coordinator/process args are forwarded for manual bring-up. Safe to
    call twice (second call is a no-op). Call BEFORE any other jax API.
    """
    if jax.process_count() > 1:
        return                          # already initialised
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)
    except (ValueError, RuntimeError):
        # single-process environment with no coordinator configured —
        # proceed single-host (jax.process_count() stays 1)
        if num_processes not in (None, 1):
            raise


def make_mesh(devices=None, axis_name: str = AXIS) -> Mesh:
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(shape=None, devices=None,
                 axis_names=(HOST_AXIS, AXIS)) -> Mesh:
    """2-D `(hosts, chips)` device mesh. Default shape is
    `(jax.process_count(), local chips per process)` so the outer axis
    spans DCN and the inner axis rides ICI; any `(N, M)` factorisation of
    the device count is accepted (the render is mesh-shape-invariant —
    see `tests/test_multihost.py`)."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (jax.process_count(), devices.size // jax.process_count())
    n = shape[0] * shape[1]
    return Mesh(devices[:n].reshape(shape), axis_names)


def _flat_shard_index(mesh: Mesh):
    """Global shard index: row-major over the mesh axes (static sizes)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    i = 0
    for ax in mesh.axis_names:
        i = i * sizes[ax] + jax.lax.axis_index(ax)
    return i


def render_sharded(scene, sensor, film_cfg: film_mod.Film, key, spp: int,
                   mesh: Mesh, max_depth: int = 2, rr_depth: int = 1000,
                   mode: str = "rgb", kinds=None):
    """Render with film rows sharded over `mesh` (1-D `(chips,)` or 2-D
    `(hosts, chips)`); returns the (H, W, C) image.

    H must be divisible by the total mesh size. The result is identical
    (bitwise, modulo reduction order inside a row block) to the
    single-device render AND invariant to the mesh factorisation, because
    every random number is keyed on the global lane index. Under
    multi-host execution the returned image is a global `jax.Array` whose
    addressable shards are this host's film rows; use
    `host_local_rows` for per-host assembly/IO without a cross-DCN
    gather.
    """
    if kinds is None:
        # static BSDF lobe pruning: without it every lobe formula runs on
        # garbage parameters and inactive-lobe NaN local derivatives leak
        # into texture/material cotangents through the kind-select wheres
        # (0 * NaN) — derive it here while the scene is still concrete
        try:
            from ..render.bsdf import table_kinds
            kinds = table_kinds(scene.bsdfs)
        except Exception:
            kinds = None
    n_dev = mesh.devices.size
    h = film_cfg.height
    assert h % n_dev == 0, f"film height {h} not divisible by mesh {n_dev}"
    rows_per = h // n_dev
    names = tuple(mesh.axis_names)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=P(names))
    def shard_render(scene_, sensor_, key_):
        i = _flat_shard_index(mesh)
        return integrator.render_rows(scene_, sensor_, film_cfg, key_, spp,
                                      max_depth, rr_depth, mode,
                                      i * rows_per, rows_per,
                                      vma_axes=names, kinds=kinds)

    accum = shard_render(scene, sensor, key)
    return film_mod.develop(accum)


def host_local_rows(image) -> list:
    """Per-host film assembly (SURVEY §2c: "film shards gathered at
    develop time" — or, here, NOT gathered: each host keeps its rows).

    Returns [(row0, rows_ndarray), ...] for the shards addressable from
    this process, sorted by row — the building block for per-host EXR
    tile IO in a multi-host render without any cross-DCN collective.
    """
    shards = []
    for s in image.addressable_shards:
        r0 = s.index[0].start or 0
        shards.append((int(r0), np.asarray(s.data)))
    shards.sort(key=lambda t: t[0])
    return shards


def make_train_step_single(scene_builder, sensor, film_cfg, spp,
                           optimizer, max_depth: int = 2,
                           mode: str = "rgb", project=None,
                           loss: str = "l2"):
    """Single-device inverse-rendering step (BASELINE config 5 on the one
    real chip): ONE fused XLA program = sunsky precompute + render + grad
    + optimizer update. Note the terminal's TPU compile service hangs on
    the fused *forward* precompute+render program (2026-08 compiler bug)
    but compiles the fused *train-step* (grad) program fine — so no
    program-splitting workaround is needed here; `bench.py --train`
    exercises this on the chip.

    Returns step(opt_state, params, target, key) -> (opt_state, params,
    loss). Matches the reference's param-update lifecycle
    (`sunsky.cpp:242-285` parameters_changed + `common.py:623`
    render_backward) but as one traced program.
    """
    import optax
    from ..render import integrator
    from ..render.bsdf import table_kinds

    _loss_kind = loss[0] if isinstance(loss, tuple) else loss
    if _loss_kind not in ("l2", "rel_l2", "log_l2", "log_l2_blur",
                          "log_l2_nodisc"):
        raise ValueError(f"unknown loss kind {_loss_kind!r}; expected one "
                         "of 'l2', 'rel_l2', 'log_l2', 'log_l2_blur', "
                         "'log_l2_nodisc'")

    def loss_fn(params, target, key):
        scene = scene_builder(params)
        kinds = table_kinds(scene.bsdfs)
        img = film_mod.develop(integrator.render_rows(
            scene, sensor, film_cfg, key, spp, max_depth, 1000, mode,
            0, film_cfg.height, kinds=kinds))
        if loss == "log_l2_nodisc":
            # log-space MSE with the sun-disc neighbourhood MASKED OUT
            # (derived from the TARGET's hot pixels, dilated ~2.5 deg):
            # with the sun within ~1 deg of truth, every unmasked
            # log-space loss is still DISC-dominated — each misaligned
            # disc pixel carries (delta log)^2 ~ 64 vs the sky's ~1e-5,
            # so ~60 pixels outweigh the 260k sky pixels 1000x and bias
            # the photometric parameters. Trimming the disc makes the
            # sky signal (turbidity/albedo) the whole objective; use for
            # final T/albedo phases with the sun frozen.
            li = jnp.log1p(jnp.maximum(img, 0.0))
            lt = jnp.log1p(jnp.maximum(target, 0.0))
            lum_t = jnp.sum(jax.lax.stop_gradient(target), axis=-1)
            hot = (lum_t > 200.0).astype(li.dtype)
            sig = li.shape[0] / 64.0
            r = jnp.arange(li.shape[0], dtype=li.dtype)
            B = jnp.exp(-0.5 * ((r[:, None] - r[None, :]) / sig) ** 2)
            B = B / B.sum(axis=1, keepdims=True)
            spread = jnp.einsum("ij,jw->iw", B,
                                jnp.einsum("ij,hj->hi", B, hot))
            # <= so an all-dark target (no disc in frame) keeps every
            # pixel instead of masking the whole image
            keep = (spread <= 1e-4 * jnp.max(spread)).astype(li.dtype)
            keep = keep[..., None]
            return (jnp.sum(keep * (li - lt) ** 2)
                    / jnp.maximum(jnp.sum(keep) * li.shape[-1], 1.0))
        if loss == "rel_l2":
            # relative MSE: with a 1e4:1 dynamic range between the sun
            # disc and the sky, plain L2 is ~all disc residual and the
            # smooth sky signal (turbidity/albedo) drowns; normalizing
            # per-pixel by the (detached) target restores the balance
            den = jax.lax.stop_gradient(target) ** 2 + 1e-3
            return jnp.mean((img - target) ** 2 / den)
        # ("log_l2_blur", sigma_px, weight) selects the blur scale for
        # coarse-to-fine annealing (each sigma is a separate static
        # program; see bench.py --train)
        if isinstance(loss, tuple):
            kind, blur_sig, blur_wgt = loss
        else:
            kind, blur_sig, blur_wgt = loss, None, 16.0
        if kind in ("log_l2", "log_l2_blur"):
            # log-space MSE: compresses the disc/sky dynamic range so the
            # disc-alignment signal (sun_direction, via the surrogate
            # boundary gradient) and the smooth sky signal (turbidity/
            # albedo) are both live — HDR inverse-rendering practice
            li = jnp.log1p(jnp.maximum(img, 0.0))
            lt = jnp.log1p(jnp.maximum(target, 0.0))
            out = jnp.mean((li - lt) ** 2)
            if kind == "log_l2_blur":
                # + a gaussian-blurred term (sigma = H/32 px): the sun
                # disc subtends ~0.27 deg — far smaller than a typical
                # initialization error — so the sharp residuals of the
                # two discs never overlap and the boundary gradient has
                # no long-range attraction. Blurring spreads each disc
                # into a smooth bump whose L2 pulls over ~2 sigma
                # (multi-scale image loss; the gaussian is two MXU
                # matmuls, negligible next to the render)
                sig = blur_sig if blur_sig is not None else li.shape[0] / 32.0

                def bmat(m):
                    r = jnp.arange(m, dtype=jnp.float32)
                    B = jnp.exp(-0.5 * ((r[:, None] - r[None, :])
                                        / sig) ** 2)
                    return B / B.sum(axis=1, keepdims=True)

                Bh, Bw = bmat(li.shape[0]), bmat(li.shape[1])

                def blur(x):
                    x = jnp.einsum("ij,jwc->iwc", Bh, x,
                                   precision=jax.lax.Precision.HIGHEST)
                    return jnp.einsum("ij,hjc->hic", Bw, x,
                                      precision=jax.lax.Precision.HIGHEST)

                out = out + blur_wgt * jnp.mean((blur(li) - blur(lt)) ** 2)
            return out
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(opt_state, params, target, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, target, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if project is not None:
            params = project(params)
        return opt_state, params, loss

    return step


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
