"""Profiling / throughput accounting (SURVEY.md §5 "tracing/profiling").

The reference hooks every hot virtual into ITT/NVTX phases
(`include/mitsuba/core/profiler.h:20-48`); the TPU-native equivalents are
`jax.profiler` device traces plus block-until-ready wall timing with
rays/s accounting, wrapped here.
"""

from __future__ import annotations

import contextlib
import time

import jax


def time_fn(fn, *args, iters: int = 10, warmup: int = 1, **kwargs):
    """Steady-state wall time of a jitted function -> seconds/iter."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def rays_per_second(fn, n_rays: int, *args, iters: int = 10, **kwargs):
    """Throughput accounting: n_rays traced per call / steady-state time."""
    return n_rays / time_fn(fn, *args, iters=iters, **kwargs)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/tpusky_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args):
    """XLA's own FLOP/byte estimates for a jitted function."""
    lowered = jax.jit(fn).lower(*args)
    return lowered.compile().cost_analysis()
