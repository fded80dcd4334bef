"""Persistent-compilation-cache crash guard (tpusky/utils/cacheguard.py).

Round-3 failure: one-process ``pytest tests -q`` SIGSEGV'd at 63% inside
``jax/_src/compilation_cache.py get_executable_and_time`` — the cache
*read* path — on an entry a previous (successful-looking) serialize left
behind. These tests exercise the guard's plumbing end-to-end: probe
verdicts gate the in-process deserialize, poisoned entries are deleted,
and corrupt-but-cleanly-failing blobs can't take the process down.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusky.utils import cacheguard


def _cache_dir():
    return jax.config.jax_compilation_cache_dir


def _compile_unique(tag: float):
    # unique constant -> unique cache key -> fresh entry; drop the
    # persistence threshold so even a fast compile is written out
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        f = jax.jit(lambda x: jnp.tanh(x @ x) * tag)
        return f(np.ones((128, 128), np.float32)).block_until_ready()
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


def test_probe_survives_valid_entry():
    """A real entry passes the probe and the cached executable loads."""
    cdir = _cache_dir()
    assert cdir, "persistent cache must be configured by conftest"
    before = set(os.listdir(cdir)) if os.path.isdir(cdir) else set()
    _compile_unique(1.25)
    after = set(os.listdir(cdir)) if os.path.isdir(cdir) else set()
    new = [f for f in after - before if f.endswith("-cache")]
    if not new:      # compile was under the 0.5s persistence threshold
        pytest.skip("program too fast to be persisted on this machine")
    path = os.path.join(cdir, new[0])
    assert cacheguard._probe_entry(path)


def test_probe_flags_or_tolerates_corrupt_entry(tmp_path):
    """Garbage blobs must produce a verdict, never a parent crash."""
    p = tmp_path / "garbage-cache"
    p.write_bytes(b"\x00" * 4096)
    # Either verdict is acceptable: a clean ZstdError/ValueError in the
    # probe means "survivable" (the parent would raise cleanly too); a
    # probe death means "poisoned". What matters is that we get an
    # answer and the parent process is still alive.
    verdict = cacheguard._probe_entry(str(p))
    assert verdict in (True, False)


def test_failing_probe_deletes_entry_and_recompiles(monkeypatch):
    """When the probe dies, the entry is removed and jax recompiles."""
    cdir = _cache_dir()
    before = set(os.listdir(cdir)) if os.path.isdir(cdir) else set()
    _compile_unique(2.5)
    after = set(os.listdir(cdir)) if os.path.isdir(cdir) else set()
    new = [f for f in after - before if f.endswith("-cache")]
    if not new:
        pytest.skip("program too fast to be persisted on this machine")
    path = os.path.join(cdir, new[0])

    monkeypatch.setattr(cacheguard, "_probe_entry", lambda _p: False)
    # a fresh process would hit the cache for the same program; simulate
    # the read through the guarded entry point directly
    from jax._src import compilation_cache as cc
    backend = jax.devices("cpu")[0].client
    key = new[0][: -len("-cache")]
    from jax._src.lib import xla_client
    devs = xla_client.DeviceList(tuple(backend.local_devices()[:1]))
    ex, t = cc.get_executable_and_time(key, xla_client.CompileOptions(),
                                       backend, devs)
    assert ex is None and t is None        # treated as a miss
    assert not os.path.exists(path)        # poisoned entry removed


def test_guard_is_installed():
    from jax._src import compilation_cache as cc
    assert cc.get_executable_and_time.__name__ == "_guarded_get"
