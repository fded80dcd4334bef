"""Crash-guard for JAX's persistent compilation cache on XLA:CPU.

This jax build's XLA:CPU AOT executable (de)serialization is unsound for
some programs: ``executable.serialize()`` can SIGSEGV outright (guarded by
the write-side compile-time cap in ``tests/conftest.py``), and — worse — a
serialize that *appears* to succeed can produce a blob whose
``deserialize_executable`` SIGSEGVs a later process (observed at
``jax/_src/compilation_cache.py get_executable_and_time`` during
``tests/test_render.py``, round 3). A segfault in native code cannot be
caught in-process, so the read path is guarded the only way that works:

  * every cache HIT is first deserialized by a sacrificial subprocess
    (one persistent probe server per session, ~2-4 s one-time startup);
  * if the probe survives (any Python-level outcome, success or clean
    exception), the parent proceeds to deserialize in-process;
  * if the probe dies or hangs, the parent DELETES the poisoned cache
    entry and reports a miss — the program simply recompiles.

Deserialize works with default ``CompileOptions`` and the probe's own
device list (verified empirically): the crash lives in parsing the AOT
blob itself, which is exactly what the probe exercises. Misses don't pay
a probe round-trip (the entry file's existence is checked first).

Activate with ``install()`` (idempotent). CPU backend only — the TPU
cache path has not shown this failure mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading

_PROBE_TIMEOUT_FIRST = 240.0   # first request waits for jax import
_PROBE_TIMEOUT = 60.0

_SERVER_SRC = r'''
import json, os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

from jax._src import compilation_cache as cc
from jax._src.lib import xla_client

backend = jax.devices("cpu")[0].client
devs = xla_client.DeviceList(tuple(backend.local_devices()))

print("READY", flush=True)
for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    req = json.loads(line)
    try:
        with open(req["path"], "rb") as f:
            blob = f.read()
        ex = cc.decompress_executable(blob)
        ser, _t = cc.extract_executable_and_time(ex)
        backend.deserialize_executable(ser, devs, xla_client.CompileOptions())
        print("ok", flush=True)
    except Exception as e:      # clean failure != crash: parent proceeds
        print("err " + type(e).__name__, flush=True)
'''

_state = {"proc": None, "lock": threading.Lock(), "installed": False,
          "first": True}


def _start_server():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # match the parent's virtual-device topology (harmless if unused)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    # the probe must never write to (or race) the parent's cache
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    proc = subprocess.Popen(
        [sys.executable, "-c", _SERVER_SRC], env=env,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    _state["first"] = True
    return proc


def _readline_with_timeout(proc, timeout):
    """Read one stdout line; None on timeout/EOF (probe hung or died)."""
    out = []

    def reader():
        out.append(proc.stdout.readline())

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    t.join(timeout)
    if not out or not out[0]:
        return None
    return out[0].strip()


def _probe_entry(path: str) -> bool:
    """True iff a sacrificial subprocess survives deserializing `path`."""
    with _state["lock"]:
        proc = _state["proc"]
        if proc is None or proc.poll() is not None:
            proc = _state["proc"] = _start_server()
            ready = _readline_with_timeout(proc, _PROBE_TIMEOUT_FIRST)
            if ready != "READY":
                # probe infrastructure itself is broken; fail open
                # (in-process deserialize) rather than disabling the cache
                _kill(proc)
                _state["proc"] = None
                return True
        try:
            proc.stdin.write(json.dumps({"path": path}) + "\n")
            proc.stdin.flush()
        except (BrokenPipeError, OSError):
            _kill(proc)
            _state["proc"] = None
            return False
        timeout = _PROBE_TIMEOUT_FIRST if _state["first"] else _PROBE_TIMEOUT
        _state["first"] = False
        resp = _readline_with_timeout(proc, timeout)
        if resp is None:                    # crashed or hung on this entry
            _kill(proc)
            _state["proc"] = None
            return False
        return True


def _kill(proc):
    try:
        proc.kill()
        proc.wait(timeout=10)
    except Exception:
        pass


def install():
    """Wrap compilation-cache reads with the subprocess probe."""
    if _state["installed"]:
        return
    _state["installed"] = True

    from jax._src import compilation_cache as _cc

    _orig_get = _cc.get_executable_and_time

    def _guarded_get(cache_key, compile_options, backend, executable_devices):
        if getattr(backend, "platform", "") != "cpu":
            return _orig_get(cache_key, compile_options, backend,
                             executable_devices)
        cache = _cc._get_cache(backend)
        if cache is None:
            return None, None
        path = os.path.join(str(getattr(cache, "path", "")),
                            f"{cache_key}-cache")
        if not os.path.exists(path):        # plain miss — no probe cost
            return None, None
        if not _probe_entry(path):
            try:
                os.remove(path)
            except OSError:
                pass
            sys.stderr.write(
                f"[tpusky cacheguard] poisoned compilation-cache entry "
                f"removed (deserialize crashed a probe): {path}\n")
            return None, None
        return _orig_get(cache_key, compile_options, backend,
                         executable_devices)

    _cc.get_executable_and_time = _guarded_get


def shutdown():
    with _state["lock"]:
        proc = _state["proc"]
        if proc is not None:
            try:
                proc.stdin.close()
            except Exception:
                pass
            _kill(proc)
            _state["proc"] = None
