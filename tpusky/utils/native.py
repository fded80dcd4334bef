"""ctypes bindings for the native support library (native/tpusky_native.cpp).

Auto-builds the shared object on first use when a compiler is available;
every entry point has a pure-Python fallback so the framework stays
functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtpusky_native.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run([os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_parse.restype = ctypes.c_int
    lib.obj_counts.argtypes = [ctypes.POINTER(ctypes.c_int64)] * 2
    lib.obj_copy.argtypes = [ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.obj_copy_uvs.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.pcg32_fill_float.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                     ctypes.c_uint64,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
    return lib


def have_native() -> bool:
    return _lib() is not None


def load_obj(path: str):
    """Parse an OBJ file -> (positions (V,3) f32, normals (V,3) f32,
    indices (T,3) i32, uvs (V,2) f32). Uses the native parser when
    available."""
    lib = _lib()
    if lib is not None:
        if lib.obj_parse(path.encode()) != 0:
            raise FileNotFoundError(path)
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        lib.obj_counts(ctypes.byref(nv), ctypes.byref(nt))
        pos = np.zeros((nv.value, 3), np.float32)
        nrm = np.zeros((nv.value, 3), np.float32)
        idx = np.zeros((nt.value, 3), np.int32)
        uv = np.zeros((nv.value, 2), np.float32)
        lib.obj_copy(pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        lib.obj_copy_uvs(uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        lib.obj_free()
        return pos, nrm, idx, uv
    return _load_obj_py(path)


def _load_obj_py(path: str):
    """Pure-Python OBJ fallback (positions, texcoords, fan-triangulated
    faces; per-vertex uv/normal resolved first-wins like the native path)."""
    positions, texcoords, faces, tfaces = [], [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                positions.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                texcoords.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                verts, tex = [], []
                for tok in line.split()[1:]:
                    parts = tok.split("/")
                    i = int(parts[0])
                    verts.append(i - 1 if i > 0 else len(positions) + i)
                    t = (int(parts[1]) if len(parts) > 1 and parts[1]
                         else 0)
                    tex.append(t - 1 if t > 0
                               else (len(texcoords) + t if t < 0 else -1))
                for k in range(2, len(verts)):
                    faces.append([verts[0], verts[k - 1], verts[k]])
                    tfaces.append([tex[0], tex[k - 1], tex[k]])
    pos = np.asarray(positions, np.float32)
    idx = np.asarray(faces, np.int32).reshape(-1, 3)
    uv = np.zeros((len(positions), 2), np.float32)
    if texcoords:
        tc = np.asarray(texcoords, np.float32)
        ti = np.asarray(tfaces, np.int32).reshape(-1, 3)
        ok = ti >= 0
        uv[idx[ok]] = tc[ti[ok]]
    return pos, np.zeros_like(pos), idx, uv


def pcg32_uniform(initstate: int, initseq: int, n: int, skip: int = 0):
    """n uniform f32 in [0,1) from a PCG32 stream (bit-exact with the
    reference's sampler RNG when available natively)."""
    lib = _lib()
    out = np.zeros((n,), np.float32)
    if lib is not None:
        lib.pcg32_fill_float(initstate, initseq, skip,
                             out.ctypes.data_as(
                                 ctypes.POINTER(ctypes.c_float)), n)
        return out
    # Python fallback of the same PCG32 algorithm
    state = 0
    inc = ((initseq << 1) | 1) & 0xFFFFFFFFFFFFFFFF

    def nxt():
        nonlocal state
        old = state
        state = (old * 6364136223846793005 + inc) & 0xFFFFFFFFFFFFFFFF
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) \
            & 0xFFFFFFFF

    nxt()
    state = (state + initstate) & 0xFFFFFFFFFFFFFFFF
    nxt()
    for _ in range(skip):
        nxt()
    for i in range(n):
        bits = (nxt() >> 9) | 0x3F800000
        out[i] = np.frombuffer(np.uint32(bits).tobytes(),
                               np.float32)[0] - 1.0
    return out
