"""Large-mesh intersection scaling benchmark (VERDICT r2 #9).

Generates procedural meshes (subdivided icospheres) at 16k/64k/256k
triangles, fires a coherent camera wavefront plus an incoherent bounce
wavefront at them, and reports rays/s per triangle count. The acceptance
bar: sub-linear scaling (the Morton-tiled culling must not degrade to
O(N) dense Moller-Trumbore).

    python tools/bench_mesh.py            # current backend
    JAX_PLATFORMS=cpu python tools/bench_mesh.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

if "--cpu" in sys.argv:
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import numpy as np
import jax.numpy as jnp


def icosphere(n_subdiv: int):
    """Subdivided icosahedron -> (V, 3), (T, 3) with 20*4^n triangles."""
    t = (1.0 + 5 ** 0.5) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                  [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                  [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int32)
    for _ in range(n_subdiv):
        cache = {}
        verts = list(v)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (verts[a] + verts[b]) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, np.int32)
    return v.astype(np.float32), f


def bench_one(n_subdiv: int, n_rays: int = 1 << 20):
    from tpusky.render.mesh import make_mesh_table, mesh_intersect
    pos, idx = icosphere(n_subdiv)
    mesh = make_mesh_table([dict(positions=pos, indices=idx,
                                 normals=pos.copy(), bsdf_idx=0)])
    n_tris = int(np.asarray(mesh.valid).sum())

    key = jax.random.PRNGKey(0)
    # coherent camera-style wavefront in RASTER ORDER (consecutive rays
    # share a pixel neighbourhood, exactly like the renderer's raygen) —
    # randomly-ordered rays would defeat block-level culling
    side = int(np.sqrt(n_rays))
    ys, xs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    u0 = (xs.ravel() + 0.5) / side * 2 - 1
    u1 = (ys.ravel() + 0.5) / side * 2 - 1
    n_rays = side * side
    o_coh = jnp.stack([jnp.asarray(u0 * 2, jnp.float32),
                       jnp.full((n_rays,), -4.0),
                       jnp.asarray(u1 * 2, jnp.float32)], -1)
    d_coh = jnp.stack([jnp.asarray(-0.2 * u0, jnp.float32),
                       jnp.ones((n_rays,)),
                       jnp.asarray(-0.2 * u1, jnp.float32)], -1)
    d_coh = d_coh / jnp.linalg.norm(d_coh, axis=-1, keepdims=True)
    # incoherent bounce-style wavefront: random origins on the sphere
    # surface, random outward directions
    k2, k3 = jax.random.split(key)
    d_inc = jax.random.normal(k2, (n_rays, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    o_inc = 1.5 * jax.random.normal(k3, (n_rays, 3))
    o_inc = o_inc / jnp.linalg.norm(o_inc, axis=-1, keepdims=True) * 1.3

    isect = jax.jit(lambda o, d: mesh_intersect(mesh, o, d)[0])
    out = {}
    for tag, o, d in [("coherent", o_coh, d_coh),
                      ("incoherent", o_inc, d_inc)]:
        t = jax.block_until_ready(isect(o, d))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            t = isect(o, d)
        jax.block_until_ready(t)
        dt = (time.perf_counter() - t0) / iters
        out[tag] = n_rays / dt
    return n_tris, out


def main():
    for n_subdiv in (4, 5, 6, 7):     # 5120 / 20480 / 81920 / 327680 tris
        n_tris, rates = bench_one(n_subdiv)
        print(json.dumps({"metric": "mesh_isect_rays_per_s",
                          "n_tris": n_tris, "backend": jax.default_backend(),
                          **{k: round(v) for k, v in rates.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
