"""Ray-block x tile AABB culling vs the dense tiled Möller–Trumbore.

Culling only skips work (a skipped tile is one no ray in the block can
enter), so the culled result must be EXACTLY the dense result — same
winning triangle, same t, same barycentrics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpusky.render import mesh as mesh_mod
from tpusky.render.mesh import make_mesh_table, mesh_intersect, mesh_test
from tpusky.render.sensors import make_perspective, perspective_ray


def _uvsphere(subdiv):
    nu, nv = 16 * subdiv, 8 * subdiv
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(1e-3, np.pi - 1e-3, nv)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    pts = np.stack([np.sin(vv) * np.cos(uu), np.sin(vv) * np.sin(uu),
                    np.cos(vv)], -1).reshape(-1, 3)
    idx = []
    for i in range(nu):
        for j in range(nv - 1):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            idx.append([a, b, a + 1])
            idx.append([b, b + 1, a + 1])
    return pts.astype(np.float32), np.asarray(idx, np.int32)


def test_culled_equals_dense(monkeypatch):
    pos, idx = _uvsphere(4)                      # ~4k triangles
    mt = make_mesh_table([dict(positions=pos, indices=idx, bsdf_idx=0)])
    monkeypatch.setattr(mesh_mod, "_RAY_BLOCK", 512)
    sensor = make_perspective([0, -4, 0.5], [0, 0, 0], fov_x_deg=45)
    w = h = 64
    yy, xx = np.mgrid[0:h, 0:w]
    uv = jnp.asarray(np.stack([(xx + 0.5) / w, (yy + 0.5) / h],
                              -1).reshape(-1, 2), jnp.float32)
    o, d = perspective_ray(sensor, uv)

    monkeypatch.setattr(mesh_mod, "_CULL_MIN_TRIS", 512)
    t_c, n_c, _, b1c, b2c, tri_c, hit_c = mesh_intersect(mt, o, d)
    occ_c = mesh_test(mt, o, d, jnp.full(o.shape[:-1], jnp.inf))
    monkeypatch.setattr(mesh_mod, "_CULL_MIN_TRIS", 10 ** 9)
    t_d, n_d, _, b1d, b2d, tri_d, hit_d = mesh_intersect(mt, o, d)
    occ_d = mesh_test(mt, o, d, jnp.full(o.shape[:-1], jnp.inf))

    assert bool((np.asarray(hit_c) == np.asarray(hit_d)).all())
    assert np.asarray(hit_c).sum() > 100        # scene actually hit
    m = np.asarray(hit_c)
    np.testing.assert_array_equal(np.asarray(tri_c)[m],
                                  np.asarray(tri_d)[m])
    np.testing.assert_array_equal(np.asarray(t_c)[m], np.asarray(t_d)[m])
    np.testing.assert_array_equal(np.asarray(b1c)[m], np.asarray(b1d)[m])
    np.testing.assert_array_equal(np.asarray(occ_c), np.asarray(occ_d))


def test_morton_order_preserves_interp():
    """Morton reordering permutes uv/normals consistently with tri ids."""
    pos, idx = _uvsphere(2)
    uvs = np.random.RandomState(0).rand(len(pos), 2).astype(np.float32)
    mt = make_mesh_table([dict(positions=pos, indices=idx, uvs=uvs,
                               bsdf_idx=0)])
    # every triangle's stored corners must match SOME input triangle
    v0 = np.asarray(mt.v0)[np.asarray(mt.valid)]
    tri_in = pos[idx]
    in_set = {tuple(np.round(t[0], 5)) for t in tri_in}
    got = {tuple(np.round(v, 5)) for v in v0}
    assert got <= in_set


def test_ray_sort_order_roundtrip_and_grouping():
    """The coherence sort is a permutation (unsort restores identity) and
    groups equal-octant rays contiguously; stable for coherent inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpusky.render.mesh import _ray_sort_order, make_mesh_table

    rng = np.random.default_rng(0)
    pos = rng.random((300, 3)).astype(np.float32) * 4 - 2
    idx = rng.integers(0, 300, (256, 3)).astype(np.int32)
    mesh = make_mesh_table([dict(positions=pos, indices=idx, bsdf_idx=0)])

    n = 4096
    o = jnp.asarray(rng.random((n, 3)).astype(np.float32) * 4 - 2)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    order, inv = jax.jit(_ray_sort_order)(mesh, o, d)
    order, inv = np.asarray(order), np.asarray(inv)
    assert np.array_equal(np.sort(order), np.arange(n))
    assert np.array_equal(order[inv], np.arange(n))
    # octants contiguous after the sort
    oct_sorted = np.asarray(((d[:, 0] < 0).astype(np.int32) * 4
                             + (d[:, 1] < 0).astype(np.int32) * 2
                             + (d[:, 2] < 0)))[order]
    changes = np.sum(oct_sorted[1:] != oct_sorted[:-1])
    assert changes <= 7, changes          # 8 groups -> at most 7 switches
    # coherent wavefront (one shared direction, raster-ordered origins in
    # one Morton cell) keeps its original order under the stable sort
    o_coh = jnp.broadcast_to(jnp.asarray([0.001, 0.0, 0.0]), (64, 3))
    d_coh = jnp.broadcast_to(jnp.asarray([0.6, 0.48, 0.64]), (64, 3))
    order2, _ = jax.jit(_ray_sort_order)(mesh, o_coh, d_coh)
    assert np.array_equal(np.asarray(order2), np.arange(64))


def test_mesh_intersect_reorder_matches_direct():
    """Reordered intersection == direct intersection (same hits/normals),
    exercised through the culled CPU path with the sort applied manually."""
    import jax.numpy as jnp
    import numpy as np
    from tpusky.render.mesh import (_ray_sort_order, make_mesh_table,
                                    mesh_intersect)

    rng = np.random.default_rng(1)
    # icosphere-ish random triangle soup around the origin
    pos = rng.normal(size=(600, 3)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    idx = rng.integers(0, 600, (512, 3)).astype(np.int32)
    mesh = make_mesh_table([dict(positions=pos, indices=idx, bsdf_idx=0)])

    n = 2048
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (rng.normal(size=(n, 3)).astype(np.float32) * 0.1
         + np.float32(2.0)) * -d        # rays converge toward the soup
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = mesh_intersect(mesh, o, d)
    order, inv = _ray_sort_order(mesh, o, d)
    out_sorted = mesh_intersect(mesh, o[order], d[order])
    for a, b in zip(ref, out_sorted):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(b)[np.asarray(inv)],
                                   rtol=1e-6, atol=1e-6)
