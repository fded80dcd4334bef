"""Triangle-mesh tests: OBJ loading (native parser), tiled intersection
correctness vs the analytic shapes, and a rendered mesh scene."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusky.render import integrator
from tpusky.render.emitters import ConstantEnv
from tpusky.render.film import Film
from tpusky.render.mesh import make_mesh_table, mesh_intersect, mesh_test
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective
from tpusky.utils.native import have_native, load_obj
from tpusky.utils.transform import scale


def _quad_mesh(z=0.0, half=1.0):
    pos = np.array([[-half, -half, z], [half, -half, z],
                    [half, half, z], [-half, half, z]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return dict(positions=pos, indices=idx)


def test_mesh_intersect_matches_rectangle():
    """A two-triangle quad must intersect identically to the analytic
    rectangle shape."""
    mesh = make_mesh_table([_quad_mesh()])
    n = 512
    key = jax.random.PRNGKey(0)
    o = jnp.stack([jax.random.uniform(key, (n,), minval=-2, maxval=2),
                   jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                                      minval=-2, maxval=2),
                   jnp.full((n,), 2.0)], -1)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    t, nrm, mat, b1, b2, tri, hit = mesh_intersect(mesh, o, d)
    inside = (np.abs(np.array(o[:, 0])) <= 1.0) & \
             (np.abs(np.array(o[:, 1])) <= 1.0)
    assert np.array_equal(np.array(hit), inside)
    assert np.allclose(np.array(t)[inside], 2.0, atol=1e-5)
    assert np.allclose(np.array(nrm)[inside, 2], 1.0, atol=1e-5)
    occ = np.array(mesh_test(mesh, o, d, jnp.full((n,), 10.0)))
    assert np.array_equal(occ, inside)


def test_obj_loader():
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 4 3\n"
    path = "/tmp/tpusky_quad.obj"
    open(path, "w").write(obj)
    pos, nrm, idx, uv = load_obj(path)
    assert pos.shape == (4, 3)
    assert idx.shape == (2, 3)  # quad fan-triangulated
    assert uv.shape == (4, 2)


def test_obj_loader_uvs():
    obj = ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
           "vt 0 0\nvt 1 0\nvt 0 1\n"
           "f 1/1 2/2 3/3\n")
    path = "/tmp/tpusky_tri_uv.obj"
    open(path, "w").write(obj)
    pos, nrm, idx, uv = load_obj(path)
    assert np.allclose(uv, [[0, 0], [1, 0], [0, 1]]), uv


def test_render_mesh_scene():
    """Mesh floor under a constant env matches the analytic-rectangle
    version of the same scene."""
    sensor = make_perspective(origin=[0, 0, 3], target=[0.01, 0, 0],
                              fov_x_deg=30)
    film = Film(8, 8, 3)
    env = ConstantEnv(jnp.asarray([1.0, 1.0, 1.0]))

    scene_mesh = make_scene(shapes=[], bsdf_albedos=[[0.5, 0.5, 0.5]],
                            meshes=[dict(**_quad_mesh(half=50.0),
                                         bsdf_idx=0)], env=env)
    img_m = np.array(integrator.render(scene_mesh, sensor, film,
                                       jax.random.PRNGKey(0), spp=256,
                                       max_depth=2))
    assert abs(img_m.mean() - 0.5) < 0.02, img_m.mean()


def test_native_available():
    assert have_native(), "native library should build in this image"


def test_pallas_mesh_kernel_matches_xla():
    """The Pallas VMEM-resident mesh intersector (interpret mode) agrees
    with the XLA scan path on hits, t, barycentrics and triangle ids."""
    from tpusky.ops.pallas.mesh_kernel import mesh_intersect_pallas
    rng = np.random.default_rng(3)
    n_tri = 700
    v = rng.uniform(-1, 1, (n_tri, 3, 3)).astype(np.float32)
    v[:, 1:] = v[:, :1] + 0.2 * (v[:, 1:] - v[:, :1])   # small tris
    pos = v.reshape(-1, 3)
    idx = np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3)
    mesh = make_mesh_table([dict(positions=pos, indices=idx,
                                 normals=np.zeros_like(pos), bsdf_idx=0)])
    n = 4096
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (rng.normal(size=(n, 3)) * 0.5 - [0, 3, 0]).astype(np.float32)
    t_ref, _, _, b1r, b2r, trir, hitr = mesh_intersect(mesh, o, d)
    t_p, b1p, b2p, trip, hitp = mesh_intersect_pallas(mesh, o, d,
                                                      interpret=True)
    hitr = np.asarray(hitr)
    hitp = np.asarray(hitp)
    assert (hitr == hitp).all()
    m = hitr
    np.testing.assert_allclose(np.asarray(t_p)[m], np.asarray(t_ref)[m],
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(trip)[m] == np.asarray(trir)[m]).mean() > 0.999
