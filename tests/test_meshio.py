"""PLY / Mitsuba-serialized mesh reader tests (reference `src/shapes/
ply.cpp`, `serialized.cpp:196-410` format semantics)."""

import struct
import zlib

import numpy as np

from tpusky.utils.meshio import read_ply, read_serialized, write_serialized

_QUAD_POS = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
_QUAD_UV = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
_QUAD_IDX = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)


def test_ply_ascii(tmp_path):
    p = tmp_path / "quad.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float u\nproperty float v\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0 0\n1 0 0 1 0\n1 1 0 1 1\n0 1 0 0 1\n"
        "4 0 1 2 3\n")
    pos, nrm, idx, uv, col = read_ply(str(p))
    np.testing.assert_allclose(pos, _QUAD_POS)
    np.testing.assert_allclose(uv, _QUAD_UV)
    np.testing.assert_array_equal(idx, _QUAD_IDX)  # quad fan-triangulated


def test_ply_binary(tmp_path):
    p = tmp_path / "tri.ply"
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 3\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property float nx\nproperty float ny\nproperty float nz\n"
              b"element face 1\n"
              b"property list uchar uint vertex_indices\n"
              b"end_header\n")
    verts = np.asarray([[0, 0, 0, 0, 0, 1],
                        [1, 0, 0, 0, 0, 1],
                        [0, 1, 0, 0, 0, 1]], np.float32)
    body = verts.tobytes() + struct.pack("<B3I", 3, 0, 1, 2)
    p.write_bytes(header + body)
    pos, nrm, idx, uv, col = read_ply(str(p))
    np.testing.assert_allclose(pos, verts[:, :3])
    np.testing.assert_allclose(nrm, verts[:, 3:])
    np.testing.assert_array_equal(idx, [[0, 1, 2]])


def test_serialized_roundtrip(tmp_path):
    p = str(tmp_path / "quad.serialized")
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    write_serialized(p, _QUAD_POS, _QUAD_IDX, normals=nrm, uvs=_QUAD_UV)
    pos, n, idx, uv = read_serialized(p)
    np.testing.assert_allclose(pos, _QUAD_POS)
    np.testing.assert_allclose(n, nrm)
    np.testing.assert_allclose(uv, _QUAD_UV)
    np.testing.assert_array_equal(idx, _QUAD_IDX)


def test_serialized_face_normals_flag(tmp_path):
    p = str(tmp_path / "quad.serialized")
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    write_serialized(p, _QUAD_POS, _QUAD_IDX, normals=nrm)
    _, n, _, _ = read_serialized(p, face_normals=True)
    assert (n == 0).all()    # vertex normals skipped like the reference


def test_serialized_double_precision(tmp_path):
    # hand-build a v3 double-precision single-mesh file
    p = str(tmp_path / "tri.serialized")
    flags = 0x2000
    payload = (struct.pack("<I", flags)
               + struct.pack("<QQ", 3, 1)
               + np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                            np.float64).tobytes()
               + np.asarray([[0, 1, 2]], np.uint32).tobytes())
    blob = struct.pack("<HH", 0x041C, 3) + zlib.compress(payload)
    with open(p, "wb") as f:
        f.write(blob)
        f.write(struct.pack("<I", 0))    # v3: u32 offsets
        f.write(struct.pack("<I", 1))
    pos, _, idx, _ = read_serialized(p)
    np.testing.assert_allclose(pos, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(idx, [[0, 1, 2]])


def test_loader_ply_scene(tmp_path):
    from tpusky.render.loader import load_dict
    p = tmp_path / "floor.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "-5 -5 0\n5 -5 0\n5 5 0\n-5 5 0\n"
        "3 0 1 2\n3 0 2 3\n")
    bundle = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"height": 16, "width": 16},
                   "sampler": {"sample_count": 8}},
        "env": {"type": "constant", "radiance": 1.0},
        "floor": {"type": "ply", "filename": str(p),
                  "bsdf": {"type": "diffuse", "reflectance": 0.5}},
    })
    img = np.asarray(bundle.render(seed=0))
    assert abs(img.mean() - 0.5) < 0.05, img.mean()
