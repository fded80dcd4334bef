"""I/O round-trip and dataset-shape tests."""

import os

import numpy as np

from tpusky.models.sunsky import constants as C
from tpusky.utils.io import read_exr, write_exr

_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "sunsky",
                     "datasets.npz")


def test_dataset_shapes():
    with np.load(_DATA) as z:
        assert z["sky_params_rgb"].shape == C.SKY_PARAM_SHAPE_RGB
        assert z["sky_params_spec"].shape == C.SKY_PARAM_SHAPE_SPEC
        assert z["sky_rad_rgb"].shape == C.SKY_RAD_SHAPE_RGB
        assert z["sky_rad_spec"].shape == C.SKY_RAD_SHAPE_SPEC
        assert z["sun_rad_rgb"].shape == C.SUN_RAD_SHAPE_RGB
        assert z["sun_rad_spec"].shape == C.SUN_RAD_SHAPE_SPEC
        assert z["sun_ld_spec"].shape == C.SUN_LD_SHAPE
        assert z["tgmm"].shape == C.TGMM_SHAPE
        # TGMM weights of each fitted mixture sum to ~1
        w = z["tgmm"][..., -1].sum(axis=-1)
        assert np.allclose(w, 1.0, atol=1e-3)


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((37, 53, 3)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, img, ["R", "G", "B"])
    out, names = read_exr(path)
    assert sorted(names) == ["B", "G", "R"]
    out = out[..., ::-1]  # file stores alphabetical B, G, R
    assert np.array_equal(out, img)


def test_exr_roundtrip_many_channels(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 16, 10)).astype(np.float32)
    path = str(tmp_path / "t10.exr")
    names = [f"ch{i:02d}" for i in range(10)]
    write_exr(path, img, names)
    out, out_names = read_exr(path)
    assert out_names == names
    assert np.array_equal(out, img)


def test_exr_uncompressed(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "u.exr")
    write_exr(path, img, compress=False)
    out, names = read_exr(path)
    assert np.array_equal(out[..., 0], img)


def test_hdr_roundtrip():
    """RGBE shared-exponent roundtrip: ~1% relative precision (8-bit
    mantissa), exact zeros (reference bitmap.cpp RGBE path)."""
    import tempfile, os
    from tpusky.utils.io import read_hdr, write_hdr
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (17, 23, 3)) ** 2 * 50).astype(np.float32)
    img[3, 4] = 0.0
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.hdr")
        write_hdr(p, img)
        back = read_hdr(p)
    assert back.shape == img.shape
    assert np.all(back[3, 4] == 0.0)
    rel = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True),
                                          1e-9)
    assert rel.max() < 0.01, rel.max()


def test_pfm_roundtrip():
    import tempfile, os
    from tpusky.utils.io import read_pfm, write_pfm
    rng = np.random.default_rng(1)
    img = rng.normal(size=(9, 13, 3)).astype(np.float32)
    gray = rng.normal(size=(5, 7)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        p1, p2 = os.path.join(td, "c.pfm"), os.path.join(td, "g.pfm")
        write_pfm(p1, img); write_pfm(p2, gray)
        np.testing.assert_array_equal(read_pfm(p1), img)
        np.testing.assert_array_equal(read_pfm(p2), gray)


def test_jpg_roundtrip():
    """JPEG write/read (reference `bitmap.cpp` JPEG support): lossy, so
    the gate is approximate recovery of a smooth linear-RGB image."""
    import tempfile
    import os as _os
    from tpusky.utils.io import read_jpg, write_jpg
    h, w = 32, 48
    ys = np.linspace(0, 1, h)[:, None]
    xs = np.linspace(0, 1, w)[None, :]
    img = np.stack([0.2 + 0.6 * ys * np.ones_like(xs),
                    0.1 + 0.5 * xs * np.ones_like(ys),
                    0.4 * np.ones((h, w))], -1).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        p = _os.path.join(td, "t.jpg")
        write_jpg(p, img, quality=95)
        back = read_jpg(p)
    assert back.shape == img.shape and back.dtype == np.float32
    assert np.abs(back - img).mean() < 0.02
    assert np.abs(back - img).max() < 0.12
