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
