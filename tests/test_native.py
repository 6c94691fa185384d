"""Native C++ data-path library vs the pure-Python implementations."""

import numpy as np
import pytest

from jointimagegeneration_tpu.data.native import (
    native_available,
    one_hot_native,
    read_nifti_native,
    remap_labels_native,
    window_norm_native,
)
from jointimagegeneration_tpu.data.nifti import read_nifti, write_nifti
from jointimagegeneration_tpu.data.classes import TOTALSEG_DESIGNATED_LABELS, remap_totalseg_labels
from jointimagegeneration_tpu.data.transforms import one_hot_np, window_norm

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib not built")


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32, np.float64])
def test_native_read_matches_python(tmp_path, dtype):
    rng = np.random.default_rng(0)
    vol = (rng.random((6, 10, 14)) * 200 - 50).astype(dtype)
    for name in ["v.nii", "v.nii.gz"]:
        p = tmp_path / name
        write_nifti(p, vol, spacing=(2.0, 1.0, 0.5))
        py_vol, py_info = read_nifti(p)
        res = read_nifti_native(p)
        assert res is not None
        na_vol, na_info = res
        np.testing.assert_allclose(na_vol, py_vol.astype(np.float32))
        assert na_info["spacing"] == pytest.approx(py_info["spacing"])


def test_native_window_norm():
    img = np.array([-1000.0, -120.0, 60.0, 240.0, 3000.0], np.float32)
    out = window_norm_native(img.copy())
    np.testing.assert_allclose(out, window_norm(img), atol=1e-6)


def test_native_remap_labels():
    rng = np.random.default_rng(1)
    seg = rng.choice([0, 1, 5, 57, 104, 42], size=(5, 6, 7)).astype(np.float32)
    tumor = (rng.random((5, 6, 7)) > 0.8).astype(np.float32)
    out = remap_labels_native(seg, tumor, TOTALSEG_DESIGNATED_LABELS, 11)
    ref = remap_totalseg_labels(seg.astype(np.int32), tumor)
    np.testing.assert_array_equal(out, ref)


def test_native_one_hot():
    labels = np.random.default_rng(2).integers(0, 4, (5, 6)).astype(np.int32)
    out = one_hot_native(labels, 4)
    np.testing.assert_array_equal(out, one_hot_np(labels, 4))


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_native_write_roundtrip(tmp_path, suffix):
    """jig_write_nifti is byte-compatible with the Python codec: python
    read recovers data, spacing, and affine exactly; u8 labels take the
    generic transpose path, f32 volumes the fused hot path."""
    from jointimagegeneration_tpu.data.native import write_nifti_native

    rng = np.random.default_rng(0)
    vol = rng.random((7, 9, 11), np.float32)
    aff = np.diag([2.0, 3.0, 4.0, 1.0]).astype(np.float32)
    aff[0, 3] = 5.0
    p = tmp_path / f"v{suffix}"
    assert write_nifti_native(p, vol, spacing=(2, 3, 4), affine=aff)
    back, info = read_nifti(p)
    np.testing.assert_array_equal(back, vol)
    assert info["spacing"] == (2.0, 3.0, 4.0)
    np.testing.assert_array_equal(info["affine"], aff)

    lab = rng.integers(0, 12, (5, 6, 7)).astype(np.uint8)
    p2 = tmp_path / f"l{suffix}"
    assert write_nifti_native(p2, lab)
    back2, _ = read_nifti(p2)
    assert back2.dtype == np.uint8
    np.testing.assert_array_equal(back2, lab)


@pytest.mark.parametrize("shape", [(13,), (13, 17), (3, 4, 5, 6)])
def test_native_write_ndim_paths(tmp_path, shape):
    from jointimagegeneration_tpu.data.native import write_nifti_native

    a = np.random.default_rng(1).random(shape, np.float32)
    p = tmp_path / "a.nii.gz"
    assert write_nifti_native(p, a)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, a)


def test_write_nifti_routes_native_and_python_agree(tmp_path):
    """write_nifti (the public entry every writer uses) produces files the
    reader decodes identically whether the native or Python codec wrote
    them — and the native reader decodes the native writer's output too."""
    vol = np.random.default_rng(2).random((6, 8, 10), np.float32)
    write_nifti(tmp_path / "routed.nii.gz", vol, spacing=(1, 2, 3))  # native-routed
    a, ia = read_nifti(tmp_path / "routed.nii.gz")
    nb = read_nifti_native(tmp_path / "routed.nii.gz")
    assert nb is not None
    np.testing.assert_array_equal(a, vol)
    np.testing.assert_array_equal(nb[0], vol)
    assert nb[1]["spacing"] == ia["spacing"] == (1.0, 2.0, 3.0)
