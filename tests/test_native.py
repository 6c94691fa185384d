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
