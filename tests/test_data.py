import json

import numpy as np
import pytest

from jointimagegeneration_tpu.data import read_nifti, write_nifti
from jointimagegeneration_tpu.data.classes import (
    NUM_CLASSES,
    class_color_map,
    labels_to_colors,
    remap_totalseg_labels,
)
from jointimagegeneration_tpu.data.datasets import (
    RuijinMaskDataset,
    SyntheticMaskDataset,
    SyntheticSliceDataset,
    train_val_split,
)
from jointimagegeneration_tpu.data.loader import DataLoader
from jointimagegeneration_tpu.data.transforms import crop_or_pad, one_hot_np, window_norm


def test_nifti_roundtrip(tmp_path):
    for dtype in [np.uint8, np.int16, np.float32]:
        vol = (np.random.default_rng(0).random((5, 7, 9)) * 100).astype(dtype)
        for name in ["a.nii", "a.nii.gz"]:
            p = tmp_path / name
            write_nifti(p, vol, spacing=(1.5, 0.8, 0.8))
            back, info = read_nifti(p)
            np.testing.assert_array_equal(back, vol)
            assert info["spacing"] == pytest.approx((1.5, 0.8, 0.8))


def test_nifti_4d_roundtrip(tmp_path):
    vol = np.random.default_rng(1).random((3, 4, 5, 2)).astype(np.float32)
    p = tmp_path / "b.nii.gz"
    write_nifti(p, vol)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, vol)


def test_remap_totalseg():
    lab = np.array([0, 1, 5, 57, 104, 42])
    out = remap_totalseg_labels(lab)
    np.testing.assert_array_equal(out, [0, 1, 4, 9, 10, 0])
    tumor = np.array([0, 0, 0, 0, 0, 1])
    out2 = remap_totalseg_labels(lab, tumor)
    assert out2[-1] == NUM_CLASSES - 1


def test_color_map():
    cm = class_color_map()
    assert cm.shape == (12, 3)
    rgb = labels_to_colors(np.array([[0, 11]]))
    np.testing.assert_array_equal(rgb[0, 0], (0, 0, 0))
    np.testing.assert_array_equal(rgb[0, 1], (0, 255, 0))


def test_window_norm():
    img = np.array([-1000.0, -120.0, 60.0, 240.0, 3000.0])
    out = window_norm(img)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_crop_or_pad():
    v = np.ones((4, 6))
    out = crop_or_pad(v, (8, 4))
    assert out.shape == (8, 4)
    assert out[:2].sum() == 0  # padded
    assert out[2:6].sum() == 4 * 4


def test_train_val_split_deterministic():
    keys = [f"c{i}" for i in range(20)]
    t1, v1 = train_val_split(keys, 0.1, seed=3)
    t2, v2 = train_val_split(keys, 0.1, seed=3)
    assert t1 == t2 and v1 == v2
    assert set(t1) | set(v1) == set(keys)
    assert not set(t1) & set(v1)


def test_synthetic_mask_dataset():
    ds = SyntheticMaskDataset(num_cases=3, volume_shape=(8, 16, 16), num_classes=5)
    item = ds[0]
    assert item["mask"].shape == (8, 16, 16, 5)
    np.testing.assert_allclose(item["mask"].sum(-1), 1.0)
    assert item["image"].shape == (8, 16, 16, 1)
    # determinism
    np.testing.assert_array_equal(ds[1]["mask"], ds[1]["mask"])


def test_synthetic_slice_dataset_volumes():
    ds = SyntheticSliceDataset(num_cases=2, slice_shape=(16, 16), depth=4, include_volumes=True)
    item = ds[0]
    assert item["image"].shape == (16, 16, 1)
    assert item["cond"].shape == (16, 16, 2)
    assert item["wholemask"].shape == (4, 16, 16, 1)
    assert 0 <= item["image"].min() and item["image"].max() <= 1


def test_ruijin_mask_dataset_from_index(tmp_path):
    # build a fake two-case index with our own NIfTI writer
    rng = np.random.default_rng(0)
    index = {}
    for name in ["case1", "case2"]:
        seg = rng.choice([0, 1, 5, 57], size=(6, 10, 10)).astype(np.int16)
        tumor = (rng.random((6, 10, 10)) > 0.9).astype(np.uint8)
        write_nifti(tmp_path / f"{name}_seg.nii.gz", seg)
        write_nifti(tmp_path / f"{name}_crc.nii.gz", tumor)
        index[name] = {"totalseg": f"{name}_seg.nii.gz", "crcseg": f"{name}_crc.nii.gz"}
    ipath = tmp_path / "index.json"
    ipath.write_text(json.dumps(index))

    ds = RuijinMaskDataset(str(ipath), split="train", volume_shape=(4, 8, 8), val_fraction=0.5, augment=False)
    assert len(ds) == 1
    item = ds[0]
    assert item["mask"].shape == (4, 8, 8, NUM_CLASSES)
    np.testing.assert_allclose(item["mask"].sum(-1), 1.0)


def test_dataloader_batching_and_epochs():
    ds = SyntheticMaskDataset(num_cases=6, volume_shape=(2, 4, 4), num_classes=3)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0, num_workers=1)
    assert len(dl) == 3
    b1 = list(dl)
    assert len(b1) == 3
    assert b1[0]["mask"].shape == (2, 2, 4, 4, 3)
    # epoch-dependent shuffling (set_epoch semantics)
    b2 = list(dl)
    names1 = [n for b in b1 for n in b["casename"]]
    names2 = [n for b in b2 for n in b["casename"]]
    assert sorted(names1) == sorted(names2)
    assert names1 != names2


def test_dataloader_rejects_batch_larger_than_dataset():
    import pytest as _pytest

    ds = SyntheticMaskDataset(num_cases=2, volume_shape=(2, 4, 4), num_classes=3)
    with _pytest.raises(ValueError, match="smaller than batch_size"):
        DataLoader(ds, batch_size=4)


def test_slice_pair_h5_cache_concurrent_and_epoch_rng(tmp_path):
    """The h5 cache survives concurrent loader workers (handle is shared
    across threads behind a lock) and the per-item RNG is epoch-varying
    yet exactly reproducible — regression for the shared-Generator and
    check-then-open races."""
    from jointimagegeneration_tpu.data.datasets import RuijinSlicePairDataset

    rng = np.random.default_rng(3)
    index = {}
    for name in ["a", "b", "c", "d"]:
        img = rng.normal(0, 100, (5, 8, 8)).astype(np.float32)
        seg = rng.choice([0, 1, 5], (5, 8, 8)).astype(np.int16)
        write_nifti(tmp_path / f"{name}_img.nii.gz", img)
        write_nifti(tmp_path / f"{name}_seg.nii.gz", seg)
        index[name] = {"image": f"{name}_img.nii.gz", "totalseg": f"{name}_seg.nii.gz"}
    ipath = tmp_path / "index.json"
    ipath.write_text(json.dumps(index))

    def build():
        return RuijinSlicePairDataset(
            str(ipath), split="train", slice_shape=(8, 8), val_fraction=0.25,
            cache_h5=str(tmp_path / "cache.h5"), seed=5)

    ds = build()
    dl = DataLoader(ds, batch_size=1, shuffle=False, seed=0, num_workers=3)
    epoch1 = [np.asarray(b["image"]) for b in dl]   # epoch 0: builds cache under contention
    epoch2 = [np.asarray(b["image"]) for b in dl]   # epoch 1: cache hits + new z draws

    # same pipeline re-run from scratch reproduces epoch 0 exactly
    ds2 = build()
    dl2 = DataLoader(ds2, batch_size=1, shuffle=False, seed=0, num_workers=3)
    epoch1_again = [np.asarray(b["image"]) for b in dl2]
    for x, y in zip(epoch1, epoch1_again):
        np.testing.assert_array_equal(x, y)
    # epochs differ (z re-drawn per epoch) for at least one item
    assert any(not np.array_equal(x, y) for x, y in zip(epoch1, epoch2))


def test_filelist_dataset_absolute_glob(tmp_path):
    from jointimagegeneration_tpu.data.generic import FileListDataset

    for i in range(3):
        np.save(tmp_path / f"f{i}.npy", np.full((2, 2), i, np.float32))
    ds = FileListDataset(str(tmp_path / "*.npy"))  # absolute glob pattern
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[1]["image"], np.full((2, 2), 1, np.float32))
