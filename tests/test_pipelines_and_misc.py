import numpy as np
import pytest

from jointimagegeneration_tpu.data.pipelines import build_transforms
from jointimagegeneration_tpu.utils.misc import archive_code, count_params, set_host_seeds


def _item(h=20, w=24):
    rng = np.random.default_rng(0)
    return {
        "image": rng.random((h, w, 1)).astype(np.float32),
        "label": rng.integers(0, 4, (h, w)).astype(np.int32),
    }


def test_build_transforms_reference_pipeline():
    # the checked-in pipeline: flip, resize, colorjitter, torchvision_normalise
    pipe = build_transforms(
        ["flip", "resize", "colorjitter", "torchvision_normalise"],
        {"target_size": (16, 16)},
    )
    rng = np.random.default_rng(1)
    out = pipe(_item(), rng)
    assert out["image"].shape == (16, 16, 1)
    assert out["label"].shape == (16, 16)
    # normalised to ~[-1, 1]
    assert out["image"].min() >= -1.0 - 1e-5 and out["image"].max() <= 1.0 + 1e-5
    # labels preserved exactly (nearest)
    assert set(np.unique(out["label"])) <= {0, 1, 2, 3}


def test_random_crop_class_ratio():
    pipe = build_transforms(["randomcrop"], {"target_size": (8, 8), "cat_max_ratio": 0.99})
    rng = np.random.default_rng(2)
    out = pipe(_item(), rng)
    assert out["image"].shape == (8, 8, 1)
    assert out["label"].shape == (8, 8)


def test_random_scale_changes_size():
    pipe = build_transforms(["randomscale"], {"scale_range": (2.0, 2.0)})
    rng = np.random.default_rng(3)
    out = pipe(_item(10, 10), rng)
    assert out["image"].shape == (20, 20, 1)


def test_pad():
    pipe = build_transforms(["pad"], {"target_size": (32, 32)})
    out = pipe(_item(20, 24), np.random.default_rng(4))
    assert out["image"].shape == (32, 32, 1)


def test_archive_code(tmp_path):
    out = archive_code(tmp_path)
    import tarfile

    with tarfile.open(out) as t:
        names = t.getnames()
    assert any("jointimagegeneration_tpu" in n for n in names)


def test_set_host_seeds():
    set_host_seeds(7)
    a = np.random.rand()
    set_host_seeds(7)
    assert np.random.rand() == a
