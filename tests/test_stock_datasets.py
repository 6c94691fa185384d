"""Stock dataset classes (LSUN txt-filelist + local ImageNet + SR):
capability parity with ldm/data/lsun.py and ldm/data/imagenet.py."""

import numpy as np
import pytest

from jointimagegeneration_tpu.data.stock import ImageNetLocal, LSUNBase, SRDataset, lsun_dataset

pytestmark = pytest.mark.fast


def _write_png(path, h=40, w=32, seed=0):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(str(path))


def test_lsun_base_contract(tmp_path):
    root = tmp_path / "lsun"
    for i in range(3):
        _write_png(root / f"img_{i}.png", h=40 + i, w=32, seed=i)
    txt = tmp_path / "list.txt"
    txt.write_text("\n".join(f"img_{i}.png" for i in range(3)) + "\n")
    ds = LSUNBase(str(txt), str(root), size=16, flip_p=0.5)
    assert len(ds) == 3
    item = ds[1]
    assert item["relative_file_path_"] == "img_1.png"
    assert item["image"].shape == (16, 16, 3)
    assert item["image"].dtype == np.float32
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    # deterministic per (epoch, index): same item twice is identical
    np.testing.assert_array_equal(ds[1]["image"], ds[1]["image"])
    # known factory splits exist; unknown raises
    with pytest.raises(ValueError, match="unknown LSUN split"):
        lsun_dataset("churches", "test")


def test_imagenet_local_labels_and_filtering(tmp_path):
    root = tmp_path / "inet"
    for syn in ("n01440764", "n01443537"):
        for j in range(2):
            _write_png(root / syn / f"{syn}_{j}.JPEG", seed=j)
    # the reference's corrupt-file ignore entry is honored
    _write_png(root / "n06596364" / "n06596364_9591.JPEG")
    (root / "synset_human.txt").write_text("n01440764 tench\nn01443537 goldfish\n")
    ds = ImageNetLocal(str(root), size=16)
    assert len(ds) == 4  # ignore entry filtered
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["synset"] == "n01440764" and item["human_label"] == "tench"
    assert sorted({ds[i]["class_label"] for i in range(4)}) == [0, 1]
    # synset filter (the sub_indices capability)
    ds2 = ImageNetLocal(str(root), size=16, synsets=["n01443537"])
    assert len(ds2) == 2 and all(ds2[i]["synset"] == "n01443537" for i in range(2))
    # process_images=False returns label dicts only (SR wrapper contract)
    ds3 = ImageNetLocal(str(root), process_images=False)
    assert "image" not in ds3[0] and ds3[0]["file_path_"].endswith(".JPEG")


@pytest.mark.parametrize("degradation", ["cv_bicubic", "bsrgan_light"])
def test_sr_dataset(tmp_path, degradation):
    root = tmp_path / "inet"
    for j in range(2):
        _write_png(root / "n01440764" / f"f_{j}.JPEG", h=70, w=90, seed=j)
    base = ImageNetLocal(str(root), process_images=False)
    ds = SRDataset(base, size=32, degradation=degradation, downscale_f=4,
                   min_crop_f=0.5, max_crop_f=1.0, random_crop=True)
    item = ds[0]
    assert item["image"].shape[2] == 3 and min(item["image"].shape[:2]) == 32
    assert min(item["LR_image"].shape[:2]) == 8
    for k in ("image", "LR_image"):
        assert item[k].dtype == np.float32
        assert item[k].min() >= -1.0 and item[k].max() <= 1.0


def test_stock_kinds_config_route(tmp_path):
    """dataset.kind: lsun / imagenet / imagenet_sr route through
    build_slice_dataset; the SR adapter yields the LDM train contract
    (image + bicubic-upsampled LR cond at HR size)."""
    from jointimagegeneration_tpu.cli.common import build_slice_dataset

    root = tmp_path / "inet"
    for j in range(2):
        _write_png(root / "n01440764" / f"f_{j}.JPEG", h=70, w=90, seed=j)
    lsun_root = tmp_path / "lsun"
    _write_png(lsun_root / "a.png", seed=5)
    (tmp_path / "list.txt").write_text("a.png\n")

    ds = build_slice_dataset({"dataset": {
        "kind": "lsun", "txt_file": str(tmp_path / "list.txt"),
        "data_root": str(lsun_root), "size": 16}}, "train")
    assert ds[0]["image"].shape == (16, 16, 3)

    ds = build_slice_dataset({"dataset": {
        "kind": "imagenet", "root": str(root), "size": 16}}, "val")
    assert ds[0]["image"].shape == (16, 16, 3) and ds[0]["class_label"] == 0

    ds = build_slice_dataset({"dataset": {
        "kind": "imagenet_sr", "root": str(root), "size": 32,
        "degradation": "cv_bicubic"}}, "train")
    item = ds[0]
    assert item["image"].shape == item["cond"].shape  # LR upsampled to HR
    assert set(item) == {"image", "cond"}
