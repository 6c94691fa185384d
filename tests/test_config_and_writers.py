import numpy as np
import pytest

from jointimagegeneration_tpu.core.config import Registry, apply_overrides, instantiate, load_yaml_config
from jointimagegeneration_tpu.eval.writers import image_volume_to_grid, labels_to_grid, make_grid


def test_registry_and_instantiate():
    reg = Registry("test")

    @reg.register("adder")
    def make_adder(a, b=1):
        return a + b

    assert instantiate({"target": "adder", "params": {"a": 2, "b": 3}}, reg) == 5
    assert instantiate({"target": "adder", "params": {"a": 2}}, reg) == 3
    with pytest.raises(KeyError, match="unknown target"):
        instantiate({"target": "nope"}, reg)
    with pytest.raises(KeyError, match="duplicate"):
        reg.register("adder")(make_adder)


def test_yaml_merge_and_overrides(tmp_path):
    (tmp_path / "a.yml").write_text("model: {lr: 1.0, depth: 2}\nname: base\n")
    (tmp_path / "b.yml").write_text("model: {lr: 0.5}\n")
    cfg = load_yaml_config(tmp_path / "a.yml", tmp_path / "b.yml", overrides=["model.depth=7", "extra=true"])
    assert cfg["model"]["lr"] == 0.5  # right file wins
    assert cfg["model"]["depth"] == 7  # override wins
    assert cfg["name"] == "base"
    assert cfg["extra"] is True


def test_apply_overrides_parses_yaml_scalars():
    cfg = {}
    apply_overrides(cfg, ["a.b=1.5", "a.c=[1,2]", "d=null"])
    assert cfg["a"]["b"] == 1.5
    assert cfg["a"]["c"] == [1, 2]
    assert cfg["d"] is None
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["noequals"])


def test_make_grid_layout():
    imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(3)]
    grid = make_grid(imgs, ncols=2, pad=1)
    assert grid.shape == (9, 9, 3)  # 2 rows x 2 cols with 1px pad
    assert grid[0, 0, 0] == 0 and grid[0, 5, 0] == 1 and grid[5, 0, 0] == 2


def test_label_and_image_grids():
    labels = np.random.default_rng(0).integers(0, 12, (4, 8, 8))
    g = labels_to_grid(labels, every=2)
    assert g.ndim == 3 and g.shape[-1] == 3
    vol = np.random.default_rng(1).random((4, 8, 8))
    g2 = image_volume_to_grid(vol, every=2)
    assert g2.dtype == np.uint8


def test_summarize_trace_parses_device_lanes(tmp_path):
    """summarize_trace aggregates X-events on /device: lanes only, sorted
    by total time (host-lane python noise excluded), with flop/byte sums
    from the XLA cost-analysis args and category/tf_op grouping."""
    import gzip
    import json as _json

    from jointimagegeneration_tpu.core.logging import summarize_trace

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    conv_args = {
        "hlo_category": "convolution fusion",
        "tf_op": "jit(run)/while/body/closed_call/UNet/res0/conv_general_dilated:",
        "model_flops": "2000000000",
        "bytes_accessed": "500000000",
    }
    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion", "dur": 1500.0, "args": conv_args},
        {"ph": "X", "pid": 3, "name": "fusion", "dur": 500.0, "args": conv_args},
        {"ph": "X", "pid": 3, "name": "copy-done", "dur": 100.0},
        {"ph": "X", "pid": 7, "name": "python_noise", "dur": 9999.0},
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        _json.dump({"traceEvents": events}, f)
    rows = summarize_trace(tmp_path)
    assert rows[0] == ("fusion", 2.0, 2, 4.0, 1.0)  # ms, count, gflop, gbytes
    assert rows[1][0] == "copy-done"
    assert all(r[0] != "python_noise" for r in rows)
    by_cat = summarize_trace(tmp_path, group="category")
    assert by_cat[0][0] == "convolution fusion" and by_cat[0][1] == 2.0
    by_op = summarize_trace(tmp_path, group="tf_op")
    assert by_op[0][0] == "UNet/res0/conv_general_dilated"
    assert summarize_trace(tmp_path / "nothing_here") == []


def test_metric_logger_png_fifo(tmp_path):
    """ImageLogger parity: PNG grids land in <logdir>/images/ with a
    bounded FIFO of max_images files (latentdiffusion/main.py:356,381-385)."""
    from jointimagegeneration_tpu.core.logging import MetricLogger

    lg = MetricLogger(tmp_path / "run")
    img = np.zeros((4, 4, 3), np.uint8)
    for s in range(35):
        lg.image(s, "val/pred", img)
    pngs = sorted((tmp_path / "run" / "images").glob("*.png"))
    assert len(pngs) == lg.max_images
    # oldest unlinked, newest kept
    assert pngs[-1].name == "val_pred_gs-000034.png"
    assert not (tmp_path / "run" / "images" / "val_pred_gs-000000.png").exists()
    lg.close()


def test_metric_logger_png_fifo_duplicates_and_restart(tmp_path):
    """The FIFO bound is per run DIRECTORY: re-logging the same (name, step)
    keeps one queue entry (no premature unlink of a retained file), and a
    new MetricLogger over the same logdir counts pre-existing PNGs."""
    from jointimagegeneration_tpu.core.logging import MetricLogger

    lg = MetricLogger(tmp_path / "run")
    img = np.zeros((4, 4, 3), np.uint8)
    for _ in range(3):  # duplicate (name, step) writes: one file, one entry
        lg.image(5, "val/pred", img)
    assert len(lg._png_queue) == 1
    for s in range(20):
        lg.image(s, "val/other", img)
    assert (tmp_path / "run" / "images" / "val_pred_gs-000005.png").exists()
    lg.close()
    # simulated restart: the new logger seeds its queue from disk so the
    # bound still holds across resumes
    lg2 = MetricLogger(tmp_path / "run")
    assert len(lg2._png_queue) == 21
    for s in range(40):
        lg2.image(s, "val/resumed", img)
    assert len(list((tmp_path / "run" / "images").glob("*.png"))) == lg2.max_images
    lg2.close()


def test_persistent_compile_cache_noop_on_cpu():
    """The CLI cache helper must NOT enable a compilation cache on the CPU
    backend: CPU artifacts carry machine features that SIGILL under a
    different host profile, and the test suite must never populate one
    (BENCH_NOTES round 3). On accelerators it enables ~/.jax_cache."""
    import jax

    from jointimagegeneration_tpu.core.runtime import enable_persistent_compile_cache

    before = jax.config.jax_compilation_cache_dir
    assert enable_persistent_compile_cache() is False  # suite runs on CPU
    assert jax.config.jax_compilation_cache_dir == before


def test_overlay_mask_on_image_matches_hand_blend():
    """overlay_mask_on_image vs a hand-computed alpha blend (the reference
    ImageLogger's combine_mask_and_im, latentdiffusion/main.py:28-67):
    background voxels keep the raw CT; labeled interiors blend
    color*0.2 + image*0.8; boundary voxels show the SOLID class color."""
    from jointimagegeneration_tpu.data.classes import class_color_map
    from jointimagegeneration_tpu.eval.writers import overlay_mask_on_image

    h = w = 12
    image = np.full((h, w), 0.5, np.float32)
    labels = np.zeros((h, w), np.int64)
    labels[3:9, 3:9] = 2  # kidney_left block
    out = overlay_mask_on_image(image, labels, overlay_coef=0.2)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8

    colors = class_color_map().astype(np.float32)
    gray = 0.5 * 255.0
    # background far from the block: untouched CT gray
    np.testing.assert_array_equal(out[0, 0], np.full(3, int(gray)))
    # interior of the block (sobel support is 1 voxel -> (5,5) is inside
    # the 3..8 block but touches no boundary): hand-computed blend
    want_in = np.clip(colors[2] * 0.2 + gray * 0.8, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out[5, 5], want_in)
    # boundary voxel: solid class color
    np.testing.assert_array_equal(out[3, 3], colors[2].astype(np.uint8))
    # boundaries=False: edge voxel gets the plain blend too
    out2 = overlay_mask_on_image(image, labels, overlay_coef=0.2, boundaries=False)
    np.testing.assert_array_equal(out2[3, 3], want_in)


def test_overlay_volume_grid_shapes():
    from jointimagegeneration_tpu.eval.writers import overlay_volume_to_grid

    vol = np.random.default_rng(0).random((4, 8, 8)).astype(np.float32)
    labels = np.zeros((4, 8, 8), np.int64)
    labels[:, 2:5, 2:5] = 1
    g = overlay_volume_to_grid(vol, labels, every=2)  # 2 panels
    assert g.dtype == np.uint8 and g.shape[-1] == 3
    # 2D single-slice input renders as one panel
    g2 = overlay_volume_to_grid(vol[0], labels[0], every=1)
    assert g2.shape == (8, 8, 3)


def test_use_linear_attn_forces_linear():
    """Reference precedence (model.py Model.__init__): use_linear_attn
    FORCES attn_type='linear' even when an explicit attn_type key says
    otherwise."""
    from jointimagegeneration_tpu.cli.common import build_autoencoder

    ae = build_autoencoder({"ddconfig": {"attn_type": "vanilla", "use_linear_attn": True,
                                         "ch": 8, "ch_mult": [1], "z_channels": 2}})
    assert ae.attn_type == "linear"
    ae = build_autoencoder({"ddconfig": {"attn_type": "none", "ch": 8, "ch_mult": [1],
                                         "z_channels": 2}})
    assert ae.attn_type == "none"
