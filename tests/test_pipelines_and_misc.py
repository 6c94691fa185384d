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


def test_convert_legacy_resblock_params():
    """Round-1 nested ResBlock checkpoints load through the converter: the
    rewritten tree must apply cleanly to the flat-param ResBlock and match
    the reference math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jointimagegeneration_tpu.nn.blocks import ResBlock
    from jointimagegeneration_tpu.utils.misc import convert_legacy_resblock_params

    rb = ResBlock(8, dims=3)
    x = jax.random.normal(jax.random.key(0), (1, 4, 8, 8, 4))
    emb = jax.random.normal(jax.random.key(1), (1, 12))
    flat = rb.init(jax.random.key(2), x, emb)["params"]

    legacy = {
        "down_0_0_res": {
            "in_norm": {"GroupNorm_0": {"scale": flat["norm1_scale"], "bias": flat["norm1_bias"]}},
            "in_conv": {"kernel": flat["conv1_kernel"], "bias": flat["conv1_bias"]},
            "emb_proj": {"kernel": flat["emb_kernel"], "bias": flat["emb_bias"]},
            "out_norm": {"GroupNorm_0": {"scale": flat["norm2_scale"], "bias": flat["norm2_bias"]}},
            "out_conv": {"kernel": flat["conv2_kernel"], "bias": flat["conv2_bias"]},
            "skip": {"kernel": flat["skip_kernel"], "bias": flat["skip_bias"]},
        },
        "other": {"kernel": jnp.ones((2, 2))},
    }
    got = convert_legacy_resblock_params(legacy)
    assert set(got["down_0_0_res"]) == set(flat)
    np.testing.assert_array_equal(got["other"]["kernel"], legacy["other"]["kernel"])
    y1 = rb.apply({"params": got["down_0_0_res"]}, x, emb)
    y2 = rb.apply({"params": flat}, x, emb)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


def test_checkpoint_restores_legacy_resblock_layout(tmp_path):
    """A round-1 checkpoint (nested ResBlock submodule names) restores
    through CheckpointManager via the legacy converter."""
    import flax.serialization
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager
    from jointimagegeneration_tpu.nn.blocks import ResBlock
    from jointimagegeneration_tpu.train import EMATrainState, build_optimizer

    rb = ResBlock(8, dims=3)
    x = jnp.zeros((1, 4, 8, 8, 8))
    emb = jnp.zeros((1, 12))
    flat = rb.init(jax.random.key(0), x, emb)
    template = EMATrainState.create(flat, build_optimizer("Adam", 1e-3))

    # forge the round-1 layout: nested submodule dicts instead of flat keys
    f = flat["params"]
    legacy_params = {"params": {
        "in_norm": {"GroupNorm_0": {"scale": f["norm1_scale"] + 1, "bias": f["norm1_bias"]}},
        "in_conv": {"kernel": f["conv1_kernel"], "bias": f["conv1_bias"]},
        "emb_proj": {"kernel": f["emb_kernel"], "bias": f["emb_bias"]},
        "out_norm": {"GroupNorm_0": {"scale": f["norm2_scale"], "bias": f["norm2_bias"]}},
        "out_conv": {"kernel": f["conv2_kernel"], "bias": f["conv2_bias"]},
    }}
    legacy_state = flax.serialization.to_state_dict(template)
    legacy_state["params"] = legacy_params
    legacy_state["ema_params"] = legacy_params

    ck = CheckpointManager(tmp_path / "ck")
    ck.save(1, legacy_state)
    ck.wait()
    restored = ck.restore(template)
    np.testing.assert_allclose(
        np.asarray(restored.params["params"]["norm1_scale"]),
        np.asarray(f["norm1_scale"]) + 1,
    )
    ck.close()


@pytest.mark.slow
def test_serve_generate_mask_batched():
    """HTTP serving surface: /healthz and /generate kind=mask with batch=2
    (the batch rides the data mesh when multiple devices exist)."""
    import base64
    import json
    import threading
    import urllib.request
    from http.server import HTTPServer

    import jax
    import jax.numpy as jnp

    from jointimagegeneration_tpu.cli.serve import make_handler
    from jointimagegeneration_tpu.models import MaskSampler

    ms = MaskSampler.create(
        num_classes=4, time_steps=6, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(2,), num_res_blocks=1, num_head_channels=4,
    )
    spatial = (4, 8, 8)
    params = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    state = {"ms": ms, "ms_params": params, "spatial": spatial, "mask_steps": 2}
    server = HTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        body = json.dumps({"kind": "mask", "seed": 3, "batch": 2}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            resp = json.load(r)
        assert "labels_nifti_b64" in resp and len(resp["batch_labels_nifti_b64"]) == 2
        assert base64.b64decode(resp["labels_nifti_b64"])[:2] == b"\x1f\x8b"  # gzip NIfTI
    finally:
        server.shutdown()


@pytest.mark.slow
def test_serve_two_stage_stream_and_batch():
    """/generate kind=two_stage: `stream: true` yields NDJSON — a mask
    header, one line per CT slice as the z-loop produces it, a summary —
    and `batch: 2` returns per-volume NIfTIs in one jitted call.  Both
    requests carry `warm_start` to cover the serve-side routing of the
    truncated-chain autoregression (streamed and whole-pipeline)."""
    import base64
    import json
    import threading
    import urllib.request
    from http.server import HTTPServer

    import jax
    import numpy as np

    from jointimagegeneration_tpu.cli.serve import make_handler
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
    from jointimagegeneration_tpu.pipeline import TwoStagePipeline

    ms = MaskSampler.create(
        num_classes=4, time_steps=6, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(2,), num_res_blocks=1, num_head_channels=4,
    )
    spatial = (4, 8, 8)
    msp = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    ldm = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=6, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(2,), num_res_blocks=1,
        num_head_channels=4,
    )
    lp = ldm.init_params(jax.random.key(1), 16)
    state = {
        "ms": ms, "ms_params": msp, "spatial": spatial, "mask_steps": 2,
        "pipe": TwoStagePipeline(ms, ldm), "ldm": ldm, "ldm_params": lp,
        "ddim": DDIMParams.create(ldm.diffusion, 2), "volume_shape": (3, 16, 16),
    }
    server = HTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps({"kind": "two_stage", "seed": 1, "stream": True,
                           "guidance_scale": 2.0, "warm_start": 0.5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            lines = [json.loads(l) for l in r.read().decode().splitlines()]
        header, slices, summary = lines[0], lines[1:-1], lines[-1]
        assert header["kind"] == "two_stage_stream" and header["n_slices"] == 3
        assert base64.b64decode(header["labels_nifti_b64"])[:2] == b"\x1f\x8b"
        assert [s["slice"] for s in slices] == [0, 1, 2]
        arr = np.frombuffer(base64.b64decode(slices[1]["data_b64"]), np.float16)
        assert arr.reshape(slices[1]["shape"]).shape == (1, 16, 16, 1)
        assert np.all(np.isfinite(arr.astype(np.float32)))
        assert summary["done"] is True

        body = json.dumps({"kind": "two_stage", "seed": 2, "batch": 2,
                           "warm_start": 0.5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = json.load(r)
        assert len(resp["batch_ct_nifti_b64"]) == 2
        assert len(resp["batch_labels_nifti_b64"]) == 2
    finally:
        server.shutdown()
