"""Round-3 feature tests: DINO conditioning routed through config/CLI,
learned-logvar + adm reachable from configs, the latent two-stage
pipeline, apply_model-level tiling, ViT log-bin descriptors + saliency,
and the CLI polish (fresh-init warning, dataset kinds)."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer
from jointimagegeneration_tpu.train.steps import make_ldm_train_step


# ------------------------------------------------- injection-site enumeration


def test_inject_site_downsample():
    from jointimagegeneration_tpu.models.cond_encoders import inject_site_downsample

    # mult (1,2), 1 res block: idx 0 stem(ds1), 1 res(ds1), 2 down(ds1->2), 3 res(ds2)
    assert inject_site_downsample((1, 2), 1, 0) == 1
    assert inject_site_downsample((1, 2), 1, 1) == 1
    assert inject_site_downsample((1, 2), 1, 2) == 1  # before the downsample conv
    assert inject_site_downsample((1, 2), 1, 3) == 2
    # flagship: mult (1,2,2,4,5), 2 res blocks — idx 4 is level-1 first res (ds 2)
    assert inject_site_downsample((1, 2, 2, 4, 5), 2, 4) == 2
    with pytest.raises(ValueError):
        inject_site_downsample((1, 2), 1, 99)


# ------------------------------------------------- DINO via config, CLI-driven


@pytest.mark.slow
def test_dino_config_cli_train_and_sample(tmp_path):
    """feature_cond_encoder: {type: dino} drives the full train CLI and the
    sample CLI (VERDICT round-2 #3 done-criterion: the config route, not
    just the library composition).  Matches the reference wiring
    condition_encoder.py:22-109 + trainer.py:287,850-852."""
    from jointimagegeneration_tpu.cli import sample as sample_cli
    from jointimagegeneration_tpu.cli import train_mask

    cfg = {
        "num_classes": 3, "time_steps": 8, "dims": 2, "bf16": False,
        "batch_size": 2, "max_steps": 3, "save_freq": 3, "display_freq": 1,
        "validate": False, "output_path": str(tmp_path / "runs"), "seed": 0,
        "unet_openai": {
            "base_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
            "num_res_blocks": 1, "num_head_channels": 4,
        },
        "feature_cond_encoder": {
            "type": "dino", "model_type": "vits8", "output_stride": 8,
            "inject_idx": 1, "layer": 2,
        },
        "dataset": {"kind": "synthetic", "num_cases": 4, "volume_shape": [16, 16]},
        "optim": {"name": "Adam", "learning_rate": 1e-3},
    }
    cfg_path = tmp_path / "dino.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_mask.main([str(cfg_path), "dinoexp"])
    metrics = (tmp_path / "runs" / "dinoexp" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 3
    import json

    last = json.loads(metrics[-1])
    assert np.isfinite(last["train/loss"]) and last["train/grad_finite"] == 1.0

    # sampling consumes the same config route + the trained checkpoint
    sample_cfg = {
        "stage": "mask", "n_cases": 1, "mask_steps": 2, "seed": 3,
        "output_path": str(tmp_path / "samples"),
        "stage1": {
            **{k: cfg[k] for k in ("num_classes", "time_steps", "dims", "bf16",
                                   "unet_openai", "feature_cond_encoder", "dataset")},
            "checkpoint": str(tmp_path / "runs" / "dinoexp" / "checkpoints"),
        },
    }
    spath = tmp_path / "dino_sample.yml"
    spath.write_text(yaml.safe_dump(sample_cfg))
    sample_cli.main([str(spath)])
    assert (tmp_path / "samples" / "case_0000" / "pred.nii.gz").exists()


# --------------------------------------------- learned logvar from the config


@pytest.mark.slow
def test_learn_logvar_config_cli_train(tmp_path):
    """learn_logvar: true in the stage-2 config reaches init_params through
    cli/train_ldm, and the logvar leaf verifiably updates during the
    CLI-built train run (ddpm.py:111-115, 423)."""
    from jointimagegeneration_tpu.cli import train_ldm
    from jointimagegeneration_tpu.cli.common import build_slice_ldm
    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager

    cfg = {
        "batch_size": 2, "max_steps": 2, "save_freq": 2, "display_freq": 1,
        "validate": False, "scale_lr": False, "output_path": str(tmp_path / "runs"),
        "model": {
            "timesteps": 8, "bf16": False, "learn_logvar": True, "logvar_init": 0.0,
            "base_learning_rate": 1e-2,
            "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                     "num_res_blocks": 1, "num_head_channels": 4},
        },
        "dataset": {"kind": "synthetic", "num_cases": 4, "slice_shape": [8, 8], "depth": 4},
    }
    cfg_path = tmp_path / "ldm_logvar.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_ldm.main([str(cfg_path), "lvexp"])

    model = build_slice_ldm(cfg["model"])
    template = EMATrainState.create(
        model.init_params(jax.random.key(0), 8, learn_logvar=True), build_optimizer("AdamW", 1e-2)
    )
    state = CheckpointManager(tmp_path / "runs" / "lvexp" / "checkpoints").restore(template)
    assert "logvar" in state.params
    assert not np.allclose(np.asarray(state.params["logvar"]), 0.0), "logvar never updated"


# ----------------------------------------------------- adm from the config


def test_adm_config_route():
    """unet_config num_classes -> SliceLDM adm mode; class ids flow through
    the train step via batch['class_label'] (openaimodel.py:516-517,
    ddpm.py:1428)."""
    from jointimagegeneration_tpu.cli.common import build_slice_ldm

    model = build_slice_ldm({
        "timesteps": 8, "bf16": False,
        "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                 "num_res_blocks": 1, "num_head_channels": 4, "num_classes": 5},
    })
    assert model.unet.adm_classes == 5
    params = model.init_params(jax.random.key(0), 8)
    assert "label_emb" in params["params"]
    # fresh UNets have a zero-init out_conv, which blocks all upstream
    # gradients; give the head signal so label_emb can receive one
    params = _unzero_head(params)
    state = EMATrainState.create(params, build_optimizer("Adam", 1e-3))
    step = jax.jit(make_ldm_train_step(model))
    batch = {
        "image": jax.random.normal(jax.random.key(1), (2, 8, 8, 1)),
        "cond": jnp.zeros((2, 8, 8, 2)),
        "class_label": jnp.asarray([1, 4]),
    }
    state2, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    # the label embedding received gradient
    le0 = np.asarray(state.params["params"]["label_emb"]["embedding"])
    le1 = np.asarray(state2.params["params"]["label_emb"]["embedding"])
    assert not np.allclose(le0, le1)


# --------------------------------------------------- latent two-stage pipeline


@pytest.mark.slow
def test_two_stage_latent_pipeline():
    """TwoStagePipeline drives a LatentSliceLDM end-to-end (mask ->
    upsample -> per-slice cond-encode / latent DDIM / decode), the `_ae`
    capability of sample_diffusion.py:196-224 + ddpm.py:510-537; and fails
    loudly without AE weights (VERDICT round-2 Missing #5)."""
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import MaskSampler
    from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL
    from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM
    from jointimagegeneration_tpu.pipeline import TwoStagePipeline

    ms = MaskSampler.create(
        num_classes=3, time_steps=8, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    fs = AutoencoderKL(embed_dim=2, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=1, out_ch=1, resolution=16)
    cs = AutoencoderKL(embed_dim=2, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=2, out_ch=2, resolution=16)
    lat = LatentSliceLDM.create(
        first_stage=fs, cond_stage=cs, image_channels=2, cond_channels=2,
        timesteps=8, model_channels=8, channel_mult=(1, 2), attention_resolutions=(),
        num_res_blocks=1, num_head_channels=4,
    )
    spatial = (2, 8, 8)
    ms_params = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    fs_params = fs.init(jax.random.key(1), jnp.zeros((1, 16, 16, 1)), jax.random.key(2))
    cs_params = cs.init(jax.random.key(3), jnp.zeros((1, 16, 16, 2)), jax.random.key(4))
    ldm_params = lat.inner.init_params(jax.random.key(5), 8)
    ddim = DDIMParams.create(lat.diffusion, 2)

    pipe = TwoStagePipeline(ms, lat)
    ct, labels = pipe(
        ms_params, ldm_params, jax.random.key(6),
        mask_shape=(1, *spatial), volume_shape=(3, 16, 16), ddim=ddim, mask_steps=2,
        cond=jnp.zeros((1, *spatial, 1)),
        ae_params=fs_params, cond_ae_params=cs_params,
    )
    assert ct.shape == (1, 3, 16, 16, 1) and labels.shape == (1, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(ct)))

    with pytest.raises(ValueError, match="ae_params"):
        pipe(ms_params, ldm_params, jax.random.key(7),
             mask_shape=(1, *spatial), volume_shape=(3, 16, 16), ddim=ddim, mask_steps=2)


# ------------------------------------------------ apply_model-level tiling


def _unzero_head(params):
    """Un-zero every zero_module barrier (the head out_conv AND each
    ResBlock's second conv) so conditioning/grad paths carry signal on a
    fresh net (same helper as test_round2)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in flat:
        if ("out_conv" in k and k[-1] == "kernel") or k[-1] == "conv2_kernel":
            flat[k] = jax.random.normal(jax.random.key(11), flat[k].shape) * 0.05
    return {"params": flax.traverse_util.unflatten_dict(flat)}


@pytest.mark.slow
def test_apply_model_tiling_full_patch_exact():
    """tile == the whole slice: the fold/unfold path must reproduce the
    direct path bit-for-bit (single window, weight/weight cancels) —
    the ddpm.py:915-997 apply_model tiling, degenerate case."""
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=8, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    params = _unzero_head(model.init_params(jax.random.key(0), 16))
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams

    ddim = DDIMParams.create(model.diffusion, 3)
    cond = jax.random.normal(jax.random.key(1), (1, 16, 16, 2))
    a = model.sample_slice(params, jax.random.key(2), cond, ddim)
    b = model.sample_slice(params, jax.random.key(2), cond, ddim, tile=((16, 16), (8, 8)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_apply_model_tiling_oversized_slice():
    """Oversized slice through overlapping tiles: agrees with the untiled
    model within stitch tolerance (GroupNorm statistics go per-tile, the
    same approximation the reference's fold/unfold makes)."""
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=8, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    params = _unzero_head(model.init_params(jax.random.key(0), 16))
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams

    ddim = DDIMParams.create(model.diffusion, 2)
    cond = jax.random.normal(jax.random.key(1), (1, 24, 24, 2)) * 0.1
    untiled = model.sample_slice(params, jax.random.key(2), cond, ddim)
    tiled = model.sample_slice(params, jax.random.key(2), cond, ddim, tile=((16, 16), (8, 8)))
    u, t = np.asarray(untiled), np.asarray(tiled)
    assert t.shape == (1, 24, 24, 1) and np.all(np.isfinite(t))
    # stitch tolerance: same scale and strongly correlated, not bit-equal
    corr = np.corrcoef(u.ravel(), t.ravel())[0, 1]
    assert corr > 0.9, f"tiled/untiled correlation {corr}"


@pytest.mark.slow
def test_tile_config_key_ct_sample_cli(tmp_path):
    """`tile: {patch, stride}` and `guidance_scale:` in the sample config
    route the diffusion-loop UNet through fold/unfold tiling + CFG end to
    end (stage: ct)."""
    from jointimagegeneration_tpu.cli import sample as sample_cli

    cfg = {
        "stage": "ct", "n_cases": 1, "ddim_steps": 2, "seed": 5,
        "output_path": str(tmp_path / "samples"),
        "guidance_scale": 2.0,
        "tile": {"patch": [16, 16], "stride": [8, 8]},
        "stage2": {
            "timesteps": 8, "bf16": False, "slice_size": 24,
            "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                     "num_res_blocks": 1, "num_head_channels": 4},
            "dataset": {"kind": "synthetic", "num_cases": 2, "slice_shape": [24, 24], "depth": 3},
        },
    }
    p = tmp_path / "ct_tile.yml"
    p.write_text(yaml.safe_dump(cfg))
    sample_cli.main([str(p)])
    from jointimagegeneration_tpu.data import read_nifti

    vol, _ = read_nifti(tmp_path / "samples" / "case_0000" / "image.nii.gz")
    vol = np.asarray(vol, np.float32)
    assert vol.shape == (3, 24, 24) and np.all(np.isfinite(vol))


@pytest.mark.slow
def test_ct_sample_cli_metrics(tmp_path):
    """The ct sampling CLI computes reference-parity image metrics when the
    dataset carries GT volumes (sample_diffusion.py:457-488): per-case
    LPIPS 3-view + FVD over the case set, written to metrics.json."""
    import json

    from jointimagegeneration_tpu.cli import sample as sample_cli

    cfg = {
        "stage": "ct", "n_cases": 2, "ddim_steps": 2, "seed": 5,
        "output_path": str(tmp_path / "samples"),
        "stage2": {
            "timesteps": 8, "bf16": False, "slice_size": 16,
            "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                     "num_res_blocks": 1, "num_head_channels": 4},
            "dataset": {"kind": "synthetic", "num_cases": 2, "slice_shape": [16, 16], "depth": 3},
        },
    }
    p = tmp_path / "ct_metrics.yml"
    p.write_text(yaml.safe_dump(cfg))
    sample_cli.main([str(p)])
    m = json.loads((tmp_path / "samples" / "metrics.json").read_text())
    assert len(m["lpips_per_case"]) == 2
    assert np.isfinite(m["lpips_three_view_mean"]) and np.isfinite(m["fvd"])
    # fallback numbers must be labeled as NOT published-FVD-comparable
    # (VERDICT r3 weak #5 / next #7)
    assert m["fvd_feature_extractor"] == "pyramid-uncalibrated"
    assert m["fvd_backbone"] == m["fvd_feature_extractor"]


# ----------------------------------------------- ViT log-bin + saliency extras


def test_vit_log_bin_descriptors():
    from jointimagegeneration_tpu.nn.vit import ViTExtractor

    ext = ViTExtractor(model_type="vits8", stride=8)
    # tiny trunk for CPU: override depth/dim via direct construction
    from jointimagegeneration_tpu.nn.vit import ViT

    ext.vit = ViT(dim=8, depth=2, heads=2, patch=8, stride=8, pos_grid=4)
    ext.init(jax.random.key(0), image_hw=(32, 32))
    imgs = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    plain = ext.extract_descriptors(imgs, layer=1, log_bin=False)
    binned = ext.extract_descriptors(imgs, layer=1, log_bin=True, hierarchy=2)
    assert plain.shape == (1, 4, 4, 8)
    assert binned.shape == (1, 4, 4, 8 * (1 + 8 * 2))  # dino.py num_bins = 1+8*hierarchy
    # constant feature map -> every bin equals that constant (border clamp sane)
    const = jnp.ones((1, 4, 4, 8))
    ext2 = ViTExtractor(model_type="vits8", stride=8)
    ext2.vit = ext.vit
    ext2.params = ext.params
    orig_extract = ext2.extract
    ext2.extract = lambda *a, **k: [const]
    out = ext2.extract_descriptors(imgs, log_bin=True, hierarchy=2)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
    ext2.extract = orig_extract


def test_vit_saliency_maps():
    from jointimagegeneration_tpu.nn.vit import ViT, ViTExtractor

    ext = ViTExtractor(model_type="vits8", stride=8)
    ext.vit = ViT(dim=8, depth=2, heads=2, patch=8, stride=8, pos_grid=4)
    ext.init(jax.random.key(0), image_hw=(32, 32))
    sal = ext.extract_saliency_maps(jax.random.normal(jax.random.key(1), (2, 32, 32, 3)))
    s = np.asarray(sal)
    assert s.shape == (2, 4, 4)
    assert s.min() >= 0.0 and s.max() <= 1.0 + 1e-6
    assert np.isclose(s.reshape(2, -1).max(1), 1.0).all()  # per-image min-max norm


# ------------------------------------------------------------------ CLI polish


def test_fresh_init_warning(capsys):
    from jointimagegeneration_tpu.cli.sample import _load_params

    p = _load_params(lambda: {"w": jnp.ones(2)}, None)
    out = capsys.readouterr().out
    assert "FRESH-INIT" in out
    np.testing.assert_allclose(np.asarray(p["w"]), 1.0)


def test_dataset_kinds_exposed(tmp_path):
    from jointimagegeneration_tpu.cli.common import build_slice_dataset

    (tmp_path / "imagesTr").mkdir()
    (tmp_path / "labelsTr").mkdir()
    ds = build_slice_dataset(
        {"dataset": {"kind": "nnunet", "root": str(tmp_path)}}, "train"
    )
    assert len(ds) == 0  # constructs on the empty layout

    with pytest.raises(KeyError):
        build_slice_dataset({"dataset": {"kind": "nnunet"}}, "train")  # root required


# ------------------------------------------- round-3 review regression fixes


@pytest.mark.slow
def test_sample_load_params_unwraps_learned_logvar(tmp_path):
    """A learn_logvar checkpoint ({'unet':…, 'logvar':…} tree) restores
    into the plain sampling template — _load_params drops the wrapper
    instead of crashing on the key mismatch."""
    import flax.serialization

    from jointimagegeneration_tpu.cli.sample import _load_params
    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager
    from jointimagegeneration_tpu.models import SliceLDM
    from jointimagegeneration_tpu.train import EMATrainState, build_optimizer

    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=6, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=4,
    )
    params = model.init_params(jax.random.key(0), 8, learn_logvar=True, logvar_init=0.25)
    state = EMATrainState.create(params, build_optimizer("Adam", 1e-3))
    ck = CheckpointManager(tmp_path / "ck")
    ck.save(1, flax.serialization.to_state_dict(state))
    ck.wait()
    ck.close()

    restored = _load_params(lambda: model.init_params(jax.random.key(2), 8),
                            str(tmp_path / "ck"))
    assert "logvar" not in restored
    want = np.asarray(jax.tree.leaves(params["unet"])[0])
    got = np.asarray(jax.tree.leaves(restored)[0])
    np.testing.assert_allclose(got, want)


@pytest.mark.slow
def test_mask_sample_cli_2d_ragged_tail(tmp_path):
    """2D mask sampling with n_cases % batch_size != 0: the ragged-tail
    padding must tile at the cond's own rank (4-D for 2D configs), not a
    hard-coded 5-D rep."""
    from jointimagegeneration_tpu.cli import sample as sample_cli

    cfg = {
        "stage": "mask", "n_cases": 3, "batch_size": 2, "mask_steps": 2, "seed": 2,
        "output_path": str(tmp_path / "samples"),
        "stage1": {
            "num_classes": 3, "time_steps": 6, "dims": 2, "bf16": False,
            "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                            "attention_resolutions": [], "num_res_blocks": 1,
                            "num_head_channels": 4},
            "dataset": {"kind": "synthetic", "num_cases": 3, "volume_shape": [16, 16]},
        },
    }
    p = tmp_path / "mask2d.yml"
    p.write_text(yaml.safe_dump(cfg))
    sample_cli.main([str(p)])
    for i in range(3):
        assert (tmp_path / "samples" / f"case_{i:04d}" / "pred.nii.gz").exists()


@pytest.mark.slow
def test_train_ldm_image_trail_writes_overlay_panel(tmp_path):
    """The training image trail includes the mask-over-sample alpha overlay
    (the reference ImageLogger's combine_mask_and_im artifact,
    main.py:28-67): a tiny train_ldm run with validation on writes
    val_overlay alongside val_samples into the PNG trail."""
    from jointimagegeneration_tpu.cli import train_ldm

    cfg = {
        "batch_size": 2, "max_steps": 2, "save_freq": 2, "display_freq": 1,
        "eval_every": 2, "validate": True, "scale_lr": False,
        "n_log_images": 1, "log_ddim_steps": 2,
        "output_path": str(tmp_path / "runs"),
        "model": {
            "timesteps": 8, "bf16": False,
            "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                     "num_res_blocks": 1, "num_head_channels": 4},
        },
        "dataset": {"kind": "synthetic", "num_cases": 4, "slice_shape": [8, 8], "depth": 4},
    }
    cfg_path = tmp_path / "ldm_overlay.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_ldm.main([str(cfg_path), "ovexp"])
    images = list((tmp_path / "runs" / "ovexp" / "images").glob("*.png"))
    names = {p.name.rsplit("_gs-", 1)[0] for p in images}
    assert "val_samples" in names, sorted(names)
    assert "val_overlay" in names, sorted(names)
