"""Reference-config importer (core/ref_import.py): the four reference config
families (ccdm params.yml / params_eval.yml, latentdiffusion LDM yaml incl.
the `_ae` variant, autoencoder yaml) translate to configs the CLIs here
consume, with unmapped keys surfaced as warnings."""

import pytest
import yaml

from jointimagegeneration_tpu.core.ref_import import detect_kind, import_reference_config

pytestmark = pytest.mark.fast


def _ccdm_params(**over):
    # mirrors the key structure of ccdm/params.yml
    cfg = {
        "output_path": "/mnt/out", "exp_name": "local_test",
        "cudnn": {"benchmark": True, "enabled": True},
        "dataset_file": "datasets.ruijin",
        "dataset_val_max_size": 100, "class_weights": "uniform",
        "multigpu": False, "distributed": False, "mp_loaders": 4,
        "batch_size": 1, "samples": 12, "max_epochs": 2000, "dims": 3,
        "optim": {"name": "AdamW", "learning_rate": 1e-3,
                  "lr_function": "polynomial",
                  "lr_params": {"power": 1.0, "min_lr": 1e-6}, "epochs": 1000},
        "polyak_alpha": 0.9999,
        "beta_schedule": "cosine", "beta_schedule_params": {"s": 0.008},
        "backbone": "unet_openai", "diffusion_type": "categorical",
        "time_steps": 1000,
        "feature_cond_encoder": {"type": "selfattn", "embed_dim": 768,
                                 "n_heads": 8, "model_depth": 4, "d_head": 64,
                                 "dropout": 0.2, "train": True},
        "validation_freq": 1, "display_freq": 100, "save_freq": 1000,
        "n_validation_images": 5, "wandb": False,
        "unet_openai": {"base_channels": 64, "channel_mult": [1, 2, 2, 4, 5],
                        "attention_resolutions": [32, 16, 8], "num_heads": 1,
                        "num_head_channels": 32, "softmax_output": True},
        "load_from": None,
    }
    cfg.update(over)
    return cfg


def _ldm_yaml(ae: bool = False):
    # mirrors configs/latent-diffusion/ruijin-ldm_from_controlnet[_ae].yaml
    unet = {"dims": 2, "image_size": 512,
            "in_channels": 8 if ae else 3, "out_channels": 4 if ae else 1,
            "model_channels": 160 if ae else 128,
            "attention_resolutions": [8, 4, 2] if ae else [32, 16, 8],
            "num_res_blocks": 2, "channel_mult": [1, 2, 4, 4, 5],
            "num_head_channels": 32}
    params = {"linear_start": 0.0015, "linear_end": 0.0195,
              "num_timesteps_cond": 1, "log_every_t": 200, "timesteps": 1000,
              "first_stage_key": "image", "cond_stage_key": "mask",
              "image_size": 64 if ae else 512, "channels": 4 if ae else 1,
              "dims": 2, "monitor": "val/loss_simple_ema",
              "unet_config": {"target": "ldm...UNetModel", "params": unet}}
    if ae:
        dd = {"double_z": True, "z_channels": 4, "resolution": 512,
              "in_channels": 1, "out_ch": 1, "ch": 128,
              "ch_mult": [1, 2, 4, 4], "num_res_blocks": 2, "dropout": 0.0,
              "dims": 2, "attn_resolutions": [16, 8]}
        params["first_stage_config"] = {
            "target": "ldm.models.autoencoder.AutoencoderKL",
            "params": {"ckpt_path": "/mnt/ae/last.ckpt", "embed_dim": 4,
                       "ddconfig": dd,
                       "lossconfig": {"target": "torch.nn.Identity"}}}
        params["cond_stage_config"] = {
            "target": "ldm.models.autoencoder.AutoencoderKL",
            "params": {"ckpt_path": "/mnt/cond/last.ckpt", "embed_dim": 4,
                       "ddconfig": dict(dd, in_channels=2, out_ch=2, ch=96)}}
    else:
        params["first_stage_config"] = "__is_no_first_stage__"
        params["cond_stage_config"] = {"target": "ldm...IdentityEncoder"}
    return {
        "model": {"base_learning_rate": 2e-6,
                  "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
                  "params": params},
        "data": {"target": "main.DataModuleFromConfig",
                 "params": {"batch_size": 1, "num_workers": 5, "wrap": False,
                            "train": {"target": "ldm.data.ruijin_pimage_and_mask.PretrainDataset",
                                      "params": {"split": "train"}}}},
        "lightning": {"callbacks": {"image_logger": {
            "target": "main.ImageLogger",
            "params": {"batch_frequency": 5000, "max_images": 8}}},
            "trainer": {"benchmark": True}},
    }


def test_detect_kind():
    assert detect_kind(_ccdm_params()) == "ccdm_train"
    assert detect_kind(_ccdm_params(evaluations=1, dataset_split="val")) == "ccdm_eval"
    assert detect_kind(_ldm_yaml()) == "ldm"
    ae = {"model": {"target": "ldm.models.autoencoder.AutoencoderKL", "params": {}}}
    assert detect_kind(ae) == "ae"
    with pytest.raises(ValueError):
        detect_kind({"foo": 1})


def test_ccdm_train_import_builds_model():
    out, warns = import_reference_config(_ccdm_params())
    assert out["num_classes"] == 12 and out["time_steps"] == 1000
    assert out["beta_schedule"] == "cosine"
    assert out["unet_openai"]["channel_mult"] == [1, 2, 2, 4, 5]
    assert out["feature_cond_encoder"]["type"] == "selfattn"
    assert out["optim"]["lr_function"] == "polynomial"
    assert out["dataset"]["kind"] == "ruijin"
    assert out["mp_loaders"] == 4 and out["remat"] is True
    # epoch-denominated knobs surfaced, not silently dropped
    assert any("max_epochs" in w for w in warns)
    assert any("optim.epochs" in w for w in warns)
    # the translated config builds the flagship MaskSampler (shrunk for CPU)
    from jointimagegeneration_tpu.cli.common import build_mask_sampler

    out["unet_openai"].update(base_channels=8, channel_mult=[1, 2])
    out["time_steps"] = 20
    out["feature_cond_encoder"]["embed_dim"] = 16
    out["feature_cond_encoder"]["d_head"] = 8
    model = build_mask_sampler(out)
    assert model.num_classes == 12 and model.refiner is not None


def test_ccdm_train_torch_ckpt_warns():
    out, warns = import_reference_config(_ccdm_params(load_from="/mnt/ck.pt"))
    assert any("convert_reference_checkpoint" in w for w in warns)


def test_ccdm_eval_import():
    cfg = _ccdm_params(evaluations=1, evaluation_vote_strategy="confidence",
                       dataset_split="val", time_steps=250,
                       load_from="/mnt/model_checkpoint_713000.pt")
    cfg["feature_cond_encoder"] = {"type": "none"}
    out, warns = import_reference_config(cfg)
    assert out["stage"] == "mask" and out["seed"] == 1024
    assert out["mask_steps"] == 250 and out["step_T_sample"] == "confidence"
    assert out["split"] == "val" and out["samples"] == 12
    assert out["stage1"]["time_steps"] == 1000  # trained schedule, not chain len
    assert any("convert_reference_checkpoint" in w for w in warns)


def test_ldm_pixel_import():
    out, warns = import_reference_config(_ldm_yaml(ae=False))
    m = out["model"]
    assert m["timesteps"] == 1000 and m["linear_start"] == 0.0015
    assert m["channels"] == 1 and m["cond_channels"] == 2  # in 3 - out 1
    assert m["unet_config"]["params"]["model_channels"] == 128
    assert "first_stage" not in m  # __is_no_first_stage__ → pixel mode
    assert out["dataset"]["kind"] == "ruijin"
    assert out["dataset"]["slice_shape"] == [512, 512]
    assert out["eval_every"] == 5000
    assert out["accumulate_grad_batches"] == 1


def test_ldm_scheduler_config_maps_to_lr_function():
    """ddpm.py scheduler_config (LambdaLR via configure_optimizers,
    :93-95,356-360) -> model.scheduler {type, params} consumed by
    cli/train_ldm.py through build_optimizer."""
    cfg = _ldm_yaml(ae=False)
    cfg["model"]["params"]["scheduler_config"] = {
        "target": "ldm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [10000], "cycle_lengths": [10000000000000],
                   "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0]}}
    out, warns = import_reference_config(cfg)
    sched = out["model"]["scheduler"]
    assert sched["type"] == "warmup-linear"
    assert sched["params"]["warm_up_steps"] == [10000]

    # unknown target warns instead of mapping
    cfg["model"]["params"]["scheduler_config"]["target"] = "my.custom.Sched"
    out, warns = import_reference_config(cfg)
    assert "scheduler" not in out["model"]
    assert any("no mapping" in w for w in warns)

    # the mapped params build a working optax schedule end to end
    import jax.numpy as jnp

    from jointimagegeneration_tpu.train.optim import build_lr_schedule

    f = build_lr_schedule(sched["type"], 2e-6,
                          20000, {"warm_up_steps": [10000],
                                  "cycle_lengths": [10000000000000],
                                  "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0]})
    assert float(f(jnp.asarray(0))) == pytest.approx(2e-6 * 1e-6)
    assert float(f(jnp.asarray(5000))) == pytest.approx(2e-6 * 0.5, rel=1e-3)
    assert float(f(jnp.asarray(10000))) == pytest.approx(2e-6, rel=1e-4)


def test_ldm_ae_import_routes_latent():
    out, warns = import_reference_config(_ldm_yaml(ae=True))
    m = out["model"]
    assert m["channels"] == 4 and m["cond_channels"] == 4  # in 8 - out 4
    assert m["first_stage"]["embed_dim"] == 4
    assert m["first_stage"]["ddconfig"]["ch"] == 128
    assert m["cond_stage"]["ddconfig"]["in_channels"] == 2
    assert "double_z" not in m["first_stage"]["ddconfig"]
    # latent UNet size comes from the first stage resolution, not image_size
    assert out["dataset"]["slice_shape"] == [512, 512]
    assert sum("convert_reference_checkpoint" in w for w in warns) == 2


def test_ae_import():
    ref = {
        "model": {"base_learning_rate": 4.5e-6,
                  "target": "ldm.models.autoencoder.AutoencoderKL",
                  "params": {"monitor": "val/rec_loss", "embed_dim": 4,
                             "dims": 2, "image_key": "mask",
                             "lossconfig": {"target": "ldm...LPIPSWithDiscriminator",
                                            "params": {"disc_start": 50001,
                                                       "kl_weight": 1e-6,
                                                       "disc_weight": 0.5,
                                                       "disc_in_channels": 1,
                                                       "gan_feat_weight": 0}},
                             "ddconfig": {"double_z": True, "z_channels": 4,
                                          "resolution": 512, "in_channels": 2,
                                          "out_ch": 2, "ch": 160,
                                          "ch_mult": [1, 2, 4, 4],
                                          "num_res_blocks": 2, "dropout": 0.0,
                                          "dims": 2, "attn_resolutions": [16, 8]}}},
        "data": {"target": "main.DataModuleFromConfig",
                 "params": {"batch_size": 1, "num_workers": 24, "wrap": True,
                            "train": {"target": "ldm.data.ruijin_pimage_and_mask.PretrainDataset",
                                      "params": {"split": "train"}}}},
        "lightning": {"trainer": {"benchmark": True,
                                  "accumulate_grad_batches": 2}},
    }
    out, warns = import_reference_config(ref)
    m = out["model"]
    assert m["embed_dim"] == 4 and m["ddconfig"]["ch"] == 160
    assert m["lossconfig"]["disc_start"] == 50001
    assert m["lossconfig"]["gan_feat_weight"] == 0
    assert "type" not in m  # KL, not VQ
    # disc_in_channels mismatch (1 vs ddconfig 2) and AE grad-accum surfaced
    assert any("disc_in_channels" in w for w in warns)
    assert any("accumulate_grad_batches" in w for w in warns)


def test_script_end_to_end(tmp_path, capsys, monkeypatch):
    from jointimagegeneration_tpu.core.ref_import import _main

    src = tmp_path / "params.yml"
    src.write_text(yaml.safe_dump(_ccdm_params()))
    dst = tmp_path / "stage1.yml"
    _main([str(src), "-o", str(dst)])
    cap = capsys.readouterr()
    assert "ccdm_train" in cap.out
    assert "cli.train_mask" in cap.err
    loaded = yaml.safe_load(dst.read_text())
    assert loaded["unet_openai"]["base_channels"] == 64


def test_top_level_step_T_sample_reaches_sampler_build():
    """Imported eval configs keep step_T_sample at the top level; the sample
    CLI must carry it into the stage1 section build_mask_sampler reads, or
    the vote strategy silently falls back to 'majority'."""
    cfg = {"step_T_sample": "confidence",
           "stage1": {"num_classes": 4, "time_steps": 8, "bf16": False,
                      "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                                      "attention_resolutions": [2],
                                      "num_head_channels": 4}}}
    s1 = cfg.get("stage1", cfg)
    if "step_T_sample" in cfg and "step_T_sample" not in s1:  # cli/sample.py logic
        s1 = {**s1, "step_T_sample": cfg["step_T_sample"]}
    from jointimagegeneration_tpu.cli.common import build_mask_sampler

    ms = build_mask_sampler(s1)
    assert ms.step_T_sample == "confidence"


def test_sample_cli_rejects_unknown_stage(tmp_path):
    import pytest
    import yaml

    from jointimagegeneration_tpu.cli import sample as sample_cli

    p = tmp_path / "bad.yml"
    p.write_text(yaml.safe_dump({"stage": "masks"}))
    with pytest.raises(ValueError, match="unknown stage"):
        sample_cli.main([str(p)])
