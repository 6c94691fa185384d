"""Latent (`_ae`) TRAINING parity: the reference trains its stage-2 UNet
on latents through a frozen first stage (ruijin-ldm_from_controlnet_ae.yaml
+ ddpm.py:662-741 get_input); these tests cover make_latent_ldm_train_step,
the train_ldm CLI route (first_stage/cond_stage/scale_by_std config keys),
and the converted-reference AE checkpoint flowing into load_ae_params."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL
from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM
from jointimagegeneration_tpu.train import (
    EMATrainState,
    build_optimizer,
    make_latent_ldm_train_step,
)


def _tiny_ae(in_ch=1, out_ch=None, seed=3):
    ae = AutoencoderKL(embed_dim=2, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=in_ch,
                       out_ch=out_ch or in_ch, dims=2, resolution=16)
    p = ae.init(jax.random.key(seed), jnp.zeros((1, 16, 16, in_ch)),
                jax.random.key(seed + 1))
    return ae, p


@pytest.mark.slow
def test_make_latent_ldm_train_step():
    """The step encodes pixel batches through frozen AEs and trains the
    UNet at latent size; UNet params move, loss is finite, and the frozen
    AE params are untouched by construction (not in the state)."""
    ae, ae_p = _tiny_ae(1)
    cond_ae, cond_p = _tiny_ae(2, seed=7)
    ldm = SliceLDM.create(
        image_channels=2, cond_channels=2, timesteps=8, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=4, dtype=jnp.float32)
    latent = LatentSliceLDM(inner=ldm, first_stage=ae, cond_stage=cond_ae,
                            scale_factor=0.7)
    params = ldm.init_params(jax.random.key(0), 8)  # latent size 16//2
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-3))
    step = jax.jit(make_latent_ldm_train_step(latent, ae_p, cond_p))
    batch = {
        "image": jax.random.normal(jax.random.key(1), (2, 16, 16, 1)),
        "cond": jax.random.normal(jax.random.key(2), (2, 16, 16, 2)),
    }
    state2, metrics = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    assert bool(metrics["grad_finite"])
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params, state2.params)
    assert any(jax.tree.leaves(moved)), "UNet params never updated"


@pytest.mark.slow
def test_latent_train_cli_and_scale_by_std(tmp_path):
    """first_stage/cond_stage/scale_by_std in the train_ldm config run the
    full latent training CLI: checkpoints land, metrics are finite, and
    the saved UNet is latent-size (restoring at latent size succeeds)."""
    from jointimagegeneration_tpu.cli import train_ldm
    from jointimagegeneration_tpu.cli.common import build_slice_ldm
    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager

    dd = {"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
          "attn_resolutions": [], "z_channels": 2, "resolution": 16}
    cfg = {
        "batch_size": 2, "max_steps": 3, "save_freq": 3, "display_freq": 1,
        "eval_every": 3, "scale_lr": False, "output_path": str(tmp_path / "runs"),
        "model": {
            "timesteps": 8, "bf16": False, "base_learning_rate": 1e-3,
            "channels": 2, "cond_channels": 2, "scale_by_std": True,
            "unet": {"model_channels": 8, "channel_mult": [1, 2],
                     "attention_resolutions": [], "num_res_blocks": 1,
                     "num_head_channels": 4},
            "first_stage": {"embed_dim": 2,
                            "ddconfig": {**dd, "in_channels": 1, "out_ch": 1}},
            "cond_stage": {"embed_dim": 2,
                           "ddconfig": {**dd, "in_channels": 2, "out_ch": 2}},
        },
        "dataset": {"kind": "synthetic", "num_cases": 4, "slice_shape": [16, 16],
                    "depth": 4},
    }
    cfg_path = tmp_path / "ldm_ae.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_ldm.main([str(cfg_path), "aeexp"])

    logdir = tmp_path / "runs" / "aeexp"
    lines = [l for l in (logdir / "metrics.jsonl").read_text().splitlines() if l]
    import json

    losses = [json.loads(l)["train/loss"] for l in lines if "train/loss" in json.loads(l)]
    assert losses and all(np.isfinite(losses))
    # UNet trained at LATENT size (16 // 2): a latent-size template restores
    model = build_slice_ldm(cfg["model"])
    template = EMATrainState.create(
        model.init_params(jax.random.key(0), 8), build_optimizer("AdamW", 1e-3))
    state = CheckpointManager(logdir / "checkpoints").restore(template)
    assert int(state.step) == 3


def test_converted_ae_checkpoint_loads(tmp_path):
    """scripts/convert_reference_checkpoint.py --ae writes a checkpoint dir
    that load_ae_params restores bit-exactly onto the model template."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "scripts")
    try:
        from convert_reference_checkpoint import main as convert_main
    finally:
        sys.path.pop(0)
    from test_ae_convert_golden import CH, EMB, MULT, NRB, RES, ZC, _sd_tiny_ae
    from jointimagegeneration_tpu.cli.common import load_ae_params

    sd = _sd_tiny_ae(prefix="first_stage_model.")
    pt = tmp_path / "ldm.pt"
    torch.save({"state_dict": sd}, pt)
    out = tmp_path / "ae_ckpt"
    convert_main([str(pt), str(out), "--ae", "first_stage_model."])

    ae = AutoencoderKL(embed_dim=EMB, ch=CH, ch_mult=MULT, num_res_blocks=NRB,
                       attn_resolutions=(8,), z_channels=ZC, in_channels=1,
                       out_ch=1, dims=2, resolution=RES)
    params = load_ae_params(ae, {"checkpoint": str(out)}, RES)
    want = np.asarray(sd["first_stage_model.quant_conv.bias"])
    got = np.asarray(params["params"]["quant_conv"]["bias"])
    np.testing.assert_array_equal(got, want)
    # wrong ddconfig must fail loudly, not mis-map silently
    bad = AutoencoderKL(embed_dim=EMB, ch=CH, ch_mult=(1, 2, 2), num_res_blocks=NRB,
                        attn_resolutions=(8,), z_channels=ZC, in_channels=1,
                        out_ch=1, dims=2, resolution=RES)
    with pytest.raises((ValueError, KeyError)):
        load_ae_params(bad, {"checkpoint": str(out)}, RES)
