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
    # the calibrated scale persists next to the checkpoints, and the shared
    # assembly resolves it for sample/serve (the reference keeps
    # scale_factor inside its checkpoint; a printed-only value would decode
    # inference latents at the wrong scale)
    from jointimagegeneration_tpu.cli.common import LATENT_SCALE_FILE, build_latent_ldm

    sidecar = logdir / "checkpoints" / LATENT_SCALE_FILE
    assert sidecar.exists()
    sf = json.loads(sidecar.read_text())["scale_factor"]
    assert np.isfinite(sf) and sf != 1.0
    s2 = dict(cfg["model"], checkpoint=str(logdir / "checkpoints"))
    latent, _, _, latent_size = build_latent_ldm(s2, model, 16)
    assert latent.scale_factor == pytest.approx(sf) and latent_size == 8


def test_load_ae_params_unknown_layout_raises(tmp_path):
    """An EXISTING checkpoint with neither 'g_params' nor 'params' must
    raise, not silently fall back to random AE weights (a wrong-path
    warning would let a 100k-step run train against fresh-init AEs)."""
    from jointimagegeneration_tpu.cli.common import load_ae_params
    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(0, {"ema_params": {"w": np.ones(3)}, "step": 0})
    mgr.wait()
    ae, _ = _tiny_ae(1)
    with pytest.raises(ValueError, match="neither 'g_params'"):
        load_ae_params(ae, {"checkpoint": str(tmp_path / "ck")}, 16)


def test_build_latent_ldm_requires_cond_channels():
    """A latent config whose cond encoder cannot take the [prev, mask]
    pixel pair fails at assembly, not inside jit at request time."""
    from jointimagegeneration_tpu.cli.common import build_latent_ldm
    from jointimagegeneration_tpu.models import SliceLDM

    ldm = SliceLDM.create(image_channels=2, cond_channels=2, timesteps=8,
                          model_channels=8, channel_mult=(1, 2),
                          attention_resolutions=(), num_res_blocks=1,
                          num_head_channels=4, dtype=jnp.float32)
    dd = {"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [],
          "z_channels": 2, "resolution": 16, "in_channels": 1, "out_ch": 1}
    # 1-channel first stage, no cond_stage: encoder can't take 2 channels
    with pytest.raises(ValueError, match="in_channels=1"):
        build_latent_ldm({"first_stage": {"embed_dim": 2, "ddconfig": dd}}, ldm, 16)


def test_convert_ae_ambiguous_prefix_raises():
    """Auto-prefix refuses to guess between first_stage_model. and
    cond_stage_model. (the shortest-prefix tiebreak silently converted
    the WRONG AE)."""
    pytest.importorskip("torch")
    from test_ae_convert_golden import _sd_tiny_ae
    from jointimagegeneration_tpu.utils.torch_convert import convert_ldm_autoencoder

    sd = {**_sd_tiny_ae(prefix="first_stage_model."),
          **_sd_tiny_ae(seed=2, prefix="cond_stage_model.")}
    with pytest.raises(ValueError, match="embeds 2 AEs"):
        convert_ldm_autoencoder(sd)
    out = convert_ldm_autoencoder(sd, prefix="first_stage_model.")
    assert "encoder" in out


def test_convert_vq_autoencoder():
    """A reference VQModel state_dict (single-z encoder, embed-dim
    quant_conv, quantize.embedding codebook) converts onto our VQModel."""
    torch = pytest.importorskip("torch")
    import flax.serialization

    from test_ae_convert_golden import CH, EMB, MULT, NRB, RES, ZC, _sd_tiny_ae
    from jointimagegeneration_tpu.models.autoencoder import VQModel
    from jointimagegeneration_tpu.utils.torch_convert import convert_ldm_autoencoder

    rs = np.random.RandomState(3)
    t = lambda *s: torch.tensor(rs.randn(*s).astype(np.float32) * 0.2)
    sd = _sd_tiny_ae()
    # KL -> VQ re-shaping: single-z conv_out, embed-dim quant convs, codebook
    sd["encoder.conv_out.weight"] = t(ZC, 2 * CH, 3, 3)
    sd["encoder.conv_out.bias"] = t(ZC)
    sd["quant_conv.weight"], sd["quant_conv.bias"] = t(EMB, ZC, 1, 1), t(EMB)
    sd["post_quant_conv.weight"] = t(ZC, EMB, 1, 1)
    sd["quantize.embedding.weight"] = t(16, EMB)
    params = convert_ldm_autoencoder(sd)
    assert params["quantize"]["codebook"].shape == (16, EMB)
    vq = VQModel(embed_dim=EMB, n_embed=16, ch=CH, ch_mult=MULT,
                 num_res_blocks=NRB, attn_resolutions=(8,), z_channels=ZC,
                 in_channels=1, out_ch=1, dims=2, resolution=RES)
    template = vq.init(jax.random.key(0), jnp.zeros((1, RES, RES, 1)))
    restored = flax.serialization.from_state_dict(template, {"params": params})
    rec, qloss, idx = vq.apply(restored, jnp.ones((1, RES, RES, 1)))
    assert rec.shape == (1, RES, RES, 1) and np.isfinite(float(qloss))


@pytest.mark.slow
def test_serve_latent_two_stage(tmp_path):
    """The serve CLI drives the latent (`_ae`) route: a first_stage section
    in the config routes two_stage generation (and streaming) through
    LatentSliceLDM with the AE params in the handler state."""
    import base64
    import json
    import threading
    import urllib.request
    from http.server import HTTPServer

    from jointimagegeneration_tpu.cli.serve import make_handler
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import MaskSampler
    from jointimagegeneration_tpu.pipeline import TwoStagePipeline

    ms = MaskSampler.create(
        num_classes=4, time_steps=6, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4)
    spatial = (4, 8, 8)
    msp = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    ae, ae_p = _tiny_ae(1)
    cond_ae, cond_p = _tiny_ae(2, seed=7)
    ldm = SliceLDM.create(
        image_channels=2, cond_channels=2, timesteps=6, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=4, dtype=jnp.float32)
    latent = LatentSliceLDM(inner=ldm, first_stage=ae, cond_stage=cond_ae)
    lp = ldm.init_params(jax.random.key(1), 8)  # latent size 16//2
    state = {
        "ms": ms, "ms_params": msp, "spatial": spatial, "mask_steps": 2,
        "pipe": TwoStagePipeline(ms, latent), "ldm": latent, "ldm_params": lp,
        "ae_params": ae_p, "cond_ae_params": cond_p,
        "ddim": DDIMParams.create(ldm.diffusion, 2), "volume_shape": (4, 16, 16),
    }
    server = HTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        for stream in (False, True):
            body = json.dumps({"kind": "two_stage", "seed": 1, "stream": stream}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                raw = r.read().decode()
            if stream:
                lines = [json.loads(l) for l in raw.splitlines()]
                assert lines[0]["n_slices"] == 4 and lines[-1]["done"] is True
                arr = np.frombuffer(base64.b64decode(lines[1]["data_b64"]), np.float16)
                assert arr.reshape(lines[1]["shape"]).shape == (1, 16, 16, 1)
            else:
                resp = json.loads(raw)
                assert base64.b64decode(resp["ct_nifti_b64"])[:2] == b"\x1f\x8b"
    finally:
        server.shutdown()


@pytest.mark.slow
@pytest.mark.parametrize("ae_type", ["kl", "vq"])
def test_train_ae_cli(tmp_path, ae_type):
    """The first-stage AE training CLI runs both variants from config:
    AutoencoderKL (+PatchGAN, autoencoder.py:385-429) and `type: vq`
    (VQModel + the vqperceptual loss)."""
    from jointimagegeneration_tpu.cli import train_ae

    cfg = {
        "batch_size": 2, "max_steps": 2, "save_freq": 2, "display_freq": 1,
        "output_path": str(tmp_path / "runs"),
        "model": {
            "type": ae_type, "embed_dim": 2, "n_embed": 16,
            "base_learning_rate": 1e-4,
            "ddconfig": {"dims": 2, "ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                         "attn_resolutions": [], "z_channels": 2, "in_channels": 1,
                         "out_ch": 1, "resolution": 16},
            "lossconfig": {"disc_start": 1, "disc_num_layers": 1, "disc_ndf": 8},
        },
        "dataset": {"kind": "synthetic", "num_cases": 4, "slice_shape": [16, 16],
                    "depth": 4},
    }
    cfg_path = tmp_path / f"ae_{ae_type}.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_ae.main([str(cfg_path), f"{ae_type}exp"])
    ckdir = tmp_path / "runs" / f"{ae_type}exp" / "checkpoints"
    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckdir)
    assert mgr.latest_step() == 2
    raw = mgr.restore_raw()
    assert "g_params" in raw and "d_params" in raw
    if ae_type == "vq":
        assert "quantize" in raw["g_params"]["params"]


@pytest.mark.slow
def test_migration_recipe_e2e(tmp_path, capsys):
    """The MIGRATION.md `_ae` porting recipe end-to-end: ONE combined
    Lightning-style checkpoint (model.diffusion_model.* UNet +
    first_stage_model.* + cond_stage_model.* AEs) converted by three
    converter runs, then the latent sampling CLI generates a volume from
    the converted weights with NO fresh-init fallback."""
    torch = pytest.importorskip("torch")
    import sys

    import yaml as _yaml

    sys.path.insert(0, "scripts")
    try:
        from convert_reference_checkpoint import main as convert_main
    finally:
        sys.path.pop(0)
    from test_ae_convert_golden import _sd_tiny_ae
    from test_torch_convert import _sd_tiny

    t = lambda *s: torch.tensor(np.random.RandomState(9).randn(*s).astype(np.float32) * 0.2)
    # UNet re-headed for the latent space: in = z(2) + cond_z(2), out = 2
    sd = _sd_tiny(prefix="model.diffusion_model.")
    sd["model.diffusion_model.input_blocks.0.0.weight"] = t(8, 4, 3, 3)
    sd["model.diffusion_model.out.2.weight"] = t(2, 8, 3, 3)
    sd["model.diffusion_model.out.2.bias"] = t(2)
    sd.update(_sd_tiny_ae(seed=4, prefix="first_stage_model."))
    cond_sd = _sd_tiny_ae(seed=5, prefix="cond_stage_model.")
    # 2-channel condition AE ([prev slice, mask slice])
    cond_sd["cond_stage_model.encoder.conv_in.weight"] = t(8, 2, 3, 3)
    cond_sd["cond_stage_model.decoder.conv_out.weight"] = t(2, 8, 3, 3)
    cond_sd["cond_stage_model.decoder.conv_out.bias"] = t(2)
    sd.update(cond_sd)
    pt = tmp_path / "ldm_ae_full.pt"
    torch.save({"state_dict": sd}, pt)

    convert_main([str(pt), str(tmp_path / "unet"), "--model-channels", "8",
                  "--channel-mult", "1,2", "--num-res-blocks", "1",
                  "--attention-resolutions", "2", "--num-head-channels", "4"])
    convert_main([str(pt), str(tmp_path / "ae"), "--ae", "first_stage_model."])
    convert_main([str(pt), str(tmp_path / "cond"), "--ae", "cond_stage_model."])

    dd = {"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [8],
          "z_channels": 2, "resolution": 16}
    cfg = {
        "stage": "ct", "n_cases": 1, "ddim_steps": 2, "seed": 3, "metrics": False,
        "output_path": str(tmp_path / "samples"),
        "stage2": {
            "slice_size": 16, "timesteps": 8, "bf16": False,
            "channels": 2, "cond_channels": 2,
            "checkpoint": str(tmp_path / "unet"),
            "unet_config": {"params": {"model_channels": 8, "channel_mult": [1, 2],
                                       "attention_resolutions": [2],
                                       "num_res_blocks": 1, "num_head_channels": 4}},
            "first_stage": {"embed_dim": 2, "checkpoint": str(tmp_path / "ae"),
                            "ddconfig": {**dd, "in_channels": 1, "out_ch": 1}},
            "cond_stage": {"embed_dim": 2, "checkpoint": str(tmp_path / "cond"),
                           "ddconfig": {**dd, "in_channels": 2, "out_ch": 2}},
            "dataset": {"kind": "synthetic", "slice_shape": [16, 16], "depth": 3,
                        "num_cases": 1},
        },
    }
    p = tmp_path / "sample_ported.yml"
    p.write_text(_yaml.safe_dump(cfg))
    from jointimagegeneration_tpu.cli import sample as sample_cli

    capsys.readouterr()  # drop converter output
    sample_cli.main([str(p)])
    out = capsys.readouterr().out
    assert "FRESH-INIT" not in out, f"a converted checkpoint failed to load:\n{out}"
    from jointimagegeneration_tpu.data import read_nifti

    vol, _ = read_nifti(tmp_path / "samples" / "case_0000" / "image.nii.gz")
    assert np.asarray(vol).shape == (3, 16, 16) and np.all(np.isfinite(np.asarray(vol)))


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
