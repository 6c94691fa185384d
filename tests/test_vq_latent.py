"""VQ first stage for the latent route (VQModelInterface parity).

The reference LDM can diffuse inside a VQGAN's CONTINUOUS pre-quant
latent: VQModelInterface.encode stops before the codebook and .decode
routes through it (latentdiffusion/ldm/models/autoencoder.py:283-301;
decode_first_stage dispatches on the class, ddpm.py:744-767).  These
tests cover the VQModel interface methods, the LatentSliceLDM dispatch,
and the `first_stage: {type: vq}` config route.
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL, VQModel
from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM


def _tiny_vq(in_ch=1, out_ch=None, seed=3):
    vq = VQModel(embed_dim=2, n_embed=16, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), z_channels=2, in_channels=in_ch,
                 out_ch=out_ch or in_ch, dims=2, resolution=16)
    p = vq.init(jax.random.key(seed), jnp.zeros((1, 16, 16, in_ch)))
    return vq, p


@pytest.mark.fast
def test_vq_interface_semantics():
    """encode_prequant is the codebook-free encode; decode_prequant
    quantizes first (== decode of the quantized encode) unless
    force_not_quantize (autoencoder.py:288-301)."""
    vq, p = _tiny_vq()
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    h = vq.apply(p, x, method=vq.encode_prequant)
    assert h.shape == (2, 8, 8, 2)
    assert vq.downsample_factor == 2

    zq, _, _ = vq.apply(p, x, method=vq.encode)
    rec_via_interface = vq.apply(p, h, method=vq.decode_prequant)
    rec_via_codebook = vq.apply(p, zq, method=vq.decode)
    np.testing.assert_allclose(np.asarray(rec_via_interface),
                               np.asarray(rec_via_codebook), rtol=1e-6, atol=1e-6)

    # force_not_quantize skips the codebook: identical to decoding h raw
    rec_raw = vq.apply(p, h, method=lambda m, hh: m.decode_prequant(hh, force_not_quantize=True))
    rec_direct = vq.apply(p, h, method=vq.decode)
    np.testing.assert_allclose(np.asarray(rec_raw), np.asarray(rec_direct),
                               rtol=1e-6, atol=1e-6)
    # and differs from the quantized route for a generic h
    assert not np.allclose(np.asarray(rec_raw), np.asarray(rec_via_interface))


@pytest.mark.slow
def test_latent_ldm_vq_first_stage_samples_and_trains():
    """LatentSliceLDM dispatches on the stage type: with a VQ first stage
    the diffusion space is the pre-quant latent, samples decode through
    the codebook to pixel space, and the latent train step moves the UNet."""
    from jointimagegeneration_tpu.train import (
        EMATrainState,
        build_optimizer,
        make_latent_ldm_train_step,
    )
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams

    vq, vq_p = _tiny_vq(1)
    cond_ae = AutoencoderKL(embed_dim=2, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=(), z_channels=2, in_channels=2,
                            out_ch=2, dims=2, resolution=16)
    cond_p = cond_ae.init(jax.random.key(7), jnp.zeros((1, 16, 16, 2)),
                          jax.random.key(8))
    ldm = SliceLDM.create(
        image_channels=2, cond_channels=2, timesteps=8, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=4, dtype=jnp.float32)
    latent = LatentSliceLDM(inner=ldm, first_stage=vq, cond_stage=cond_ae,
                            scale_factor=1.0)

    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
    # scale_by_std calibration goes through the pre-quant encode
    latent = latent.calibrate_scale_factor(vq_p, x)
    assert np.isfinite(latent.scale_factor) and latent.scale_factor > 0

    z = latent.encode(vq_p, x)
    assert z.shape == (2, 8, 8, 2)
    rec = latent.decode(vq_p, z)
    assert rec.shape == x.shape

    params = ldm.init_params(jax.random.key(0), 8)
    ddim = DDIMParams.create(latent.diffusion, 2)
    cond_pix = jax.random.normal(jax.random.key(2), (1, 16, 16, 2))
    out = latent.sample_slice(params, vq_p, jax.random.key(3), cond_pix, ddim,
                              cond_ae_params=cond_p)
    assert out.shape == (1, 16, 16, 1) and np.all(np.isfinite(np.asarray(out)))

    # quantize_denoised ancestral chain in the VQ latent space
    # (p_sample quantize_denoised, ddpm.py:1092-1106; clip_denoised=False
    # in latent space per the reference default)
    qfn = latent.make_quantize_fn(vq_p)
    assert qfn is not None
    cond_z = latent.encode_cond(cond_p, cond_pix)
    zq = ldm.p_sample_loop(params, jax.random.key(6), cond_z,
                           clip_denoised=False, quantize_fn=qfn)
    dec = latent.decode(vq_p, zq)
    assert dec.shape == (1, 16, 16, 1) and np.all(np.isfinite(np.asarray(dec)))

    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-3))
    step = jax.jit(make_latent_ldm_train_step(latent, vq_p, cond_p))
    batch = {"image": x, "cond": jax.random.normal(jax.random.key(4), (2, 16, 16, 2))}
    state2, metrics = step(state, batch, jax.random.key(5))
    assert np.isfinite(float(metrics["loss"])) and bool(metrics["grad_finite"])
    moved = jax.tree.map(lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
                         state.params, state2.params)
    assert any(jax.tree.leaves(moved))


@pytest.mark.slow
def test_vq_first_stage_config_route(tmp_path, capsys):
    """`first_stage: {type: vq}` in a ct sampling config builds the VQGAN
    first stage end to end (build_autoencoder type dispatch +
    load_ae_params VQ init + sample_volume through the codebook)."""
    from jointimagegeneration_tpu.cli import sample as sample_cli

    dd = {"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [],
          "z_channels": 2, "resolution": 16}
    cfg = {
        "stage": "ct", "n_cases": 1, "ddim_steps": 2, "seed": 3, "metrics": False,
        "output_path": str(tmp_path / "samples"),
        "stage2": {
            "slice_size": 16, "timesteps": 8, "bf16": False,
            "channels": 2, "cond_channels": 2,
            "unet": {"model_channels": 8, "channel_mult": [1, 2],
                     "attention_resolutions": [], "num_res_blocks": 1,
                     "num_head_channels": 4},
            "first_stage": {"type": "vq", "embed_dim": 2, "n_embed": 16,
                            "ddconfig": {**dd, "in_channels": 1, "out_ch": 1}},
            "cond_stage": {"embed_dim": 2,
                           "ddconfig": {**dd, "in_channels": 2, "out_ch": 2}},
            "dataset": {"kind": "synthetic", "slice_shape": [16, 16], "depth": 3,
                        "num_cases": 1},
        },
    }
    p = tmp_path / "vq_ct.yml"
    p.write_text(yaml.safe_dump(cfg))
    sample_cli.main([str(p)])
    from jointimagegeneration_tpu.data import read_nifti

    vol, _ = read_nifti(tmp_path / "samples" / "case_0000" / "image.nii.gz")
    vol = np.asarray(vol, np.float32)
    assert vol.shape == (3, 16, 16) and np.all(np.isfinite(vol))
