"""Round-3 fresh-eyes review fixes: x0-parameterization in the subset
samplers, adm y plumbing through log_images, latent return_intermediates,
eta validation for ODE samplers, and the DDIMParams full-chain guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM

pytestmark = pytest.mark.fast


def _tiny(parameterization="eps", timesteps=20, adm=None):
    return SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=timesteps,
        model_channels=8, channel_mult=(1, 2), attention_resolutions=(2,),
        num_res_blocks=1, num_head_channels=4,
        parameterization=parameterization, adm_classes=adm,
    )


def test_x0_parameterization_ddim_matches_analytic():
    """The UNet head is zero-init, so a fresh x0-parameterized model
    predicts x0 = 0 at every step.  The correct DDIM chain then telescopes
    to x_final = x_T * sqrt((1-abar_min)/(1-abar_T)) — a SHRINKING factor;
    the pre-fix behaviour (treating the 0 output as eps) amplifies by
    1/sqrt(abar_min·/abar_T) instead."""
    ldm = _tiny("x0", timesteps=50)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 10)
    cond = jnp.zeros((1, 16, 16, 2))
    x_T = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))
    out = ldm.sample_slice(params, jax.random.key(2), cond, ddim, x_T=x_T)
    a = np.asarray(ddim.alphas)
    ac0 = float(np.asarray(ldm.diffusion.alphas_cumprod)[0])
    # telescoping: x_prev = sqrt((1-a_prev)/(1-a))*x, and alphas_prev[0] is
    # alphas_cumprod[0] (the +1-offset convention, util.py:63-74)
    expected = np.asarray(x_T) * np.sqrt((1.0 - ac0) / (1.0 - a[-1]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3, atol=2e-4)
    # and the multistep solvers run finite (eps-conversion wired there too)
    for sampler in ("plms", "dpm"):
        s = ldm._sample_slice_multistep(params, jax.random.key(3), cond, ddim, sampler, x_T=x_T)
        assert np.isfinite(np.asarray(s)).all()
        assert np.abs(np.asarray(s)).max() < np.abs(np.asarray(x_T)).max() * 2


def test_x0_parameterization_cfg_equivalent_to_post_conversion():
    """CFG composes in model-output space pre-conversion; for an affine
    conversion that equals composing in eps space — both must shrink, not
    blow up, for the zero-output x0 model."""
    ldm = _tiny("x0", timesteps=20)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 2))
    x_T = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))
    out = ldm.sample_slice(params, jax.random.key(2), cond, ddim, x_T=x_T,
                           guidance_scale=3.0)
    ref = ldm.sample_slice(params, jax.random.key(2), cond, ddim, x_T=x_T)
    # zero-output model: cond == uncond branch, CFG must be a no-op
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_adm_log_images_and_volume_do_not_crash():
    """adm-configured models eval without class ids in the batch (zeros
    default) and with them (batch['class_label'] — ddpm.py:1428 key)."""
    ldm = _tiny(adm=5)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 4)
    batch = {"image": jnp.zeros((2, 16, 16, 1)), "cond": jnp.zeros((2, 16, 16, 2))}
    panels = ldm.log_images(params, jax.random.key(1), batch, ddim, n_row=2)
    assert np.isfinite(panels["samples"]).all()
    batch["class_label"] = jnp.array([1, 3], jnp.int32)
    panels = ldm.log_images(params, jax.random.key(1), batch, ddim, n_row=2,
                            progressive=True)
    assert "progressive_row" in panels


def test_latent_sample_slice_return_intermediates():
    from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL
    from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM

    ae = AutoencoderKL(embed_dim=2, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=1,
                       out_ch=1, resolution=16)
    ae_params = ae.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    latent = LatentSliceLDM.create(
        first_stage=ae, image_channels=2, cond_channels=2, timesteps=20,
        model_channels=8, channel_mult=(1, 2), attention_resolutions=(2,),
        num_res_blocks=1, num_head_channels=4,
    )
    params = latent.inner.init_params(jax.random.key(2), 8)
    ddim = DDIMParams.create(latent.diffusion, 4)
    cond = jnp.zeros((1, 8, 8, 2))
    dec, inter = latent.sample_slice(params, ae_params, jax.random.key(3), cond, ddim,
                                     encode_cond=False, return_intermediates=True)
    assert dec.shape == (1, 16, 16, 1)      # decoded pixels
    assert inter.shape[0] == ddim.num_steps  # latent pred_x0 rows


def test_ode_samplers_reject_nonzero_eta():
    ldm = _tiny()
    params = ldm.init_params(jax.random.key(0), 16)
    noisy = DDIMParams.create(ldm.diffusion, 4, eta=0.5)
    mask = jnp.ones((1, 2, 16, 16, 1)) * 0.5
    with pytest.raises(ValueError, match="ddim_eta"):
        ldm.sample_volume(params, jax.random.key(1), mask, noisy, sampler="dpm")
    # eta != 0 stays valid for the stochastic DDIM chain
    out = ldm.sample_volume(params, jax.random.key(1), mask, noisy, sampler="ddim")
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_params_full_chain_guard():
    ldm = _tiny(timesteps=20)
    with pytest.raises(ValueError, match="num_steps < timesteps"):
        DDIMParams.create(ldm.diffusion, 20)
    with pytest.raises(ValueError, match="subset-offset"):
        DDIMParams.create(ldm.diffusion, 19)  # stride-1 subset reaches T
    DDIMParams.create(ldm.diffusion, 10)  # T//2 is always valid
