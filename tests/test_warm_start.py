"""Warm-start autoregressive sampling (beyond-reference speed knob).

`warm_start=f` runs only the last round(f·S) DDIM steps for slices after
the first, initialised from the previous slice's raw sample noised to
that level (SDEdit-style truncation — adjacent CT slices are strongly
correlated).  The reference always runs the full subset from pure noise
per slice (sample_diffusion.py:208-223); default None keeps that exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM


def _tiny_ldm(timesteps=20):
    return SliceLDM.create(timesteps=timesteps, model_channels=8, channel_mult=(1, 2),
                           attention_resolutions=(), num_res_blocks=1, num_head_channels=4)


def _randomize_head(params, scale=0.05):
    # un-zero the zero-init output conv so the model is nontrivial
    return jax.tree_util.tree_map_with_path(
        lambda path, p: jax.random.normal(jax.random.key(9), p.shape) * scale
        if any(getattr(k, "key", None) == "out_conv" for k in path) else p,
        params,
    )


def test_start_index_telescopes_with_zero_eps():
    """Exact closed-form check of the start_index plumbing: a fresh-init
    UNet has a zero-init out_conv, so e_t ≡ 0 and each eta=0 DDIM step is
    x -> sqrt(a_prev/a_t)·x.  A chain started at index k from x therefore
    telescopes to x·sqrt(alphas_prev[0]/alphas[k-1]) — any off-by-one in
    the truncated index range breaks the equality bit-for-bit."""
    ldm = _tiny_ldm()
    params = ldm.init_params(jax.random.key(0), 16)  # out_conv zero-init -> e_t = 0
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 2))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))
    for k in (1, 3, 5):
        out = ldm.sample_slice(params, jax.random.key(2), cond, ddim,
                               x_T=x, start_index=k)
        expect = x * jnp.sqrt(ddim.alphas_prev[0] / ddim.alphas[k - 1])
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)
    # full-length start_index == default full chain, bit for bit
    full = ldm.sample_slice(params, jax.random.key(2), cond, ddim, x_T=x)
    k5 = ldm.sample_slice(params, jax.random.key(2), cond, ddim, x_T=x,
                          start_index=ddim.num_steps)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(k5))


def test_start_index_validation():
    ldm = _tiny_ldm()
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 2))
    with pytest.raises(ValueError):
        ldm.sample_slice(params, jax.random.key(1), cond, ddim, start_index=6)
    with pytest.raises(ValueError):
        ldm.sample_slice(params, jax.random.key(1), cond, ddim, start_index=0)
    with pytest.raises(ValueError):
        SliceLDM.warm_start_index(ddim, 0.0)
    with pytest.raises(ValueError):
        SliceLDM.warm_start_index(ddim, 1.5)
    assert SliceLDM.warm_start_index(ddim, None) is None
    assert SliceLDM.warm_start_index(ddim, 0.4) == 2
    assert SliceLDM.warm_start_index(ddim, 1e-9) == 1  # floor at one step


def test_cold_stream_single_program():
    """With warm_start off, streaming must hit ONE jitted signature for
    every slice — the raw-sample carry stays None so the unused prev_raw
    argument never flips the cold program's signature to a tensor."""
    ldm = _tiny_ldm()
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 2)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    for _ in ldm.stream_volume(params, jax.random.key(1), mask, ddim):
        pass
    (fn,) = ldm._stream_jit_cache.values()
    assert fn._cache_size() == 1


@pytest.mark.slow
def test_sample_volume_warm_start_shapes_and_differs():
    ldm = _tiny_ldm()
    params = _randomize_head(ldm.init_params(jax.random.key(0), 16))
    ddim = DDIMParams.create(ldm.diffusion, 4)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    cold = ldm.sample_volume(params, jax.random.key(1), mask, ddim)
    warm = ldm.sample_volume(params, jax.random.key(1), mask, ddim, warm_start=0.5)
    assert warm.shape == (1, 3, 16, 16, 1)
    assert np.isfinite(np.asarray(warm)).all()
    # slice 0 runs the identical full chain (same key path), later slices
    # run the truncated chain and must differ
    np.testing.assert_array_equal(np.asarray(cold[:, 0]), np.asarray(warm[:, 0]))
    assert np.abs(np.asarray(cold[:, 1:]) - np.asarray(warm[:, 1:])).max() > 0
    # warm_start also composes with CFG (both carries extended)
    warm_cfg = ldm.sample_volume(params, jax.random.key(1), mask, ddim,
                                 warm_start=0.5, guidance_scale=2.0)
    assert np.isfinite(np.asarray(warm_cfg)).all()
    assert np.abs(np.asarray(warm_cfg) - np.asarray(warm)).max() > 0


@pytest.mark.slow
def test_stream_volume_matches_sample_volume_warm():
    """stream_volume shares _volume_slice_step and the key-split order with
    sample_volume — warm-start streaming must be bit-identical."""
    ldm = _tiny_ldm()
    params = _randomize_head(ldm.init_params(jax.random.key(0), 16))
    ddim = DDIMParams.create(ldm.diffusion, 4)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    whole = ldm.sample_volume(params, jax.random.key(1), mask, ddim, warm_start=0.5)
    streamed = jnp.stack(
        list(ldm.stream_volume(params, jax.random.key(1), mask, ddim, warm_start=0.5)), axis=1)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(streamed))


@pytest.mark.slow
def test_latent_sample_volume_warm_start():
    from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL
    from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM

    fs = AutoencoderKL(embed_dim=2, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=1, out_ch=1,
                       resolution=16)
    cs = AutoencoderKL(embed_dim=2, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=2, out_ch=2,
                       resolution=16)
    model = LatentSliceLDM(
        inner=SliceLDM.create(
            image_channels=2, cond_channels=2, timesteps=20, model_channels=8,
            channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
            num_head_channels=4),
        first_stage=fs, cond_stage=cs, scale_factor=1.0)
    fs_params = fs.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    cs_params = cs.init(jax.random.key(2), jnp.zeros((1, 16, 16, 2)), jax.random.key(3))
    params = model.inner.init_params(jax.random.key(4), 8)
    ddim = DDIMParams.create(model.diffusion, 4)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    warm = model.sample_volume(params, fs_params, jax.random.key(3), mask, ddim,
                               cond_ae_params=cs_params, warm_start=0.5)
    assert warm.shape == (1, 3, 16, 16, 1)
    assert np.isfinite(np.asarray(warm)).all()
    streamed = jnp.stack(
        list(model.stream_volume(params, fs_params, jax.random.key(3), mask, ddim,
                                 cond_ae_params=cs_params, warm_start=0.5)), axis=1)
    # same math/keys; the scan-fused whole-volume program and the per-slice
    # jitted programs fuse the AE convs differently (float-level only)
    np.testing.assert_allclose(np.asarray(warm), np.asarray(streamed), atol=2e-5)


@pytest.mark.slow
def test_warm_start_config_key_ct_sample_cli(tmp_path):
    """`warm_start:` in the sample config routes the truncated-chain
    autoregression end to end (stage: ct)."""
    from jointimagegeneration_tpu.cli import sample as sample_cli

    cfg = {
        "stage": "ct", "n_cases": 1, "ddim_steps": 4, "seed": 5, "metrics": False,
        "output_path": str(tmp_path / "samples"),
        "warm_start": 0.5,
        "stage2": {
            "timesteps": 8, "bf16": False, "slice_size": 16,
            "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                     "num_res_blocks": 1, "num_head_channels": 4},
            "dataset": {"kind": "synthetic", "num_cases": 2, "slice_shape": [16, 16], "depth": 3},
        },
    }
    p = tmp_path / "ct_warm.yml"
    p.write_text(yaml.safe_dump(cfg))
    sample_cli.main([str(p)])
    from jointimagegeneration_tpu.data import read_nifti

    vol, _ = read_nifti(tmp_path / "samples" / "case_0000" / "image.nii.gz")
    vol = np.asarray(vol, np.float32)
    assert vol.shape == (3, 16, 16) and np.all(np.isfinite(vol))


def test_batched_fast_route_serving_program():
    """The production batch-serving program (scripts/probe_serving_fast.py,
    cli/serve volume batching): batched sample_volume with sampler='dpm'
    + warm_start — per-volume results must equal the b=1 runs stacked
    only in SHAPE/finiteness (RNG differs by construction), and the
    batch dimension must be independent: identical inputs per slot give
    identical outputs per slot under a shared key."""
    ldm = _tiny_ldm(timesteps=100)
    params = _randomize_head(ldm.init_params(jax.random.key(0), 16))
    ddim = DDIMParams.create(ldm.diffusion, 5, method="uniform_lambda")
    mask = jnp.zeros((2, 3, 16, 16, 1))
    vol = jax.jit(lambda p, k: ldm.sample_volume(
        p, k, mask, ddim, sampler="dpm", warm_start=0.4))(params, jax.random.key(1))
    assert vol.shape == (2, 3, 16, 16, 1)
    arr = np.asarray(vol)
    assert np.isfinite(arr).all()
    # identical per-slot conditioning + per-batch-broadcast RNG => the two
    # slots see different noise draws (batch must not share one stream)
    assert not np.allclose(arr[0], arr[1])
