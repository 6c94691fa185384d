import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL
from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


@pytest.fixture(scope="module")
def setup():
    ae = AutoencoderKL(embed_dim=2, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, dims=2, resolution=16)
    model = LatentSliceLDM.create(
        first_stage=ae,
        image_channels=2, cond_channels=2,  # latent z has 2 channels
        timesteps=50, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    x = jnp.zeros((1, 16, 16, 1))
    ae_params = ae.init(jax.random.key(0), x, jax.random.key(1))
    ldm_params = model.inner.init_params(jax.random.key(2), 8)  # latent is 8x8
    return model, ae_params, ldm_params


def test_encode_decode_roundtrip_shapes(setup):
    model, ae_params, _ = setup
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 1))
    z = model.encode(ae_params, x)
    assert z.shape == (2, 8, 8, 2)
    rec = model.decode(ae_params, z)
    assert rec.shape == x.shape


def test_scale_factor_calibration(setup):
    model, ae_params, _ = setup
    x = jax.random.normal(jax.random.key(4), (4, 16, 16, 1))
    cal = model.calibrate_scale_factor(ae_params, x)
    z = cal.encode(ae_params, x)
    # calibrated: unit std (ddpm.py scale_by_std)
    assert float(jnp.std(z)) == pytest.approx(1.0, rel=0.05)


def test_latent_sampling_decodes_to_pixel_space(setup):
    model, ae_params, ldm_params = setup
    ddim = DDIMParams.create(model.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 1))
    out = model.sample_slice(ldm_params, ae_params, jax.random.key(5), cond, ddim)
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_slice_intermediates_and_inpaint():
    ldm = SliceLDM.create(timesteps=50, model_channels=8, channel_mult=(1, 2),
                          attention_resolutions=(), num_res_blocks=1, num_head_channels=4)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 2))
    x, inter = ldm.sample_slice(params, jax.random.key(1), cond, ddim, return_intermediates=True)
    assert inter.shape == (5, 1, 16, 16, 1)
    x0 = jnp.ones((1, 16, 16, 1)) * 0.5
    mask = jnp.zeros_like(x0).at[:, :, :8].set(1.0)
    out = ldm.sample_slice(params, jax.random.key(2), cond, ddim, inpaint_mask=mask, inpaint_x0=x0)
    assert np.isfinite(np.asarray(out)).all()


def test_log_images_keys():
    ldm = SliceLDM.create(timesteps=50, model_channels=8, channel_mult=(1, 2),
                          attention_resolutions=(), num_res_blocks=1, num_head_channels=4)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    batch = {"image": jnp.zeros((2, 16, 16, 1)), "cond": jnp.zeros((2, 16, 16, 2))}
    logs = ldm.log_images(params, jax.random.key(1), batch, ddim, n_row=2)
    assert {"inputs", "samples", "denoise_row", "diffusion_row", "inpaint",
            "outpaint", "conditioning"} <= set(logs)
    assert logs["samples"].shape == (2, 16, 16, 1)
    assert logs["outpaint"].shape == (2, 16, 16, 1)
    assert np.isfinite(logs["outpaint"]).all()
    assert logs["diffusion_row"].shape == (6, 2, 16, 16, 1)


def test_cfg_changes_output():
    ldm = SliceLDM.create(timesteps=50, model_channels=8, channel_mult=(1, 2),
                          attention_resolutions=(), num_res_blocks=1, num_head_channels=4)
    params = ldm.init_params(jax.random.key(0), 16)
    # randomize head so cond actually matters
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jax.random.normal(jax.random.key(9), p.shape) * 0.05
        if any(getattr(k, "key", None) == "out_conv" for k in path) else p,
        params,
    )
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.ones((1, 16, 16, 2))
    a = ldm.sample_slice(params, jax.random.key(1), cond, ddim, guidance_scale=1.0)
    b = ldm.sample_slice(params, jax.random.key(1), cond, ddim, guidance_scale=3.0)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
    # CFG threads through the autoregressive volume sampler (the CLI's
    # `guidance_scale:` route) and changes its output too
    mask = jnp.ones((1, 2, 16, 16, 1))
    va = ldm.sample_volume(params, jax.random.key(2), mask, ddim, guidance_scale=1.0)
    vb = ldm.sample_volume(params, jax.random.key(2), mask, ddim, guidance_scale=3.0)
    assert va.shape == (1, 2, 16, 16, 1)
    assert np.abs(np.asarray(va) - np.asarray(vb)).max() > 0


def test_cfg_scale_does_not_retrace():
    """The CFG scale rides the scan carry as a TRACED input: sweeping it
    (the serve request pattern) must reuse ONE compiled program — a
    client-controlled float baked as a constant would recompile the whole
    slice program per value (round-3 review finding)."""
    ldm = SliceLDM.create(timesteps=20, model_channels=8, channel_mult=(1, 2),
                          attention_resolutions=(), num_res_blocks=1, num_head_channels=4)
    params = ldm.init_params(jax.random.key(0), 16)
    # un-zero the output head so the CFG direction is nonzero
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jax.random.normal(jax.random.key(9), p.shape) * 0.05
        if any(getattr(k, "key", None) == "out_conv" for k in path) else p,
        params,
    )
    ddim = DDIMParams.create(ldm.diffusion, 2)
    cond = jnp.ones((1, 16, 16, 2))

    traces = 0
    def f(params, key, cond, gs):
        nonlocal traces
        traces += 1
        return ldm.sample_slice(params, key, cond, ddim, guidance_scale=gs)

    jf = jax.jit(f)
    outs = [jf(params, jax.random.key(1), cond, gs) for gs in (1.5, 2.0, 3.0)]
    assert traces == 1, f"guidance sweep retraced {traces}x"
    assert np.abs(np.asarray(outs[0]) - np.asarray(outs[2])).max() > 0

    # stream_volume caches ONE jitted program per (tile, cfg-on, warm,
    # sampler) quad
    mask = jnp.ones((1, 2, 16, 16, 1))
    for gs in (2.0, 3.0, 4.5):
        for _ in ldm.stream_volume(params, jax.random.key(2), mask, ddim,
                                   guidance_scale=gs):
            pass
    assert set(ldm._stream_jit_cache) == {(None, True, None, "ddim")}


def test_plms_slice_sampler():
    ldm = SliceLDM.create(timesteps=50, model_channels=8, channel_mult=(1, 2),
                          attention_resolutions=(), num_res_blocks=1, num_head_channels=4)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 2))
    out = ldm.sample_slice_plms(params, jax.random.key(1), cond, ddim)
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_slice_pair_h5_cache(tmp_path):
    import json
    from jointimagegeneration_tpu.data import write_nifti
    from jointimagegeneration_tpu.data.datasets import RuijinSlicePairDataset

    rng = np.random.default_rng(0)
    index = {}
    for name in ["c1", "c2"]:
        write_nifti(tmp_path / f"{name}_img.nii.gz", rng.normal(0, 100, (4, 8, 8)).astype(np.float32))
        write_nifti(tmp_path / f"{name}_seg.nii.gz", rng.choice([0, 1, 5], (4, 8, 8)).astype(np.int16))
        index[name] = {"image": f"{name}_img.nii.gz", "totalseg": f"{name}_seg.nii.gz"}
    (tmp_path / "index.json").write_text(json.dumps(index))
    cache = str(tmp_path / "cache.h5")
    ds = RuijinSlicePairDataset(str(tmp_path / "index.json"), split="train",
                                slice_shape=(8, 8), val_fraction=0.5, cache_h5=cache)
    a = ds[0]
    # second load hits the cache and must be identical
    ds.rng = np.random.default_rng(17)  # reset slice rng to reproduce
    ds2 = RuijinSlicePairDataset(str(tmp_path / "index.json"), split="train",
                                 slice_shape=(8, 8), val_fraction=0.5, cache_h5=cache)
    b = ds2[0]
    np.testing.assert_allclose(a["image"], b["image"])
    import h5py
    with h5py.File(cache, "r") as f:
        assert len(f.keys()) >= 1
