"""End-to-end tiny-model pipeline tests (BASELINE.md milestone configs 1-3,
scaled down for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
from jointimagegeneration_tpu.pipeline import TwoStagePipeline, upsample_labels

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


@pytest.fixture(scope="module")
def tiny_mask_sampler():
    return MaskSampler.create(
        num_classes=4,
        time_steps=20,
        model_channels=8,
        channel_mult=(1, 2),
        attention_resolutions=(2,),
        num_res_blocks=1,
        num_head_channels=4,
    )


@pytest.fixture(scope="module")
def tiny_slice_ldm():
    return SliceLDM.create(
        timesteps=100,
        model_channels=8,
        channel_mult=(1, 2),
        attention_resolutions=(2,),
        num_res_blocks=1,
        num_head_channels=4,
    )


def test_mask_sampler_end_to_end(tiny_mask_sampler):
    ms = tiny_mask_sampler
    spatial = (4, 8, 8)
    params = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    cond = jnp.zeros((1, *spatial, 1))
    sample = jax.jit(lambda p, k: ms.sample(p, k, (1, *spatial), cond=cond, num_steps=5))
    x = sample(params, jax.random.key(1))
    assert x.shape == (1, *spatial, 4)
    arr = np.asarray(x)
    # output is exactly one-hot
    np.testing.assert_array_equal(np.sort(np.unique(arr)), [0.0, 1.0])
    np.testing.assert_allclose(arr.sum(-1), 1.0)


def test_mask_sampler_labels(tiny_mask_sampler):
    ms = tiny_mask_sampler
    spatial = (4, 8, 8)
    params = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    labels = ms.sample_labels(params, jax.random.key(2), (2, *spatial), cond=jnp.zeros((2, *spatial, 1)), num_steps=3)
    assert labels.shape == (2, *spatial)
    assert labels.dtype in (jnp.int32, jnp.int64)
    assert int(labels.max()) < 4 and int(labels.min()) >= 0


def test_slice_ldm_single_slice(tiny_slice_ldm):
    ldm = tiny_slice_ldm
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 10)
    cond = jnp.zeros((1, 16, 16, 2))
    s = jax.jit(lambda p, k: ldm.sample_slice(p, k, cond, ddim))(params, jax.random.key(1))
    assert s.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(s)).all()


def test_slice_ldm_autoregressive_volume(tiny_slice_ldm):
    ldm = tiny_slice_ldm
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    mask = jnp.zeros((1, 3, 16, 16, 1))
    vol = jax.jit(lambda p, k: ldm.sample_volume(p, k, mask, ddim))(params, jax.random.key(1))
    assert vol.shape == (1, 3, 16, 16, 1)
    arr = np.asarray(vol)
    assert np.isfinite(arr).all()
    # per-slice min-max normalisation => each slice spans [0, 1]
    for z in range(3):
        assert arr[0, z].min() == pytest.approx(0.0, abs=1e-6)
        assert arr[0, z].max() == pytest.approx(1.0, abs=1e-6)


def test_upsample_labels_nearest():
    labels = jnp.asarray(np.arange(8).reshape(1, 2, 2, 2))
    up = upsample_labels(labels, (4, 4, 4))
    assert up.shape == (1, 4, 4, 4)
    # nearest keeps the original label set exactly
    np.testing.assert_array_equal(np.unique(np.asarray(up)), np.arange(8))


def test_two_stage_pipeline(tiny_mask_sampler, tiny_slice_ldm):
    ms, ldm = tiny_mask_sampler, tiny_slice_ldm
    spatial = (2, 8, 8)
    mp = ms.init_params(jax.random.key(0), spatial, cond_channels=0)
    lp = ldm.init_params(jax.random.key(1), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    pipe = TwoStagePipeline(ms, ldm)
    ct, labels = pipe(
        mp, lp, jax.random.key(2),
        mask_shape=(1, *spatial), volume_shape=(4, 16, 16), ddim=ddim, mask_steps=3,
    )
    assert ct.shape == (1, 4, 16, 16, 1)
    assert labels.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(ct)).all()
