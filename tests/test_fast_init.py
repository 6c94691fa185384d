"""shape_init (bench/dev fast parameter materialisation) and the
checksum/full-mask chunked-pipeline program variants bench.py relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
from jointimagegeneration_tpu.pipeline.two_stage import make_chunked_two_stage_programs
from jointimagegeneration_tpu.utils.fast_init import shape_init


@pytest.fixture(scope="module")
def tiny_ms():
    return MaskSampler.create(
        num_classes=4, time_steps=20, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(2,), num_res_blocks=1, num_head_channels=4)


@pytest.fixture(scope="module")
def tiny_ldm():
    return SliceLDM.create(
        timesteps=100, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(2,), num_res_blocks=1, num_head_channels=4)


def test_shape_init_matches_real_init_tree(tiny_ms):
    spatial = (4, 8, 8)
    thunk = lambda k: tiny_ms.init_params(k, spatial, cond_channels=1)
    real = thunk(jax.random.key(0))
    fast = shape_init(thunk, seed=0)
    assert jax.tree.structure(real) == jax.tree.structure(fast)
    for r, f in zip(jax.tree.leaves(real), jax.tree.leaves(fast)):
        assert r.shape == f.shape
        assert r.dtype == f.dtype
        assert np.isfinite(np.asarray(f, np.float32)).all()


def test_shape_init_is_deterministic(tiny_ms):
    thunk = lambda k: tiny_ms.init_params(k, (4, 8, 8), cond_channels=1)
    a = shape_init(thunk, seed=7)
    b = shape_init(thunk, seed=7)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x, np.float32), np.asarray(y, np.float32))


def test_ldm_param_tree_is_size_independent(tiny_ldm):
    """bench.py shares ONE LDM tree across the 256² and 512² legs."""
    s16 = jax.eval_shape(lambda k: tiny_ldm.init_params(k, 16), jax.random.key(0))
    s32 = jax.eval_shape(lambda k: tiny_ldm.init_params(k, 32), jax.random.key(0))
    assert jax.tree.structure(s16) == jax.tree.structure(s32)
    for a, b in zip(jax.tree.leaves(s16), jax.tree.leaves(s32)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_chunked_programs_checksum_and_full_mask_variants(tiny_ms, tiny_ldm):
    """The bench-oriented variants (checksum outputs baked into the
    programs, mask slicing inside the chunk program) must produce
    bit-identical volumes to the default chunked path."""
    spatial = (2, 8, 8)
    mp = shape_init(lambda k: tiny_ms.init_params(k, spatial, cond_channels=0), seed=0)
    lp = shape_init(lambda k: tiny_ldm.init_params(k, 16), seed=1)
    ddim = DDIMParams.create(tiny_ldm.diffusion, 5)
    kw = dict(mask_shape=(1, *spatial), volume_shape=(4, 16, 16), ddim=ddim,
              chunk=2, mask_steps=3)

    mask_a, chunk_a = make_chunked_two_stage_programs(tiny_ms, tiny_ldm, **kw)
    mask_b, chunk_b = make_chunked_two_stage_programs(
        tiny_ms, tiny_ldm, with_checksum=True, full_mask=True, **kw)

    kmask = jax.random.key(2)
    mv_a = mask_a(mp, kmask)
    mv_b, msum = mask_b(mp, kmask)
    np.testing.assert_array_equal(np.asarray(mv_a), np.asarray(mv_b))
    np.testing.assert_allclose(float(msum), float(np.asarray(mv_a).sum()), rtol=1e-5)

    init_a = jnp.zeros((1, 16, 16, 1), mv_a.dtype)
    init_b = init_a
    vols_a, vols_b = [], []
    for k in range(2):
        kk = jax.random.key(10 + k)
        va, init_a = chunk_a(lp, kk, mv_a[:, 2 * k: 2 * k + 2], init_a)
        vb, init_b, csum = chunk_b(lp, kk, mv_b, jnp.int32(2 * k), init_b)
        vols_a.append(np.asarray(va))
        vols_b.append(np.asarray(vb))
        np.testing.assert_allclose(float(csum), vols_b[-1].sum(), rtol=1e-5)
    np.testing.assert_array_equal(np.concatenate(vols_a, 1), np.concatenate(vols_b, 1))
