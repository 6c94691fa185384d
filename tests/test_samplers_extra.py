"""PLMS sampler, tiled apply, LPIPS, FVD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion import DDIMParams, GaussianDiffusion
from jointimagegeneration_tpu.diffusion.plms import plms_sample_loop
from jointimagegeneration_tpu.eval.fvd import downsample_feature_fn, fvd
from jointimagegeneration_tpu.eval.lpips import LPIPS, lpips_three_view
from jointimagegeneration_tpu.ops.tiling import border_weighting, tiled_apply


def test_plms_oracle_converges():
    diff = GaussianDiffusion.create("linear", 1000, linear_start=0.0015, linear_end=0.0195)
    p = DDIMParams.create(diff, 20)
    target = jnp.full((1, 4, 4, 1), 0.3)

    def eps_fn(x, t):
        # oracle eps for fixed target at the subset alpha of this t
        idx = jnp.argmax(p.timesteps == t[0])
        a = p.alphas[idx]
        return (x - jnp.sqrt(a) * target) / jnp.sqrt(1 - a)

    x = jax.random.normal(jax.random.key(0), target.shape)
    out = plms_sample_loop(eps_fn, p, x)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=0.2)
    assert np.isfinite(np.asarray(out)).all()


def test_border_weighting_properties():
    w = np.asarray(border_weighting((8, 8)))
    assert w.shape == (8, 8)
    assert w.max() <= 1.0 and w.min() >= 1e-2
    assert w[4, 4] > w[0, 0]  # center weighted higher than corner


def test_tiled_apply_identity_exact():
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 2))
    out = tiled_apply(lambda t: t, x, patch=(8, 8), stride=(4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_tiled_apply_matches_global_linear():
    # a per-pixel linear fn commutes with tiling exactly
    x = jax.random.normal(jax.random.key(2), (2, 12, 12, 1))
    f = lambda t: t * 3.0 + 1.0
    out = tiled_apply(f, x, patch=(8, 8), stride=(4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(x)), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def lpips_metric():
    return LPIPS()


def test_lpips_zero_for_identical(lpips_metric):
    x = jax.random.uniform(jax.random.key(3), (1, 32, 32, 1))
    d = lpips_metric(x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_positive_and_symmetric(lpips_metric):
    a = jax.random.uniform(jax.random.key(4), (1, 32, 32, 1))
    b = jax.random.uniform(jax.random.key(5), (1, 32, 32, 1))
    dab = float(lpips_metric(a, b)[0])
    dba = float(lpips_metric(b, a)[0])
    assert dab > 0
    assert dab == pytest.approx(dba, rel=1e-5)


def test_lpips_three_view(lpips_metric):
    va = jax.random.uniform(jax.random.key(6), (8, 16, 16))
    vb = jax.random.uniform(jax.random.key(7), (8, 16, 16))
    d = lpips_three_view(lpips_metric, va, vb)
    assert float(d) > 0


def test_fvd_identical_zero_and_shifted_positive():
    rng = np.random.default_rng(0)
    real = [rng.random((8, 16, 16)).astype(np.float32) for _ in range(6)]
    gen_same = [v.copy() for v in real]
    assert fvd(real, gen_same) == pytest.approx(0.0, abs=1e-4)
    gen_shift = [v + 0.5 for v in real]
    assert fvd(real, gen_shift) > 0.1


def test_downsample_feature_deterministic():
    v = np.random.default_rng(1).random((8, 16, 16)).astype(np.float32)
    np.testing.assert_array_equal(downsample_feature_fn(v), downsample_feature_fn(v))


@pytest.mark.slow
def test_ancestral_p_sample_loop_and_progressive():
    """Full-T ancestral sampling as one scan (DDPM.p_sample_loop,
    ddpm.py:254-269/1179-1230) and the pred_x0 progression
    (progressive_denoising, ddpm.py:1123-1177): intermediates collection
    must not perturb the chain, the t=0 row must equal the final sample,
    and log_images(progressive=True) must expose the panel."""
    from jointimagegeneration_tpu.models import SliceLDM

    ldm = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=8, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=4, dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0), 16)
    cond = jnp.zeros((1, 16, 16, 2))

    x = ldm.p_sample_loop(params, jax.random.key(1), cond)
    assert x.shape == (1, 16, 16, 1) and np.isfinite(np.asarray(x)).all()

    x2, rows = ldm.p_sample_loop(params, jax.random.key(1), cond,
                                 return_intermediates=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), rtol=1e-6)
    assert rows.shape == (8, 1, 16, 16, 1)  # T=8, n_rows=6 → every=1
    # rows are in sampling order: the last row is the t=0 step = the sample
    np.testing.assert_allclose(np.asarray(rows[-1]), np.asarray(x2), rtol=1e-6)

    x3, prog = ldm.progressive_denoising(params, jax.random.key(1), cond)
    assert prog.shape == (8, 1, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x2), rtol=1e-6)
    # pred_x0 rows are clipped by clip_denoised and differ from the raw chain
    assert np.abs(np.asarray(prog)).max() <= 1.0 + 1e-6
    # noisiest row first: the early pred_x0 differs from the final one
    assert not np.allclose(np.asarray(prog[0]), np.asarray(prog[-1]))

    panels = ldm.log_images(
        params, jax.random.key(2),
        {"image": jnp.zeros((1, 16, 16, 1)), "cond": cond},
        DDIMParams.create(ldm.diffusion, 2), progressive=True)
    assert panels["progressive_row"].shape[0] == 8
    assert np.isfinite(panels["progressive_row"]).all()
