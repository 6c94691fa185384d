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
