"""Fused ResBlock kernel: interpret-mode Pallas vs XLA composition, and the
GN->affine folding algebra vs flax GroupNorm (reference GroupNorm32
semantics, ccdm/ddpm/models/unet_openai/nn.py:17-19)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.ops.pallas import fused_resblock as fr


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype)


@pytest.mark.slow  # interpret-mode Pallas is slow on CPU
@pytest.mark.parametrize("bias,residual,want_stats", [
    (False, False, False),
    (True, False, True),
    (True, True, False),
])
def test_fused_conv_matches_xla(bias, residual, want_stats):
    d, h, w, cin, cout = 4, 8, 8, 8, 8
    x = _rand(0, (1, d, h, w, cin))
    k = _rand(1, (3, 3, 3, cin, cout)) * 0.2
    scale = jnp.abs(_rand(2, (cin,))) + 0.5
    shift = _rand(3, (cin,)) * 0.1
    b = _rand(4, (cout,)) if bias else None
    r = _rand(5, (1, d, h, w, cout)) if residual else None

    ref = fr._xla_reference(x, k, scale, shift, b, r, want_stats)
    fr._FORCE_PALLAS[0] = True
    try:
        got = fr.fused_affine_silu_conv3d(x, k, scale, shift, b, r, want_stats, 4)
    finally:
        fr._FORCE_PALLAS[0] = False
    if want_stats:
        np.testing.assert_allclose(got[0], ref[0], atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(got[1], ref[1], atol=1e-2, rtol=1e-4)
    else:
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_gn_affine_matches_groupnorm():
    from flax import linen as nn

    c, groups = 16, 4
    x = _rand(0, (1, 4, 6, 6, c))
    gamma = jnp.abs(_rand(1, (c,))) + 0.5
    beta = _rand(2, (c,))

    gn = nn.GroupNorm(num_groups=groups)
    want = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)

    mean, var = fr.group_moments(x, groups)
    scale, shift = fr.gn_affine_from_moments(mean, var, gamma, beta, groups)
    got = x * scale + shift
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_moments_from_channel_sums_match_direct():
    c, groups = 8, 2
    d, h, w = 3, 4, 4
    y = _rand(0, (1, d, h, w, c))
    stats = jnp.stack([
        jnp.sum(y.astype(jnp.float32), axis=(0, 1, 2, 3)),
        jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2, 3)),
    ])
    mean, var = fr.moments_from_channel_sums(stats, d * h * w, groups)
    mean_d, var_d = fr.group_moments(y, groups)
    np.testing.assert_allclose(mean, mean_d, atol=1e-5)
    np.testing.assert_allclose(var, var_d, atol=1e-5)


@pytest.mark.slow
def test_fused_conv_grads_match_xla():
    d, h, w, cin, cout = 4, 8, 8, 8, 8
    x = _rand(0, (1, d, h, w, cin))
    k = _rand(1, (3, 3, 3, cin, cout)) * 0.2
    scale = jnp.abs(_rand(2, (cin,))) + 0.5
    shift = _rand(3, (cin,)) * 0.1
    b = _rand(4, (cout,))

    def loss_fused(x, k, scale, shift, b):
        y, st = fr.fused_affine_silu_conv3d(x, k, scale, shift, b, None, True, 4)
        return jnp.sum(y**2) + 1e-3 * jnp.sum(st)

    def loss_ref(x, k, scale, shift, b):
        y, st = fr._xla_reference(x, k, scale, shift, b, None, True)
        return jnp.sum(y**2) + 1e-3 * jnp.sum(st)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k, scale, shift, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, scale, shift, b)
    for a, bgrad in zip(g1, g2):
        np.testing.assert_allclose(a, bgrad, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("fused_mode", ["kernel", "xla"])
@pytest.mark.parametrize("in_ch,out_ch,ssn", [(8, 8, False), (8, 16, False), (8, 8, True)])
def test_resblock_fused_matches_unfused(in_ch, out_ch, ssn, fused_mode):
    """Both fused paths must reproduce the plain XLA block."""
    from jointimagegeneration_tpu.nn.blocks import ResBlock

    x = _rand(0, (1, 4, 8, 8, in_ch))
    emb = _rand(1, (1, 12))
    rb_u = ResBlock(out_ch, dims=3, use_scale_shift_norm=ssn, fused=False)
    rb_f = ResBlock(out_ch, dims=3, use_scale_shift_norm=ssn, fused=fused_mode)
    params = rb_u.init(jax.random.key(2), x, emb)
    # conv2 is zero-init (reference zero_module) -> un-zero so the second
    # half-block (GN2 affine + conv2) actually contributes
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: _rand(9, p.shape) * 0.1
        if any(getattr(k, "key", None) == "conv2_kernel" for k in path) else p,
        params,
    )
    y_u = rb_u.apply(params, x, emb)
    y_f = rb_f.apply(params, x, emb)
    assert y_f.shape == y_u.shape
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u), atol=2e-4, rtol=2e-4)


def test_resblock_fused_grads_match(in_ch=8, out_ch=8):
    from jointimagegeneration_tpu.nn.blocks import ResBlock

    x = _rand(0, (1, 4, 8, 8, in_ch))
    emb = _rand(1, (1, 12))
    rb_u = ResBlock(out_ch, dims=3, fused=False)
    rb_f = ResBlock(out_ch, dims=3, fused=True)
    params = rb_u.init(jax.random.key(2), x, emb)
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: _rand(9, p.shape) * 0.1
        if any(getattr(k, "key", None) == "conv2_kernel" for k in path) else p,
        params,
    )
    gu = jax.grad(lambda p: jnp.sum(rb_u.apply(p, x, emb) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(rb_f.apply(p, x, emb) ** 2))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3)
