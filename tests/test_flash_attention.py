"""Flash attention kernel vs plain XLA attention (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.ops.attention import _xla_attention
from jointimagegeneration_tpu.ops.pallas.flash_attention import flash_attention


def _ref(q, k, v):
    scale = 1.0 / math.sqrt(math.sqrt(q.shape[-1]))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("tq,tk,d,bq,bk", [(128, 128, 32, 64, 64), (256, 256, 32, 128, 128)])
def test_flash_matches_xla(tq, tk, d, bq, bk):
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, tq, d))
    k = jax.random.normal(kk, (1, 2, tk, d))
    v = jax.random.normal(kv, (1, 2, tk, d))
    out = flash_attention(q, k, v, block_q=bq, block_k=bk)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_single_block():
    q = jax.random.normal(jax.random.key(1), (2, 1, 64, 16))
    k = jax.random.normal(jax.random.key(2), (2, 1, 64, 16))
    v = jax.random.normal(jax.random.key(3), (2, 1, 64, 16))
    out = flash_attention(q, k, v, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_flash_gradients_match_xla():
    q = jax.random.normal(jax.random.key(4), (1, 1, 128, 16))
    k = jax.random.normal(jax.random.key(5), (1, 1, 128, 16))
    v = jax.random.normal(jax.random.key(6), (1, 1, 128, 16))

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, block_q=64, block_k=64).sum()

    def loss_ref(q, k, v):
        return _ref(q, k, v).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_flash_block_fallback_and_limits():
    """Sequence lengths divisible by a >=128 power-of-two block halve down to
    it (T=1536 -> 512-blocks); lengths with no such divisor raise so the
    dispatch layer falls back to XLA attention instead of a degenerate
    tiny-block kernel; oversized head dims are rejected."""
    q = jnp.zeros((1, 1, 1536, 16))
    out = flash_attention(q, q, q)  # 1024 -> 512 fallback
    assert out.shape == q.shape
    with pytest.raises(ValueError):
        flash_attention(jnp.zeros((1, 1, 1100, 16)), jnp.zeros((1, 1, 1100, 16)),
                        jnp.zeros((1, 1, 1100, 16)))  # best divisor < 128
    with pytest.raises(ValueError):
        flash_attention(jnp.zeros((1, 1, 64, 512)), jnp.zeros((1, 1, 64, 512)),
                        jnp.zeros((1, 1, 64, 512)))


@pytest.mark.slow
def test_flash_backward_kernels_multiblock():
    """dq/dk/dv Pallas kernels across multiple q and k blocks, Tq != Tk."""
    import numpy as np

    b, h, tq, tk, d = 1, 2, 256, 128, 32
    q = jax.random.normal(jax.random.key(10), (b, h, tq, d))
    k = jax.random.normal(jax.random.key(11), (b, h, tk, d))
    v = jax.random.normal(jax.random.key(12), (b, h, tk, d))
    g = jax.random.normal(jax.random.key(13), (b, h, tq, d))

    def ref(q, k, v):
        import math
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

    f_fl = lambda q, k, v: jnp.vdot(flash_attention(q, k, v, block_q=64, block_k=64), g)
    f_rf = lambda q, k, v: jnp.vdot(ref(q, k, v), g)
    g1 = jax.grad(f_fl, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_rf, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4, rtol=2e-4)
