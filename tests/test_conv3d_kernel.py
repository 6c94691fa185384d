"""Pallas conv3d kernel vs XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.ops.pallas.conv3d import conv3d_3x3

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


def _ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


@pytest.mark.parametrize("shape,cin,cout,th", [
    ((1, 4, 16, 16, 8), 8, 8, 8),
    ((1, 3, 8, 8, 4), 4, 12, 4),
    ((2, 2, 8, 8, 4), 4, 4, 8),
])
def test_conv3d_matches_xla(shape, cin, cout, th):
    x = jax.random.normal(jax.random.key(0), shape)
    k = jax.random.normal(jax.random.key(1), (3, 3, 3, cin, cout)) * 0.1
    np.testing.assert_allclose(
        np.asarray(conv3d_3x3(x, k, tile_h=th)), np.asarray(_ref(x, k)), rtol=1e-4, atol=1e-5
    )


def test_conv3d_fused_silu():
    x = jax.random.normal(jax.random.key(2), (1, 2, 8, 8, 4))
    k = jax.random.normal(jax.random.key(3), (3, 3, 3, 4, 4)) * 0.1
    ref = _ref(x, k)
    np.testing.assert_allclose(
        np.asarray(conv3d_3x3(x, k, tile_h=8, activate=True)),
        np.asarray(ref * jax.nn.sigmoid(ref)),
        rtol=1e-4, atol=1e-5,
    )


def test_conv3d_rejects_ragged_h():
    x = jnp.zeros((1, 2, 10, 8, 4))
    k = jnp.zeros((3, 3, 3, 4, 4))
    with pytest.raises(AssertionError):
        conv3d_3x3(x, k, tile_h=8)


def test_conv3d_gradients_match_xla():
    x = jax.random.normal(jax.random.key(4), (1, 2, 8, 8, 4))
    k = jax.random.normal(jax.random.key(5), (3, 3, 3, 4, 4)) * 0.1

    g1 = jax.grad(lambda x, k: conv3d_3x3(x, k, 8, False).sum(), argnums=(0, 1))(x, k)
    g2 = jax.grad(lambda x, k: _ref(x, k).sum(), argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
