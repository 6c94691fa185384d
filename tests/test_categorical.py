import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion.categorical import (
    CategoricalDiffusion,
    brute_force_theta_post_prob,
    max_prob_one_hot,
    sample_one_hot,
)


@pytest.fixture(scope="module")
def diff():
    return CategoricalDiffusion.create("cosine", time_steps=20, num_classes=5)


def _rand_one_hot(rng, shape, c):
    idx = rng.integers(0, c, size=shape)
    return np.eye(c)[idx].astype(np.float32)


def _rand_probs(rng, shape, c):
    p = rng.random(shape + (c,)).astype(np.float32) + 0.05
    return p / p.sum(-1, keepdims=True)


def test_q_probs_are_valid_distributions(diff):
    rng = np.random.default_rng(0)
    x0 = _rand_one_hot(rng, (2, 4, 4, 4), 5)
    for t in [1, 10, 20]:
        tv = jnp.full((2,), t, jnp.int32)
        p = diff.q_xt_given_x0_probs(jnp.asarray(x0), tv)
        np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)
        assert (np.asarray(p) >= 0).all()
        p1 = diff.q_xt_given_xtm1_probs(jnp.asarray(x0), tv)
        np.testing.assert_allclose(np.asarray(p1).sum(-1), 1.0, rtol=1e-5)


def test_q_at_T_is_nearly_uniform(diff):
    rng = np.random.default_rng(1)
    x0 = _rand_one_hot(rng, (1, 2, 2, 2), 5)
    p = diff.q_xt_given_x0_probs(jnp.asarray(x0), jnp.array([20]))
    np.testing.assert_allclose(np.asarray(p), 1.0 / 5, atol=6e-3)


def test_theta_post_normalised_and_boundary(diff):
    rng = np.random.default_rng(2)
    xt = _rand_one_hot(rng, (2, 3, 3), 5)
    x0 = _rand_one_hot(rng, (2, 3, 3), 5)
    for t in [1, 2, 20]:
        tv = jnp.full((2,), t, jnp.int32)
        th = np.asarray(diff.theta_post(jnp.asarray(xt), jnp.asarray(x0), tv))
        np.testing.assert_allclose(th.sum(-1), 1.0, rtol=1e-5)
    # at t==1: alphas->0, cumalphas_prev->1 => posterior == x0 exactly
    th1 = np.asarray(diff.theta_post(jnp.asarray(xt), jnp.asarray(x0), jnp.full((2,), 1, jnp.int32)))
    np.testing.assert_allclose(th1, x0, atol=1e-6)


def test_theta_post_prob_matches_brute_force(diff):
    """The O(C) closed form must equal the reference's O(C^2) einsum."""
    rng = np.random.default_rng(3)
    xt = _rand_one_hot(rng, (2, 4, 4), 5)
    theta_x0 = _rand_probs(rng, (2, 4, 4), 5)
    for t in [1, 2, 7, 20]:
        tv = np.full((2,), t, np.int64)
        fast = np.asarray(diff.theta_post_prob(jnp.asarray(xt), jnp.asarray(theta_x0), jnp.asarray(tv)))
        slow = brute_force_theta_post_prob(diff, xt, theta_x0, tv)
        np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-7)


def test_theta_post_prob_reduces_to_theta_post_for_onehot_x0(diff):
    rng = np.random.default_rng(4)
    xt = _rand_one_hot(rng, (2, 4, 4), 5)
    x0 = _rand_one_hot(rng, (2, 4, 4), 5)
    for t in [1, 5, 20]:
        tv = jnp.full((2,), t, jnp.int32)
        a = np.asarray(diff.theta_post_prob(jnp.asarray(xt), jnp.asarray(x0), tv))
        b = np.asarray(diff.theta_post(jnp.asarray(xt), jnp.asarray(x0), tv))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_theta_post_prob_mixed_timesteps_in_batch(diff):
    rng = np.random.default_rng(5)
    xt = _rand_one_hot(rng, (3, 4, 4), 5)
    theta_x0 = _rand_probs(rng, (3, 4, 4), 5)
    tv = np.array([1, 2, 20])
    fast = np.asarray(diff.theta_post_prob(jnp.asarray(xt), jnp.asarray(theta_x0), jnp.asarray(tv)))
    slow = brute_force_theta_post_prob(diff, xt, theta_x0, tv)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-7)


def test_one_hot_sampler_statistics():
    key = jax.random.key(0)
    probs = jnp.asarray([0.7, 0.2, 0.1])
    probs = jnp.broadcast_to(probs, (10000, 3))
    s = sample_one_hot(key, probs)
    assert s.shape == (10000, 3)
    np.testing.assert_allclose(np.asarray(s).sum(-1), 1.0)
    freq = np.asarray(s).mean(0)
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)


def test_max_prob_sample():
    p = jnp.asarray([[0.1, 0.6, 0.3], [0.5, 0.2, 0.3]])
    m = np.asarray(max_prob_one_hot(p))
    np.testing.assert_array_equal(m, [[0, 1, 0], [1, 0, 0]])


def test_q_sample_roundtrip_low_noise(diff):
    """At t=1 with cosine schedule, x_t ~= x0 with overwhelming probability."""
    rng = np.random.default_rng(6)
    x0 = _rand_one_hot(rng, (4, 8, 8), 5)
    key = jax.random.key(1)
    xt = diff.sample_q_xt_given_x0(key, jnp.asarray(x0), jnp.full((4,), 1, jnp.int32))
    agreement = (np.asarray(xt).argmax(-1) == x0.argmax(-1)).mean()
    assert agreement > 0.95
