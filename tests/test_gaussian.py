import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion import DDIMParams, GaussianDiffusion, ddim_step


@pytest.fixture(scope="module")
def diff():
    # stage-2 primary config: linear 0.0015 -> 0.0195, T=1000
    return GaussianDiffusion.create("linear", 1000, linear_start=0.0015, linear_end=0.0195)


def test_buffer_identities(diff):
    ac = np.asarray(diff.alphas_cumprod, np.float64)
    np.testing.assert_allclose(np.asarray(diff.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(diff.alphas_cumprod_prev)[1:], ac[:-1], rtol=1e-6)
    assert np.asarray(diff.alphas_cumprod_prev)[0] == 1.0
    # posterior variance identity: beta_t * (1-ac_prev)/(1-ac)
    betas = np.asarray(diff.betas, np.float64)
    acp = np.asarray(diff.alphas_cumprod_prev, np.float64)
    np.testing.assert_allclose(
        np.asarray(diff.posterior_variance), betas * (1 - acp) / (1 - ac), rtol=1e-5
    )


def test_q_sample_and_eps_recovery(diff):
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (2, 8, 8, 1))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t = jnp.asarray([10, 500])
    xt = diff.q_sample(x0, t, noise)
    # invert: predict_start_from_noise with the true eps recovers x0
    rec = diff.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_p_sample_t0_is_deterministic(diff):
    key = jax.random.key(2)
    x = jax.random.normal(key, (2, 4, 4, 1))
    eps = jax.random.normal(jax.random.key(3), x.shape)
    t = jnp.zeros((2,), jnp.int32)
    a = diff.p_sample(jax.random.key(4), eps, x, t)
    b = diff.p_sample(jax.random.key(5), eps, x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_params_shapes(diff):
    p = DDIMParams.create(diff, 50)
    assert p.num_steps == 50
    assert int(p.timesteps[0]) == 1 and int(p.timesteps[-1]) == 981
    np.testing.assert_allclose(np.asarray(p.sigmas), 0.0)


def test_ddim_step_perfect_eps_recovers_x0(diff):
    """With e_t equal to the true noise, pred_x0 == x0 at every index."""
    p = DDIMParams.create(diff, 50)
    key = jax.random.key(6)
    x0 = jax.random.normal(key, (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.key(7), x0.shape)
    for index in [0, 25, 49]:
        t_sub = p.timesteps[index]
        # construct x_t at the subset step using the subset alpha
        a_t = p.alphas[index]
        xt = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
        x_prev, pred_x0 = ddim_step(p, jax.random.key(8), xt, eps, jnp.asarray(index))
        np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), rtol=1e-3, atol=1e-4)
        # and x_prev is exactly the deterministic DDIM point at alpha_prev
        a_prev = p.alphas_prev[index]
        expect = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expect), rtol=1e-3, atol=1e-4)


def test_ddim_full_chain_linear_model(diff):
    """Sampling with the oracle eps for a fixed target converges to it."""
    p = DDIMParams.create(diff, 50)
    target = jnp.ones((1, 4, 4, 1)) * 0.5
    x = jax.random.normal(jax.random.key(9), target.shape)

    def body(x, index):
        # oracle eps given x_t: e = (x - sqrt(a)*target)/sqrt(1-a)
        a_t = p.alphas[index]
        e = (x - jnp.sqrt(a_t) * target) / jnp.sqrt(1 - a_t)
        x_prev, _ = ddim_step(p, jax.random.key(0), x, e, index)
        return x_prev, e

    x, es = jax.lax.scan(body, x, jnp.arange(49, -1, -1))
    # the chain terminates at alpha_prev[0] == alphas_cumprod[0] (reference
    # convention), i.e. x == sqrt(ac0)*target + sqrt(1-ac0)*e_final, not target
    ac0 = p.alphas_prev[0]
    expect = jnp.sqrt(ac0) * target + jnp.sqrt(1 - ac0) * es[-1]
    np.testing.assert_allclose(np.asarray(x), np.asarray(expect), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=0.2)
