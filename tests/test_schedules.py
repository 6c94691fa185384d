import math

import numpy as np

from jointimagegeneration_tpu.ops import schedules as S


def test_categorical_linear_schedule():
    b, a, ca = S.categorical_linear_schedule(10, start=1e-2, end=0.2)
    assert b.shape == (10,)
    np.testing.assert_allclose(b[0], 1e-2)
    np.testing.assert_allclose(b[-1], 0.2)
    np.testing.assert_allclose(a, 1 - b)
    np.testing.assert_allclose(ca, np.cumprod(1 - b))


def test_categorical_cosine_schedule_matches_reference_semantics():
    T = 100
    b, a, ca = S.categorical_cosine_schedule(T)
    s = 0.008
    # cumalphas computed directly from cos^2 at integer t, NOT renormalised
    t = np.arange(T)
    expected_ca = np.cos(((t / T + s) / (1 + s)) * (math.pi / 2)) ** 2
    np.testing.assert_allclose(ca, expected_ca)
    assert ca[0] != 1.0  # the tell-tale of the ccdm variant
    # betas from consecutive cos^2 ratios, clipped
    f = lambda u: math.cos((u + s) / (1 + s) * math.pi / 2) ** 2
    expected_b = np.array([min(1 - f((i + 1) / T) / f(i / T), 0.999) for i in range(T)])
    np.testing.assert_allclose(b, expected_b)
    assert b[-1] == 0.999


def test_gaussian_linear_is_sqrt_space():
    T = 1000
    betas = S.gaussian_beta_schedule("linear", T, linear_start=0.0015, linear_end=0.0195)
    np.testing.assert_allclose(betas[0], 0.0015)
    np.testing.assert_allclose(betas[-1], 0.0195)
    # midpoints are linear in sqrt(beta)
    sq = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(sq), np.diff(sq)[0], rtol=1e-10)


def test_gaussian_cosine_renormalises():
    T = 100
    betas = S.gaussian_beta_schedule("cosine", T)
    alphas = np.cumprod(1 - betas)
    assert betas.min() >= 0 and betas.max() <= 0.999
    assert alphas[-1] < 0.01  # fully noised by T


def test_ddim_uniform_subset():
    steps = S.ddim_timestep_subset("uniform", 50, 1000)
    assert steps.shape == (50,)
    assert steps[0] == 1 and steps[-1] == 981
    assert np.all(np.diff(steps) == 20)


def test_ddim_sampling_parameters_eta0():
    T = 1000
    betas = S.gaussian_beta_schedule("linear", T, 0.0015, 0.0195)
    ac = np.cumprod(1 - betas)
    steps = S.ddim_timestep_subset("uniform", 50, T)
    sigmas, alphas, alphas_prev = S.ddim_sampling_parameters(ac, steps, eta=0.0)
    np.testing.assert_allclose(sigmas, 0.0)
    np.testing.assert_allclose(alphas, ac[steps])
    np.testing.assert_allclose(alphas_prev[0], ac[0])
    np.testing.assert_allclose(alphas_prev[1:], ac[steps[:-1]])
