"""Golden-value parity vs independent PyTorch computations (SURVEY §4b).

These pin cross-framework numerics of the building blocks: the torch side
is built from the mathematical definitions (not loaded reference code),
weights are shared by construction, and outputs must agree to fp32
tolerance."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)

torch = pytest.importorskip("torch")


def test_timestep_embedding_matches_torch():
    from jointimagegeneration_tpu.nn.blocks import timestep_embedding

    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    dim = 64
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = torch.tensor(t)[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    out = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_groupnorm_matches_torch():
    from jointimagegeneration_tpu.nn.blocks import GroupNorm32

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    m = GroupNorm32()
    params = m.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    # torch GroupNorm on NCHW with unit affine
    gn = torch.nn.GroupNorm(32, 32, eps=1e-6, affine=False)
    ref = gn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 6, 6, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 3, 5)).astype(np.float32) * 0.1  # DHWIO

    out = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )
    conv = torch.nn.Conv3d(3, 5, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w).permute(4, 3, 0, 1, 2))  # OIDHW
        ref = conv(torch.tensor(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_categorical_posterior_matches_torch_reference_math():
    """theta_post_prob closed form vs a torch implementation of the
    reference's einsum formulation (diffusion_denoising.py:105-139),
    written independently from the math."""
    from jointimagegeneration_tpu.diffusion.categorical import CategoricalDiffusion

    diff = CategoricalDiffusion.create("cosine", time_steps=15, num_classes=6)
    rng = np.random.default_rng(2)
    C = 6
    xt = np.eye(C, dtype=np.float32)[rng.integers(0, C, (2, 4, 4))]
    tx0 = rng.random((2, 4, 4, C)).astype(np.float32) + 0.05
    tx0 /= tx0.sum(-1, keepdims=True)

    for t in [1, 5, 15]:
        fast = np.asarray(diff.theta_post_prob(jnp.asarray(xt), jnp.asarray(tx0), jnp.full((2,), t)))

        alphas = torch.tensor(np.asarray(diff.alphas))
        cumalphas = torch.tensor(np.asarray(diff.cumalphas))
        a = alphas[t - 1] if t > 1 else torch.tensor(0.0)
        ca = cumalphas[t - 2] if t > 1 else torch.tensor(1.0)
        xt_t = torch.tensor(xt).permute(0, 3, 1, 2)  # B C H W
        tx0_t = torch.tensor(tx0).permute(0, 3, 1, 2)
        eye = torch.eye(C)[None, :, :, None, None]
        theta_xt_xtm1 = a * xt_t + (1 - a) / C  # B C1 H W
        theta_xtm1_x0 = ca * eye + (1 - ca) / C  # 1 C1 C2 1 1
        aux = theta_xt_xtm1[:, :, None] * theta_xtm1_x0  # B C1 C2 H W
        aux = aux / aux.sum(dim=1, keepdim=True)
        ref = torch.einsum("bcdhw,bdhw->bchw", aux, tx0_t).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-6)


def test_silu_dense_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32) * 0.2
    b = rng.standard_normal((8,)).astype(np.float32)
    out = np.asarray(jax.nn.silu(jnp.asarray(x) @ jnp.asarray(w) + jnp.asarray(b)))
    ref = torch.nn.functional.silu(torch.tensor(x) @ torch.tensor(w) + torch.tensor(b)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
