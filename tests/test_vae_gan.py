"""AutoencoderKL / VQModel / PatchGAN / dual-optimizer GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL, DiagonalGaussian, VQModel
from jointimagegeneration_tpu.nn.discriminators import PatchDiscriminator
from jointimagegeneration_tpu.train import build_optimizer
from jointimagegeneration_tpu.train.gan import GANTrainState, hinge_d_loss, make_autoencoder_train_step, vanilla_d_loss

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


@pytest.fixture(scope="module")
def tiny_ae():
    return AutoencoderKL(
        embed_dim=2, ch=8, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), z_channels=2, dims=2, resolution=16,
    )


def test_diagonal_gaussian_identities():
    moments = jnp.concatenate([jnp.zeros((2, 4, 4, 3)), jnp.zeros((2, 4, 4, 3))], -1)
    g = DiagonalGaussian.from_moments(moments)
    # standard normal: KL to N(0,I) is 0
    np.testing.assert_allclose(np.asarray(g.kl()), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.mode()), 0.0)
    s = g.sample(jax.random.key(0))
    assert s.shape == (2, 4, 4, 3)


def test_autoencoder_kl_roundtrip_shapes(tiny_ae):
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))
    params = tiny_ae.init(jax.random.key(0), x, jax.random.key(2))
    rec, post = tiny_ae.apply(params, x, jax.random.key(3))
    assert rec.shape == x.shape
    # latent is downsampled by 2^(levels-1) = 2
    z = post.mode()
    assert z.shape == (1, 8, 8, 2)


def test_vq_model_roundtrip_and_codes():
    vq = VQModel(embed_dim=2, n_embed=16, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), z_channels=2, dims=2, resolution=16)
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 1))
    params = vq.init(jax.random.key(5), x)
    rec, qloss, idx = vq.apply(params, x)
    assert rec.shape == x.shape
    assert float(qloss) >= 0
    assert idx.shape == (1, 8, 8)
    assert int(idx.max()) < 16


def test_patch_discriminator_output_shape():
    d = PatchDiscriminator(dims=2, ndf=8, n_layers=2)
    x = jnp.zeros((2, 32, 32, 1))
    params = d.init(jax.random.key(0), x)
    logits = d.apply(params, x)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    logits2, feats = d.apply(params, x, return_features=True)
    assert len(feats) == 3


def test_d_losses():
    real = jnp.ones((2, 4, 4, 1))
    fake = -jnp.ones((2, 4, 4, 1))
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
    assert float(hinge_d_loss(fake, real)) == pytest.approx(2.0)
    assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))


def test_gan_train_step_runs_and_learns(tiny_ae):
    disc = PatchDiscriminator(dims=2, ndf=8, n_layers=2)
    x = jax.random.uniform(jax.random.key(6), (2, 16, 16, 1))
    g_params = tiny_ae.init(jax.random.key(7), x, jax.random.key(8))
    d_params = disc.init(jax.random.key(9), x)
    state = GANTrainState.create(
        g_params, d_params, build_optimizer("Adam", 1e-3), build_optimizer("Adam", 1e-3)
    )
    step = jax.jit(
        make_autoencoder_train_step(tiny_ae, disc, disc_start=2, adaptive_d_weight=True)
    )
    batch = {"image": x}
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.key(10 + i))
        losses.append(float(metrics["nll"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["d_loss"]))
    assert losses[-1] < losses[0]  # reconstruction improves
    assert int(state.step) == 6
    # disc became active after disc_start
    assert float(metrics["d_weight"]) >= 0


def test_gan_feature_matching_term(tiny_ae):
    disc = PatchDiscriminator(dims=2, ndf=8, n_layers=2)
    x = jax.random.uniform(jax.random.key(20), (1, 32, 32, 1))
    g_params = tiny_ae.init(jax.random.key(21), x, jax.random.key(22))
    d_params = disc.init(jax.random.key(23), x)
    state = GANTrainState.create(
        g_params, d_params, build_optimizer("Adam", 1e-3), build_optimizer("Adam", 1e-3)
    )
    step = jax.jit(make_autoencoder_train_step(
        tiny_ae, disc, disc_start=0, adaptive_d_weight=False, feature_matching_weight=1.0
    ))
    state, metrics = step(state, {"image": x}, jax.random.key(24))
    assert np.isfinite(float(metrics["loss"]))


def test_vae_stock_extras_shapes():
    """SimpleDecoder / UpsampleDecoder / LatentRescaler / Merged* /
    Upsampler (model.py:634-812): dead code in the reference's configs but
    part of its public surface — shape contracts at tiny sizes."""
    import jax
    import jax.numpy as jnp

    from jointimagegeneration_tpu.nn.vae import (
        LatentRescaler, MergedRescaleDecoder, MergedRescaleEncoder,
        SimpleDecoder, UpsampleDecoder, Upsampler)

    key = jax.random.key(0)
    x = jnp.zeros((1, 8, 8, 4))

    m = SimpleDecoder(out_channels=3)
    out = m.apply(m.init(key, x), x)
    assert out.shape == (1, 16, 16, 3)  # one 2x upsample

    m = UpsampleDecoder(out_channels=2, ch=4, num_res_blocks=1, ch_mult=(2, 2))
    out = m.apply(m.init(key, x), x)
    assert out.shape == (1, 16, 16, 2)  # upsample between the 2 levels

    m = LatentRescaler(factor=1.5, mid_channels=6, out_channels=5)
    out = m.apply(m.init(key, x), x)
    assert out.shape == (1, 12, 12, 5)  # 8 * 1.5

    # 3D variant (the reference's dims=3 default)
    x3 = jnp.zeros((1, 4, 8, 8, 4))
    m = LatentRescaler(factor=0.5, mid_channels=6, out_channels=5, dims=3)
    out = m.apply(m.init(key, x3), x3)
    assert out.shape == (1, 2, 4, 4, 5)

    xi = jnp.zeros((1, 16, 16, 3))
    m = MergedRescaleEncoder(in_ch=3, ch=4, out_ch=6, num_res_blocks=1,
                             ch_mult=(1, 2), rescale_factor=1.0, resolution=16)
    out = m.apply(m.init(key, xi), xi)
    assert out.shape == (1, 8, 8, 6)  # one downsample level, rescale 1.0

    m = MergedRescaleDecoder(z_channels=4, out_ch=3, ch=4, num_res_blocks=1,
                             ch_mult=(1, 2), rescale_factor=1.0, resolution=16)
    out = m.apply(m.init(key, x), x)
    assert out.shape == (1, 16, 16, 3)

    m = Upsampler(in_size=8, out_size=16, out_channels=3)
    out = m.apply(m.init(key, x), x)
    assert out.shape == (1, 16, 16, 3)  # log2(2)+1 = 2 levels -> one 2x up
