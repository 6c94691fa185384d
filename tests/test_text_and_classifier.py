import pytest
import jax
import jax.numpy as jnp
import numpy as np

from jointimagegeneration_tpu.diffusion import GaussianDiffusion
from jointimagegeneration_tpu.models.classifier import NoisyLatentClassifier
from jointimagegeneration_tpu.nn.text import ClassEmbedder, IdentityEncoder, TextFeatureRefiner, TransformerTextEncoder


def test_text_feature_refiner_residual():
    m = TextFeatureRefiner(embed_dim=16, n_heads=2, depth=2, d_head=8, dropout=0.0)
    feats = jax.random.normal(jax.random.key(0), (2, 5, 16))
    params = m.init(jax.random.key(1), feats)
    out = m.apply(params, feats)
    assert out.shape == feats.shape
    assert not np.allclose(np.asarray(out), np.asarray(feats))  # refined, not identity


def test_transformer_text_encoder():
    m = TransformerTextEncoder(vocab_size=100, embed_dim=16, depth=2, n_heads=2, d_head=8, max_len=32)
    toks = jnp.asarray([[1, 5, 9, 0], [2, 2, 2, 2]])
    params = m.init(jax.random.key(0), toks)
    out = m.apply(params, toks)
    assert out.shape == (2, 4, 16)


def test_class_embedder():
    m = ClassEmbedder(n_classes=7, embed_dim=8)
    y = jnp.asarray([0, 6])
    params = m.init(jax.random.key(0), y)
    out = m.apply(params, y)
    assert out.shape == (2, 1, 8)


def test_identity_encoder():
    enc = IdentityEncoder()
    x = jnp.ones((2, 3))
    assert enc(x) is x and enc.encode(x) is x


@pytest.mark.slow
def test_noisy_latent_classifier_trains():
    diff = GaussianDiffusion.create("linear", 50)
    clf = NoisyLatentClassifier.create(num_classes=3, diffusion=diff, model_channels=8, channel_mult=(1, 2))
    params = clf.init_params(jax.random.key(0), (8, 8), channels=1)
    x0 = jax.random.normal(jax.random.key(1), (4, 8, 8, 1))
    labels = jnp.asarray([0, 1, 2, 0])
    loss, metrics = clf.loss(params, jax.random.key(2), x0, labels)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    # guidance gradient has the input's shape
    g = clf.guidance_fn(params, target_label=1)(x0, jnp.zeros((4,)))
    assert g.shape == x0.shape
    assert np.isfinite(np.asarray(g)).all()


def test_spatial_rescaler():
    """SpatialRescaler (modules.py): n_stages × multiplier downscale +
    optional 1×1 channel remap."""
    from jointimagegeneration_tpu.nn.text import SpatialRescaler

    r = SpatialRescaler(n_stages=2, multiplier=0.5, out_channels=3)
    x = jnp.ones((1, 16, 16, 2))
    p = r.init(jax.random.key(0), x)
    y = r.apply(p, x)
    assert y.shape == (1, 4, 4, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_hybrid_conditioner_feeds_hybrid_mode():
    """HybridConditioner (util.py:251-261) produces the {c_concat,
    c_crossattn} pair the hybrid DiffusionWrapper mode consumes
    (ddpm.py:1421-1425)."""
    from jointimagegeneration_tpu.nn.text import HybridConditioner, SpatialRescaler
    from jointimagegeneration_tpu.models import SliceLDM

    hc = HybridConditioner(
        concat_conditioner=SpatialRescaler(n_stages=0, out_channels=2),
        crossattn_conditioner=TransformerTextEncoder(
            vocab_size=16, embed_dim=8, depth=1, n_heads=2, d_head=4, max_len=8),
    )
    c_pix = jnp.ones((1, 16, 16, 1))
    tokens = jnp.zeros((1, 5), jnp.int32)
    p = hc.init(jax.random.key(0), c_pix, tokens)
    out = hc.apply(p, c_pix, tokens)
    assert set(out) == {"c_concat", "c_crossattn"}
    assert out["c_concat"].shape == (1, 16, 16, 2)
    assert out["c_crossattn"].shape == (1, 5, 8)

    ldm = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=4, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(2,), num_res_blocks=1,
        num_head_channels=4, context_dim=8, dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(1), 16, context_shape=(5, 8))
    eps = ldm.apply_model(params, jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                          cond=out["c_concat"], context=out["c_crossattn"])
    assert eps.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(eps)).all()
