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
