import pytest
import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow
def test_vit_extractor_feature_geometry():
    from jointimagegeneration_tpu.nn.vit import ViTExtractor

    ext = ViTExtractor(model_type="vits8", stride=8)
    # tiny custom trunk for CPU: patch the module attributes via a fresh ViT
    from jointimagegeneration_tpu.nn.vit import ViT

    ext.vit = ViT(dim=32, depth=2, heads=2, patch=8, stride=8, pos_grid=4)
    ext.init(jax.random.key(0), image_hw=(32, 32))
    feats = ext.extract(jnp.zeros((1, 48, 48, 3)), layers=(1,), facet="key")
    assert len(feats) == 1
    # 48x48 with patch/stride 8 -> 6x6 grid (pos-embed re-interpolated from 4x4)
    assert feats[0].shape == (1, 6, 6, 32)


@pytest.mark.slow
def test_graft_entry_single_chip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # compile-check on CPU with tiny override is too slow at full scale;
    # just trace/lower to validate the program builds
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


@pytest.mark.slow
def test_unet_inside_tiled_apply():
    """fold/unfold parity demo: run a small UNet over tiles of a larger
    image through tiled_apply (the reference's big-image mechanism)."""
    from jointimagegeneration_tpu.nn import UNet
    from jointimagegeneration_tpu.ops.tiling import tiled_apply

    m = UNet(model_channels=8, out_channels=1, num_res_blocks=1, attention_resolutions=(),
             channel_mult=(1, 2), dims=2, num_head_channels=4)
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 1))
    params = m.init(jax.random.key(1), x, jnp.asarray([1.0]))
    t = jnp.asarray([5.0])
    out = tiled_apply(lambda tile: m.apply(params, tile, t), x, patch=(8, 8), stride=(4, 4))
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
