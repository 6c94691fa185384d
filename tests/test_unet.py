import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.nn import UNet

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


def _init_and_apply(model, x, t, **kw):
    params = model.init(jax.random.key(0), x, t, **kw)
    return params, model.apply(params, x, t, **kw)


def test_unet_3d_shapes_tiny():
    # tiny stage-1-shaped model: 12-class one-hot + 1 cond channel input
    model = UNet(
        model_channels=16,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions=(4,),
        channel_mult=(1, 2, 4),
        dims=3,
        num_head_channels=8,
        softmax_output=True,
    )
    x = jnp.zeros((1, 8, 16, 16, 6))
    cond = jnp.zeros((1, 8, 16, 16, 1))
    t = jnp.asarray([3.0])
    params, y = _init_and_apply(model, x, t, cond=cond)
    assert y.shape == (1, 8, 16, 16, 6)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)  # softmax head


def test_unet_2d_shapes():
    model = UNet(
        model_channels=16,
        out_channels=1,
        num_res_blocks=2,
        attention_resolutions=(4, 2),
        channel_mult=(1, 2, 2),
        dims=2,
        num_head_channels=8,
    )
    x = jnp.zeros((2, 32, 32, 1))
    cond = jnp.zeros((2, 32, 32, 2))  # [prev slice, mask slice] concat-cond
    t = jnp.asarray([0.0, 999.0])
    params, y = _init_and_apply(model, x, t, cond=cond)
    assert y.shape == (2, 32, 32, 1)


def test_unet_zero_init_head_outputs_uniform_softmax():
    model = UNet(
        model_channels=8,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=2,
        softmax_output=True,
    )
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    t = jnp.asarray([5.0])
    _, y = _init_and_apply(model, x, t)
    # zero-init final conv => logits 0 => exactly uniform
    np.testing.assert_allclose(np.asarray(y), 0.25, atol=1e-6)


def test_unet_cross_attention_context():
    model = UNet(
        model_channels=8,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        dims=3,
        num_head_channels=4,
        context_dim=16,
    )
    x = jnp.zeros((1, 4, 8, 8, 4))
    t = jnp.asarray([1.0])
    ctx = jax.random.normal(jax.random.key(2), (1, 7, 16))
    params = model.init(jax.random.key(0), x, t, context=ctx)
    # un-zero the zero-init projections so influence can reach the output
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jax.random.normal(jax.random.key(7), p.shape) * 0.1
        if any(getattr(k, "key", None) in ("out_conv", "proj_out") for k in path)
        else p,
        params,
    )
    y1 = model.apply(params, x, t, context=ctx)
    y2 = model.apply(params, x, t, context=ctx * 2.0)
    assert y1.shape == (1, 4, 8, 8, 4)
    # context must actually influence the output (reference 3D wiring was inert)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 0


def test_unet_bf16_torso():
    model = UNet(
        model_channels=8,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=2,
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.key(3), (1, 8, 8, 4), jnp.bfloat16)
    t = jnp.asarray([10.0])
    params, y = _init_and_apply(model, x, t)
    assert y.dtype == jnp.bfloat16
    leaves = jax.tree.leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # params stay fp32


def test_unet_remat_grads_match():
    kwargs = dict(
        model_channels=8,
        out_channels=2,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=2,
    )
    x = jax.random.normal(jax.random.key(4), (1, 8, 8, 2))
    t = jnp.asarray([7.0])
    m1, m2 = UNet(**kwargs, remat=False), UNet(**kwargs, remat=True)
    p = m1.init(jax.random.key(5), x, t)

    g1 = jax.grad(lambda p: m1.apply(p, x, t).sum())(p)
    g2 = jax.grad(lambda p: m2.apply(p, x, t).sum())(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_unet_structure_matches_reference_arch():
    """Pin the architecture via eval_shape (no compile, 1-core-CPU friendly):
    the stage-1 block inventory at channel_mult [1,2,2,4,5] must yield
    2 resblocks/level down + mid pair + 3/level up, with the expected
    parameter count scaling."""
    model = UNet(
        model_channels=16,
        out_channels=12,
        num_res_blocks=2,
        attention_resolutions=(8,),
        channel_mult=(1, 2, 2, 4, 5),
        dims=3,
        num_head_channels=8,
        softmax_output=True,
    )
    x = jnp.zeros((1, 16, 16, 16, 13))
    t = jnp.asarray([1.0])
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, t))
    names = shapes["params"].keys()
    # 5 levels x 2 resblocks down, 4 downsamples, mid pair, 5 x 3 up, 4 upsamples
    assert sum(k.startswith("down_") and k.endswith("_res") for k in names) == 10
    assert sum(k.startswith("down_") and k.endswith("_ds") for k in names) == 4
    assert {"mid_res1", "mid_attn", "mid_res2"} <= set(names)
    assert sum(k.startswith("up_") and k.endswith("_res") for k in names) == 15
    assert sum(k.startswith("up_") and k.endswith("_us") for k in names) == 4
    # attention only where ds hits 8 (levels 3..4 boundary): ds sequence 1,2,4,8,16
    attn = [k for k in names if k.endswith("_attn") and k != "mid_attn"]
    assert all(k.startswith(("down_3", "down_4", "up_3", "up_4")) for k in attn)
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    assert n > 1_000_000
