"""Golden test for the reference-checkpoint converter: a torch-named
guided-diffusion state_dict (the reference layout, LEGACY attention
order) converted by utils/torch_convert.py must make our UNet reproduce
an independent torch replica of the reference semantics
(unet_openai/unet.py:142-262 ResBlock, :265-364 AttentionBlock legacy
head-major qkv, :402-823 UNetModel wiring) driven by the SAME weights."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from jointimagegeneration_tpu.utils.torch_convert import (  # noqa: E402
    convert_guided_diffusion_unet,
    find_unet_prefix,
)

MC, HEAD_CH, OUT_CH = 8, 4, 5
MULT, NRES, ATTN_DS = (1, 2), 1, (2,)


def _sd_tiny(seed=0, prefix=""):
    """Random state dict with the reference's exact names/shapes for
    channel_mult=(1,2), num_res_blocks=1, attention at ds=2, dims=2."""
    rs = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rs.randn(*s).astype(np.float32) * 0.2)
    sd = {}
    emb = MC * 4

    def res(at, cin, cout):
        sd[f"{at}.in_layers.0.weight"] = t(cin)
        sd[f"{at}.in_layers.0.bias"] = t(cin)
        sd[f"{at}.in_layers.2.weight"] = t(cout, cin, 3, 3)
        sd[f"{at}.in_layers.2.bias"] = t(cout)
        sd[f"{at}.emb_layers.1.weight"] = t(cout, emb)
        sd[f"{at}.emb_layers.1.bias"] = t(cout)
        sd[f"{at}.out_layers.0.weight"] = t(cout)
        sd[f"{at}.out_layers.0.bias"] = t(cout)
        sd[f"{at}.out_layers.3.weight"] = t(cout, cout, 3, 3)
        sd[f"{at}.out_layers.3.bias"] = t(cout)
        if cin != cout:
            sd[f"{at}.skip_connection.weight"] = t(cout, cin, 1, 1)
            sd[f"{at}.skip_connection.bias"] = t(cout)

    def attn(at, c):
        sd[f"{at}.norm.weight"] = t(c)
        sd[f"{at}.norm.bias"] = t(c)
        sd[f"{at}.qkv.weight"] = t(3 * c, c, 1)
        sd[f"{at}.qkv.bias"] = t(3 * c)
        sd[f"{at}.proj_out.weight"] = t(c, c, 1)
        sd[f"{at}.proj_out.bias"] = t(c)

    sd["time_embed.0.weight"] = t(emb, MC)
    sd["time_embed.0.bias"] = t(emb)
    sd["time_embed.2.weight"] = t(emb, emb)
    sd["time_embed.2.bias"] = t(emb)
    sd["input_blocks.0.0.weight"] = t(MC, 3, 3, 3)
    sd["input_blocks.0.0.bias"] = t(MC)
    res("input_blocks.1.0", MC, MC)            # level 0 (ds=1, no attn)
    sd["input_blocks.2.0.op.weight"] = t(MC, MC, 3, 3)  # downsample
    sd["input_blocks.2.0.op.bias"] = t(MC)
    res("input_blocks.3.0", MC, 2 * MC)        # level 1 (ds=2, attn)
    attn("input_blocks.3.1", 2 * MC)
    res("middle_block.0", 2 * MC, 2 * MC)
    attn("middle_block.1", 2 * MC)
    res("middle_block.2", 2 * MC, 2 * MC)
    res("output_blocks.0.0", 4 * MC, 2 * MC)   # level 1, i=0
    attn("output_blocks.0.1", 2 * MC)
    res("output_blocks.1.0", 3 * MC, 2 * MC)   # level 1, i=1 (+ upsample)
    attn("output_blocks.1.1", 2 * MC)
    sd["output_blocks.1.2.conv.weight"] = t(2 * MC, 2 * MC, 3, 3)
    sd["output_blocks.1.2.conv.bias"] = t(2 * MC)
    res("output_blocks.2.0", 3 * MC, MC)       # level 0, i=0
    res("output_blocks.3.0", 2 * MC, MC)       # level 0, i=1
    sd["out.0.weight"] = t(MC)
    sd["out.0.bias"] = t(MC)
    sd["out.2.weight"] = t(OUT_CH, MC, 3, 3)
    sd["out.2.bias"] = t(OUT_CH)
    return {prefix + k: v for k, v in sd.items()}


# ---- torch replica of the reference forward (legacy attention) ----------


def _t_gn(h, sd, at, groups):
    return F.group_norm(h, groups, sd[f"{at}.weight"], sd[f"{at}.bias"], eps=1e-5)


def _t_res(h, e, sd, at):
    cin = h.shape[1]
    cout = sd[f"{at}.in_layers.2.weight"].shape[0]
    y = F.silu(_t_gn(h, sd, f"{at}.in_layers.0", math.gcd(cin, 32)))
    y = F.conv2d(y, sd[f"{at}.in_layers.2.weight"], sd[f"{at}.in_layers.2.bias"], padding=1)
    eo = F.silu(e) @ sd[f"{at}.emb_layers.1.weight"].T + sd[f"{at}.emb_layers.1.bias"]
    y = y + eo[:, :, None, None]
    y = F.silu(_t_gn(y, sd, f"{at}.out_layers.0", math.gcd(cout, 32)))
    y = F.conv2d(y, sd[f"{at}.out_layers.3.weight"], sd[f"{at}.out_layers.3.bias"], padding=1)
    if f"{at}.skip_connection.weight" in sd:
        h = F.conv2d(h, sd[f"{at}.skip_connection.weight"], sd[f"{at}.skip_connection.bias"])
    return h + y


def _t_attn_legacy(h, sd, at):
    """AttentionBlock with QKVAttentionLegacy (unet.py:305-364): qkv as
    conv1d then reshape(b*heads, 3d, t).split(d) — head-major layout."""
    b, c, hh, ww = h.shape
    heads = c // HEAD_CH
    x = h.reshape(b, c, -1)
    y = F.group_norm(x, math.gcd(c, 32), sd[f"{at}.norm.weight"], sd[f"{at}.norm.bias"], eps=1e-5)
    qkv = F.conv1d(y, sd[f"{at}.qkv.weight"], sd[f"{at}.qkv.bias"])  # (b, 3c, t)
    bs, width, length = qkv.shape
    ch = width // (3 * heads)
    q, k, v = qkv.reshape(bs * heads, ch * 3, length).split(ch, dim=1)
    scale = 1 / math.sqrt(math.sqrt(ch))
    w = torch.softmax(torch.einsum("bct,bcs->bts", q * scale, k * scale), dim=-1)
    a = torch.einsum("bts,bcs->bct", w, v).reshape(bs, -1, length)
    out = F.conv1d(a, sd[f"{at}.proj_out.weight"], sd[f"{at}.proj_out.bias"])
    return (x + out).reshape(b, c, hh, ww)


def _t_forward(sd, x, tsteps):
    half = MC // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = torch.tensor(tsteps)[:, None] * freqs[None]
    e = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    e = e @ sd["time_embed.0.weight"].T + sd["time_embed.0.bias"]
    e = F.silu(e) @ sd["time_embed.2.weight"].T + sd["time_embed.2.bias"]

    h = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2),
                 sd["input_blocks.0.0.weight"], sd["input_blocks.0.0.bias"], padding=1)
    h0 = h
    h1 = _t_res(h0, e, sd, "input_blocks.1.0")
    h2 = F.conv2d(h1, sd["input_blocks.2.0.op.weight"], sd["input_blocks.2.0.op.bias"],
                  stride=2, padding=1)
    h3 = _t_attn_legacy(_t_res(h2, e, sd, "input_blocks.3.0"), sd, "input_blocks.3.1")
    h = _t_res(h3, e, sd, "middle_block.0")
    h = _t_attn_legacy(h, sd, "middle_block.1")
    h = _t_res(h, e, sd, "middle_block.2")
    h = _t_attn_legacy(_t_res(torch.cat([h, h3], 1), e, sd, "output_blocks.0.0"),
                       sd, "output_blocks.0.1")
    h = _t_attn_legacy(_t_res(torch.cat([h, h2], 1), e, sd, "output_blocks.1.0"),
                       sd, "output_blocks.1.1")
    h = h.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)
    h = F.conv2d(h, sd["output_blocks.1.2.conv.weight"], sd["output_blocks.1.2.conv.bias"],
                 padding=1)
    h = _t_res(torch.cat([h, h1], 1), e, sd, "output_blocks.2.0")
    h = _t_res(torch.cat([h, h0], 1), e, sd, "output_blocks.3.0")
    h = F.silu(F.group_norm(h, math.gcd(MC, 32), sd["out.0.weight"], sd["out.0.bias"], eps=1e-5))
    h = F.conv2d(h, sd["out.2.weight"], sd["out.2.bias"], padding=1)
    return h.permute(0, 2, 3, 1).numpy()


def test_converted_checkpoint_matches_torch_reference():
    from jointimagegeneration_tpu.nn.unet import UNet

    sd = _sd_tiny()
    params = convert_guided_diffusion_unet(
        sd, model_channels=MC, channel_mult=MULT, num_res_blocks=NRES,
        attention_resolutions=ATTN_DS, num_head_channels=HEAD_CH,
    )
    net = UNet(model_channels=MC, out_channels=OUT_CH, num_res_blocks=NRES,
               attention_resolutions=ATTN_DS, channel_mult=MULT, dims=2,
               num_head_channels=HEAD_CH)
    x = np.random.RandomState(1).randn(2, 8, 8, 3).astype(np.float32)
    t = np.array([7.0, 3.0], np.float32)
    ours = np.asarray(net.apply({"params": jax.tree.map(jnp.asarray, params)},
                                jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        want = _t_forward(sd, x, t)
    np.testing.assert_allclose(ours, want, atol=5e-4, rtol=5e-4)


def test_prefix_autodetect_and_strict():
    sd = _sd_tiny(prefix="model.diffusion_model.")
    assert find_unet_prefix(sd) == "model.diffusion_model."
    params = convert_guided_diffusion_unet(
        sd, model_channels=MC, channel_mult=MULT, num_res_blocks=NRES,
        attention_resolutions=ATTN_DS, num_head_channels=HEAD_CH,
    )
    assert "in_conv" in params and "up_1_us" in params
    sd["model.diffusion_model.some.leftover"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_guided_diffusion_unet(
            sd, model_channels=MC, channel_mult=MULT, num_res_blocks=NRES,
            attention_resolutions=ATTN_DS, num_head_channels=HEAD_CH,
        )
