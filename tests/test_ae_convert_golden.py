"""Golden test for the AutoencoderKL checkpoint converter: a torch-named
reference AE state_dict (ldm/modules/diffusionmodules/model.py naming,
incl. the separate 1x1 q/k/v AttnBlock and the (0,1)-padded Downsample)
converted by convert_ldm_autoencoder must make our AutoencoderKL
reproduce an independent torch replica of the reference forward
(encode -> quant -> mode -> post_quant -> decode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from jointimagegeneration_tpu.utils.torch_convert import convert_ldm_autoencoder  # noqa: E402

CH, ZC, EMB, RES = 8, 2, 2, 16
MULT, NRB, ATTN = (1, 2), 1, (8,)


def _sd_tiny_ae(seed=0, prefix=""):
    rs = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rs.randn(*s).astype(np.float32) * 0.2)
    sd = {}

    def res(at, cin, cout):
        sd[f"{at}.norm1.weight"], sd[f"{at}.norm1.bias"] = t(cin), t(cin)
        sd[f"{at}.conv1.weight"], sd[f"{at}.conv1.bias"] = t(cout, cin, 3, 3), t(cout)
        sd[f"{at}.norm2.weight"], sd[f"{at}.norm2.bias"] = t(cout), t(cout)
        sd[f"{at}.conv2.weight"], sd[f"{at}.conv2.bias"] = t(cout, cout, 3, 3), t(cout)
        if cin != cout:
            sd[f"{at}.nin_shortcut.weight"] = t(cout, cin, 1, 1)
            sd[f"{at}.nin_shortcut.bias"] = t(cout)

    def attn(at, c):
        sd[f"{at}.norm.weight"], sd[f"{at}.norm.bias"] = t(c), t(c)
        for n in ("q", "k", "v", "proj_out"):
            sd[f"{at}.{n}.weight"], sd[f"{at}.{n}.bias"] = t(c, c, 1, 1), t(c)

    # encoder: level0 8->8 (res 16, no attn), ds; level1 8->16 (res 8, attn)
    sd["encoder.conv_in.weight"], sd["encoder.conv_in.bias"] = t(CH, 1, 3, 3), t(CH)
    res("encoder.down.0.block.0", CH, CH)
    sd["encoder.down.0.downsample.conv.weight"] = t(CH, CH, 3, 3)
    sd["encoder.down.0.downsample.conv.bias"] = t(CH)
    res("encoder.down.1.block.0", CH, 2 * CH)
    attn("encoder.down.1.attn.0", 2 * CH)
    res("encoder.mid.block_1", 2 * CH, 2 * CH)
    attn("encoder.mid.attn_1", 2 * CH)
    res("encoder.mid.block_2", 2 * CH, 2 * CH)
    sd["encoder.norm_out.weight"], sd["encoder.norm_out.bias"] = t(2 * CH), t(2 * CH)
    sd["encoder.conv_out.weight"] = t(2 * ZC, 2 * CH, 3, 3)
    sd["encoder.conv_out.bias"] = t(2 * ZC)
    # decoder: conv_in z->16, mid, level1 blocks x2 (+attn) + upsample, level0
    sd["decoder.conv_in.weight"], sd["decoder.conv_in.bias"] = t(2 * CH, ZC, 3, 3), t(2 * CH)
    res("decoder.mid.block_1", 2 * CH, 2 * CH)
    attn("decoder.mid.attn_1", 2 * CH)
    res("decoder.mid.block_2", 2 * CH, 2 * CH)
    res("decoder.up.1.block.0", 2 * CH, 2 * CH)
    attn("decoder.up.1.attn.0", 2 * CH)
    res("decoder.up.1.block.1", 2 * CH, 2 * CH)
    attn("decoder.up.1.attn.1", 2 * CH)
    sd["decoder.up.1.upsample.conv.weight"] = t(2 * CH, 2 * CH, 3, 3)
    sd["decoder.up.1.upsample.conv.bias"] = t(2 * CH)
    res("decoder.up.0.block.0", 2 * CH, CH)
    res("decoder.up.0.block.1", CH, CH)
    sd["decoder.norm_out.weight"], sd["decoder.norm_out.bias"] = t(CH), t(CH)
    sd["decoder.conv_out.weight"], sd["decoder.conv_out.bias"] = t(1, CH, 3, 3), t(1)
    sd["quant_conv.weight"], sd["quant_conv.bias"] = t(2 * EMB, 2 * ZC, 1, 1), t(2 * EMB)
    sd["post_quant_conv.weight"], sd["post_quant_conv.bias"] = t(ZC, EMB, 1, 1), t(ZC)
    return {prefix + k: v for k, v in sd.items()}


# ---- torch replica of the reference forward ------------------------------


def _gn(h, sd, at):
    return F.group_norm(h, math.gcd(h.shape[1], 32), sd[f"{at}.weight"], sd[f"{at}.bias"],
                        eps=1e-6)


def _res_t(h, sd, at):
    y = F.silu(_gn(h, sd, f"{at}.norm1"))
    y = F.conv2d(y, sd[f"{at}.conv1.weight"], sd[f"{at}.conv1.bias"], padding=1)
    y = F.silu(_gn(y, sd, f"{at}.norm2"))
    y = F.conv2d(y, sd[f"{at}.conv2.weight"], sd[f"{at}.conv2.bias"], padding=1)
    if f"{at}.nin_shortcut.weight" in sd:
        h = F.conv2d(h, sd[f"{at}.nin_shortcut.weight"], sd[f"{at}.nin_shortcut.bias"])
    return h + y


def _attn_t(h, sd, at):
    """Reference AttnBlock (model.py:154-207): single-head, separate q/k/v."""
    b, c, hh, ww = h.shape
    y = _gn(h, sd, f"{at}.norm")
    q = F.conv2d(y, sd[f"{at}.q.weight"], sd[f"{at}.q.bias"]).reshape(b, c, -1)
    k = F.conv2d(y, sd[f"{at}.k.weight"], sd[f"{at}.k.bias"]).reshape(b, c, -1)
    v = F.conv2d(y, sd[f"{at}.v.weight"], sd[f"{at}.v.bias"]).reshape(b, c, -1)
    w = torch.softmax(torch.einsum("bci,bcj->bij", q, k) * c ** -0.5, dim=2)
    a = torch.einsum("bij,bcj->bci", w, v).reshape(b, c, hh, ww)
    return h + F.conv2d(a, sd[f"{at}.proj_out.weight"], sd[f"{at}.proj_out.bias"])


def _forward_t(sd, x):
    h = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2),
                 sd["encoder.conv_in.weight"], sd["encoder.conv_in.bias"], padding=1)
    h = _res_t(h, sd, "encoder.down.0.block.0")
    h = F.pad(h, (0, 1, 0, 1))  # reference Downsample: (0,1) pad + VALID stride 2
    h = F.conv2d(h, sd["encoder.down.0.downsample.conv.weight"],
                 sd["encoder.down.0.downsample.conv.bias"], stride=2)
    h = _attn_t(_res_t(h, sd, "encoder.down.1.block.0"), sd, "encoder.down.1.attn.0")
    h = _res_t(h, sd, "encoder.mid.block_1")
    h = _attn_t(h, sd, "encoder.mid.attn_1")
    h = _res_t(h, sd, "encoder.mid.block_2")
    h = F.silu(_gn(h, sd, "encoder.norm_out"))
    h = F.conv2d(h, sd["encoder.conv_out.weight"], sd["encoder.conv_out.bias"], padding=1)
    moments = F.conv2d(h, sd["quant_conv.weight"], sd["quant_conv.bias"])
    z = moments[:, :EMB]  # posterior mode = mean
    h = F.conv2d(z, sd["post_quant_conv.weight"], sd["post_quant_conv.bias"])
    h = F.conv2d(h, sd["decoder.conv_in.weight"], sd["decoder.conv_in.bias"], padding=1)
    h = _res_t(h, sd, "decoder.mid.block_1")
    h = _attn_t(h, sd, "decoder.mid.attn_1")
    h = _res_t(h, sd, "decoder.mid.block_2")
    h = _attn_t(_res_t(h, sd, "decoder.up.1.block.0"), sd, "decoder.up.1.attn.0")
    h = _attn_t(_res_t(h, sd, "decoder.up.1.block.1"), sd, "decoder.up.1.attn.1")
    h = F.interpolate(h, scale_factor=2, mode="nearest")
    h = F.conv2d(h, sd["decoder.up.1.upsample.conv.weight"],
                 sd["decoder.up.1.upsample.conv.bias"], padding=1)
    h = _res_t(h, sd, "decoder.up.0.block.0")
    h = _res_t(h, sd, "decoder.up.0.block.1")
    h = F.silu(_gn(h, sd, "decoder.norm_out"))
    h = F.conv2d(h, sd["decoder.conv_out.weight"], sd["decoder.conv_out.bias"], padding=1)
    return h.permute(0, 2, 3, 1).numpy()


def test_converted_ae_matches_torch_reference():
    from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL

    sd = _sd_tiny_ae()
    params = convert_ldm_autoencoder(sd)
    ae = AutoencoderKL(embed_dim=EMB, ch=CH, ch_mult=MULT, num_res_blocks=NRB,
                       attn_resolutions=ATTN, z_channels=ZC, in_channels=1,
                       out_ch=1, dims=2, resolution=RES)
    x = np.random.RandomState(1).randn(2, RES, RES, 1).astype(np.float32)
    rec, _ = ae.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x),
                      sample_posterior=False)
    with torch.no_grad():
        want = _forward_t(sd, x)
    np.testing.assert_allclose(np.asarray(rec), want, atol=5e-4, rtol=5e-4)


def test_ae_prefix_and_strict():
    sd = _sd_tiny_ae(prefix="first_stage_model.")
    params = convert_ldm_autoencoder(sd)
    assert {"encoder", "decoder", "quant_conv", "post_quant_conv"} <= set(params)
    assert "down_0_0" in params["encoder"] and "up_1_us" in params["decoder"]
    # loss.* (LPIPS/discriminator) keys are ignored, others rejected
    sd["first_stage_model.loss.discriminator.x"] = torch.zeros(1)
    convert_ldm_autoencoder(sd)
    sd["first_stage_model.unexpected.thing"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_ldm_autoencoder(sd)
