"""VAE encoder/decoder backbones (dims ∈ {2, 3}), channels-last.

Re-design of the CompVis VAE stacks the reference generalises to 3D
(latentdiffusion/ldm/modules/diffusionmodules/model.py:42-631): resnet
blocks without timestep conditioning, attention at configured
resolutions, stride-2 resampling, double-z Gaussian head.  Also the
vector quantizer for the VQ variant (the reference imports it from the
missing taming package — ldm/models/autoencoder.py:18)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import AttentionBlock, GroupNorm32, _conv, _nearest_up2

__all__ = ["Encoder", "Decoder", "LinearAttentionBlock", "VectorQuantizer",
           "SimpleDecoder", "UpsampleDecoder", "LatentRescaler",
           "MergedRescaleEncoder", "MergedRescaleDecoder", "Upsampler", "make_attn"]


class LinearAttentionBlock(nn.Module):
    """Linear (kernelized) attention, O(N·d·e) instead of O(N²): softmax
    over the TOKEN axis of k, then two small einsums that map straight to
    MXU matmuls — no N×N score matrix is ever materialised.

    Channels-last re-design of the reference's LinearAttention /
    LinAttnBlock (ldm/modules/attention.py:80-104, model.py:148-152),
    reachable there via `attn_type: "linear"` (make_attn, model.py:264).
    Reference quirks kept for parity: qkv projection has no bias, and
    LinAttnBlock applies NO norm and NO residual around the attention
    (unlike AttnBlock).  Channel order of the qkv projection is
    (qkv, heads, dim) and of the output (heads, dim), matching the torch
    rearrange patterns so converted weights transfer."""

    heads: int = 1
    dim_head: Optional[int] = None  # default: in_channels (LinAttnBlock)
    dims: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        d = c if self.dim_head is None else self.dim_head
        hidden = self.heads * d
        qkv = _conv(3 * hidden, 1, self.dims, use_bias=False, name="to_qkv")(x)
        spatial = x.shape[1:-1]
        n = 1
        for s in spatial:
            n *= s
        qkv = qkv.reshape(x.shape[0], n, 3, self.heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(x.shape[0], *spatial, hidden)
        return _conv(c, 1, self.dims, name="to_out")(out)


def make_attn(attn_type: str, dims: int, name: str):
    """Attention-block factory mirroring the reference's `make_attn`
    (model.py:264-273): 'vanilla' | 'linear' | 'none'."""
    if attn_type == "vanilla":
        return AttentionBlock(num_heads=1, eps=1e-6, name=name)
    if attn_type == "linear":
        return LinearAttentionBlock(dims=dims, name=name)
    if attn_type == "none":
        return lambda h: h
    raise ValueError(f"attn_type {attn_type!r} unknown (vanilla|linear|none)")


class VAEResBlock(nn.Module):
    """GN→swish→conv ×2 with 1x1 shortcut (model.py:85-146, temb unused)."""

    out_channels: int
    dims: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = nn.silu(GroupNorm32(name="norm1", eps=1e-6)(x))
        h = _conv(self.out_channels, 3, self.dims, name="conv1")(h)
        h = nn.silu(GroupNorm32(name="norm2", eps=1e-6)(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.out_channels, 3, self.dims, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, self.dims, name="nin_shortcut")(x)
        return x + h


class Encoder(nn.Module):
    """(B, *S, in_ch) -> (B, *S/2^L, 2*z_channels if double_z else z_channels)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4
    double_z: bool = True
    dims: int = 2
    dropout: float = 0.0
    resolution: int = 256  # nominal input size used to track attn placement
    attn_type: str = "vanilla"  # vanilla | linear | none (make_attn routing)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = _conv(self.ch, 3, self.dims, name="conv_in")(x)
        res = self.resolution
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResBlock(self.ch * mult, self.dims, self.dropout, name=f"down_{level}_{i}")(
                    h, deterministic=deterministic
                )
                if res in self.attn_resolutions:
                    h = make_attn(self.attn_type, self.dims, f"down_{level}_{i}_attn")(h)
            if level != len(self.ch_mult) - 1:
                # asymmetric (0,1) pad + VALID, matching the reference's
                # Downsample (model.py:61-73) so its trained weights
                # transfer tap-exactly (symmetric SAME shifts taps by one)
                h = jnp.pad(h, [(0, 0)] + [(0, 1)] * self.dims + [(0, 0)])
                h = _conv(h.shape[-1], 3, self.dims, strides=2, padding=0,
                          name=f"down_{level}_ds")(h)
                res //= 2
        h = VAEResBlock(h.shape[-1], self.dims, self.dropout, name="mid_1")(h, deterministic=deterministic)
        h = make_attn(self.attn_type, self.dims, "mid_attn")(h)
        h = VAEResBlock(h.shape[-1], self.dims, self.dropout, name="mid_2")(h, deterministic=deterministic)
        h = nn.silu(GroupNorm32(name="norm_out", eps=1e-6)(h))
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv(out_ch, 3, self.dims, name="conv_out")(h)


class Decoder(nn.Module):
    """(B, *S, z_channels) -> (B, *S*2^L, out_ch)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    out_ch: int = 1
    dims: int = 2
    dropout: float = 0.0
    resolution: int = 256
    attn_type: str = "vanilla"  # vanilla | linear | none (make_attn routing)

    @nn.compact
    def __call__(self, z: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        h = _conv(self.ch * self.ch_mult[-1], 3, self.dims, name="conv_in")(z)
        h = VAEResBlock(h.shape[-1], self.dims, self.dropout, name="mid_1")(h, deterministic=deterministic)
        h = make_attn(self.attn_type, self.dims, "mid_attn")(h)
        h = VAEResBlock(h.shape[-1], self.dims, self.dropout, name="mid_2")(h, deterministic=deterministic)
        for level, mult in reversed(list(enumerate(self.ch_mult))):
            for i in range(self.num_res_blocks + 1):
                h = VAEResBlock(self.ch * mult, self.dims, self.dropout, name=f"up_{level}_{i}")(
                    h, deterministic=deterministic
                )
                if res in self.attn_resolutions:
                    h = make_attn(self.attn_type, self.dims, f"up_{level}_{i}_attn")(h)
            if level != 0:
                h = _nearest_up2(h, self.dims)
                h = _conv(h.shape[-1], 3, self.dims, name=f"up_{level}_us")(h)
                res *= 2
        h = nn.silu(GroupNorm32(name="norm_out", eps=1e-6)(h))
        return _conv(self.out_ch, 3, self.dims, name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """Codebook quantizer with straight-through estimator (the missing
    taming/modules/vqvae/quantize.py dependency of VQModel)."""

    n_embed: int = 8192
    embed_dim: int = 4
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        codebook = self.param(
            "codebook",
            # zero-centered U(-1/n, 1/n) like taming's VectorQuantizer
            # (flax's uniform(scale) samples [0, scale) — all-positive codes
            # would start near-degenerate against a zero-centered encoder)
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.n_embed, 1.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
        )
        flat = z.reshape(-1, self.embed_dim)
        d = (
            jnp.sum(flat**2, -1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, -1)[None]
        )
        idx = jnp.argmin(d, axis=-1)
        zq = codebook[idx].reshape(z.shape)
        commit = jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
        embed = jnp.mean((zq - jax.lax.stop_gradient(z)) ** 2)
        loss = self.beta * commit + embed
        zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
        return zq, loss, idx.reshape(z.shape[:-1])


# ---------------------------------------------------------------------------
# Stock decoder extras (model.py:634-812) — dead code in the reference's
# checked-in configs but part of its public surface; kept for parity.
# ---------------------------------------------------------------------------


class SimpleDecoder(nn.Module):
    """1x1 conv -> ResBlock chain (C->2C->4C->2C) -> 1x1 -> 2x nearest
    upsample + conv -> GN/swish/conv_out (SimpleDecoder, model.py:634-667)."""

    out_channels: int
    dims: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        h = _conv(c, 1, self.dims, name="conv_a")(x)
        h = VAEResBlock(2 * c, self.dims, name="res_1")(h, deterministic=deterministic)
        h = VAEResBlock(4 * c, self.dims, name="res_2")(h, deterministic=deterministic)
        h = VAEResBlock(2 * c, self.dims, name="res_3")(h, deterministic=deterministic)
        h = _conv(c, 1, self.dims, name="conv_b")(h)
        h = _nearest_up2(h, self.dims)
        h = _conv(c, 3, self.dims, name="upsample_conv")(h)
        h = nn.silu(GroupNorm32(name="norm_out", eps=1e-6)(h))
        return _conv(self.out_channels, 3, self.dims, name="conv_out")(h)


class UpsampleDecoder(nn.Module):
    """Per-level ResBlock stacks with 2x upsampling between levels
    (UpsampleDecoder, model.py:670-717)."""

    out_channels: int
    ch: int
    num_res_blocks: int = 2
    ch_mult: Sequence[int] = (2, 2)
    dims: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = x
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks + 1):
                h = VAEResBlock(self.ch * mult, self.dims, self.dropout,
                                name=f"res_{level}_{i}")(h, deterministic=deterministic)
            if level != len(self.ch_mult) - 1:
                h = _nearest_up2(h, self.dims)
                h = _conv(h.shape[-1], 3, self.dims, name=f"up_{level}_conv")(h)
        h = nn.silu(GroupNorm32(name="norm_out", eps=1e-6)(h))
        return _conv(self.out_channels, 3, self.dims, name="conv_out")(h)


class LatentRescaler(nn.Module):
    """conv_in -> depth ResBlocks -> spatial resize by `factor` (nearest,
    the torch F.interpolate default) -> attention -> depth ResBlocks ->
    1x1 conv_out (LatentRescaler, model.py:720-760); dims ∈ {2, 3}."""

    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2
    dims: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = _conv(self.mid_channels, 3, self.dims, name="conv_in")(x)
        for i in range(self.depth):
            h = VAEResBlock(self.mid_channels, self.dims, name=f"res1_{i}")(h, deterministic=deterministic)
        spatial = tuple(int(round(s * self.factor)) for s in h.shape[1:-1])
        h = jax.image.resize(h, (h.shape[0], *spatial, h.shape[-1]), method="nearest")
        h = AttentionBlock(num_heads=1, eps=1e-6, name="attn")(h)
        for i in range(self.depth):
            h = VAEResBlock(self.mid_channels, self.dims, name=f"res2_{i}")(h, deterministic=deterministic)
        return _conv(self.out_channels, 1, self.dims, name="conv_out")(h)


class MergedRescaleEncoder(nn.Module):
    """Encoder (double_z=False) composed with a LatentRescaler
    (model.py:763-776)."""

    in_ch: int
    ch: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int] = ()
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    resolution: int = 256
    dims: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        mid = self.ch * self.ch_mult[-1]
        h = Encoder(ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
                    attn_resolutions=self.attn_resolutions, z_channels=mid, double_z=False,
                    dims=self.dims, dropout=self.dropout, resolution=self.resolution,
                    name="encoder")(x, deterministic=deterministic)
        return LatentRescaler(self.rescale_factor, mid, self.out_ch,
                              depth=self.rescale_module_depth, dims=self.dims,
                              name="rescaler")(h, deterministic=deterministic)


class MergedRescaleDecoder(nn.Module):
    """LatentRescaler composed with a Decoder (model.py:778-792)."""

    z_channels: int
    out_ch: int
    ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int] = ()
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    resolution: int = 256
    dims: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, z: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        tmp = self.z_channels * self.ch_mult[-1]
        h = LatentRescaler(self.rescale_factor, tmp, tmp,
                           depth=self.rescale_module_depth, dims=self.dims,
                           name="rescaler")(z, deterministic=deterministic)
        return Decoder(ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
                       attn_resolutions=self.attn_resolutions, out_ch=self.out_ch,
                       dims=self.dims, dropout=self.dropout, resolution=self.resolution,
                       name="decoder")(h, deterministic=deterministic)


class Upsampler(nn.Module):
    """LatentRescaler + all-up Decoder sized by log2(out/in)
    (Upsampler, model.py:795-812)."""

    in_size: int
    out_size: int
    out_channels: int
    ch_mult: int = 2
    dims: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        assert self.out_size >= self.in_size
        import math as _math

        num_blocks = int(_math.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        c = x.shape[-1]
        h = LatentRescaler(factor_up, 2 * c, c, dims=self.dims,
                           name="rescaler")(x, deterministic=deterministic)
        return Decoder(ch=c, ch_mult=[self.ch_mult] * num_blocks, num_res_blocks=2,
                       attn_resolutions=(), out_ch=self.out_channels, dims=self.dims,
                       resolution=self.out_size, name="decoder")(h, deterministic=deterministic)
