"""UNet building blocks — channels-last, dims-agnostic (1/2/3 spatial dims).

Functional re-design of the OpenAI guided-diffusion block set used by both
reference stacks (ccdm/ddpm/models/unet_openai/unet.py:87-311 and
latentdiffusion/ldm/modules/diffusionmodules/openaimodel.py), TPU-first:

  * data layout is (B, *spatial, C) so channels ride the 128-lane axis;
  * GroupNorm runs in float32 regardless of activation dtype (the
    reference's GroupNorm32, nn.py:17-19) and feeds SiLU in one fused
    XLA epilogue;
  * attention is over the flattened voxel/pixel sequence with a Pallas
    flash kernel at runtime (ops/attention.py) — blocks only reshape;
  * rematerialisation is `jax.checkpoint` at the UNet level rather than a
    custom autograd.Function (nn.py:124-170).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from ..ops.attention import multi_head_self_attention

__all__ = [
    "timestep_embedding",
    "GroupNorm32",
    "ResBlock",
    "AttentionBlock",
    "Upsample",
    "Downsample",
]


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embeddings, [cos | sin] order (unet_openai/nn.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32, output cast back (nn.py:12-19).

    eps defaults to torch's GroupNorm 1e-5 (the UNet normalization sites
    subclass torch.nn.GroupNorm with its default); the VAE/SpatialTransformer
    sites pass 1e-6 to match the LDM's Normalize (model.py:76-77)."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        # all reference configs have channels % 32 == 0; the gcd fallback only
        # matters for tiny test models
        groups = math.gcd(x.shape[-1], self.num_groups)
        y = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                         dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(dtype)


def _conv(features: int, kernel: int, dims: int, strides: int = 1, zero_init: bool = False, name=None,
          padding: Optional[int] = None, dtype=None, use_bias: bool = True):
    """Conv with fp32 params; `dtype` sets the COMPUTE dtype (params are
    cast per-op).  Without an explicit dtype flax promotes bf16 activations
    back to fp32 against the fp32 params — silently forfeiting the MXU's
    bf16 rate — so compute-path callers must pass their activation dtype."""
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * dims,
        strides=(strides,) * dims,
        padding=[(padding, padding)] * dims,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        param_dtype=jnp.float32,
        dtype=dtype,
        use_bias=use_bias,
        name=name,
    )


_CONV_DIMNUMS = {1: ("NWC", "WIO", "NWC"), 2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}


def _raw_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray], dims: int,
              *, pallas: bool = False) -> jnp.ndarray:
    """'SAME' conv from explicit (spatial..., Cin, Cout) kernel params; compute
    dtype follows x, params cast per-op (same policy as `_conv`)."""
    k = kernel.shape[0]
    if pallas and dims == 3 and k == 3 and x.shape[-1] == 128 and x.shape[2] >= 64 and x.shape[2] % 8 == 0:
        # legacy per-conv Pallas routing at its measured-win shape (BENCH_NOTES)
        from ..ops.pallas.conv3d import conv3d_3x3_v2

        y = conv3d_3x3_v2(x, kernel.astype(x.dtype), 8, False)
    else:
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1,) * dims, [(k // 2, k // 2)] * dims,
            dimension_numbers=_CONV_DIMNUMS[dims], preferred_element_type=x.dtype,
        )
    return y if bias is None else y + bias.astype(y.dtype)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, groups: int,
               eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample GroupNorm in fp32, cast back (reference GroupNorm32,
    unet_openai/nn.py:17-19); identical math to flax nn.GroupNorm."""
    b, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return (xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _nearest_up2(x: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample of all spatial axes (B, *S, C)."""
    for ax in range(1, 1 + dims):
        x = jnp.repeat(x, 2, axis=ax)
    return x


class Upsample(nn.Module):
    """2x nearest upsample + optional conv (unet.py:87-116)."""

    dims: int
    use_conv: bool = True
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _nearest_up2(x, self.dims)
        if self.use_conv:
            x = _conv(self.out_channels or x.shape[-1], 3, self.dims, name="conv", dtype=x.dtype)(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv (or avg-pool) downsample (unet.py:119-146)."""

    dims: int
    use_conv: bool = True
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return _conv(self.out_channels or x.shape[-1], 3, self.dims, strides=2, name="op", dtype=x.dtype)(x)
        window = (2,) * self.dims
        return nn.avg_pool(x, window_shape=window, strides=window)


class ResBlock(nn.Module):
    """GN→SiLU→conv, +timestep-emb (add or FiLM scale-shift), GN→SiLU→drop→zero-conv,
    with learned skip projection on channel change (unet.py:149-262).

    `up`/`down` fold the resampling inside the block (resblock_updown mode).

    Params are declared flat (norm scales/biases + conv kernels) so the
    `fused` path can fold each GroupNorm into a per-channel affine and run
    half the block per Pallas call (ops/pallas/fused_resblock.py): the
    GN+SiLU prologue, im2col conv, emb/bias add, and skip add never make
    separate HBM round trips, and the per-channel moments the kernel
    accumulates while writing conv1's output provide GN2's statistics for
    free.  `fused` applies on 3D, no up/down, batch 1, inference-dropout;
    everything else falls back to the identical-math XLA path."""

    out_channels: int
    dims: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    pallas_conv: bool = False
    # False | 'xla' (conv kernel + XLA prologue fusions) | 'kernel' / True
    # (GN-affine+SiLU prologue inside the Pallas call)
    fused: object = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.out_channels
        g1 = math.gcd(in_ch, 32)
        g2 = math.gcd(out_ch, 32)
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        lecun = nn.initializers.lecun_normal()
        kshape = (3,) * self.dims

        n1s = self.param("norm1_scale", ones, (in_ch,), jnp.float32)
        n1b = self.param("norm1_bias", zeros, (in_ch,), jnp.float32)
        k1 = self.param("conv1_kernel", lecun, kshape + (in_ch, out_ch), jnp.float32)
        b1 = self.param("conv1_bias", zeros, (out_ch,), jnp.float32)
        emb_features = 2 * out_ch if self.use_scale_shift_norm else out_ch
        ek = self.param("emb_kernel", lecun, (emb.shape[-1], emb_features), jnp.float32)
        eb = self.param("emb_bias", zeros, (emb_features,), jnp.float32)
        n2s = self.param("norm2_scale", ones, (out_ch,), jnp.float32)
        n2b = self.param("norm2_bias", zeros, (out_ch,), jnp.float32)
        k2 = self.param("conv2_kernel", zeros, kshape + (out_ch, out_ch), jnp.float32)
        b2 = self.param("conv2_bias", zeros, (out_ch,), jnp.float32)
        if in_ch != out_ch:
            ks = self.param("skip_kernel", lecun, (1,) * self.dims + (in_ch, out_ch), jnp.float32)
            kb = self.param("skip_bias", zeros, (out_ch,), jnp.float32)

        emb_out = (nn.silu(emb.astype(jnp.float32)) @ ek + eb)  # (B, emb_features) fp32

        can_fuse = (
            self.fused
            and self.dims == 3
            and not (self.up or self.down)
            and x.shape[0] == 1
            and (self.dropout == 0 or deterministic)
            and x.shape[2] % 8 == 0
        )
        if can_fuse:
            from ..ops.pallas.fused_resblock import (
                fused_affine_silu_conv3d, fused_conv3d, gn_affine_from_moments,
                group_moments, moments_from_channel_sums,
            )

            d, hh, ww = x.shape[1:4]
            if self.use_scale_shift_norm:
                film_scale, film_shift = jnp.split(emb_out[0], 2)
                bias1 = b1
            else:
                bias1 = b1 + emb_out[0]
            residual = x if in_ch == out_ch else _raw_conv(x, ks, kb, self.dims)

            if self.fused == "xla":
                # prologues stay XLA elementwise fusions; the Pallas call is
                # conv + bias/residual/moments epilogue
                t1 = nn.silu(group_norm(x, n1s, n1b, g1))
                y1, st = fused_conv3d(t1, k1, bias1, None, True, 8)
                # keep the conv_out remat-policy contract on the fused paths
                # too — otherwise remat_policy='conv_outputs' silently saves
                # nothing here and the backward recomputes the whole fused
                # forward (the exact cost the policy exists to avoid)
                y1 = _checkpoint_name(y1, "conv_out")
                mean2, var2 = moments_from_channel_sums(st, d * hh * ww, g2)
                a2, s2 = gn_affine_from_moments(mean2, var2, n2s, n2b, g2)
                if self.use_scale_shift_norm:
                    a2 = a2 * (1 + film_scale)
                    s2 = s2 * (1 + film_scale) + film_shift
                t2 = y1.astype(jnp.float32) * a2 + s2
                t2 = (t2 * jax.nn.sigmoid(t2)).astype(y1.dtype)
                return fused_conv3d(t2, k2, b2, residual, False, 8)

            mean1, var1 = group_moments(x, g1)
            a1, s1 = gn_affine_from_moments(mean1, var1, n1s, n1b, g1)
            y1, st = fused_affine_silu_conv3d(x, k1, a1, s1, bias1, None, True, 8)
            y1 = _checkpoint_name(y1, "conv_out")  # see the fused=='xla' note
            mean2, var2 = moments_from_channel_sums(st, d * hh * ww, g2)
            a2, s2 = gn_affine_from_moments(mean2, var2, n2s, n2b, g2)
            if self.use_scale_shift_norm:
                a2 = a2 * (1 + film_scale)
                s2 = s2 * (1 + film_scale) + film_shift
            return fused_affine_silu_conv3d(y1, k2, a2, s2, b2, residual, False, 8)

        h = group_norm(x, n1s, n1b, g1)
        h = nn.silu(h)
        if self.up:
            h = _nearest_up2(h, self.dims)
            x = _nearest_up2(x, self.dims)
        elif self.down:
            window = (2,) * self.dims
            h = nn.avg_pool(h, window, window)
            x = nn.avg_pool(x, window, window)
        h = _raw_conv(h, k1, b1, self.dims, pallas=self.pallas_conv)
        # named site for remat policies: with UNet(remat_policy='conv_outputs')
        # the conv results are SAVED and only the bandwidth-bound GN/SiLU glue
        # recomputes in the backward (jax.checkpoint save_only_these_names)
        h = _checkpoint_name(h, "conv_out")

        eo = emb_out.astype(h.dtype).reshape(emb_out.shape[:1] + (1,) * self.dims + emb_out.shape[1:])
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(eo, 2, axis=-1)
            h = group_norm(h, n2s, n2b, g2) * (1 + scale) + shift
        else:
            h = group_norm(h + eo, n2s, n2b, g2)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _raw_conv(h, k2, b2, self.dims, pallas=self.pallas_conv)
        h = _checkpoint_name(h, "conv_out")

        if in_ch != out_ch:
            x = _raw_conv(x, ks, kb, self.dims)
        return (x + h).astype(h.dtype)


class AttentionBlock(nn.Module):
    """Self-attention over the flattened spatial sequence (unet.py:265-311).

    norm → 1x1 qkv → multi-head attention → zero-init 1x1 proj, residual.
    The attention itself dispatches to a Pallas flash kernel on TPU."""

    num_heads: int = 1
    num_head_channels: int = -1
    eps: float = 1e-5  # UNet sites: torch default; VAE AttnBlock passes 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, *spatial, c = x.shape
        heads = self.num_heads if self.num_head_channels == -1 else max(1, c // self.num_head_channels)
        seq = x.reshape(b, -1, c)
        h = GroupNorm32(name="norm", eps=self.eps)(seq)
        qkv = nn.Dense(3 * c, param_dtype=jnp.float32, dtype=x.dtype, name="qkv")(h)
        a = multi_head_self_attention(qkv, heads)
        a = nn.Dense(c, kernel_init=nn.initializers.zeros, param_dtype=jnp.float32, dtype=x.dtype, name="proj_out")(a)
        return (seq + a).reshape(x.shape)
