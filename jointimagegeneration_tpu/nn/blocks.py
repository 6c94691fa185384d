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
    """GroupNorm(32) computed in float32, output cast back (nn.py:12-19)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        # all reference configs have channels % 32 == 0; the gcd fallback only
        # matters for tiny test models
        groups = math.gcd(x.shape[-1], self.num_groups)
        y = nn.GroupNorm(num_groups=groups, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(dtype)


def _conv(features: int, kernel: int, dims: int, strides: int = 1, zero_init: bool = False, name=None,
          padding: Optional[int] = None, dtype=None):
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
        name=name,
    )


class PallasConv3d(nn.Module):
    """3x3x3 conv through the Pallas kernel (ops/pallas/conv3d.py), with
    the same param structure as nn.Conv ('kernel' DHWIO + 'bias') so
    checkpoints interoperate with the XLA path."""

    features: int
    zero_init: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas.conv3d import conv3d_3x3_v2, _xla_conv3d

        cin = x.shape[-1]
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (3, 3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        # route ONLY the measured-win shape (BENCH_NOTES): Cin==128 at large
        # spatial extents. Cin=256 skip-concat tiles and small extents regress.
        if cin == 128 and x.shape[2] >= 64 and x.shape[2] % 8 == 0:
            y = conv3d_3x3_v2(x.astype(dt), kernel.astype(dt), 8, False)
        else:
            y = _xla_conv3d(x.astype(dt), kernel.astype(dt))
        return y + bias.astype(y.dtype)


def _conv3(features: int, dims: int, *, zero_init: bool = False, dtype=None, pallas: bool = False, name=None):
    """3x3(x3) 'SAME' conv; Pallas kernel when requested (3D, inference-grade
    and trainable via its custom VJP)."""
    if pallas and dims == 3:
        return PallasConv3d(features, zero_init=zero_init, dtype=dtype, name=name)
    return _conv(features, 3, dims, zero_init=zero_init, dtype=dtype, name=name)


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

    `up`/`down` fold the resampling inside the block (resblock_updown mode)."""

    out_channels: int
    dims: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    pallas_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h = _nearest_up2(h, self.dims)
            x = _nearest_up2(x, self.dims)
        elif self.down:
            window = (2,) * self.dims
            h = nn.avg_pool(h, window, window)
            x = nn.avg_pool(x, window, window)
        h = _conv3(self.out_channels, self.dims, dtype=h.dtype, pallas=self.pallas_conv, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            param_dtype=jnp.float32,
            dtype=h.dtype,
            name="emb_proj",
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out.reshape(emb_out.shape[:1] + (1,) * self.dims + emb_out.shape[1:])

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = GroupNorm32(name="out_norm")(h + emb_out)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv3(self.out_channels, self.dims, zero_init=True, dtype=h.dtype, pallas=self.pallas_conv, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, self.dims, name="skip", dtype=x.dtype)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Self-attention over the flattened spatial sequence (unet.py:265-311).

    norm → 1x1 qkv → multi-head attention → zero-init 1x1 proj, residual.
    The attention itself dispatches to a Pallas flash kernel on TPU."""

    num_heads: int = 1
    num_head_channels: int = -1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, *spatial, c = x.shape
        heads = self.num_heads if self.num_head_channels == -1 else max(1, c // self.num_head_channels)
        seq = x.reshape(b, -1, c)
        h = GroupNorm32(name="norm")(seq)
        qkv = nn.Dense(3 * c, param_dtype=jnp.float32, dtype=x.dtype, name="qkv")(h)
        a = multi_head_self_attention(qkv, heads)
        a = nn.Dense(c, kernel_init=nn.initializers.zeros, param_dtype=jnp.float32, dtype=x.dtype, name="proj_out")(a)
        return (seq + a).reshape(x.shape)
