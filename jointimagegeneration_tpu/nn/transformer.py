"""Cross-attention transformer blocks for conditioning.

Re-design of the reference's SpatialTransformer stack
(ccdm/ddpm/models/unet_openai/attention.py:40-192 and
ldm/modules/attention.py:80-260).  Two deliberate changes:

  * dims-agnostic: the reference's SpatialTransformer only handles 2D
    (`b c h w -> b (hw) c`), which silently makes stage-1 text
    cross-attention inert in 3D (SURVEY.md §2.1).  Here blocks operate on
    an already-flattened (B, T, C) sequence, so the same module serves
    2D slices and 3D volumes.
  * attention dispatches through ops/attention.py (Pallas flash on TPU).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_cross_attention
from .blocks import GroupNorm32

__all__ = ["CrossAttention", "BasicTransformerBlock", "SequenceTransformer"]


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, param_dtype=jnp.float32, dtype=x.dtype)(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate)


class FeedForward(nn.Module):
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        h = GEGLU(inner)(x) if self.glu else nn.gelu(nn.Dense(inner, param_dtype=jnp.float32, dtype=x.dtype)(x))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(dim, param_dtype=jnp.float32, dtype=h.dtype)(h)


class CrossAttention(nn.Module):
    """query_dim-preserving attention; context=None => self-attention
    (attention.py:101-124)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None, *, deterministic: bool = True
    ) -> jnp.ndarray:
        query_dim = x.shape[-1]
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32, dtype=x.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32, dtype=x.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32, dtype=x.dtype, name="to_v")(ctx)
        out = multi_head_cross_attention(q, k, v, self.heads)
        out = nn.Dense(query_dim, param_dtype=jnp.float32, dtype=x.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> FF, pre-LN residuals
    (attention.py:127-146)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    disable_self_attn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None, *, deterministic: bool = True
    ) -> jnp.ndarray:
        sa_ctx = context if self.disable_self_attn else None

        def ln(h, name):
            # fp32 statistics, output cast back to the activation dtype so the
            # attention/FF matmuls stay in bf16
            y = nn.LayerNorm(param_dtype=jnp.float32, dtype=jnp.float32, name=name)(h.astype(jnp.float32))
            return y.astype(h.dtype)

        x = x + CrossAttention(self.heads, self.dim_head, self.dropout, name="attn1")(
            ln(x, "norm1"), sa_ctx, deterministic=deterministic
        )
        x = x + CrossAttention(self.heads, self.dim_head, self.dropout, name="attn2")(
            ln(x, "norm2"), context, deterministic=deterministic
        )
        x = x + FeedForward(dropout=self.dropout, name="ff")(
            ln(x, "norm3"), deterministic=deterministic
        )
        return x


class SequenceTransformer(nn.Module):
    """GroupNorm -> proj-in -> N transformer blocks -> zero proj-out, residual.

    Equivalent of SpatialTransformer (attention.py:149-192) but over a
    flattened (B, *spatial, C) input of any spatial rank."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    disable_self_attn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None, *, deterministic: bool = True
    ) -> jnp.ndarray:
        b, *spatial, c = x.shape
        h = GroupNorm32(name="norm", eps=1e-6)(x).reshape(b, -1, c)  # Normalize, attention.py:76-77
        h = nn.Dense(self.heads * self.dim_head, param_dtype=jnp.float32, dtype=x.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout, self.disable_self_attn, name=f"block_{i}"
            )(h, context, deterministic=deterministic)
        h = nn.Dense(c, kernel_init=nn.initializers.zeros, param_dtype=jnp.float32, dtype=x.dtype, name="proj_out")(h)
        return x + h.reshape(x.shape)
