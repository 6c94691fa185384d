"""Guided-diffusion UNet, dims-agnostic, channels-last, Flax.

One UNet class serves both reference stacks:
  * stage 1 (3D categorical mask denoiser): ccdm/ddpm/models/unet_openai/
    unet.py:402-823 with params.yml:69-76 (base 64, mult [1,2,2,4,5],
    attn at ds {32,16,8}, head_ch 32, softmax x0 head);
  * stage 2 (2D slice eps-denoiser): ldm/modules/diffusionmodules/
    openaimodel.py:416-746 with ruijin-ldm_from_controlnet.yaml:17-40
    (base 128, mult [1,2,4,4,5]).

TPU-first choices: channels-last layout, bf16 torso with fp32 norms (the
reference's fp16 conversion, fp16_util.py), `jax.checkpoint` on each
level for rematerialisation, cross-attention available at any spatial
rank (the reference's SpatialTransformer is 2D-only, making stage-1 text
conditioning inert — SURVEY.md §2.1; here it actually works in 3D).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import AttentionBlock, Downsample, GroupNorm32, ResBlock, Upsample, _conv, timestep_embedding
from .transformer import SequenceTransformer

__all__ = ["UNet"]


class UNet(nn.Module):
    """Returns raw logits or softmax probs over `out_channels`.

    Conditioning:
      * `cond`   — concatenated to the input along channels (stage-1 image
                   condition, unet.py:774-775; stage-2 'concat' mode,
                   ddpm.py:1415-1420).
      * `context`— (B, T_ctx, C_ctx) sequence for cross-attention; used at
                   attention sites when `context_dim` is set.
      * `y`      — (B,) class ids, 'adm' mode: a learned class embedding is
                   added to the timestep embedding (openaimodel.py:516-517,
                   737-741; ddpm.py:1428) when `adm_classes` is set.
      * `feature_cond` — {encoder_block_idx: (B, *spatial_at_block, F)}
                   dense extractor feature maps channel-concatenated in
                   front of the indexed encoder block (the reference's
                   DINO/ResNet feature conditioning, unet.py:485-507,
                   785-803; idx 0 = the stem conv, each ResBlock(+attn) or
                   down-transition advances the index by one, mirroring
                   input_blocks enumeration).
    """

    model_channels: int
    out_channels: int
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    channel_mult: Sequence[int] = (1, 2, 2, 4, 5)
    dims: int = 3
    num_heads: int = 1
    num_head_channels: int = 32
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    conv_resample: bool = True
    softmax_output: bool = False
    # cross-attention (SequenceTransformer) instead of self-attn blocks:
    context_dim: Optional[int] = None
    transformer_depth: int = 1
    # 'adm' class-conditioning: number of classes for the label embedding
    adm_classes: Optional[int] = None
    # compute dtype for the torso (params always fp32):
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # selective remat: only these encoder/decoder levels rematerialise
    # (None = all levels when `remat`).  Deep levels have small activations
    # whose storage is cheap but whose recompute still costs FLOPs — rematting
    # only the big-activation shallow levels keeps the memory win while
    # skipping most recompute (reference remats every block, nn.py:124-170)
    remat_levels: Optional[Sequence[int]] = None
    # remat POLICY: 'conv_outputs' saves each ResBlock's conv results and
    # recomputes only the cheap GN/SiLU glue in the backward — the
    # FLOPs-for-bandwidth middle ground between full remat (backward
    # recomputes the conv-bound forward, ~3x fwd FLOPs) and no remat
    # (OOMs at full 3D scale).  None = save-nothing (plain nn.remat).
    remat_policy: Optional[str] = None
    # shard the leading spatial axis over this mesh axis (sequence/spatial
    # parallelism over ICI; XLA inserts the conv halo exchanges) — the
    # 'model' axis of parallel.make_mesh for big 512^2 / 128^3 activations:
    spatial_axis: Optional[str] = None
    # route 3^3 convs through the Pallas im2col kernel (ops/pallas/conv3d.py)
    use_pallas_conv: bool = False
    # fuse ResBlocks into Pallas conv pairs (ops/pallas/fused_resblock.py):
    # False | 'xla' (XLA prologue) | 'kernel'/True (in-kernel prologue)
    use_fused_resblock: object = False

    def _attn(self, ch: int, name: str):
        if self.num_head_channels == -1:
            heads, dim_head = self.num_heads, ch // self.num_heads
        else:
            # clamp for tiny test models where ch < num_head_channels
            heads = max(1, ch // self.num_head_channels)
            dim_head = ch // heads
        if self.context_dim is not None:
            return SequenceTransformer(
                heads=heads, dim_head=dim_head, depth=self.transformer_depth, dropout=self.dropout, name=name
            )
        return AttentionBlock(num_heads=heads, num_head_channels=self.num_head_channels, name=name)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        feature_cond: Optional[dict] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        mc = self.model_channels
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, param_dtype=jnp.float32, name="time_embed_0")(emb)
        emb = nn.Dense(mc * 4, param_dtype=jnp.float32, name="time_embed_1")(nn.silu(emb))
        if self.adm_classes is not None:
            assert y is not None, "adm_classes set but no class ids `y` given"
            emb = emb + nn.Embed(self.adm_classes, mc * 4, param_dtype=jnp.float32, name="label_emb")(y)
        emb = emb.astype(self.dtype)

        def inject(h, idx):
            """feature-concat site before encoder block `idx`."""
            if feature_cond is not None and idx in feature_cond:
                h = jnp.concatenate([h, feature_cond[idx].astype(h.dtype)], axis=-1)
            return h

        if cond is not None:
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        in_dtype = x.dtype
        h = x.astype(self.dtype)
        if context is not None:
            context = context.astype(self.dtype)

        if self.spatial_axis is not None:
            from jax.sharding import PartitionSpec as P

            spec = P("data", self.spatial_axis, *([None] * self.dims))
            try:
                h = jax.lax.with_sharding_constraint(h, spec)
            except RuntimeError:
                pass  # no mesh in context (e.g. init outside `with mesh:`)

        res_args = dict(
            dims=self.dims,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            pallas_conv=self.use_pallas_conv and self.dims == 3,
            fused=self.use_fused_resblock if self.dims == 3 else False,
        )
        # rematerialise each ResBlock under grad (reference: per-block
        # CheckpointFunction, unet_openai/nn.py:124-170)
        policy = None
        if self.remat_policy == "conv_outputs":
            policy = jax.checkpoint_policies.save_only_these_names("conv_out")
        elif self.remat_policy is not None:
            raise ValueError(f"unknown remat_policy {self.remat_policy!r}")
        RematRes = nn.remat(ResBlock, static_argnums=(3,), policy=policy)

        def res_for(level):
            if not self.remat:
                return ResBlock
            if self.remat_levels is not None and level not in self.remat_levels:
                return ResBlock
            return RematRes


        # --- encoder ------------------------------------------------------
        h = inject(h, 0)
        h = _conv(mc * self.channel_mult[0], 3, self.dims, name="in_conv", dtype=self.dtype)(h)
        hs = [h]
        ds = 1
        block_idx = 1  # mirrors input_blocks enumeration (unet.py:785)
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = inject(h, block_idx)
                h = res_for(level)(int(mult * mc), **res_args, name=f"down_{level}_{i}_res")(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = self._attn(h.shape[-1], f"down_{level}_{i}_attn")(
                        *( (h, context) if self.context_dim is not None else (h,) )
                    )
                hs.append(h)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                h = inject(h, block_idx)
                if self.resblock_updown:
                    h = res_for(level)(h.shape[-1], **res_args, down=True, name=f"down_{level}_ds")(h, emb, deterministic)
                else:
                    h = Downsample(self.dims, self.conv_resample, name=f"down_{level}_ds")(h)
                hs.append(h)
                block_idx += 1
                ds *= 2

        # --- middle ---------------------------------------------------------
        h = res_for(len(self.channel_mult) - 1)(h.shape[-1], **res_args, name="mid_res1")(h, emb, deterministic)
        h = self._attn(h.shape[-1], "mid_attn")(
            *( (h, context) if self.context_dim is not None else (h,) )
        )
        h = res_for(len(self.channel_mult) - 1)(h.shape[-1], **res_args, name="mid_res2")(h, emb, deterministic)

        # --- decoder ----------------------------------------------------------
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_for(level)(int(mult * mc), **res_args, name=f"up_{level}_{i}_res")(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = self._attn(h.shape[-1], f"up_{level}_{i}_attn")(
                        *( (h, context) if self.context_dim is not None else (h,) )
                    )
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res_for(level)(h.shape[-1], **res_args, up=True, name=f"up_{level}_us")(h, emb, deterministic)
                    else:
                        h = Upsample(self.dims, self.conv_resample, name=f"up_{level}_us")(h)
                    ds //= 2
        assert not hs

        # --- head (fp32) -----------------------------------------------------
        h = h.astype(jnp.float32)
        h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = _conv(self.out_channels, 3, self.dims, zero_init=True, name="out_conv")(h)
        if self.softmax_output:
            h = jax.nn.softmax(h, axis=-1)
        return h.astype(in_dtype) if in_dtype != jnp.float32 else h
