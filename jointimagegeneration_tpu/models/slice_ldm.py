"""Stage 2 — conditional CT slice generator with autoregressive volume assembly.

TPU-native equivalent of the LatentDiffusion + DDIMSampler + sample_cond
drive loop (latentdiffusion/ldm/models/diffusion/ddpm.py:429-1459,
ddim.py:11-205, sample_diffusion.py:165-273).

Two scan levels, both compiled once:
  * inner: the 50-step DDIM chain for one slice is a `lax.scan` over the
    timestep-subset indices (the reference dispatches the UNet from
    Python per step, ddim.py:141-164);
  * outer: the autoregressive z loop is a `lax.scan` with the previously
    generated slice as carry (the reference's Python for-loop over z,
    sample_diffusion.py:208-223) — so a whole volume is ONE XLA program.

Conditioning is 'concat' (ddpm.py:1415-1420): the UNet input is
[x_t | prev generated slice | current mask slice] along channels.  Each
generated slice is min-max normalised independently before being written
into the volume and used as the next condition — replicating
sample_diffusion.py:222 exactly (flagged in SURVEY.md §7.3 as a known
flicker source, kept for comparability).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddim import DDIMParams, ddim_step
from ..diffusion.gaussian import GaussianDiffusion
from ..nn.unet import UNet
from .common import unet_vars

__all__ = ["SliceLDM"]


def _minmax_slice(s: jnp.ndarray) -> jnp.ndarray:
    """Per-slice min-max normalisation into [0,1] — replicates
    sample_diffusion.py:222 exactly (the single definition shared by the
    pixel and latent volume steps)."""
    lo = jnp.min(s, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(s, axis=(1, 2, 3), keepdims=True)
    return (s - lo) / jnp.maximum(hi - lo, 1e-8)


@dataclass(frozen=True)
class SliceLDM:
    unet: UNet
    diffusion: GaussianDiffusion
    channels: int = 1  # generated image channels
    cond_channels: int = 2  # [prev slice, mask slice]

    @classmethod
    def create(
        cls,
        image_channels: int = 1,
        cond_channels: int = 2,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 0.0015,
        linear_end: float = 0.0195,
        model_channels: int = 128,
        channel_mult: Sequence[int] = (1, 2, 4, 4, 5),
        attention_resolutions: Sequence[int] = (32, 16, 8),
        num_res_blocks: int = 2,
        num_head_channels: int = 32,
        context_dim: Optional[int] = None,
        adm_classes: Optional[int] = None,
        parameterization: str = "eps",
        dtype=jnp.float32,
        remat: bool = False,
        spatial_axis: Optional[str] = None,
    ) -> "SliceLDM":
        """`adm_classes` enables class-conditional ('adm') mode: a learned
        class embedding added to the timestep embedding (the reference's
        UNet num_classes, openaimodel.py:516-517 + conditioning_key 'adm',
        ddpm.py:1428); class ids arrive as `y`."""
        unet = UNet(
            model_channels=model_channels,
            out_channels=image_channels,
            num_res_blocks=num_res_blocks,
            attention_resolutions=tuple(attention_resolutions),
            channel_mult=tuple(channel_mult),
            dims=2,
            num_head_channels=num_head_channels,
            softmax_output=False,
            context_dim=context_dim,
            adm_classes=adm_classes,
            dtype=dtype,
            remat=remat,
            spatial_axis=spatial_axis,
        )
        diffusion = GaussianDiffusion.create(
            beta_schedule, timesteps, linear_start=linear_start, linear_end=linear_end,
            parameterization=parameterization,
        )
        return cls(unet=unet, diffusion=diffusion, channels=image_channels, cond_channels=cond_channels)

    def init_params(
        self, key: jax.Array, size: int, context_shape=None,
        learn_logvar: bool = False, logvar_init: float = 0.0,
    ):
        """`learn_logvar` adds a per-timestep log-variance parameter
        alongside the UNet tree (ddpm.py:111-115; joined to the optimizer
        the reference way, ddpm.py:423)."""
        x = jnp.zeros((1, size, size, self.channels))
        cond = jnp.zeros((1, size, size, self.cond_channels))
        ctx = None if context_shape is None else jnp.zeros((1, *context_shape))
        y = None if self.unet.adm_classes is None else jnp.zeros((1,), jnp.int32)
        uv = self.unet.init(key, x, jnp.zeros((1,)), cond=cond, context=ctx, y=y)
        if not learn_logvar:
            return uv
        return {"unet": uv, "logvar": jnp.full((self.diffusion.num_timesteps,), logvar_init, jnp.float32)}

    # -- eps model -----------------------------------------------------------

    def apply_model(self, params, x, t, cond=None, context=None, y=None):
        """DiffusionWrapper modes (ddpm.py:1408-1434): concat (`cond`),
        crossattn (`context`), hybrid (both), adm (`y` class ids)."""
        return self.unet.apply(
            unet_vars(params), x, t.astype(jnp.float32), cond=cond, context=context, y=y
        )

    # -- single-slice DDIM sampling, scan-compiled -----------------------------

    def sample_slice(
        self,
        params,
        key: jax.Array,
        cond: jnp.ndarray,  # (B, H, W, cond_channels)
        ddim: DDIMParams,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        x_T: Optional[jnp.ndarray] = None,
        temperature: float = 1.0,
        guidance_scale: float = 1.0,
        uncond_context: Optional[jnp.ndarray] = None,
        guidance_fn=None,
        inpaint_mask: Optional[jnp.ndarray] = None,  # 1 = keep x0, 0 = generate
        inpaint_x0: Optional[jnp.ndarray] = None,
        return_intermediates: bool = False,
        tile: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None,  # (patch, stride)
        uncond_cond: Optional[jnp.ndarray] = None,
        start_index: Optional[int] = None,
    ):
        """DDIM chain for one slice, scan-compiled.

        `guidance_scale` > 1 enables classifier-free guidance
        (ddim.py:172-179): e = e_uncond + s*(e_cond - e_uncond), run as two
        sequential b=B UNet calls — measured FASTER on v5e than the
        reference's concat-then-chunk b=2B batching at the hot shapes
        (BENCH_NOTES round-3 "CFG batching").  The scale rides the scan
        CARRY as a traced input, so sweeping it (e.g. per serve request)
        reuses ONE compiled program; only on/off (== 1.0 as a Python
        number) is static.  `uncond_cond` overrides the zeroed-`cond`
        unconditional branch (the latent path passes the ENCODING of
        zeroed pixels, which is not the zero latent).  `guidance_fn(x, t)
        -> grad` adds classifier guidance (models/classifier.py).

        `tile=((ph, pw), (sh, sw))` runs the UNet itself patch-tiled with
        border-weighted stitching every diffusion step — the reference's
        apply_model-level fold/unfold for oversized slices
        (ddpm.py:915-997); [x_t | cond] windows move together like the
        reference's jointly-unfolded z and c patches.

        `start_index=k` (static, 1 ≤ k ≤ num_steps) runs only the LAST k
        steps of the subset chain (indices k-1 … 0); the caller must then
        supply `x_T` already at that step's noise level, i.e.
        x = sqrt(ddim.alphas[k-1])·x0_guess + sqrt(1-ddim.alphas[k-1])·ε.
        This is the primitive behind the autoregressive `warm_start`
        option (sample_volume) — beyond-reference; the reference always
        runs the full subset from pure noise (ddim.py:141-164)."""
        b, h, w, _ = cond.shape
        n_run = ddim.num_steps if start_index is None else int(start_index)
        if not 1 <= n_run <= ddim.num_steps:
            raise ValueError(f"start_index must be in [1, {ddim.num_steps}], got {start_index}")
        if x_T is None:
            key, sub = jax.random.split(key)
            x_T = jax.random.normal(sub, (b, h, w, self.channels))
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)
        gs = jnp.asarray(guidance_scale, jnp.float32) if use_cfg else None

        def model_fn(x, t_b, c, ctx):
            if tile is None:
                return self.apply_model(params, x, t_b, cond=c, context=ctx, y=y)
            from ..ops.tiling import tiled_apply

            joint = x if c is None else jnp.concatenate([x, c.astype(x.dtype)], axis=-1)

            def fn(window):
                xw = window[..., : self.channels]
                cw = None if c is None else window[..., self.channels:]
                return self.apply_model(params, xw, t_b, cond=cw, context=ctx, y=y)

            return tiled_apply(fn, joint, tile[0], tile[1], out_channels=self.channels)

        def body(carry, index):
            if use_cfg:
                x, k, gs_c = carry
            else:
                (x, k), gs_c = carry, None
            k, sub, sub2 = jax.random.split(k, 3)
            t_b = jnp.full((b,), ddim.timesteps[index], jnp.int32)
            if inpaint_mask is not None and inpaint_x0 is not None:
                # re-noise the kept region to the current level (ddim.py:146-151)
                noise = jax.random.normal(sub2, x.shape, x.dtype)
                x_orig = self.diffusion.q_sample(inpaint_x0, t_b, noise)
                x = x_orig * inpaint_mask + (1.0 - inpaint_mask) * x
            out = model_fn(x, t_b, cond, context)
            if use_cfg:
                # the unconditional branch drops BOTH conditioning channels:
                # zeroed concat + uncond_context (None = no context — the
                # cross-attn falls back to self-attn), and it runs through
                # the SAME (possibly tiled) model_fn as the cond branch.
                # Deliberately TWO b=B calls, not one b=2B call: on v5e the
                # 512² UNet forward costs 3.3x at b=2 (94 vs 57 ms/sample —
                # XLA's large-spatial conv schedules degrade with batch), so
                # concat-then-chunk batching LOSES 1.69x here: 188 vs
                # 111 ms/step (BENCH_NOTES round-3 "CFG batching" entry).
                null_cond = jnp.zeros_like(cond) if uncond_cond is None else uncond_cond
                out_uncond = model_fn(x, t_b, null_cond, uncond_context)
                out = out_uncond + gs_c.astype(out.dtype) * (out - out_uncond)
            # subset samplers work in eps space; an x0-parameterized model's
            # output converts here (the CFG combine above is affine, so
            # composing pre-conversion is equivalent)
            e_t = self._to_eps(out, x, t_b)
            if guidance_fn is not None:
                e_t = e_t - jnp.sqrt(1.0 - ddim.alphas[index]) * guidance_fn(x, t_b)
            x, pred_x0 = ddim_step(ddim, sub, x, e_t.astype(x.dtype), index, temperature)
            next_carry = (x, k, gs_c) if use_cfg else (x, k)
            return next_carry, (pred_x0 if return_intermediates else None)

        indices = jnp.arange(n_run - 1, -1, -1)
        init = (x_T, key, gs) if use_cfg else (x_T, key)
        (x, *_), inter = jax.lax.scan(body, init, indices)
        if return_intermediates:
            return x, inter  # inter: (S, B, H, W, C) pred_x0 trajectory
        return x

    # -- full-T ancestral sampling, scan-compiled ------------------------------

    def _ancestral_loop(self, params, key, cond, *, context=None, y=None,
                        x_T=None, clip_denoised=True, n_rows=0,
                        collect="x0", quantize_fn=None):
        """One lax.scan over t = T-1…0 of the ancestral chain
        (DDPM.p_sample_loop / LatentDiffusion.p_sample_loop,
        ddpm.py:254-269, 1179-1230), optionally collecting `n_rows`
        evenly-spaced intermediates into a fixed-size device buffer
        (dynamic_update_slice — no per-step host appends like the
        reference's Python list).  `collect` picks the row content: 'x0'
        (pred_x0 — progressive_denoising, ddpm.py:1123-1177) or 'x' (the
        walking sample — p_sample_loop intermediates).  `quantize_fn`
        maps pred_x0 through a quantizer before the posterior (the
        quantize_denoised hook of p_sample, ddpm.py:1092-1106)."""
        b, h, w, _ = cond.shape
        T = self.diffusion.num_timesteps
        if x_T is None:
            key, sub = jax.random.split(key)
            x_T = jax.random.normal(sub, (b, h, w, self.channels))
        every = max(1, T // n_rows) if n_rows else T + 1
        n_buf = (T + every - 1) // every if n_rows else 1
        buf = jnp.zeros((n_buf, b, h, w, self.channels), x_T.dtype)

        def body(carry, t):
            x, k, rows = carry
            k, sub = jax.random.split(k)
            t_b = jnp.full((b,), t, jnp.int32)
            out = self.apply_model(params, x, t_b, cond=cond, context=context, y=y)
            x0 = self.diffusion.predict_x0(out.astype(x.dtype), x, t_b, clip_denoised)
            if quantize_fn is not None:
                x0 = quantize_fn(x0)
            mean, _, log_var = self.diffusion.q_posterior(x0, x, t_b)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            nonzero = (t > 0).astype(x.dtype)
            x_next = mean + nonzero * jnp.exp(0.5 * log_var) * noise
            if n_rows:
                idx = t // every
                cur = jax.lax.dynamic_slice_in_dim(rows, idx, 1, 0)[0]
                val = x0 if collect == "x0" else x_next
                new = jnp.where(t % every == 0, val, cur)
                rows = jax.lax.dynamic_update_slice_in_dim(rows, new[None], idx, 0)
            return (x_next, k, rows), None

        ts = jnp.arange(T - 1, -1, -1)
        (x, _, buf), _ = jax.lax.scan(body, (x_T, key, buf), ts)
        return (x, buf[::-1]) if n_rows else (x, None)  # rows in sampling order (t high → low)

    def p_sample_loop(self, params, key, cond, *, context=None, y=None, x_T=None,
                      clip_denoised=True, return_intermediates=False, n_rows=6,
                      quantize_fn=None):
        """Full-T ancestral sampler (ddpm.py:254-269 / 1179-1230); with
        `return_intermediates`, also the walking sample at ~n_rows levels."""
        x, rows = self._ancestral_loop(
            params, key, cond, context=context, y=y, x_T=x_T,
            clip_denoised=clip_denoised, n_rows=n_rows if return_intermediates else 0,
            collect="x", quantize_fn=quantize_fn)
        return (x, rows) if return_intermediates else x

    def progressive_denoising(self, params, key, cond, *, context=None, y=None,
                              x_T=None, clip_denoised=True, n_rows=6,
                              quantize_fn=None):
        """(sample, pred_x0 progression) over the full ancestral chain —
        LatentDiffusion.progressive_denoising (ddpm.py:1123-1177), feeding
        log_images' progressive_row panel (ddpm.py:1358-1365)."""
        return self._ancestral_loop(
            params, key, cond, context=context, y=y, x_T=x_T,
            clip_denoised=clip_denoised, n_rows=n_rows, collect="x0",
            quantize_fn=quantize_fn)

    def _sample_slice_multistep(
        self,
        params,
        key: jax.Array,
        cond: jnp.ndarray,
        ddim: DDIMParams,
        sampler: str,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        guidance_scale=1.0,
        uncond_cond: Optional[jnp.ndarray] = None,
        uncond_context: Optional[jnp.ndarray] = None,
        x_T: Optional[jnp.ndarray] = None,
        start_index: Optional[int] = None,
    ) -> jnp.ndarray:
        """Shared driver for the multistep ODE samplers ('plms', 'dpm').

        CFG composes inside eps_fn as the same two sequential b=B calls as
        the DDIM path (see sample_slice); `guidance_scale` may be a traced
        array (it closes over into the loop body, so a scan carry works).
        `start_index=k` runs only the last k nodes from an x_T at node
        k-1's noise level — the warm-start primitive, same contract as
        sample_slice's start_index."""
        from ..diffusion.dpm_solver import dpm_solver_sample_loop
        from ..diffusion.plms import plms_sample_loop

        loops = {"plms": plms_sample_loop, "dpm": dpm_solver_sample_loop}
        if sampler not in loops:
            raise ValueError(f"unknown sampler {sampler!r}; expected 'ddim', 'plms' or 'dpm'")
        # guard here, not only in sample_volume/stream_volume: the public
        # per-slice entry points (sample_slice_plms/dpm) would otherwise
        # silently drop a nonzero-eta DDIMParams' sigma term and return a
        # deterministic trajectory with a mismatched dir_xt coefficient
        self._check_sampler(sampler, None, ddim)
        b, h, w, _ = cond.shape
        if x_T is None:
            key, sub = jax.random.split(key)
            x_T = jax.random.normal(sub, (b, h, w, self.channels))
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)

        def eps_fn(x, t):
            e = self.apply_model(params, x, t, cond=cond, context=context, y=y)
            if use_cfg:
                null_cond = jnp.zeros_like(cond) if uncond_cond is None else uncond_cond
                e_u = self.apply_model(params, x, t, cond=null_cond,
                                       context=uncond_context, y=y)
                gs = jnp.asarray(guidance_scale).astype(e.dtype)
                e = e_u + gs * (e - e_u)
            # multistep ODE updates are derived in eps space — convert an
            # x0-parameterized model's output (no-op for eps models)
            return self._to_eps(e, x, t).astype(x.dtype)

        return loops[sampler](eps_fn, ddim, x_T, start_index=start_index)

    def sample_slice_plms(
        self,
        params,
        key: jax.Array,
        cond: jnp.ndarray,
        ddim: DDIMParams,
        context: Optional[jnp.ndarray] = None,
        x_T: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """PLMS variant of the slice sampler (ldm/models/diffusion/plms.py)."""
        return self._sample_slice_multistep(params, key, cond, ddim, "plms",
                                            context=context, x_T=x_T)

    def sample_slice_dpm(
        self,
        params,
        key: jax.Array,
        cond: jnp.ndarray,
        ddim: DDIMParams,
        context: Optional[jnp.ndarray] = None,
        x_T: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """DPM-Solver++(2M) slice sampler (diffusion/dpm_solver.py) —
        beyond-reference: ~50-step-DDIM quality in ~15-25 model calls with
        the reference's pure-noise-per-slice semantics kept exactly."""
        return self._sample_slice_multistep(params, key, cond, ddim, "dpm",
                                            context=context, x_T=x_T)

    def log_images(self, params, key: jax.Array, batch: dict, ddim: DDIMParams, n_row: int = 4,
                   progressive: bool = False) -> dict:
        """Qualitative logging dict (LatentDiffusion.log_images,
        ddpm.py:1263-1372 / ImageLogger main.py:419-449): inputs,
        reconstruction-free samples, a denoise-progression row, and
        inpainting / outpainting panels (left half kept / regenerated —
        the mask and its complement, ddpm.py:1345-1358).  `progressive`
        adds the full-T pred_x0 progression (plot_progressive_rows →
        progressive_denoising, ddpm.py:1358-1365) — one extra ancestral
        chain, so off by default."""
        import numpy as np

        x = batch["image"][:n_row]
        cond = batch.get("cond")
        cond = cond[:n_row] if cond is not None else jnp.zeros(x.shape[:-1] + (self.cond_channels,))
        # adm class ids ride the batch like the train step does
        # (cond_stage_key 'class_label', ddpm.py:1428) — without this, an
        # adm-configured UNet would assert at the first eval panel
        y = batch.get("y", batch.get("class_label"))
        y = y[:n_row] if y is not None else (
            None if self.unet.adm_classes is None
            else jnp.zeros((x.shape[0],), jnp.int32))
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        samples, inter = self.sample_slice(params, k1, cond, ddim, y=y,
                                           return_intermediates=True)
        every = max(1, inter.shape[0] // 6)
        denoise_row = inter[::every]  # (R, B, H, W, C)
        mask = jnp.zeros_like(x).at[:, :, : x.shape[2] // 2].set(1.0)
        inpaint = self.sample_slice(params, k2, cond, ddim, y=y, inpaint_mask=mask, inpaint_x0=x)
        outpaint = self.sample_slice(params, k3, cond, ddim, y=y, inpaint_mask=1.0 - mask,
                                     inpaint_x0=x)
        # forward-noising progression of the first input (diffusion_row,
        # ddpm.py:1273-1285): q_sample at ~6 evenly spaced t levels
        T = self.diffusion.num_timesteps
        ts = jnp.linspace(0, T - 1, num=min(6, T)).astype(jnp.int32)
        diffusion_row = jax.vmap(
            lambda t, k: self.diffusion.q_sample(
                x, jnp.full((x.shape[0],), t, jnp.int32),
                jax.random.normal(k, x.shape, x.dtype))
        )(ts, jax.random.split(k4, ts.shape[0]))  # (R, B, H, W, C)
        out = {
            "inputs": np.asarray(x),
            "samples": np.asarray(samples),
            "denoise_row": np.asarray(denoise_row),
            "diffusion_row": np.asarray(diffusion_row),
            "inpaint": np.asarray(inpaint),
            "outpaint": np.asarray(outpaint),
            "conditioning": np.asarray(cond),
        }
        if progressive:
            _, prog = self.progressive_denoising(params, k5, cond, y=y, n_rows=6)
            out["progressive_row"] = np.asarray(prog)  # (R, B, H, W, C)
        return out

    # -- autoregressive volume, both loops fused ------------------------------

    @staticmethod
    def warm_start_index(ddim: DDIMParams, warm_start: Optional[float]) -> Optional[int]:
        """Map a warm-start fraction to the static chain start index.

        `warm_start=f` ∈ (0, 1] means: after the first slice, run only the
        last round(f·S) DDIM steps per slice, initialised from the previous
        slice's RAW sample noised to that level (SDEdit-style).  None = the
        reference behaviour (full chain from pure noise per slice)."""
        if warm_start is None:
            return None
        f = float(warm_start)
        if not 0.0 < f <= 1.0:
            raise ValueError(f"warm_start must be in (0, 1], got {warm_start}")
        return max(1, min(ddim.num_steps, int(round(f * ddim.num_steps))))

    def _to_eps(self, out: jnp.ndarray, x: jnp.ndarray, t_b: jnp.ndarray) -> jnp.ndarray:
        """Model output → eps for the subset samplers (DDIM/PLMS/DPM update
        rules all assume eps parameterization, as the reference's do —
        ddim.py:173, plms.py).  For `parameterization='x0'` the output is
        x0_hat; invert q_sample: eps = (x_t − √ᾱ_t·x0)/√(1−ᾱ_t).  No-op
        for eps models.  `t_b` is the DDPM timestep, broadcast per batch."""
        if self.diffusion.parameterization == "eps":
            return out
        a = self.diffusion.alphas_cumprod[t_b].astype(x.dtype)
        a = a.reshape(a.shape + (1,) * (x.ndim - a.ndim))
        return (x - jnp.sqrt(a) * out.astype(x.dtype)) * jax.lax.rsqrt(1.0 - a)

    @staticmethod
    def _check_sampler(sampler, tile, ddim=None):
        if sampler not in ("ddim", "plms", "dpm"):
            raise ValueError(f"unknown sampler {sampler!r}; expected 'ddim', 'plms' or 'dpm'")
        if sampler != "ddim" and tile is not None:
            raise ValueError(
                f"sampler={sampler!r} does not support tile (a DDIM-chain "
                "feature); drop it or use sampler='ddim'")
        if sampler != "ddim" and ddim is not None:
            try:  # concrete arrays only — skip when tracing
                nonzero_eta = bool(np.any(np.asarray(ddim.sigmas) != 0.0))
            except Exception:
                nonzero_eta = False
            if nonzero_eta:
                # the multistep ODE updates have no stochastic sigma term —
                # the reference PLMSSampler asserts ddim_eta == 0 (plms.py:30)
                raise ValueError(
                    f"sampler={sampler!r} requires ddim_eta=0 (deterministic "
                    "ODE solver); this DDIMParams was built with nonzero eta")

    def sample_volume(
        self,
        params,
        key: jax.Array,
        mask_volume: jnp.ndarray,  # (B, D, H, W, 1) mask channel, already windowed
        ddim: DDIMParams,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        init_slice: Optional[jnp.ndarray] = None,
        tile: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None,
        guidance_scale: float = 1.0,
        warm_start: Optional[float] = None,
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """Generate all D slices autoregressively; returns (B, D, H, W, C).

        The first slice is conditioned on `init_slice` (zeros by default,
        mirroring sample_cond's zero-initialised volume buffer,
        sample_diffusion.py:196-210).  A CFG scale rides the scan carry as
        a traced input — one compiled program for all scale values.

        `warm_start=f` ∈ (0, 1] is a beyond-reference speed/quality knob:
        slice z>0 starts its DDIM chain from the previous slice's raw
        sample noised to the round(f·S)-th subset level and runs only
        those last steps (adjacent CT slices are highly correlated, so the
        previous slice is a strong x0 guess — SDEdit truncation).  The
        per-slice cost drops ~1/f; default None keeps exact reference
        semantics (full chain from pure noise, sample_diffusion.py:212).

        `sampler='dpm'` ('plms') swaps the per-slice chain for a multistep
        ODE solver at the SAME semantics (every slice from pure noise) —
        DPM-Solver++(2M) reaches 50-step-DDIM quality in ~15-25 steps, so
        a 20-step `ddim` subset cuts e2e ~2.4x without the z-smoothing
        trade of `warm_start`.  `warm_start` COMPOSES with it (the solver
        runs only its last round(f·S) nodes from the q-noised previous
        slice), compounding the two speedups; `tile` stays DDIM-only."""
        self._check_sampler(sampler, tile, ddim)
        b, d, h, w, _ = mask_volume.shape
        if init_slice is None:
            init_slice = jnp.zeros((b, h, w, self.channels))
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)
        gs = jnp.asarray(guidance_scale, jnp.float32) if use_cfg else None
        warm = self.warm_start_index(ddim, warm_start)
        mask_zfirst = jnp.moveaxis(mask_volume, 1, 0)  # (D, B, H, W, 1)

        if warm is None:
            def body(carry, mask_slice):
                if use_cfg:
                    prev, k, gs_c = carry
                else:
                    (prev, k), gs_c = carry, 1.0
                k, sub = jax.random.split(k)
                s, _ = self._volume_slice_step(params, prev, mask_slice, sub, ddim,
                                               context=context, y=y, tile=tile,
                                               guidance_scale=gs_c, sampler=sampler)
                return ((s, k, gs_c) if use_cfg else (s, k)), s

            init = (init_slice, key, gs) if use_cfg else (init_slice, key)
            _, slices = jax.lax.scan(body, init, mask_zfirst)
            return jnp.moveaxis(slices, 0, 1)  # (B, D, H, W, C)

        # warm-start path: slice 0 runs the full chain (no predecessor);
        # slices 1… carry the previous RAW sample and run the short chain
        key, k0 = jax.random.split(key)
        s0, raw0 = self._volume_slice_step(params, init_slice, mask_zfirst[0], k0, ddim,
                                           context=context, y=y, tile=tile,
                                           guidance_scale=gs if use_cfg else 1.0,
                                           sampler=sampler)

        def body(carry, mask_slice):
            if use_cfg:
                prev, praw, k, gs_c = carry
            else:
                (prev, praw, k), gs_c = carry, 1.0
            k, sub = jax.random.split(k)
            s, raw = self._volume_slice_step(params, prev, mask_slice, sub, ddim,
                                             context=context, y=y, tile=tile,
                                             guidance_scale=gs_c,
                                             prev_raw=praw, warm_index=warm,
                                             sampler=sampler)
            return ((s, raw, k, gs_c) if use_cfg else (s, raw, k)), s

        init = (s0, raw0, key, gs) if use_cfg else (s0, raw0, key)
        _, slices = jax.lax.scan(body, init, mask_zfirst[1:])
        slices = jnp.concatenate([s0[None], slices], axis=0)
        return jnp.moveaxis(slices, 0, 1)  # (B, D, H, W, C)

    def _volume_slice_step(self, params, prev, mask_slice, k, ddim,
                           context=None, y=None, tile=None, guidance_scale=1.0,
                           prev_raw=None, warm_index: Optional[int] = None,
                           sampler: str = "ddim"):
        """One autoregressive z-step: [prev generated | mask] concat-cond
        DDIM chain + per-slice min-max normalisation
        (sample_diffusion.py:222) — the single definition shared by
        sample_volume's scan body and stream_volume.  Returns
        (normalised slice, RAW slice) — the raw sample is the x0 guess for
        the next slice's warm start; with `warm_index=k` and `prev_raw`
        given, the chain starts at index k-1 from q-sampled prev_raw.
        `sampler` picks the per-slice chain: 'ddim' (default, full feature
        set) or the multistep ODE solvers 'plms'/'dpm' (warm composes —
        the truncated chain runs the solver's last k nodes; tile stays
        DDIM-only)."""
        cond = jnp.concatenate([prev, mask_slice], axis=-1)
        x_T = start = None
        if warm_index is not None and prev_raw is not None:
            k, ke = jax.random.split(k)
            a = ddim.alphas[warm_index - 1]
            eps = jax.random.normal(ke, prev_raw.shape, prev_raw.dtype)
            x_T = jnp.sqrt(a) * prev_raw + jnp.sqrt(1.0 - a) * eps
            start = warm_index
        if sampler != "ddim":
            s = self._sample_slice_multistep(params, k, cond, ddim, sampler,
                                             context=context, y=y,
                                             guidance_scale=guidance_scale,
                                             x_T=x_T, start_index=start)
        else:
            s = self.sample_slice(params, k, cond, ddim, context=context, y=y, tile=tile,
                                  guidance_scale=guidance_scale, x_T=x_T, start_index=start)
        return _minmax_slice(s), s

    def stream_volume(
        self,
        params,
        key: jax.Array,
        mask_volume: jnp.ndarray,  # (B, D, H, W, 1)
        ddim: DDIMParams,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        init_slice: Optional[jnp.ndarray] = None,
        tile: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None,
        guidance_scale: float = 1.0,
        warm_start: Optional[float] = None,
        sampler: str = "ddim",
    ):
        """Generator over z: yields each (B, H, W, C) slice as it is
        produced.  Same math as `sample_volume` (shared _volume_slice_step,
        incl. the `warm_start` short-chain and `sampler` options) but
        consumers see slices incrementally — the serving analog of the
        reference's per-slice debug dump inside sample_cond
        (sample_diffusion.py:223).  The jitted per-slice programs are
        cached on the instance (keyed by tile, CFG ON/OFF, warm index, and
        sampler only — the scale itself is a traced argument) so repeated
        streaming requests, even with varying guidance scales, never
        retrace."""
        self._check_sampler(sampler, tile, ddim)
        b, d, h, w, _ = mask_volume.shape
        if init_slice is None:
            init_slice = jnp.zeros((b, h, w, self.channels))
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)
        warm = self.warm_start_index(ddim, warm_start)

        # frozen dataclass: mutate __dict__ directly for the jit cache
        cache = self.__dict__.setdefault("_stream_jit_cache", {})

        def get_fn(warm_index):
            fn = cache.get((tile, use_cfg, warm_index, sampler))
            if fn is None:
                def fn(params, prev, prev_raw, mask_slice, k, ddim, context, y, gs):
                    return self._volume_slice_step(params, prev, mask_slice, k, ddim,
                                                   context=context, y=y, tile=tile,
                                                   guidance_scale=gs if use_cfg else 1.0,
                                                   prev_raw=prev_raw, warm_index=warm_index,
                                                   sampler=sampler)

                fn = cache[(tile, use_cfg, warm_index, sampler)] = jax.jit(fn)
            return fn

        gs = jnp.asarray(guidance_scale, jnp.float32)
        prev, prev_raw = init_slice, None
        for z in range(d):
            key, sub = jax.random.split(key)
            fn = get_fn(warm if (warm is not None and z > 0) else None)
            prev, raw = fn(params, prev, prev_raw, mask_volume[:, z], sub, ddim,
                           context, y, gs)
            # keep prev_raw=None when warm start is off so every slice hits
            # the SAME jitted signature (a tensor here would retrace the
            # cold program once with an unused argument)
            prev_raw = raw if warm is not None else None
            yield prev
