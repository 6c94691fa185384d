"""Benchmarks over the whole BASELINE surface — one JSON line per metric.

Primary metric (printed FIRST so it is recorded even if later metrics run
out of budget): stage-1 categorical UNet denoise steps/sec/chip at the
reference workload — 12-class one-hot 64x128x128 volume, UNet base 64,
mult [1,2,2,4,5], attn at ds {32,16,8} (ccdm/params.yml:69-76).  One
denoise step = UNet forward + closed-form categorical posterior +
categorical draw.

Additional metrics (BASELINE.md milestones, VERDICT round-1 item #9):
  * stage-1 train steps/sec (full-size fwd+bwd+Adam+EMA, no remat, batch 1)
  * stage-2 DDIM denoise steps/sec at 512^2 (UNet base 128, mult
    [1,2,4,4,5], concat-cond — ruijin-ldm_from_controlnet.yaml:24-40)
  * end-to-end two-stage latency: 25-step mask sample at 64x128x128 +
    autoregressive 16-slice 256^2 CT at 50 DDIM steps, plus the linear
    extrapolation to the 128-slice north-star volume.

Measured the production way: each chain is ONE `lax.scan`-compiled
program (exactly how the samplers run), so per-step Python dispatch —
which dominates on this host — is excluded, as it is in real sampling.
Timing is synced by fetching a scalar reduction (on this box
`block_until_ready` alone does not await the tunneled device, and the
first device->host fetch pays a one-time relay setup which is excluded by
a warmup fetch).

The reference publishes no numbers (BASELINE.md) so vs_baseline is null;
the north-star target (<60 s full volume on v5e-8) is tracked by the
extrapolated e2e line.  Set BENCH_METRICS=primary to emit only the first
metric.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compiled-executable cache (TPU only: CPU executables compiled by
# the remote-compile relay carry its machine features and can SIGILL here):
# remote compilation of the big scan programs is the dominant cost on this
# box; caching makes reruns start in seconds
if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(value, 4), "unit": unit,
                      "vs_baseline": None}), flush=True)


def time_chain(fn, *args, iters=3):
    """fn must return a scalar; first call warms compile + d2h relay."""
    _ = float(fn(*args[0] if isinstance(args[0], tuple) else args))
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(fn(*args[0] if isinstance(args[0], tuple) else args))
    return (time.perf_counter() - t0) / iters


_V5E_PEAK_TFLOPS = 197.0  # bf16


def emit_mfu(name, jitted, args, dt_per_step):
    """Achieved TF/s + model FLOPs utilisation from XLA's own cost analysis
    of the compiled chain program (SURVEY §5 tracing/profiling surface).
    XLA counts a lax.scan/while body ONCE, so for the scan-chain programs
    here `flops` is already per-step (verified on-chip: 2.31 TF reported
    for the 6.15-TFLOP denoise body x 8.7 steps/s ~= the measured 53 TF/s
    whole-model rate only when NOT dividing by chain length)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops <= 0:
            return
        tfs = flops / dt_per_step / 1e12
        emit(f"{name}_achieved_tflops_per_chip", tfs, "TF/s")
        emit(f"{name}_mfu", 100.0 * tfs / _V5E_PEAK_TFLOPS, "%")
    except Exception:
        pass


def bench_stage1_denoise():
    from jointimagegeneration_tpu.models import MaskSampler

    spatial = (64, 128, 128)  # reference stage-1 volume (ruijin.py:176-178)
    chain_steps = 25
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)

    @jax.jit
    def run_chain(params, key):
        x = model.sample(params, key, (1, *spatial), cond=cond, num_steps=chain_steps)
        return jnp.sum(x[..., 0])

    n_iters = 3
    _ = float(run_chain(params, jax.random.key(1)))
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = float(run_chain(params, jax.random.key(2 + i)))
    dt = time.perf_counter() - t0
    emit("stage1_denoise_steps_per_sec_per_chip_64x128x128",
         chain_steps * n_iters / dt, "steps/s")
    emit_mfu("stage1_denoise", run_chain, (params, jax.random.key(1)),
             dt / (chain_steps * n_iters))
    return model, params, spatial


def bench_stage1_train():
    from jointimagegeneration_tpu.models import MaskSampler
    from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_mask_train_step

    spatial = (64, 128, 128)
    # remat=False: the full fwd+bwd fits since the round-3 data-formatting
    # fixes (XLA memory_analysis: peak 14.54 GiB of 16; rounds 1-2 it OOMed
    # by ~170 MB) and is the measured 1.09x winner over per-ResBlock remat
    # (567.5 vs 618.1 ms/step, identical loss trajectory — BENCH_NOTES).
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16, remat=False,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    tx = build_optimizer("AdamW", 1e-4)
    state = EMATrainState.create(params, tx)
    step = make_mask_train_step(model, class_weights=jnp.ones((12,)))
    batch = {
        "mask": jax.nn.one_hot(jnp.zeros((1, *spatial), jnp.int32), 12),
        "image": jnp.zeros((1, *spatial, 1)),
    }
    # single-step program (not a scan chain): the fwd+bwd graph at
    # full shape is near the remote compile helper's memory ceiling — a
    # 4-step scan of it gets the helper SIGKILLed.  Per-step dispatch is
    # ~1 ms against a ~570 ms step, so timing sequential calls is faithful.
    jstep = jax.jit(step, donate_argnums=(0,))
    state, m = jstep(state, batch, jax.random.key(1))
    _ = float(m["loss"])  # warm: compile + relay
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, batch, jax.random.key(2 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    emit("stage1_train_steps_per_sec_64x128x128", 1.0 / dt, "steps/s")
    emit_mfu("stage1_train", jstep, (state, batch, jax.random.key(9)), dt)


def bench_stage2_train():
    """Stage-2 train step at the reference train size (512², batch 1 —
    ruijin-ldm_from_controlnet.yaml:12,73) plus the batched-256² leg: the
    round-3 ladder (BENCH_NOTES) found per-sample cost is non-monotonic
    in batch — b=2/4 lose 25%, b=8 WINS 2.35x (fills the 8-sublane tile
    dim) — so the b=8 samples/s line is the recommended training
    configuration at 256²-class shapes."""
    from jointimagegeneration_tpu.models import SliceLDM
    from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_ldm_train_step

    def run(size, batch, name, rate_metric, rate_unit, rate_fn):
        model = SliceLDM.create(
            image_channels=1, cond_channels=2, timesteps=1000,
            model_channels=128, channel_mult=(1, 2, 4, 4, 5),
            attention_resolutions=(32, 16, 8), num_res_blocks=2,
            num_head_channels=32, dtype=jnp.bfloat16,
        )
        params = model.init_params(jax.random.key(1), size)
        state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
        jstep = jax.jit(make_ldm_train_step(model), donate_argnums=(0,))
        batch_d = {
            "image": jnp.zeros((batch, size, size, 1)),
            "cond": jnp.zeros((batch, size, size, 2)),
        }
        state, m = jstep(state, batch_d, jax.random.key(1))
        _ = float(m["loss"])
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            state, m = jstep(state, batch_d, jax.random.key(2 + i))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        emit(rate_metric, rate_fn(dt), rate_unit)
        # MFU from cost analysis of the exact compiled step.  Emitted inside
        # run() so the big train state stays local and is freed before the
        # next leg allocates its own (keeping both resident can OOM the b=8
        # leg on a 16 GB chip).
        emit_mfu(name, jstep, (state, batch_d, jax.random.key(9)), dt)

    run(512, 1, "stage2_train", "stage2_train_steps_per_sec_512x512",
        "steps/s", lambda dt: 1.0 / dt)
    run(256, 8, "stage2_train_batch8", "stage2_train_samples_per_sec_256x256_batch8",
        "samples/s", lambda dt: 8.0 / dt)


def _stage2(size, ddim_steps):
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import SliceLDM

    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), size)
    ddim = DDIMParams.create(model.diffusion, ddim_steps)
    return model, params, ddim


def bench_stage2_ddim():
    size, chain = 512, 10
    model, params, ddim = _stage2(size, chain)
    cond = jnp.zeros((1, size, size, 2), jnp.bfloat16)

    @jax.jit
    def run(params, key):
        s = model.sample_slice(params, key, cond, ddim)
        return jnp.sum(s)

    dt = time_chain(run, params, jax.random.key(2))
    emit("stage2_ddim_steps_per_sec_512x512", chain / dt, "steps/s")
    emit_mfu("stage2_ddim", run, (params, jax.random.key(2)), dt / chain)


def bench_serving_batch8():
    """Aggregate multi-volume serving throughput: the 50-step DDIM slice
    chain at 256² with 8 volumes resident on ONE chip — the measured
    batching sweet spot (BENCH_NOTES inference ladder: b=8 is
    1.55x/sample vs one-at-a-time; b=2/4 lose; the flip holds at 512²).
    Same program as scripts/probe_batch_infer.py so the persistent cache
    is shared."""
    size, steps, b = 256, 50, 8
    model, params, ddim = _stage2(size, steps)
    cond = jnp.zeros((b, size, size, 2), jnp.bfloat16)

    @jax.jit
    def run(params, key):
        s = model.sample_slice(params, key, cond, ddim)
        return jnp.sum(s)

    dt = time_chain(run, params, jax.random.key(2))
    agg = b * steps / dt  # sample-steps/s
    emit("serving_sample_steps_per_sec_256x256_batch8", agg, "sample-steps/s")
    emit_mfu("serving_batch8", run, (params, jax.random.key(2)), dt / steps)
    # amortized per-volume latency for the 128-slice ddim-50 volume when
    # serving 8 concurrently (stage-2 share only; mask stage adds ~3 s)
    emit("serving_amortized_seconds_per_128slice_volume_batch8",
         128 * steps / agg, "s/volume")


def bench_e2e():
    """25-step mask at 64x128x128 -> nearest-upsample -> 16 slices of 256^2
    at 50 DDIM steps (one scan program), extrapolated to the 128-slice
    north-star volume (BASELINE.md: <60 s on v5e-8; this is single-chip)."""
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import MaskSampler
    from jointimagegeneration_tpu.pipeline import TwoStagePipeline

    spatial = (64, 128, 128)
    n_slices, size, ddim_steps = 16, 256, 50
    ms = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    ms_params = ms.init_params(jax.random.key(0), spatial, cond_channels=1)
    ldm, ldm_params, ddim = _stage2(size, ddim_steps)
    pipe = TwoStagePipeline(ms, ldm)

    def make_run(nz):
        @jax.jit
        def run(ms_params, ldm_params, key):
            ct, labels = pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *spatial), volume_shape=(nz, size, size),
                ddim=ddim, mask_steps=25, cond=jnp.zeros((1, *spatial, 1), jnp.bfloat16),
            )
            return jnp.sum(ct) + jnp.sum(labels)

        return run

    dt = time_chain(make_run(n_slices), (ms_params, ldm_params, jax.random.key(3)), iters=1)
    emit(f"e2e_two_stage_{n_slices}x{size}x{size}_seconds", dt, "s")
    # mask time is shared; only the per-slice DDIM chain scales in z
    # (sample_diffusion drives n_slices x 50 UNet forwards, SURVEY.md §3.4).
    # A second measured point at 2x slices separates the shared base from
    # the per-slice rate, so the 128-slice figure is an affine fit of two
    # MEASUREMENTS rather than naive x8 scaling (which wrongly multiplies
    # the mask-sampler time too).
    dt32 = time_chain(make_run(2 * n_slices), (ms_params, ldm_params, jax.random.key(4)), iters=1)
    emit(f"e2e_two_stage_{2 * n_slices}x{size}x{size}_seconds", dt32, "s")
    if dt32 > dt:
        rate = (dt32 - dt) / n_slices
        base = dt - n_slices * rate
        e2e_128 = base + 128 * rate
    else:  # timing noise collapsed the two points — fall back to linear
        e2e_128 = dt * (128 / n_slices)

    # beyond-reference routes, each fenced so a failure here cannot suppress
    # the headline line below (the driver parses the FINAL json line):
    # DPM-Solver++(2M) on uniform-log-SNR nodes at 20 steps — reference
    # per-slice semantics kept (pure noise per slice), ~2.4x fewer UNet
    # calls per slice; accuracy vs the converged ODE solution is BETTER
    # than ddim-50/uniform (BENCH_NOTES round 3)
    try:
        dpm = DDIMParams.create(ldm.diffusion, 20, method="uniform_lambda")

        @jax.jit
        def run_dpm(ms_params, ldm_params, key):
            ct, labels = pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *spatial), volume_shape=(n_slices, size, size),
                ddim=dpm, mask_steps=25, cond=jnp.zeros((1, *spatial, 1), jnp.bfloat16),
                sampler="dpm",
            )
            return jnp.sum(ct) + jnp.sum(labels)

        dt_dpm = time_chain(run_dpm, (ms_params, ldm_params, jax.random.key(5)), iters=1)
        emit(f"e2e_two_stage_dpm20_{n_slices}x{size}x{size}_seconds", dt_dpm, "s")

        # composed fast route: dpm-20 + warm_start 0.4 (solver runs only its
        # last 8 nodes per slice, seeded from the q-noised previous slice) —
        # measured zero composition overhead; 128-slice fit 14.8 s single chip
        # (BENCH_NOTES round 3, scripts/probe_dpm_warm.py)
        @jax.jit
        def run_dpm_warm(ms_params, ldm_params, key):
            ct, labels = pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *spatial), volume_shape=(n_slices, size, size),
                ddim=dpm, mask_steps=25, cond=jnp.zeros((1, *spatial, 1), jnp.bfloat16),
                sampler="dpm", warm_start=0.4,
            )
            return jnp.sum(ct) + jnp.sum(labels)

        dt_warm = time_chain(run_dpm_warm, (ms_params, ldm_params, jax.random.key(6)), iters=1)
        emit(f"e2e_two_stage_dpm20_warm04_{n_slices}x{size}x{size}_seconds", dt_warm, "s")
    except Exception as e:
        print(json.dumps({"metric": "e2e_dpm_legs", "error": str(e)[:200]}), flush=True)

    # the north-star tracker line goes LAST: the driver records the final
    # JSON line as the round's parsed headline (BENCH_r{N}.json), and the
    # reference-semantics 128-slice figure is the comparable one
    emit("e2e_extrapolated_128slice_256x256_seconds", e2e_128, "s")


def main():
    which = os.environ.get("BENCH_METRICS", "all")
    bench_stage1_denoise()
    if which == "primary":
        return
    for fn in (bench_stage1_train, bench_stage2_train, bench_stage2_ddim,
               bench_serving_batch8, bench_e2e):
        try:
            fn()
        except Exception as e:  # keep emitting the remaining metrics
            print(json.dumps({"metric": fn.__name__, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
