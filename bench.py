"""Benchmarks over the whole BASELINE surface — one JSON line per metric.

Primary metric (printed FIRST so it is recorded even if later metrics run
out of budget): stage-1 categorical UNet denoise steps/sec/chip at the
reference workload — 12-class one-hot 64x128x128 volume, UNet base 64,
mult [1,2,2,4,5], attn at ds {32,16,8} (ccdm/params.yml:69-76).  One
denoise step = UNet forward + closed-form categorical posterior +
categorical draw.

Leg ordering (round-4): the legs run most-important-first under a
wall-clock budget (env BENCH_BUDGET_S, default 1500 s) so a cold
compile cache can never time the process out before the headline
numbers are emitted (round-3 post-mortem: rc=124 with train legs
ordered early lost every e2e/serving line):

  1. stage-1 denoise chain (primary)
  2. e2e two-stage legs: 16/32-slice measurements -> 128-slice affine
     fit; dpm-20 and dpm-20+warm-start fast routes; budget permitting a
     DIRECT 128-slice run (the north-star measured, not extrapolated)
  3. batch-8 serving throughput (measured batching sweet spot)
  4. stage-2 DDIM chain at 512^2
  5. train-step legs (slowest compiles; skipped first under pressure)

A leg whose estimated cost exceeds the remaining budget emits a
{"metric": ..., "skipped": "budget"} line instead of silently vanishing.
The FINAL line is always the 128-slice north-star (measured if the
direct leg ran, else the two-point affine fit) because the driver
records the last JSON line as the round's parsed headline.

Measured the production way: each chain is ONE `lax.scan`-compiled
program (exactly how the samplers run), so per-step Python dispatch —
which dominates on this host — is excluded, as it is in real sampling.
Timing is synced by fetching a scalar reduction (on this box
`block_until_ready` alone does not await the tunneled device, and the
first device->host fetch pays a one-time relay setup which is excluded by
a warmup fetch).

The reference publishes no numbers (BASELINE.md) so vs_baseline is null;
the north-star target (<60 s full volume on v5e-8) is tracked by the
final e2e line.  Set BENCH_METRICS=primary to emit only the first metric.
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

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _remaining():
    return _BUDGET_S - (time.monotonic() - _T0)


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(value, 4), "unit": unit,
                      "vs_baseline": None}), flush=True)


_ONLY = set(filter(None, os.environ.get("BENCH_ONLY", "").split(",")))


def leg(name, est_cold_s, fn):
    """Run one bench leg if the remaining wall-clock budget can plausibly
    absorb a cold-cache compile (est_cold_s); otherwise say so and move on.
    Failures never kill the process — later legs still run.  BENCH_ONLY
    (comma-separated leg names) restricts to a subset, e.g. to re-run legs
    a mid-process TPU-worker crash took out without repeating the rest."""
    if _ONLY and name not in _ONLY:
        return None
    if _remaining() < est_cold_s:
        print(json.dumps({"metric": name, "skipped": "budget",
                          "est_cold_s": est_cold_s,
                          "remaining_s": round(_remaining(), 1)}), flush=True)
        return None
    try:
        return fn()
    except Exception as e:
        print(json.dumps({"metric": name, "error": str(e)[:200]}), flush=True)
        return None


def time_chain(fn, *args, iters=3):
    """fn is a jax.jit'd callable returning a scalar.  Compiles ONCE via
    AOT and reuses the executable for warm + timed runs AND (via the
    returned compiled object) for cost analysis — the old pattern of a
    second `lower().compile()` inside emit_mfu paid a full relay
    roundtrip (~30-90 s) per leg, which is what blew the round-4 warm
    budget.  First call still warms the d2h relay."""
    a = args[0] if isinstance(args[0], tuple) else args
    compiled = fn.lower(*a).compile()
    _ = float(compiled(*a))
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(compiled(*a))
    return (time.perf_counter() - t0) / iters, compiled


_V5E_PEAK_TFLOPS = 197.0  # bf16


def emit_mfu(name, compiled, dt_per_step):
    """Achieved TF/s + model FLOPs utilisation from XLA's own cost analysis
    of the ALREADY-compiled program (SURVEY §5 tracing/profiling surface).
    XLA counts a lax.scan/while body ONCE, so for the scan-chain programs
    here `flops` is already per-step (verified on-chip: 2.31 TF reported
    for the 6.15-TFLOP denoise body x 8.7 steps/s ~= the measured 53 TF/s
    whole-model rate only when NOT dividing by chain length)."""
    try:
        ca = compiled.cost_analysis()
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


_PRIMARY = {}  # final-line fallback when every e2e leg was skipped/failed


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
    compiled = run_chain.lower(params, jax.random.key(1)).compile()
    _ = float(compiled(params, jax.random.key(1)))
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = float(compiled(params, jax.random.key(2 + i)))
    dt = time.perf_counter() - t0
    _PRIMARY["stage1_denoise_steps_per_sec_per_chip_64x128x128"] = chain_steps * n_iters / dt
    emit("stage1_denoise_steps_per_sec_per_chip_64x128x128",
         chain_steps * n_iters / dt, "steps/s")
    emit_mfu("stage1_denoise", compiled, dt / (chain_steps * n_iters))


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
    jstep = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(1)).compile()
    state, m = jstep(state, batch, jax.random.key(1))
    _ = float(m["loss"])  # warm: compile + relay
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, batch, jax.random.key(2 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    emit("stage1_train_steps_per_sec_64x128x128", 1.0 / dt, "steps/s")
    emit_mfu("stage1_train", jstep, dt)


def _stage2_train_leg(size, batch, name, rate_metric, rate_unit, rate_fn):
    """Stage-2 train step legs (reference train size 512² b=1 —
    ruijin-ldm_from_controlnet.yaml:12,73 — plus the batched-256² leg:
    the round-3 ladder found b=8 WINS 2.35x per sample at 256²)."""
    from jointimagegeneration_tpu.models import SliceLDM
    from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_ldm_train_step

    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), size)
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
    batch_d = {
        "image": jnp.zeros((batch, size, size, 1)),
        "cond": jnp.zeros((batch, size, size, 2)),
    }
    jstep = jax.jit(make_ldm_train_step(model), donate_argnums=(0,)).lower(
        state, batch_d, jax.random.key(1)).compile()
    state, m = jstep(state, batch_d, jax.random.key(1))
    _ = float(m["loss"])
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, batch_d, jax.random.key(2 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    emit(rate_metric, rate_fn(dt), rate_unit)
    # MFU from cost analysis of the exact compiled step.  The big train
    # state stays local to this function and is freed before the next leg
    # allocates its own (keeping both resident can OOM the b=8 leg).
    emit_mfu(name, jstep, dt)


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

    dt, compiled = time_chain(run, params, jax.random.key(2))
    emit("stage2_ddim_steps_per_sec_512x512", chain / dt, "steps/s")
    emit_mfu("stage2_ddim", compiled, dt / chain)


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

    dt, compiled = time_chain(run, params, jax.random.key(2))
    agg = b * steps / dt  # sample-steps/s
    emit("serving_sample_steps_per_sec_256x256_batch8", agg, "sample-steps/s")
    emit_mfu("serving_batch8", compiled, dt / steps)
    # amortized per-volume latency for the 128-slice ddim-50 volume when
    # serving 8 concurrently (stage-2 share only; mask stage adds ~3 s)
    emit("serving_amortized_seconds_per_128slice_volume_batch8",
         128 * steps / agg, "s/volume")


class _E2E:
    """Shared state for the end-to-end two-stage legs: 25-step mask at
    64x128x128 -> nearest-upsample -> z-slice autoregressive 256^2 CT at
    50 DDIM steps, one scan program per z-count (SURVEY §3.4 loop;
    BASELINE.md north star <60 s for the 128-slice volume on v5e-8)."""

    def __init__(self):
        from jointimagegeneration_tpu.models import MaskSampler
        from jointimagegeneration_tpu.pipeline import TwoStagePipeline

        self.spatial = (64, 128, 128)
        self.size, self.ddim_steps = 256, 50
        ms = MaskSampler.create(
            num_classes=12, time_steps=1000, model_channels=64,
            channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
            num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
        )
        self.ms = ms
        self.ms_params = ms.init_params(jax.random.key(0), self.spatial, cond_channels=1)
        self.ldm, self.ldm_params, self.ddim = _stage2(self.size, self.ddim_steps)
        self.pipe = TwoStagePipeline(ms, self.ldm)
        self.extrapolated_128 = None
        self.direct_128 = None

    def make_run(self, nz, ddim=None, **kw):
        ddim = self.ddim if ddim is None else ddim
        cond = jnp.zeros((1, *self.spatial, 1), jnp.bfloat16)

        @jax.jit
        def run(ms_params, ldm_params, key):
            ct, labels = self.pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *self.spatial), volume_shape=(nz, self.size, self.size),
                ddim=ddim, mask_steps=25, cond=cond, **kw,
            )
            return jnp.sum(ct) + jnp.sum(labels)

        return run

    def args(self, seed):
        return (self.ms_params, self.ldm_params, jax.random.key(seed))

    def leg_fit(self):
        """16- and 32-slice measured points -> affine fit of the 128-slice
        figure (mask time is shared; only the per-slice DDIM chain scales
        in z — naive x8 scaling would wrongly multiply the mask time)."""
        n = 16
        dt, _ = time_chain(self.make_run(n), self.args(3), iters=1)
        emit(f"e2e_two_stage_{n}x{self.size}x{self.size}_seconds", dt, "s")
        dt32, _ = time_chain(self.make_run(2 * n), self.args(4), iters=1)
        emit(f"e2e_two_stage_{2 * n}x{self.size}x{self.size}_seconds", dt32, "s")
        if dt32 > dt:
            rate = (dt32 - dt) / n
            base = dt - n * rate
            self.extrapolated_128 = base + 128 * rate
        else:  # timing noise collapsed the two points — fall back to linear
            self.extrapolated_128 = dt * (128 / n)

    def _dpm(self):
        from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
        return DDIMParams.create(self.ldm.diffusion, 20, method="uniform_lambda")

    def leg_dpm(self):
        """DPM-Solver++(2M) on uniform-log-SNR nodes at 20 steps —
        reference per-slice semantics kept (pure noise per slice), ~2.4x
        fewer UNet calls per slice, LOWER integration error than
        ddim-50/uniform (BENCH_NOTES round 3)."""
        n = 16
        dt, _ = time_chain(self.make_run(n, ddim=self._dpm(), sampler="dpm"),
                           self.args(5), iters=1)
        emit(f"e2e_two_stage_dpm20_{n}x{self.size}x{self.size}_seconds", dt, "s")

    def leg_dpm_warm(self):
        """Composed fast route: dpm-20 + warm_start 0.4 (solver runs only
        its last nodes per slice, seeded from the q-noised previous
        slice) — measured zero composition overhead; 128-slice fit 14.8 s
        single chip (scripts/probe_dpm_warm.py)."""
        n = 16
        dt, _ = time_chain(self.make_run(n, ddim=self._dpm(), sampler="dpm", warm_start=0.4),
                           self.args(6), iters=1)
        emit(f"e2e_two_stage_dpm20_warm04_{n}x{self.size}x{self.size}_seconds", dt, "s")

    def _direct_chunked(self, ddim, **kw):
        """The north star measured DIRECTLY (VERDICT r3 #2), in FIVE
        dispatches — one mask program + four 32-slice sample_volume
        chunks seeded with the previous chunk's last slice — because the
        single-scan 128-slice program (~77 s device time) crashes the
        tunneled TPU worker (BENCH_NOTES round 4).  Semantics identical
        to the fused pipeline (sample_diffusion.py:208-223 autoregression);
        the ~ms per-dispatch overhead is real serving overhead, included.
        Program construction is shared with scripts/probe_direct_128.py."""
        from jointimagegeneration_tpu.pipeline.two_stage import make_chunked_two_stage_programs

        D, CHUNK = 128, 32
        cond = jnp.zeros((1, *self.spatial, 1), jnp.bfloat16)
        mask_program, chunk = make_chunked_two_stage_programs(
            self.ms, self.ldm, mask_shape=(1, *self.spatial),
            volume_shape=(D, self.size, self.size), ddim=ddim, chunk=CHUNK,
            mask_steps=25, cond=cond, **kw)

        # compile + relay warm, untimed
        mv = mask_program(self.ms_params, jax.random.key(2))
        _ = float(jnp.sum(mv))
        _v, last = chunk(self.ldm_params, jax.random.key(3), mv[:, :CHUNK],
                         jnp.zeros((1, self.size, self.size, 1)))
        _ = float(jnp.sum(last))

        t0 = time.perf_counter()
        mv = mask_program(self.ms_params, jax.random.key(10))
        total = jnp.zeros((), jnp.float32)
        init = jnp.zeros((1, self.size, self.size, 1))
        for k in range(D // CHUNK):
            v, last = chunk(self.ldm_params, jax.random.key(20 + k),
                            mv[:, k * CHUNK : (k + 1) * CHUNK], init)
            init = last
            total = total + jnp.sum(v)
        _ = float(total)
        return time.perf_counter() - t0

    def leg_direct_128(self):
        dt = self._direct_chunked(self.ddim)
        self.direct_128 = dt
        emit("e2e_direct_128slice_256x256_seconds", dt, "s")

    def leg_direct_128_dpm(self):
        dt = self._direct_chunked(self._dpm(), sampler="dpm")
        emit("e2e_direct_128slice_dpm20_256x256_seconds", dt, "s")


def main():
    which = os.environ.get("BENCH_METRICS", "all")
    leg("stage1_denoise", 0, bench_stage1_denoise)  # primary: always run
    if which == "primary":
        return

    # --- e2e group (the BASELINE north star) ---
    e2e = None
    e2e_names = {"e2e_fit_legs", "e2e_dpm20", "e2e_dpm20_warm04",
                 "e2e_direct_128slice", "e2e_direct_128slice_dpm20"}
    if not _ONLY or (_ONLY & e2e_names):
        try:
            e2e = _E2E()
        except Exception as e:
            print(json.dumps({"metric": "e2e_setup", "error": str(e)[:200]}), flush=True)
    warm = False
    if e2e is not None:
        t_fit = time.monotonic()
        leg("e2e_fit_legs", 240, e2e.leg_fit)
        # warm-cache detection: the fit legs' compute is ~66 s; a wall
        # clock much beyond that means the big pipeline programs are
        # COMPILING (~5-10 min each) — keep the conservative cold
        # estimates.  Warm (persistent-cache loads only) lets the
        # direct-128 headline leg fit inside the default budget.
        warm = (time.monotonic() - t_fit) < 200
        leg("e2e_dpm20", 180 if not warm else 60, e2e.leg_dpm)
        leg("e2e_dpm20_warm04", 180 if not warm else 60, e2e.leg_dpm_warm)

    def est(cold, warm_s):
        return warm_s if warm else cold

    # --- serving, then the direct 128-slice north-star measurement (the
    # headline: measured beats extrapolated, so it outranks stage2_ddim;
    # runtime ~77 s ddim / ~35 s dpm + ~2 min program loads warm) ---
    leg("serving_batch8", est(200, 80), bench_serving_batch8)
    if e2e is not None:
        leg("e2e_direct_128slice", est(400, 300), e2e.leg_direct_128)
        leg("e2e_direct_128slice_dpm20", est(250, 150), e2e.leg_direct_128_dpm)
    leg("stage2_ddim", est(180, 100), bench_stage2_ddim)

    # --- train legs last: slowest compiles, least headline-critical ---
    leg("stage1_train", est(300, 120), bench_stage1_train)
    leg("stage2_train", est(300, 120), lambda: _stage2_train_leg(
        512, 1, "stage2_train", "stage2_train_steps_per_sec_512x512",
        "steps/s", lambda dt: 1.0 / dt))
    leg("stage2_train_batch8", est(300, 120), lambda: _stage2_train_leg(
        256, 8, "stage2_train_batch8", "stage2_train_samples_per_sec_256x256_batch8",
        "samples/s", lambda dt: 8.0 / dt))

    # the north-star tracker goes LAST: the driver records the final JSON
    # line as the round's parsed headline, and the reference-semantics
    # 128-slice figure is the comparable one (measured beats extrapolated)
    if e2e is not None and e2e.direct_128 is not None:
        emit("e2e_128slice_256x256_seconds", e2e.direct_128, "s")
    elif e2e is not None and e2e.extrapolated_128 is not None:
        emit("e2e_extrapolated_128slice_256x256_seconds", e2e.extrapolated_128, "s")
    elif _PRIMARY:
        # every e2e leg was skipped or failed: the final (headline) line
        # must still be a real metric with a value, not a skip record —
        # fall back to re-emitting the primary
        for k, v in _PRIMARY.items():
            emit(k, v, "steps/s")


if __name__ == "__main__":
    main()
