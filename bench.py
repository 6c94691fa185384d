"""Benchmarks over the whole BASELINE surface — one JSON line per metric.

Primary metric (emitted FIRST): stage-1 categorical UNet denoise
steps/sec/chip at the reference workload — 12-class one-hot 64x128x128
volume, UNet base 64, mult [1,2,2,4,5], attn at ds {32,16,8}
(ccdm/params.yml:69-76).  One denoise step = UNet forward + closed-form
categorical posterior + categorical draw.  The FINAL line is always the
128-slice two-stage north star (BASELINE.md: full text->mask->CT volume;
reference loop sample_diffusion.py:208-223) — measured directly when the
direct leg ran, else the two-point affine fit, else the primary again.

Round-5 architecture — two processes:

  parent (no jax): spawns the child, relays its stdout, tracks leg
    completion, enforces the wall-clock budget (env BENCH_BUDGET_S,
    default 1500 s), restarts the child on an abnormal exit (the
    tunneled TPU worker can crash mid-run and poison its process —
    BENCH_NOTES round 4) with BENCH_SKIP set to the already-completed
    legs, re-emits a key-metric recap (the record keeps only the TAIL
    of stdout and the most important legs print earliest), and ALWAYS
    emits the final headline line before exiting 0.
  child (jax): runs the legs most-important-first, skip-and-say-so when
    a leg's estimated cost exceeds the remaining budget.

Why the child does NO eager device work at setup (round-5 post-mortem):
flax `Module.init` executes the forward eagerly — hundreds of one-op
programs, each paying the axon relay round-trip.  A fresh-process
primary leg measured 12m55s wall / 19s CPU with a WARM persistent cache:
~12 minutes of relay latency before any benchmark work (this is what ate
the driver's round-4 budget: BENCH_r04.json captured leg 1 + skips).
Every leg therefore materialises params host-side via
`utils.fast_init.shape_init` (eval_shape + numpy fill + ONE device_put,
~20 s), builds schedules/models under the CPU backend, ships conds/keys
with explicit device_put, and syncs through checksum outputs baked into
the compiled programs (pipeline.two_stage make_chunked_two_stage_programs
with_checksum/full_mask) instead of eager reductions.

Measured the production way: each chain is `lax.scan`-compiled exactly
as the samplers run it, so per-step Python dispatch is excluded; chunked
dispatch overhead in the direct-128 legs is real serving overhead and is
included.  Timing is synced by fetching a scalar program output (on this
box `block_until_ready` alone does not await the tunneled device).

The reference publishes no numbers (BASELINE.md) so vs_baseline is null;
the north-star target (<60 s full volume on v5e-8) is tracked by the
final e2e line.  BENCH_METRICS=primary emits only the first metric;
BENCH_ONLY=leg1,leg2 restricts to a subset.
"""

import json
import os
import signal
import sys
import time

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

# ---------------------------------------------------------------------------
# parent: budget watchdog + relay + restart-on-crash + guaranteed headline
# ---------------------------------------------------------------------------

# final-line candidates, in priority order: (child metric, final name)
_FINAL_CANDIDATES = (
    ("e2e_direct_128slice_256x256_seconds", "e2e_128slice_256x256_seconds", "s"),
    ("e2e_extrapolated_128slice_256x256_seconds",
     "e2e_extrapolated_128slice_256x256_seconds", "s"),
    ("e2e_direct_128slice_dpm20_256x256_seconds",
     "e2e_direct_128slice_dpm20_256x256_seconds", "s"),
    ("stage1_denoise_steps_per_sec_per_chip_64x128x128",
     "stage1_denoise_steps_per_sec_per_chip_64x128x128", "steps/s"),
)

_ALL_LEGS = [
    "stage1_denoise", "e2e_direct_128slice", "e2e_direct_128slice_dpm20",
    "serving_batch8", "stage2_ddim", "e2e_dpm20", "e2e_dpm20_warm04",
    "e2e_fit_legs", "stage1_train", "stage2_train", "stage2_train_batch8",
]


def _emit_line(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(value, 4), "unit": unit,
                      "vs_baseline": None}), flush=True)


def parent_main():
    import selectors
    import subprocess

    kill_at = _BUDGET_S - 30.0  # leave margin under the driver's own timeout
    metrics = {}
    done = []
    stop = {"sig": False}
    signal.signal(signal.SIGTERM, lambda *a: stop.update(sig=True))
    signal.signal(signal.SIGINT, lambda *a: stop.update(sig=True))

    attempts = 0
    while attempts < 3 and not stop["sig"]:
        attempts += 1
        env = dict(os.environ, BENCH_CHILD="1", PYTHONUNBUFFERED="1")
        if done:
            env["BENCH_SKIP"] = ",".join(done)
        child = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                 stdout=subprocess.PIPE, text=True, env=env)
        sel = selectors.DefaultSelector()
        sel.register(child.stdout, selectors.EVENT_READ)
        timed_out = False
        while True:
            left = kill_at - (time.monotonic() - _T0)
            if left <= 0:
                timed_out = True
                break
            if stop["sig"]:
                break
            try:
                events = sel.select(timeout=min(left, 5.0))
            except InterruptedError:
                continue
            if not events:
                if child.poll() is not None:
                    break
                continue
            line = child.stdout.readline()
            if not line:
                break
            sys.stdout.write(line)
            sys.stdout.flush()
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict):
                if "metric" in obj and "value" in obj:
                    metrics[obj["metric"]] = obj
                if "leg_done" in obj and obj["leg_done"] not in done:
                    done.append(obj["leg_done"])
        sel.close()
        if child.poll() is None:
            child.terminate()
            try:
                child.wait(timeout=10)
            except subprocess.TimeoutExpired:
                child.kill()
                child.wait()
        rc = child.returncode
        # drain anything the child flushed between last select and exit
        for line in child.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            try:
                obj = json.loads(line)
                if isinstance(obj, dict) and "metric" in obj and "value" in obj:
                    metrics[obj["metric"]] = obj
                if isinstance(obj, dict) and "leg_done" in obj and obj["leg_done"] not in done:
                    done.append(obj["leg_done"])
            except ValueError:
                pass
        if timed_out or stop["sig"] or rc == 0:
            break
        if kill_at - (time.monotonic() - _T0) < 240 or len(done) >= len(_ALL_LEGS):
            break
        print(json.dumps({"metric": "bench_child_restart", "child_rc": rc,
                          "completed_legs": len(done)}), flush=True)

    # Key-metric recap: the driver records only the TAIL of stdout, and
    # the most important legs print EARLIEST — re-emit them here so a
    # truncated tail still carries the headline numbers.  The north-star
    # final line stays last (the driver parses the last JSON line).
    recap = [
        ("stage1_denoise_steps_per_sec_per_chip_64x128x128", "steps/s"),
        ("stage1_denoise_mfu", "%"),
        ("e2e_direct_128slice_256x256_seconds", "s"),
        ("e2e_direct_128slice_dpm20_256x256_seconds", "s"),
        ("serving_sample_steps_per_sec_256x256_batch8", "sample-steps/s"),
        ("serving_batch8_mfu", "%"),
        ("serving_amortized_seconds_per_128slice_volume_batch8", "s/volume"),
        ("stage2_ddim_steps_per_sec_512x512", "steps/s"),
        ("stage2_train_samples_per_sec_256x256_batch8", "samples/s"),
        ("stage2_train_batch8_mfu", "%"),
    ]
    for name, unit in recap:
        m = metrics.get(name)
        if m is not None:
            _emit_line(name, float(m["value"]), unit)

    for child_name, final_name, unit in _FINAL_CANDIDATES:
        m = metrics.get(child_name)
        if m is not None:
            _emit_line(final_name, float(m["value"]), unit)
            return 0
    _emit_line("bench_no_metrics", 0.0, "")
    return 0


# ---------------------------------------------------------------------------
# child: the actual benchmark legs (jax imported only here)
# ---------------------------------------------------------------------------


def child_main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compiled-executable cache (TPU only: CPU executables compiled
    # by the remote-compile relay carry its machine features and can SIGILL
    # here): remote compilation of the big scan programs is the dominant cold
    # cost on this box; the cache makes reruns start in program-load time.
    if jax.default_backend() != "cpu":
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.expanduser("~/.jax_cache"))
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jointimagegeneration_tpu.utils.fast_init import shape_init

    _CPU = jax.devices("cpu")[0]
    _DEV = jax.devices()[0]
    # margin so the child normally finishes before the parent's kill point
    budget = _BUDGET_S - 90.0

    def remaining():
        return budget - (time.monotonic() - _T0)

    def emit(metric, value, unit):
        _emit_line(metric, value, unit)

    _ONLY = set(filter(None, os.environ.get("BENCH_ONLY", "").split(",")))
    _SKIP = set(filter(None, os.environ.get("BENCH_SKIP", "").split(",")))

    timings = {}

    def leg(name, est_s, fn):
        """Run one leg if the remaining budget plausibly absorbs it.

        Estimates are single-tier AFTER-FIRST-LEG costs (round-5 measured
        walls + margin): the expensive part of a run is once-per-process
        (grant wait + tunnel setup + first d2h fetch — 83-700 s observed
        for the SAME cache-hit primary leg across one morning) and lands
        on leg 1; subsequent cache-hit legs ran 10-263 s.  A genuinely
        cold cache makes a leg overrun its estimate mid-flight — then the
        jax-free parent ends the run at the budget with the best headline
        captured so far, which is the correct priority order by
        construction.  Failures never kill the process — later legs
        still run."""
        if name in _SKIP or (_ONLY and name not in _ONLY):
            return
        est = est_s
        if remaining() < est:
            print(json.dumps({"metric": name, "skipped": "budget",
                              "est_s": est, "remaining_s": round(remaining(), 1)}),
                  flush=True)
            return
        t0 = time.monotonic()
        try:
            fn()
            timings[name] = time.monotonic() - t0
            print(json.dumps({"leg_done": name,
                              "s": round(timings[name], 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:200]}), flush=True)
        if os.environ.get("BENCH_CRASH_AFTER") == name:
            # test hook: simulate the mid-run TPU-worker crash that kills
            # the child process, to exercise the parent's restart path
            os._exit(17)

    # ---- host-side builders (no eager device dispatch) ----

    def dput(arr):
        return jax.device_put(arr, _DEV)

    def dzeros(shape, dtype=np.float32):
        return dput(np.zeros(shape, dtype))

    def dkey(seed):
        with jax.default_device(_CPU):
            k = jax.random.key(seed)
        return dput(k)

    _V5E_PEAK_TFLOPS = 197.0  # bf16

    def emit_mfu(name, compiled, dt_per_step):
        """Achieved TF/s + model FLOPs utilisation from XLA's own cost
        analysis of the ALREADY-compiled program (SURVEY §5 tracing
        surface).  XLA counts a lax.scan body ONCE, so for the scan-chain
        programs `flops` is already per-step (verified on-chip, round 2)."""
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

    SPATIAL = (64, 128, 128)  # reference stage-1 volume (ruijin.py:176-178)

    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import MaskSampler, SliceLDM

    class Models:
        """Shared model defs + device param trees.  The LDM param tree is
        input-size independent (conv/attn weights only — tested in
        tests/test_fast_init.py), so ONE tree serves every 256²/512²
        sampling AND train leg — train states are jit-created copies, so
        donating them never invalidates the shared tree."""

        def __init__(self):
            with jax.default_device(_CPU):
                self.ms = MaskSampler.create(
                    num_classes=12, time_steps=1000, model_channels=64,
                    channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
                    num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16)
            self.ms_params = shape_init(
                lambda k: self.ms.init_params(k, SPATIAL, cond_channels=1),
                seed=0, device=_DEV)
            self.mask_cond = dzeros((1, *SPATIAL, 1), jnp.bfloat16)
            self._ldm = None

        def _build_ldm(self):
            with jax.default_device(_CPU):
                self._ldm = SliceLDM.create(
                    image_channels=1, cond_channels=2, timesteps=1000,
                    model_channels=128, channel_mult=(1, 2, 4, 4, 5),
                    attention_resolutions=(32, 16, 8), num_res_blocks=2,
                    num_head_channels=32, dtype=jnp.bfloat16)
                self._ddim50 = DDIMParams.create(self._ldm.diffusion, 50)
                self._dpm20 = DDIMParams.create(self._ldm.diffusion, 20,
                                                method="uniform_lambda")
            self._ldm_params = shape_init(
                lambda k: self._ldm.init_params(k, 256), seed=1, device=_DEV)

        def release_ldm(self):
            """Free the LDM tree's HBM (it rebuilds lazily on next use).
            stage1_train peaks at 14.5 of 16 GiB — the ~1 GB LDM tree
            must not be resident during it."""
            self._ldm = None
            self._ldm_params = None

        # lazy: a BENCH_METRICS=primary run never pays the LDM build
        @property
        def ldm(self):
            if self._ldm is None:
                self._build_ldm()
            return self._ldm

        @property
        def ldm_params(self):
            if self._ldm is None:
                self._build_ldm()
            return self._ldm_params

        @property
        def ddim50(self):
            if self._ldm is None:
                self._build_ldm()
            return self._ddim50

        @property
        def dpm20(self):
            if self._ldm is None:
                self._build_ldm()
            return self._dpm20

    M = Models()

    # ---- leg 1: primary ----

    def bench_stage1_denoise():
        chain_steps, n_iters = 25, 3

        @jax.jit
        def run_chain(params, key):
            x = M.ms.sample(params, key, (1, *SPATIAL), cond=M.mask_cond,
                            num_steps=chain_steps)
            return jnp.sum(x[..., 0])

        keys = [dkey(i) for i in range(1, 2 + n_iters)]
        compiled = run_chain.lower(M.ms_params, keys[0]).compile()
        _ = float(compiled(M.ms_params, keys[0]))  # warm: load + d2h relay
        t0 = time.perf_counter()
        for i in range(n_iters):
            _ = float(compiled(M.ms_params, keys[1 + i]))
        dt = time.perf_counter() - t0
        emit("stage1_denoise_steps_per_sec_per_chip_64x128x128",
             chain_steps * n_iters / dt, "steps/s")
        emit_mfu("stage1_denoise", compiled, dt / (chain_steps * n_iters))

    # ---- direct 128-slice north star (chunked; VERDICT r3 #2) ----

    class Direct:
        """Mask program shared between the ddim-50 and dpm-20 routes;
        chunk slicing + checksums live inside the compiled programs
        (full_mask/with_checksum) so inter-dispatch host work is zero."""

        D, CHUNK, SIZE = 128, 32, 256

        def __init__(self):
            self.mask_prog = None

        def _programs(self, ddim, **kw):
            from jointimagegeneration_tpu.pipeline.two_stage import (
                make_chunked_two_stage_programs)
            mask_prog, chunk = make_chunked_two_stage_programs(
                M.ms, M.ldm, mask_shape=(1, *SPATIAL),
                volume_shape=(self.D, self.SIZE, self.SIZE), ddim=ddim,
                chunk=self.CHUNK, mask_steps=25, cond=M.mask_cond,
                with_checksum=True, full_mask=True, **kw)
            if self.mask_prog is None:
                self.mask_prog = mask_prog  # identical for every route
            return self.mask_prog, chunk

        def run(self, ddim, **kw):
            mask_prog, chunk = self._programs(ddim, **kw)
            starts = [dput(np.int32(k * self.CHUNK)) for k in range(self.D // self.CHUNK)]
            init0 = dzeros((1, self.SIZE, self.SIZE, 1))
            kw_warm, kw_run = dkey(100), [dkey(200 + k) for k in range(self.D // self.CHUNK)]
            km_warm, km_run = dkey(101), dkey(102)

            # warm: compile-or-load + d2h relay, untimed
            mv, msum = mask_prog(M.ms_params, km_warm)
            _ = float(msum)
            _v, last, csum = chunk(M.ldm_params, kw_warm, mv, starts[0], init0)
            _ = float(csum)

            t0 = time.perf_counter()
            mv, _msum = mask_prog(M.ms_params, km_run)
            init = init0
            for k, st in enumerate(starts):
                _v, init, csum = chunk(M.ldm_params, kw_run[k], mv, st, init)
            _ = float(csum)  # chunk k+1 depends on chunk k's last slice
            return time.perf_counter() - t0

    direct = Direct()
    direct_ddim_ok = []

    def leg_direct_128():
        dt = direct.run(M.ddim50)
        emit("e2e_direct_128slice_256x256_seconds", dt, "s")
        direct_ddim_ok.append(dt)

    def leg_direct_128_dpm():
        dt = direct.run(M.dpm20, sampler="dpm")
        emit("e2e_direct_128slice_dpm20_256x256_seconds", dt, "s")

    # ---- serving + stage-2 chain legs ----

    def time_chain(fn, args, iters=3):
        """fn is jittable returning a scalar; compiles ONCE via AOT and
        reuses the executable for warm + timed runs and cost analysis."""
        compiled = fn.lower(*args).compile()
        _ = float(compiled(*args))
        t0 = time.perf_counter()
        for _i in range(iters):
            _ = float(compiled(*args))
        return (time.perf_counter() - t0) / iters, compiled

    def bench_serving_batch8():
        """Aggregate multi-volume serving throughput: the 50-step DDIM
        slice chain at 256² with 8 volumes resident on ONE chip — the
        measured batching sweet spot (BENCH_NOTES inference ladder: b=8
        is 1.55x/sample vs one-at-a-time; b=2/4 lose)."""
        size, steps, b = 256, 50, 8
        cond = dzeros((b, size, size, 2), jnp.bfloat16)

        @jax.jit
        def run(params, key):
            s = M.ldm.sample_slice(params, key, cond, M.ddim50)
            return jnp.sum(s)

        dt, compiled = time_chain(run, (M.ldm_params, dkey(2)))
        agg = b * steps / dt
        emit("serving_sample_steps_per_sec_256x256_batch8", agg, "sample-steps/s")
        emit_mfu("serving_batch8", compiled, dt / steps)
        # amortized per-volume latency for the 128-slice ddim-50 volume
        # when serving 8 concurrently (stage-2 share; mask adds ~3 s)
        emit("serving_amortized_seconds_per_128slice_volume_batch8",
             128 * steps / agg, "s/volume")

    def bench_stage2_ddim():
        size, chain = 512, 10
        with jax.default_device(_CPU):
            ddim = DDIMParams.create(M.ldm.diffusion, chain)
        cond = dzeros((1, size, size, 2), jnp.bfloat16)

        @jax.jit
        def run(params, key):
            s = M.ldm.sample_slice(params, key, cond, ddim)
            return jnp.sum(s)

        dt, compiled = time_chain(run, (M.ldm_params, dkey(2)))
        emit("stage2_ddim_steps_per_sec_512x512", chain / dt, "steps/s")
        emit_mfu("stage2_ddim", compiled, dt / chain)

    # ---- fused 16/32-slice e2e legs (fit cross-check + fast routes) ----

    class Fused:
        def __init__(self):
            from jointimagegeneration_tpu.pipeline import TwoStagePipeline
            self.pipe = TwoStagePipeline(M.ms, M.ldm)
            self.size = 256
            self.extrapolated = None

        def make_run(self, nz, ddim, **kw):
            @jax.jit
            def run(ms_params, ldm_params, key):
                ct, labels = self.pipe(
                    ms_params, ldm_params, key, mask_shape=(1, *SPATIAL),
                    volume_shape=(nz, self.size, self.size), ddim=ddim,
                    mask_steps=25, cond=M.mask_cond, **kw)
                return jnp.sum(ct) + jnp.sum(labels)

            return run

        def leg_fit(self):
            """16- and 32-slice measured points -> affine fit of the
            128-slice figure (mask time is shared; only the per-slice
            DDIM chain scales in z)."""
            n = 16
            dt, _ = time_chain(self.make_run(n, M.ddim50),
                               (M.ms_params, M.ldm_params, dkey(3)), iters=1)
            emit(f"e2e_two_stage_{n}x{self.size}x{self.size}_seconds", dt, "s")
            dt32, _ = time_chain(self.make_run(2 * n, M.ddim50),
                                 (M.ms_params, M.ldm_params, dkey(4)), iters=1)
            emit(f"e2e_two_stage_{2 * n}x{self.size}x{self.size}_seconds", dt32, "s")
            if dt32 > dt:
                rate = (dt32 - dt) / n
                fit = (dt - n * rate) + 128 * rate
            else:  # timing noise collapsed the two points
                fit = dt * (128 / n)
            self.extrapolated = fit
            emit("e2e_extrapolated_128slice_256x256_seconds", fit, "s")

        def leg_dpm(self):
            """DPM-Solver++(2M) on uniform-log-SNR nodes at 20 steps —
            reference per-slice semantics kept, ~2.4x fewer UNet calls,
            LOWER integration error than ddim-50 (BENCH_NOTES round 3)."""
            dt, _ = time_chain(self.make_run(16, M.dpm20, sampler="dpm"),
                               (M.ms_params, M.ldm_params, dkey(5)), iters=1)
            emit("e2e_two_stage_dpm20_16x256x256_seconds", dt, "s")

        def leg_dpm_warm(self):
            """Composed fast route: dpm-20 + warm_start 0.4 (solver runs
            only its last nodes per slice, seeded from the q-noised
            previous slice) — measured zero composition overhead."""
            dt, _ = time_chain(
                self.make_run(16, M.dpm20, sampler="dpm", warm_start=0.4),
                (M.ms_params, M.ldm_params, dkey(6)), iters=1)
            emit("e2e_two_stage_dpm20_warm04_16x256x256_seconds", dt, "s")

    # ---- train legs (donating: each builds its own param tree) ----

    def bench_stage1_train():
        from jointimagegeneration_tpu.train import (
            EMATrainState, build_optimizer, make_mask_train_step)

        # remat=False: full fwd+bwd fits since the round-3 data-formatting
        # fixes (XLA memory_analysis: peak 14.54 GiB of 16) and is the
        # measured 1.09x winner over per-ResBlock remat (BENCH_NOTES).
        M.release_ldm()
        with jax.default_device(_CPU):
            model = MaskSampler.create(
                num_classes=12, time_steps=1000, model_channels=64,
                channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
                num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
                remat=False)
        tx = build_optimizer("AdamW", 1e-4)
        # donate the shared mask tree into state creation: this leg peaks at
        # 14.5 of 16 GiB (BENCH_NOTES round 3) and keeping a second params
        # copy alive OOMs it.  stage1_train is the tree's last consumer —
        # every sampling leg is ordered before the train legs.
        state = jax.jit(lambda p: EMATrainState.create(p, tx),
                        donate_argnums=(0,))(M.ms_params)
        # class_weights must be a jax array: the step fancy-indexes it with a
        # traced label volume (numpy would call __array__ on the tracer).
        # CPU-backed so its creation never dispatches through the relay.
        with jax.default_device(_CPU):
            cw = jnp.ones((12,))
        step = make_mask_train_step(model, class_weights=cw)
        mask = np.zeros((1, *SPATIAL, 12), np.float32)
        mask[..., 0] = 1.0  # one-hot background
        batch = {"mask": dput(mask), "image": dzeros((1, *SPATIAL, 1))}
        # single-step program (not a scan chain): the full-shape fwd+bwd
        # graph is near the remote compile helper's ceiling — a 4-step
        # scan of it gets the helper SIGKILLed.  Per-step dispatch is
        # ~1 ms against a ~570 ms step, so sequential timing is faithful.
        jstep = jax.jit(step, donate_argnums=(0,)).lower(
            state, batch, dkey(1)).compile()
        state, m = jstep(state, batch, dkey(1))
        _ = float(m["loss"])
        n = 3
        keys = [dkey(2 + i) for i in range(n)]
        t0 = time.perf_counter()
        for i in range(n):
            state, m = jstep(state, batch, keys[i])
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        emit("stage1_train_steps_per_sec_64x128x128", 1.0 / dt, "steps/s")
        emit_mfu("stage1_train", jstep, dt)

    def _stage2_train_leg(size, batch_n, name, rate_metric, rate_unit, rate_fn):
        """Stage-2 train step legs (reference train size 512² b=1 —
        ruijin-ldm_from_controlnet.yaml:12,73 — plus the batched-256²
        leg: the round-3 ladder found b=8 WINS 2.35x per sample).
        Reuses the shared LDM tree: the jit-created state holds fresh
        output buffers, so donating it never touches M.ldm_params."""
        from jointimagegeneration_tpu.train import (
            EMATrainState, build_optimizer, make_ldm_train_step)

        tx = build_optimizer("AdamW", 1e-4)
        state = jax.jit(lambda p: EMATrainState.create(p, tx))(M.ldm_params)
        batch_d = {"image": dzeros((batch_n, size, size, 1)),
                   "cond": dzeros((batch_n, size, size, 2))}
        jstep = jax.jit(make_ldm_train_step(M.ldm), donate_argnums=(0,)).lower(
            state, batch_d, dkey(1)).compile()
        state, m = jstep(state, batch_d, dkey(1))
        _ = float(m["loss"])
        n = 3
        keys = [dkey(2 + i) for i in range(n)]
        t0 = time.perf_counter()
        for i in range(n):
            state, m = jstep(state, batch_d, keys[i])
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        emit(rate_metric, rate_fn(dt), rate_unit)
        emit_mfu(name, jstep, dt)

    # ---- schedule: most-important-first under the budget (estimates =
    # round-5 measured after-first-leg walls + relay-variance margin) ----

    if os.environ.get("BENCH_TEST_LEG"):
        # test-only no-op leg: lets the orchestration tests exercise leg
        # completion + the crash-restart path without TPU-scale compute
        leg("test_noop", 1, lambda: emit("test_noop_metric", 1.0, "x"))

    leg("stage1_denoise", 0, bench_stage1_denoise)
    if os.environ.get("BENCH_METRICS") == "primary":
        return 0

    leg("e2e_direct_128slice", 300, leg_direct_128)
    leg("e2e_direct_128slice_dpm20", 150, leg_direct_128_dpm)
    leg("serving_batch8", 100, bench_serving_batch8)

    fused = Fused()
    if not direct_ddim_ok:
        # no directly-measured ddim-50 north star: the 16/32-slice affine
        # fit is the headline fallback — promote it ahead of everything
        leg("e2e_fit_legs", 250, fused.leg_fit)

    leg("stage2_ddim", 130, bench_stage2_ddim)
    leg("e2e_dpm20", 90, fused.leg_dpm)
    leg("e2e_dpm20_warm04", 100, fused.leg_dpm_warm)
    if direct_ddim_ok:
        # direct measurement exists: the fit is a cross-check, run late
        leg("e2e_fit_legs", 250, fused.leg_fit)

    leg("stage1_train", 250, bench_stage1_train)
    leg("stage2_train", 300, lambda: _stage2_train_leg(
        512, 1, "stage2_train", "stage2_train_steps_per_sec_512x512",
        "steps/s", lambda dt: 1.0 / dt))
    leg("stage2_train_batch8", 200, lambda: _stage2_train_leg(
        256, 8, "stage2_train_batch8",
        "stage2_train_samples_per_sec_256x256_batch8",
        "samples/s", lambda dt: 8.0 / dt))
    return 0


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        sys.exit(child_main())
    sys.exit(parent_main())
