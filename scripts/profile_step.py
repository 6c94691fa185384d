"""Per-op device profile of the flagship steps (ROADMAP #9).

Traces one scan-compiled chain of the stage-1 categorical denoise and the
stage-2 DDIM step under `jax.profiler` (core/logging.py:profile_trace) and
prints the device-op time breakdown (core/logging.py:summarize_trace) —
the per-op view the reference surfaces through profiler summaries
(latentdiffusion/main.py:828) and GpuInfo (ccdm/ddpm/trainer.py:476-478).

    python scripts/profile_step.py [stage1|stage2|both] [--logdir DIR]

Shapes match bench.py exactly so compiled programs come from the
persistent cache on a warm box.
"""

import argparse
import os
import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _print(title, rows):
    print(f"\n== {title} ==")
    if not rows:
        print("  (no device events captured)")
        return
    total = sum(r[1] for r in rows)
    print(f"  {'op':58s} {'ms':>9s} {'cnt':>5s} {'share':>6s} {'TF/s':>6s} {'GB/s':>7s}")
    for name, t, c, gf, gb in rows:
        tfs = gf / t if t else 0.0  # gflop/ms == tflop/s
        gbs = gb / t * 1e3 if t else 0.0  # gbyte/ms -> GB/s
        print(f"  {name[:58]:58s} {t:9.3f} {c:5d} {100 * t / total:5.1f}% {tfs:6.1f} {gbs:7.1f}")


def _report(title, logdir):
    from jointimagegeneration_tpu.core.logging import summarize_trace

    _print(f"{title}: by HLO category", summarize_trace(logdir, group="category"))
    _print(f"{title}: by model op (tf_op)", summarize_trace(logdir, top_k=25, group="tf_op"))
    _print(f"{title}: top fusions", summarize_trace(logdir, top_k=12))


def profile_stage1(logdir):
    from jointimagegeneration_tpu.core.logging import profile_trace
    from jointimagegeneration_tpu.models import MaskSampler

    spatial = (64, 128, 128)
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)

    @jax.jit
    def run(params, key):
        return jnp.sum(model.sample(params, key, (1, *spatial), cond=cond, num_steps=5)[..., 0])

    _ = float(run(params, jax.random.key(1)))  # compile + relay warm
    with profile_trace(logdir):
        _ = float(run(params, jax.random.key(2)))
    _report("stage-1 denoise (5-step chain, 64x128x128)", logdir)


def profile_stage2(logdir):
    from jointimagegeneration_tpu.core.logging import profile_trace
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import SliceLDM

    size = 512
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), size)
    ddim = DDIMParams.create(model.diffusion, 10)
    cond = jnp.zeros((1, size, size, 2), jnp.bfloat16)

    @jax.jit
    def run(params, key):
        return jnp.sum(model.sample_slice(params, key, cond, ddim))

    _ = float(run(params, jax.random.key(2)))
    with profile_trace(logdir):
        _ = float(run(params, jax.random.key(3)))
    _report("stage-2 DDIM (10-step chain, 512^2)", logdir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both", choices=["stage1", "stage2", "both"])
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()
    base = args.logdir or tempfile.mkdtemp(prefix="jig_profile_")
    if args.which in ("stage1", "both"):
        profile_stage1(str(Path(base) / "stage1"))
    if args.which in ("stage2", "both"):
        profile_stage2(str(Path(base) / "stage2"))
    print(f"\ntraces kept under {base}")


if __name__ == "__main__":
    main()
