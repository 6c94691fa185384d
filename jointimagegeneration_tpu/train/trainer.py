"""Unified training engine for both stages.

Replaces the reference's two divergent engines — ignite Engine assembly
(ccdm/ddpm/trainer.py:466-694, run_train :697-882) and the Lightning
Trainer (latentdiffusion/main.py:497-828) — with one functional loop:

  build datasets -> build model/optimizer/EMATrainState -> [restore] ->
  for step: next batch -> jitted train step (pjit over mesh) ->
  metrics/throughput logging -> periodic checkpoint (rolling + best) ->
  periodic validation (Dice for stage 1 / val loss for stage 2) +
  qualitative image grids.

Failure handling mirrors the reference's semantics the JAX way: the
train step reports `grad_finite`; on a non-finite loss the engine dumps a
debug checkpoint and raises (trainer.py:388-407's nan/inf guard);
KeyboardInterrupt checkpoints before exiting (main.py:297-301 melk()).
"""

from __future__ import annotations

import signal
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.logging import MetricLogger, Throughput, hbm_stats
from ..parallel.mesh import is_chief
from .state import EMATrainState

__all__ = ["Trainer", "TrainerConfig"]


@dataclass
class TrainerConfig:
    logdir: str = "runs/exp"
    max_steps: int = 10_000
    log_every: int = 50
    save_every: int = 1000  # ccdm save_freq (params.yml:62)
    eval_every: int = 1000
    keep_checkpoints: int = 3  # ignite n_saved=3
    keep_best: int = 1  # best-by-score savers kept (trainer.py:559-567; LDM top-k)
    best_mode: str = "max"  # 'max' for Dice / negated val-loss scores
    # weight-only snapshots kept forever (LDM metrics_over_trainsteps_checkpoint:
    # save_top_k=-1 + save_weights_only, main.py:720-736); None = off (default,
    # as in the reference where the callback is opt-in)
    save_weights_every: Optional[int] = None
    # capture a jax.profiler device trace of N post-warmup steps into
    # <logdir>/profile and print the top-op device-time summary — the
    # config-drivable replacement for Lightning's exit profiler summary
    # (latentdiffusion/main.py:828); 0 = off
    profile_steps: int = 0
    seed: int = 0


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        state: EMATrainState,
        train_step: Callable,  # (state, batch, key) -> (state, metrics)
        train_loader,
        eval_fn: Optional[Callable] = None,  # (state, step, logger) -> score
        resume: bool = False,
        run_config: Optional[dict] = None,
    ):
        self.cfg = config
        self.state = state
        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.train_loader = train_loader
        self.eval_fn = eval_fn
        self.logger = MetricLogger(config.logdir) if is_chief() else None
        self.ckpt = CheckpointManager(
            Path(config.logdir) / "checkpoints", config.keep_checkpoints,
            best_mode=config.best_mode, best_k=config.keep_best,
        )
        if resume and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            print(f"resumed from step {int(self.state.step)}")
        if is_chief():
            # code self-archival for reproducibility (ccdm/ddpm/utils.py:41-44)
            try:
                from ..utils.misc import archive_code

                archive_code(config.logdir)
            except Exception:
                pass
            if run_config is not None:
                # merged run-config dump at startup (SetupCallback writes
                # project/lightning configs to the logdir, main.py:286-335)
                import yaml

                cfg_dir = Path(config.logdir) / "configs"
                cfg_dir.mkdir(parents=True, exist_ok=True)
                with open(cfg_dir / "run-config.yaml", "w") as f:
                    yaml.safe_dump(run_config, f, default_flow_style=False, sort_keys=False)
        # SIGUSR1 -> checkpoint now (latentdiffusion/main.py:784-795 melk);
        # SIGUSR2 -> drop into the debugger (main.py:798-801 divein);
        # SIGTERM -> checkpoint and stop cleanly: cloud TPU preemption /
        # maintenance delivers SIGTERM with a short grace window, so a
        # preempted run leaves a resumable checkpoint and exits 0 for the
        # orchestrator to reschedule (the 'optional preemption handler' of
        # SURVEY §2.3's elastic row; the reference has no equivalent — its
        # closest is checkpoint-on-exception, main.py:804-809)
        self._usr1 = False
        self._term = False
        try:
            signal.signal(signal.SIGUSR1, lambda *_: setattr(self, "_usr1", True))
            signal.signal(signal.SIGUSR2, self._divein)
            signal.signal(signal.SIGTERM, lambda *_: setattr(self, "_term", True))
        except (ValueError, OSError):
            pass  # not in main thread

    @staticmethod
    def _divein(*_):
        import pdb

        pdb.set_trace()

    def _log(self, step: int, metrics: dict, prefix: str = "train/"):
        if self.logger:
            self.logger.scalars(step, metrics, prefix)

    def fit(self):
        cfg = self.cfg
        step = int(self.state.step)
        # fold the restored step into the key so a resumed run CONTINUES the
        # randomness stream instead of replaying the (t, noise) draws of
        # steps 1..N from the original run (fresh runs: fold_in(key, 0))
        key = jax.random.fold_in(jax.random.key(cfg.seed), step)
        tput = Throughput()
        # profiler window: start after the compile+warmup steps (or
        # immediately when the run is too short to afford skipping them)
        prof_start = None
        if cfg.profile_steps and is_chief():
            prof_start = step + 3 if cfg.max_steps - step > cfg.profile_steps + 3 else step + 1
        prof_active = False
        try:
            while step < cfg.max_steps:
                epoch_batches = 0
                for batch in self.train_loader:
                    epoch_batches += 1
                    if step >= cfg.max_steps:
                        break
                    if prof_start is not None and not prof_active and step + 1 == prof_start:
                        try:
                            jax.profiler.start_trace(str(Path(cfg.logdir) / "profile"))
                            prof_active = True
                        except Exception as e:  # backend without trace support
                            print(f"profiler: start_trace failed: {e}")
                            prof_start = None
                    key, sub = jax.random.split(key)
                    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
                    self.state, metrics = self.train_step(self.state, arrays, sub)
                    step += 1
                    if prof_active and step >= prof_start + cfg.profile_steps - 1:
                        jax.block_until_ready(self.state)  # close the async window
                        jax.profiler.stop_trace()
                        prof_active = False
                        self._print_trace_summary()
                    bsz = next(iter(arrays.values())).shape[0]
                    tput.update(bsz)

                    if step % cfg.log_every == 0:
                        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                        skipped = float(getattr(self.state, "nonfinite_count", 0))
                        metrics["nonfinite_skipped"] = skipped
                        if not np.isfinite(metrics.get("loss", 0.0)) or skipped > 0:
                            # Non-finite grads are skip-updated in-device
                            # (EMATrainState.apply_gradients), so params here
                            # are still the last-good pre-NaN state; dump a
                            # restorable debug checkpoint then halt
                            # (reference per-step guard, trainer.py:388-407).
                            self.ckpt.save(step, jax.device_get(self.state))
                            self.ckpt.wait()
                            raise FloatingPointError(f"non-finite loss/grads at step {step}: {metrics}")
                        metrics["imgs_per_sec"] = tput.rate()
                        metrics.update(hbm_stats())
                        self._log(step, metrics)
                        tput.reset()

                    saved_this_step = False
                    if step % cfg.save_every == 0 or self._usr1:
                        self.ckpt.save(step, jax.device_get(self.state))
                        self._usr1 = False
                        saved_this_step = True

                    if self._term:
                        if not saved_this_step:
                            self.ckpt.save(step, jax.device_get(self.state))
                        print(f"SIGTERM — checkpointed step {step}, stopping for preemption")
                        return self.state

                    if cfg.save_weights_every and step % cfg.save_weights_every == 0:
                        self.ckpt.save_weights(step, jax.device_get({
                            "params": self.state.params,
                            "ema_params": self.state.ema_params,
                            "step": self.state.step,
                        }))

                    if self.eval_fn is not None and step % cfg.eval_every == 0:
                        score = self.eval_fn(self.state, step, self.logger)
                        if score is not None:
                            self.ckpt.save(step, jax.device_get(self.state), score=float(score))
                if epoch_batches == 0:
                    # an empty dataset or exhausted one-shot iterator would
                    # otherwise spin this while-loop forever at 100% CPU
                    raise RuntimeError(
                        "train_loader yielded no batches this epoch — empty "
                        "dataset or exhausted one-shot iterator?"
                    )
        except KeyboardInterrupt:
            print("interrupted — saving checkpoint")
            self.ckpt.save(step, jax.device_get(self.state))
            raise
        finally:
            if prof_active:  # run ended inside the capture window
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
            self.ckpt.wait()
        return self.state

    def _print_trace_summary(self, top_k: int = 10):
        from ..core.logging import summarize_trace

        try:
            rows = summarize_trace(str(Path(self.cfg.logdir) / "profile"),
                                   top_k=top_k, group="category")
        except Exception as e:
            print(f"profiler: trace summary unavailable: {e}")
            return
        if not rows:
            print(f"profiler: trace written to {self.cfg.logdir}/profile (no device events parsed)")
            return
        total = sum(r[1] for r in rows)
        print(f"profiler: {self.cfg.profile_steps}-step device trace "
              f"({self.cfg.logdir}/profile), top categories:")
        for key_, ms, count, gflop, gbytes in rows[:top_k]:
            print(f"  {key_:<28s} {ms:9.2f} ms ({100 * ms / max(total, 1e-9):5.1f}%)  n={count}")
