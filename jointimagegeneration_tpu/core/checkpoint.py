"""Checkpointing via orbax: {params, ema_params, opt_state, step} with
rolling / best / last policies.

Mirrors the reference's TWO-saver split (SURVEY.md §5 'Checkpoint /
resume') with two orbax managers:

  * rolling — every periodic save, FIFO `max_to_keep=3` (ignite
    ModelCheckpoint n_saved=3, ccdm/ddpm/trainer.py:522-529); lives at
    the manager root so round-1/2 checkpoint layouts stay restorable.
  * best    — only SCORED saves, top-`best_k` on the score (the separate
    best-by-Dice saver, trainer.py:559-567; Lightning top-3 on monitor,
    latentdiffusion/main.py:654-675); lives under `<root>/best`.

A single manager with one `best_fn` delivers neither policy: orbax keeps
score-less saves forever (`keep_checkpoints_without_metrics` default) and
ranks absent scores as 0.0 against real ones — the round-2 retention bug.
Splitting the managers also removes same-step double-save ambiguity when
`save_every` == `eval_every`: the two saves land in different trees.

Migration note: a pre-split (round-2) directory holds SCORED checkpoints
at the root; resuming into it restores them fine, but new rolling saves
will FIFO-prune those legacy root steps like any others (no best_fn at
the root anymore).  Copy legacy best checkpoints into `<root>/best`
before resuming if they must survive retention."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 3, best_mode: str = "max", best_k: int = 1):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ocp = ocp
        self.max_to_keep = max_to_keep
        self.best_mode = best_mode
        self.best_k = best_k
        self._roll = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._best: Optional[Any] = None  # created lazily on first scored save

    def _best_mgr(self):
        if self._best is None:
            ocp = self._ocp
            self._best = ocp.CheckpointManager(
                str(self.directory / "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.best_k,
                    best_fn=lambda m: m["score"],
                    best_mode=self.best_mode,
                    keep_checkpoints_without_metrics=False,
                    create=True,
                ),
            )
        return self._best

    def save(self, step: int, state: Any, score: Optional[float] = None) -> None:
        """Score-less saves roll (FIFO max_to_keep); scored saves compete
        in the best-k tree.  A step that should appear in both (collide of
        save_every and eval_every) is saved by two calls."""
        if score is None:
            self._roll.save(step, args=self._ocp.args.StandardSave(state))
        else:
            self._best_mgr().save(
                step, args=self._ocp.args.StandardSave(state), metrics={"score": float(score)}
            )

    def _manager_for(self, step: int):
        if step in self._roll.all_steps():
            return self._roll
        if (self.directory / "best").exists() and step in self._best_mgr().all_steps():
            return self._best_mgr()
        return self._roll  # let orbax raise its not-found error

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        mgr = self._manager_for(step)
        try:
            return mgr.restore(step, args=self._ocp.args.StandardRestore(state_template))
        except Exception:
            # legacy (round-1) checkpoints name ResBlock params as nested
            # submodules; restore raw, rewrite to the flat layout, then
            # re-shape onto the template
            import flax.serialization

            from ..utils.misc import convert_legacy_resblock_params

            raw = mgr.restore(step, args=self._ocp.args.StandardRestore())
            converted = convert_legacy_resblock_params(raw)
            # name-based mapping onto the template (robust to key ordering)
            return flax.serialization.from_state_dict(state_template, converted)

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore without a template (dict-of-arrays as stored) — for
        consumers that only need a sub-tree (e.g. ema_params at sampling)
        and must not depend on the training run's optimizer topology."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        mgr = self._manager_for(step)
        return mgr.restore(step, args=self._ocp.args.StandardRestore())

    def latest_step(self) -> Optional[int]:
        steps = [self._roll.latest_step()]
        if (self.directory / "best").exists():
            steps.append(self._best_mgr().latest_step())
        steps = [s for s in steps if s is not None]
        return max(steps) if steps else None

    def best_step(self) -> Optional[int]:
        """Step of the best scored checkpoint (None if none scored yet)."""
        if not (self.directory / "best").exists():
            return None
        return self._best_mgr().best_step()

    def all_steps(self) -> dict:
        """{'rolling': [...], 'best': [...]} retained steps (for tests/CLI)."""
        best = sorted(self._best_mgr().all_steps()) if (self.directory / "best").exists() else []
        return {"rolling": sorted(self._roll.all_steps()), "best": best}

    def wait(self) -> None:
        self._roll.wait_until_finished()
        if self._best is not None:
            self._best.wait_until_finished()

    def close(self) -> None:
        self._roll.close()
        if self._best is not None:
            self._best.close()
