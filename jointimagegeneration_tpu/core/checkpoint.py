"""Checkpointing via orbax: {params, ema_params, opt_state, step} with
rolling / best / last policies.

Covers both reference policies (SURVEY.md §5 'Checkpoint / resume'):
ignite ModelCheckpoint rolling n_saved=3 + best-by-Dice (ccdm
trainer.py:522-596) and Lightning save_last + top-k on monitor
(latentdiffusion/main.py:654-675)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

import jax

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 3, best_mode: str = "max"):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ocp = ocp
        self.max_to_keep = max_to_keep
        self.best_mode = best_mode
        self._mgr = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m.get("score", 0.0)) if best_mode else None,
                best_mode=best_mode or "max",
                create=True,
            ),
        )

    def save(self, step: int, state: Any, score: Optional[float] = None) -> None:
        metrics = {"score": float(score)} if score is not None else None
        self._mgr.save(step, args=self._ocp.args.StandardSave(state), metrics=metrics)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        try:
            return self._mgr.restore(step, args=self._ocp.args.StandardRestore(state_template))
        except Exception:
            # legacy (round-1) checkpoints name ResBlock params as nested
            # submodules; restore raw, rewrite to the flat layout, then
            # re-shape onto the template
            import flax.serialization

            from ..utils.misc import convert_legacy_resblock_params

            raw = self._mgr.restore(step, args=self._ocp.args.StandardRestore())
            converted = convert_legacy_resblock_params(raw)
            # name-based mapping onto the template (robust to key ordering)
            return flax.serialization.from_state_dict(state_template, converted)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
