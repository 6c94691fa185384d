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
from typing import Any, Optional, Sequence

__all__ = ["CheckpointManager", "load_partial"]


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

    def _weights_mgr(self):
        """Weight-only snapshot tree (the reference's opt-in
        `metrics_over_trainsteps_checkpoint`: ModelCheckpoint with
        save_top_k=-1 + save_weights_only=True every n train steps,
        latentdiffusion/main.py:720-736) — keeps EVERY save, no FIFO."""
        if getattr(self, "_weights", None) is None:
            ocp = self._ocp
            self._weights = ocp.CheckpointManager(
                str(self.directory / "trainstep"),
                options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
            )
        return self._weights

    def save_weights(self, step: int, weights: Any) -> None:
        """Unbounded weight-only snapshot (no optimizer state) under
        `<root>/trainstep` — the reference prints the same disk-space
        caution it carries (main.py:721-722)."""
        self._weights_mgr().save(step, args=self._ocp.args.StandardSave(weights))

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
        """{'rolling': [...], 'best': [...], 'trainstep': [...]} retained
        steps (for tests/CLI)."""
        best = sorted(self._best_mgr().all_steps()) if (self.directory / "best").exists() else []
        weights = (sorted(self._weights_mgr().all_steps())
                   if (self.directory / "trainstep").exists() else [])
        return {"rolling": sorted(self._roll.all_steps()), "best": best, "trainstep": weights}

    def wait(self) -> None:
        self._roll.wait_until_finished()
        if self._best is not None:
            self._best.wait_until_finished()
        if getattr(self, "_weights", None) is not None:
            self._weights.wait_until_finished()

    def close(self) -> None:
        self._roll.close()
        if self._best is not None:
            self._best.close()
        if getattr(self, "_weights", None) is not None:
            self._weights.close()


def _wrapped_view(tree: Any) -> tuple[dict, bool]:
    """Normalize a params tree to the {'unet': …, …} wrapped layout.

    Both models return either bare flax variables or a wrapped dict
    ({'unet': vars, 'refiner'|'logvar': …} — models/mask_sampler.py
    init_params, models/slice_ldm.py init_params); matching in wrapped
    view lets a bare-source checkpoint load into a wrapped template and
    vice versa."""
    if isinstance(tree, dict) and "unet" in tree:
        return dict(tree), False
    return {"unet": tree}, True


def load_partial(
    template: Any,
    path,
    ignore_keys: Sequence[str] = (),
    only_model: bool = False,
    source: str = "params",
    verbose: bool = True,
) -> Any:
    """Warm-start weight surgery — the reference's `init_from_ckpt`
    (ldm/models/diffusion/ddpm.py:187-203, wired from the `ckpt_path` +
    `ignore_keys` config keys; ccdm analog: partial `load()` objects).

    Restores `source` ('params' or 'ema_params'; falls back across the
    {params, ema_params, g_params} layouts this repo writes), drops every
    leaf whose '/'-joined path starts with one of the `ignore_keys`
    prefixes (printed, like the reference's "Deleting key" lines), then
    maps the remainder onto `template` NON-STRICTLY: paths present in
    both with equal shapes load; template leaves with no (surviving)
    source keep their fresh-init values; source-only and shape-mismatched
    leaves are dropped.  Missing/unexpected counts are reported like
    torch's strict=False load.  `only_model=True` restricts overwrites to
    the UNet subtree (the reference's `self.model.load_state_dict`
    branch), leaving e.g. a text refiner or logvar at fresh init."""
    import flax.serialization
    import flax.traverse_util
    import numpy as np

    raw = CheckpointManager(path).restore_raw()
    src = None
    for k in (source, "params", "ema_params", "g_params"):
        if isinstance(raw, dict) and k in raw:
            if verbose and k != source:
                print(f"init_from: no '{source}' in checkpoint — using '{k}'")
            src = raw[k]
            break
    if src is None:
        raise KeyError(
            f"checkpoint at {path!r} has none of params/ema_params/g_params "
            f"(top-level keys: {list(raw)[:8] if isinstance(raw, dict) else type(raw)})")

    tpl_view, tpl_bare = _wrapped_view(flax.serialization.to_state_dict(template))
    src_view, src_bare = _wrapped_view(flax.serialization.to_state_dict(src))
    tpl_flat = flax.traverse_util.flatten_dict(tpl_view, sep="/")
    src_flat = flax.traverse_util.flatten_dict(src_view, sep="/")

    # accept torch-style dotted prefixes too ("unet.params.out")
    ignore_keys = tuple(ik.replace(".", "/") for ik in ignore_keys)
    # For a bare source the 'unet/' prefix is synthetic (_wrapped_view), so
    # ignore keys are matched against the natural bare path as well —
    # the reference matches keys as they appear in the actual state dict
    # (ddpm.py:195-199); requiring the synthetic prefix would make e.g.
    # ignore_keys: [params/decoder] silently delete nothing.
    matched = {ik: 0 for ik in ignore_keys}
    for k in list(src_flat):
        views = (k, k[len("unet/"):]) if src_bare and k.startswith("unet/") else (k,)
        hits = [ik for ik in ignore_keys if any(v.startswith(ik) for v in views)]
        if hits:
            for ik in hits:
                matched[ik] += 1
            if verbose:
                print(f"init_from: deleting key {k} from checkpoint")
            del src_flat[k]
    for ik, n in matched.items():
        if n == 0 and verbose:
            print(f"init_from: WARNING — ignore key {ik!r} matched no checkpoint leaves")

    merged, loaded, mismatched = dict(tpl_flat), 0, []
    for k, v in src_flat.items():
        if k not in tpl_flat:
            continue
        if only_model and not k.startswith("unet/"):
            continue
        t = tpl_flat[k]
        if hasattr(t, "shape") and tuple(np.shape(v)) != tuple(t.shape):
            mismatched.append(k)
            continue
        merged[k] = v
        loaded += 1
    missing = [k for k in tpl_flat if k not in src_flat]
    unexpected = [k for k in src_flat if k not in tpl_flat]
    if verbose:
        print(f"init_from: restored {loaded}/{len(tpl_flat)} leaves from {path} "
              f"({len(missing)} missing, {len(unexpected)} unexpected, "
              f"{len(mismatched)} shape-mismatched)")
        for name, keys in (("missing", missing), ("unexpected", unexpected),
                           ("shape-mismatched", mismatched)):
            if keys:
                print(f"init_from: {name} keys: {keys[:10]}{' …' if len(keys) > 10 else ''}")
    out = flax.traverse_util.unflatten_dict(merged, sep="/")
    out = out["unet"] if tpl_bare else out
    import jax

    return jax.device_put(flax.serialization.from_state_dict(template, out))
