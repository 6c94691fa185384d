"""Optimizer + LR-schedule factory.

Unifies the two reference generations into optax:
  * ccdm: SGD/Adam/AdamW + LRFcts multipliers — static / piecewise_static /
    exponential / polynomial(power, min_lr) / cosine / linear-warmup-
    polynomial, with restart machinery (ccdm/ddpm/optimizer.py:9-61,
    lr_functions.py:5-139);
  * LDM: warmup-cosine (single cycle), warmup-cosine2 and warmup-linear
    (repeated cycles with per-cycle warmup/f_min/f_max/f_start) LambdaLR
    schedules (ldm/lr_scheduler.py:4-98) and the accum*ngpu*bs*base_lr
    scaling rule (main.py:772-776), which callers apply to `learning_rate`
    directly.

All schedules are pure step->multiplier functions (jit-traceable) applied
via optax.scale_by_schedule composition.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import optax

__all__ = ["build_lr_schedule", "build_optimizer"]


def _restart_schedule(
    lr_function: str,
    base_lr: float,
    total_steps: int,
    p: dict,
    lr_restarts: Sequence[int],
    lr_restart_vals,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Warm-restart machinery (ccdm lr_functions.py:16-79): the step range
    is split at `lr_restarts` into segments; segment i starts from a base
    multiplier (restart_vals**i for a scalar, or [1, *list]) and runs the
    shape function over (steps_since_restart, steps_in_segment)."""
    import numpy as np

    bounds = [0] + sorted(int(r) for r in lr_restarts) + [int(total_steps)]
    n_seg = len(bounds) - 1
    if isinstance(lr_restart_vals, (int, float)):
        seg_vals = [float(lr_restart_vals) ** i for i in range(n_seg)]
    else:
        assert len(lr_restart_vals) == n_seg - 1, "lr_restart_vals list must have len(lr_restarts) entries"
        seg_vals = [1.0] + [float(v) for v in lr_restart_vals]
    starts = jnp.asarray(np.asarray(bounds[:-1], np.float32))
    lengths = jnp.asarray(np.asarray(bounds[1:], np.float32) - np.asarray(bounds[:-1], np.float32))
    vals = jnp.asarray(np.asarray(seg_vals, np.float32))

    power = p.get("power", 1.0)
    min_lr = p.get("min_lr", 0.0)
    gamma = p.get("gamma", 0.98)

    def sched(step):
        s = step.astype(jnp.float32)
        seg = jnp.clip(jnp.searchsorted(starts, s, side="right") - 1, 0, n_seg - 1)
        since = s - starts[seg]
        length = lengths[seg]
        base_val = vals[seg]
        if lr_function == "static":
            shape = 1.0
        elif lr_function == "exponential":
            shape = gamma**since
        elif lr_function == "polynomial":
            # floor the denominator at 1: a length-1 segment (consecutive
            # restart bounds) would otherwise divide 0/0 -> NaN lr
            den = jnp.maximum(length - 1.0, 1.0)
            coeff = (1.0 - jnp.minimum(since, length - 1) / den) ** power
            shape = (1.0 - min_lr / base_lr) * coeff + min_lr / base_lr
        elif lr_function == "cosine":
            shape = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.minimum(since, length) / length))
        else:
            raise ValueError(f"lr_function {lr_function!r} does not support restarts")
        return base_lr * base_val * shape

    return sched


def build_lr_schedule(
    lr_function: Optional[str],
    base_lr: float,
    total_steps: int,
    lr_params: Optional[dict] = None,
    lr_restarts: Optional[Sequence[int]] = None,
    lr_restart_vals=1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns schedule(step) -> absolute lr."""
    p = dict(lr_params or {})

    if lr_restarts:
        return _restart_schedule(lr_function or "static", base_lr, total_steps, p, lr_restarts, lr_restart_vals)

    if lr_function is None or lr_function == "static":
        return lambda step: jnp.asarray(base_lr)

    if lr_function == "piecewise_static":
        # lr = base_lr * multiplier of the first phase whose end >= step
        # (ccdm lr_functions.py:45-62, 102-107); steps past the last phase
        # keep the last multiplier.
        schedule = p["piecewise_static_schedule"]  # [[phase_end, mult], ...]
        ends = jnp.asarray([float(e) for e, _ in schedule])
        mults = jnp.asarray([float(m) for _, m in schedule])

        def sched(step):
            i = jnp.clip(jnp.searchsorted(ends, step.astype(jnp.float32), side="left"), 0, len(schedule) - 1)
            return base_lr * mults[i]

        return sched

    if lr_function == "exponential":
        gamma = p.get("gamma", 0.98)
        return lambda step: base_lr * gamma ** step.astype(jnp.float32)

    if lr_function == "polynomial":
        power = p.get("power", 1.0)
        min_lr = p.get("min_lr", 0.0)
        # build_optimizer defaults total_steps=1 — without the floor the
        # schedule is 0/0 = NaN lr at EVERY step, which poisons params while
        # grads stay finite (so skip_nonfinite never fires)
        den = max(total_steps - 1, 1)

        def sched(step):
            s = jnp.minimum(step.astype(jnp.float32), total_steps - 1)
            coeff = (1.0 - s / den) ** power
            return (base_lr - min_lr) * coeff + min_lr

        return sched

    if lr_function == "cosine":
        def sched(step):
            s = jnp.minimum(step.astype(jnp.float32), total_steps)
            return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * s / total_steps))

        return sched

    if lr_function == "linear-warmup-polynomial":
        warmup_iters = p["warmup_iters"]
        warmup_rate = p["warmup_rate"]
        power = p.get("power", 1.0)
        min_lr = p.get("min_lr", 0.0)

        den = max(total_steps - 1, 1)  # see the polynomial branch above

        def sched(step):
            s = step.astype(jnp.float32)
            warm = base_lr * (1.0 - (1.0 - (s + 1.0) / warmup_iters) * (1.0 - warmup_rate))
            sc = jnp.minimum(s, total_steps - 1)
            poly = (base_lr - min_lr) * (1.0 - sc / den) ** power + min_lr
            return jnp.where(s <= warmup_iters - 1, warm, poly)

        return sched

    if lr_function == "warmup-cosine":  # LDM LambdaWarmUpCosineScheduler (lr_scheduler.py:4-36)
        # lr_min/lr_max/lr_start are MULTIPLIERS on base_lr, exactly like the
        # cyclic schedules below: the reference applies schedule(n) through
        # torch LambdaLR ("note: use with a base_lr of 1.0", lr_scheduler.py:6;
        # ddpm.py:1391), so the absolute lr is base_lr * f(n).
        warm_up_steps = p.get("warm_up_steps", 0)
        f_min = p.get("lr_min", 0.0)
        f_max = p.get("lr_max", 1.0)
        f_start = p.get("lr_start", 0.0)
        decay_steps = p.get("max_decay_steps", total_steps)

        def sched(step):
            s = step.astype(jnp.float32)
            warm = f_start + s / max(warm_up_steps, 1) * (f_max - f_start)
            t = jnp.minimum((s - warm_up_steps) / max(decay_steps - warm_up_steps, 1), 1.0)
            cos = f_min + 0.5 * (f_max - f_min) * (1 + jnp.cos(t * jnp.pi))
            return base_lr * jnp.where(s < warm_up_steps, warm, cos)

        return sched

    if lr_function in ("warmup-cosine2", "warmup-linear"):
        # LDM LambdaWarmUpCosineScheduler2 / LambdaLinearScheduler
        # (lr_scheduler.py:36-98): repeated warmup cycles, each with its own
        # warmup length, f_start/f_max/f_min and duration (`cycle_lengths`);
        # f is a multiplier on base_lr (torch LambdaLR semantics, "use with
        # a base_lr of 1.0").  A step landing exactly on a cycle's
        # cumulative end belongs to that cycle (find_in_interval's `n <= cl`).
        import numpy as np

        def _as_list(key, default):
            v = p.get(key, default)
            return [float(x) for x in (v if isinstance(v, (list, tuple)) else [v])]

        cycle_lengths = _as_list("cycle_lengths", [total_steps])
        ncyc = len(cycle_lengths)

        def _per_cycle(key, default):
            v = _as_list(key, default)
            if len(v) == 1:
                v = v * ncyc
            if len(v) != ncyc:
                raise ValueError(f"lr_params[{key!r}] needs one entry per cycle ({ncyc})")
            return jnp.asarray(v, jnp.float32)

        warm = _per_cycle("warm_up_steps", [0.0])
        f_min = _per_cycle("f_min", [0.0])
        f_max = _per_cycle("f_max", [1.0])
        f_start = _per_cycle("f_start", [0.0])
        # Cycle selection and the since-cycle-start offset run in INTEGER
        # arithmetic: canonical LDM configs use cycle_lengths like 1e13, and
        # float32 can't represent steps/boundaries past 2^24 — the offset
        # `s - starts[c]` would drift (ADVICE r3).  Steps are int32-exact to
        # 2^31; boundaries beyond that are clamped (unreachable by any
        # trainable step count).
        _imax = np.int64(2**31 - 1)
        cum = np.minimum(np.cumsum([0] + [int(c) for c in cycle_lengths], dtype=np.int64), _imax)
        starts = jnp.asarray(cum[:-1], jnp.int32)
        uppers = jnp.asarray(cum[1:], jnp.int32)
        lens = jnp.asarray(cycle_lengths, jnp.float32)  # true lengths: only the searchsorted bounds are clamped
        cosine = lr_function == "warmup-cosine2"

        def sched(step):
            s = step.astype(jnp.int32)
            c = jnp.clip(jnp.searchsorted(uppers, s, side="left"), 0, ncyc - 1)
            n = (s - starts[c]).astype(jnp.float32)
            w = warm[c]
            warm_f = f_start[c] + (f_max[c] - f_start[c]) / jnp.maximum(w, 1.0) * n
            if cosine:
                t = jnp.minimum((n - w) / jnp.maximum(lens[c] - w, 1.0), 1.0)
                decay_f = f_min[c] + 0.5 * (f_max[c] - f_min[c]) * (1.0 + jnp.cos(t * jnp.pi))
            else:
                # past the final cycle the linear ramp is clamped at f_min
                # (the reference would crash there instead)
                decay_f = f_min[c] + (f_max[c] - f_min[c]) * jnp.maximum((lens[c] - n) / lens[c], 0.0)
            return base_lr * jnp.where(n < w, warm_f, decay_f)

        return sched

    raise ValueError(f"unknown lr_function {lr_function!r}")


def build_optimizer(
    name: str = "AdamW",
    learning_rate: float = 1e-3,
    lr_function: Optional[str] = None,
    lr_params: Optional[dict] = None,
    total_steps: int = 1,
    weight_decay: Optional[float] = None,
    betas: Sequence[float] = (0.9, 0.999),
    momentum: float = 0.9,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
    lr_restarts: Optional[Sequence[int]] = None,
    lr_restart_vals=1.0,
) -> optax.GradientTransformation:
    """optax mirror of ccdm build_optimizer defaults (optimizer.py:27-39):
    SGD wd=5e-4 momentum=.9; Adam plain; AdamW wd=0.01."""
    # YAML 1.1 parses exponent literals without a decimal point ("1e-3",
    # "5e-4") as STRINGS — coerce the numerics that commonly arrive from
    # config files so such a value trains instead of crashing in optax
    learning_rate = float(learning_rate)
    if weight_decay is not None:
        weight_decay = float(weight_decay)
    if grad_clip is not None:
        grad_clip = float(grad_clip)
    betas = tuple(float(b) for b in betas)
    momentum = float(momentum)
    sched = build_lr_schedule(lr_function, learning_rate, total_steps, lr_params, lr_restarts, lr_restart_vals)
    if name == "SGD":
        wd = 0.0005 if weight_decay is None else weight_decay
        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(learning_rate=sched, momentum=momentum),
        )
    elif name == "Adam":
        tx = optax.adam(learning_rate=sched, b1=betas[0], b2=betas[1])
    elif name == "AdamW":
        wd = 0.01 if weight_decay is None else weight_decay
        tx = optax.adamw(learning_rate=sched, b1=betas[0], b2=betas[1], weight_decay=wd)
    else:
        raise ValueError(f"optimizer {name!r} not recognized")
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate_steps > 1:
        # gradient accumulation (LDM accumulate_grad_batches, main.py:766-776)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
