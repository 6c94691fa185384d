"""Regressions for the round-3 review findings in train/ + models/ +
diffusion/: NaN polynomial LR at default total_steps, PRNG replay on
resume, the nonzero-eta guard on the per-slice multistep entry points,
and the empty-loader busy loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.diffusion.gaussian import GaussianDiffusion
from jointimagegeneration_tpu.models.slice_ldm import SliceLDM
from jointimagegeneration_tpu.train.optim import build_lr_schedule, build_optimizer
from jointimagegeneration_tpu.train.state import EMATrainState
from jointimagegeneration_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.fast


# --------------------------------------------------------- LR schedules
def test_polynomial_schedule_finite_at_default_total_steps():
    """build_optimizer's default total_steps=1 used to make the polynomial
    schedule divide 0/0 -> NaN lr at every step, silently poisoning params
    while grads stayed finite (so skip_nonfinite never fired)."""
    for fn, p in [("polynomial", {}),
                  ("linear-warmup-polynomial", {"warmup_iters": 1, "warmup_rate": 0.1})]:
        sched = build_lr_schedule(fn, 1e-3, total_steps=1, lr_params=p)
        for s in (0, 1, 5):
            v = float(sched(jnp.asarray(s)))
            assert np.isfinite(v), f"{fn} lr at step {s} is {v}"


def test_polynomial_restart_length1_segment_finite():
    """Consecutive restart bounds create a length-1 segment whose
    (length - 1) denominator used to be 0."""
    sched = build_lr_schedule(
        "polynomial", 1e-3, total_steps=10, lr_params={},
        lr_restarts=[4, 5], lr_restart_vals=0.5,
    )
    vals = [float(sched(jnp.asarray(s))) for s in range(10)]
    assert all(np.isfinite(v) for v in vals), vals


def test_polynomial_default_optimizer_update_finite():
    tx = build_optimizer("AdamW", 1e-3, lr_function="polynomial")  # total_steps default
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, opt, params)
    assert bool(jnp.all(jnp.isfinite(updates["w"])))


# ------------------------------------------------------- trainer resume PRNG
def _key_probe_step(state, batch, key):
    # "loss" is a pure function of the per-step key, so metrics expose the
    # key stream directly
    return state.replace(step=state.step + 1), {"loss": jax.random.uniform(key)}


def _read_losses(logdir):
    import json
    from pathlib import Path

    return [json.loads(l)["train/loss"]
            for l in (Path(logdir) / "metrics.jsonl").read_text().strip().splitlines()]


def test_resume_continues_prng_stream(tmp_path):
    """A resumed run must NOT replay the per-step (t, noise) keys of the
    original run's early steps: fit() folds the restored step into the seed."""
    tx = build_optimizer("AdamW", 1e-3)
    loader = [{"x": np.zeros((1, 2), np.float32)}] * 2
    fresh = lambda: EMATrainState.create({"w": jnp.zeros((2,))}, tx)

    cfg1 = TrainerConfig(logdir=str(tmp_path / "a"), max_steps=2, log_every=1,
                         save_every=2, eval_every=100)
    tr1 = Trainer(cfg1, fresh(), _key_probe_step, loader)
    tr1.fit()
    tr1.ckpt.wait()
    first_run = _read_losses(cfg1.logdir)
    assert len(first_run) == 2

    # resume from step 2 in the same logdir, run 2 more steps
    cfg2 = TrainerConfig(logdir=str(tmp_path / "a"), max_steps=4, log_every=1,
                         save_every=100, eval_every=100)
    tr2 = Trainer(cfg2, fresh(), _key_probe_step, loader, resume=True)
    assert int(tr2.state.step) == 2
    tr2.fit()
    resumed = _read_losses(cfg2.logdir)[2:]
    assert len(resumed) == 2
    # the buggy behavior replayed the seed stream from step 0, making the
    # resumed steps' keys identical to the first run's steps 1..2
    assert not np.allclose(resumed, first_run), (resumed, first_run)


def test_empty_loader_raises(tmp_path):
    params = {"w": jnp.zeros((2,))}
    tx = build_optimizer("AdamW", 1e-3)
    cfg = TrainerConfig(logdir=str(tmp_path / "e"), max_steps=4, log_every=1,
                        save_every=100, eval_every=100)
    tr = Trainer(cfg, EMATrainState.create(params, tx), _key_probe_step, [])
    with pytest.raises(RuntimeError, match="no batches"):
        tr.fit()


# ------------------------------------------------- multistep sampler eta guard
def test_multistep_slice_entry_points_reject_nonzero_eta():
    model = SliceLDM.create(
        image_channels=1, cond_channels=1, timesteps=10, model_channels=8,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=4,
    )
    ddim = DDIMParams.create(
        GaussianDiffusion.create(timesteps=10), num_steps=4, eta=1.0)
    cond = jnp.zeros((1, 8, 8, 1))
    key = jax.random.key(0)
    for fn in (model.sample_slice_plms, model.sample_slice_dpm):
        with pytest.raises(ValueError, match="ddim_eta=0"):
            fn(None, key, cond, ddim)
