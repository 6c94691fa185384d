"""Trainer engine + checkpoint manager, in-process smoke (tiny synthetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.core.checkpoint import CheckpointManager
from jointimagegeneration_tpu.data.datasets import SyntheticMaskDataset
from jointimagegeneration_tpu.data.loader import DataLoader
from jointimagegeneration_tpu.models import MaskSampler
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_mask_train_step
from jointimagegeneration_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


@pytest.fixture()
def setup(tmp_path):
    model = MaskSampler.create(
        num_classes=3, time_steps=10, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    spatial = (2, 4, 4)
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    tx = build_optimizer("AdamW", 1e-3)
    state = EMATrainState.create(params, tx)
    ds = SyntheticMaskDataset(num_cases=4, volume_shape=spatial, num_classes=3)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    step = make_mask_train_step(model, jnp.ones((3,)))
    return model, state, loader, step, tmp_path


def test_trainer_fit_and_resume(setup):
    model, state, loader, step, tmp_path = setup
    cfg = TrainerConfig(logdir=str(tmp_path / "run"), max_steps=4, log_every=2, save_every=2, eval_every=100)
    tr = Trainer(cfg, state, step, loader)
    final = tr.fit()
    assert int(final.step) == 4
    tr.ckpt.wait()
    assert tr.ckpt.latest_step() == 4
    # metrics were logged
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 2
    # resume continues from the checkpoint
    state2 = EMATrainState.create(final.params, final.tx)  # fresh step=0
    tr2 = Trainer(
        TrainerConfig(logdir=str(tmp_path / "run"), max_steps=6, log_every=2, save_every=2, eval_every=100),
        state2, step, loader, resume=True,
    )
    out = tr2.fit()
    assert int(out.step) == 6


def test_checkpoint_best_policy(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2, best_k=2)
    mgr.save(1, jax.device_get({"w": jnp.arange(4.0)}), score=0.5)
    mgr.save(2, jax.device_get({"w": jnp.arange(4.0) * 2}), score=0.9)
    mgr.save(3, jax.device_get({"w": jnp.arange(4.0) * 3}), score=0.1)
    mgr.wait()
    # best-k policy: keeps the two best scores (steps 1, 2); step 3 pruned
    assert mgr.all_steps()["best"] == [1, 2]
    assert mgr.best_step() == 2
    back = mgr.restore({"w": np.zeros(4, np.float32)}, step=2)
    np.testing.assert_allclose(back["w"], np.arange(4.0) * 2)


def test_checkpoint_retention_mixed_saves(tmp_path):
    """The round-2 retention bug probe: interleave score-less rolling saves
    (what Trainer emits at save_every) with scored eval saves, exactly the
    sequence of a real run with save_freq==eval_freq.  Exactly
    {last max_to_keep rolling} ∪ {best_k best-scored} must survive —
    reference semantics: ignite rolling n_saved=3 (ccdm trainer.py:522-529)
    plus the separate best-by-Dice saver (:559-567)."""
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=3, best_k=1)
    scores = {1000: 0.2, 2000: 0.9, 3000: 0.4, 4000: 0.1, 5000: 0.3, 6000: 0.5, 7000: 0.6}
    for step, score in scores.items():
        mgr.save(step, {"w": np.full(2, float(step))})       # rolling (score-less)
        mgr.save(step, {"w": np.full(2, float(step))}, score=score)  # scored eval save
    mgr.wait()
    kept = mgr.all_steps()
    assert kept["rolling"] == [5000, 6000, 7000], kept  # NOT all 7 (round-2 bug)
    assert kept["best"] == [2000], kept  # best-by-score, not best-by-recency
    assert mgr.best_step() == 2000
    # restore of the best step works even though it's outside the rolling window
    back = mgr.restore({"w": np.zeros(2, np.float32)}, step=2000)
    np.testing.assert_allclose(back["w"], 2000.0)
    # latest overall = newest retained step in either tree
    assert mgr.latest_step() == 7000


def test_checkpoint_best_sign_consistency(tmp_path):
    """train_ldm scores = -val_loss with best_mode='max': lower val loss
    must win.  With the split managers no score-less 0.0 ever competes
    (the round-2 'garbage ranking' hazard)."""
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2, best_k=1)
    mgr.save(1, {"w": np.ones(1)})  # score-less rolling save mixed in
    mgr.save(1, {"w": np.ones(1)}, score=-0.9)   # val_loss 0.9
    mgr.save(2, {"w": np.ones(1) * 2}, score=-0.1)  # val_loss 0.1 (best)
    mgr.save(3, {"w": np.ones(1) * 3}, score=-0.5)
    mgr.wait()
    assert mgr.best_step() == 2


def test_profiler_window_captures_trace(setup, capsys):
    """`profile_steps: N` (the config-drivable replacement for Lightning's
    exit profiler summary, latentdiffusion/main.py:828): fit() captures a
    jax.profiler trace of N steps into <logdir>/profile and still trains
    to max_steps; the capture must not disturb the training result."""
    model, state, loader, step, tmp_path = setup
    cfg = TrainerConfig(logdir=str(tmp_path / "prof"), max_steps=4, log_every=100,
                        save_every=100, eval_every=100, profile_steps=2)
    tr = Trainer(cfg, state, step, loader)
    final = tr.fit()
    assert int(final.step) == 4
    prof_dir = tmp_path / "prof" / "profile"
    assert prof_dir.exists()
    # a trace capture was actually written (xplane or trace.json.gz artifacts)
    artifacts = list(prof_dir.rglob("*.xplane.pb")) + list(prof_dir.rglob("*.trace.json.gz"))
    assert artifacts, f"no trace artifacts under {prof_dir}"
    out = capsys.readouterr().out
    assert "profiler:" in out  # summary (or honest no-device-events note) printed


def test_sigterm_graceful_stop(setup):
    """Preemption semantics: with the SIGTERM flag raised, fit() checkpoints
    the current step and returns instead of training to max_steps — a
    preempted run is resumable and exits cleanly (SURVEY §2.3 elastic row;
    the reference has no preemption handler)."""
    model, state, loader, step, tmp_path = setup
    cfg = TrainerConfig(logdir=str(tmp_path / "term"), max_steps=50, log_every=100,
                        save_every=100, eval_every=100)
    tr = Trainer(cfg, state, step, loader)
    tr._term = True  # as the signal handler would set it mid-run
    final = tr.fit()
    assert int(final.step) == 1  # stopped after the first step
    tr.ckpt.wait()
    assert tr.ckpt.latest_step() == 1
    # and the run resumes from the preemption checkpoint
    tr2 = Trainer(cfg, EMATrainState.create(final.params, final.tx), step, loader, resume=True)
    assert int(tr2.state.step) == 1
