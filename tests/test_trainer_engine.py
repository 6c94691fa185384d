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
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    state = {"w": jnp.arange(4.0)}
    mgr.save(1, jax.device_get(state), score=0.5)
    mgr.save(2, jax.device_get({"w": jnp.arange(4.0) * 2}), score=0.9)
    mgr.save(3, jax.device_get({"w": jnp.arange(4.0) * 3}), score=0.1)
    mgr.wait()
    # best-k policy: keeps the two best scores (steps 1, 2); step 3 pruned
    assert mgr.latest_step() == 2
    back = mgr.restore({"w": np.zeros(4, np.float32)}, step=2)
    np.testing.assert_allclose(back["w"], np.arange(4.0) * 2)
