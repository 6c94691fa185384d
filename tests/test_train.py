import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_ldm_train_step, make_mask_train_step
from jointimagegeneration_tpu.train.losses import sample_train_timesteps
from jointimagegeneration_tpu.train.optim import build_lr_schedule

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


def test_lr_polynomial_matches_reference_semantics():
    # ccdm params.yml: polynomial power 1.0, min_lr 1e-6, base 1e-3
    sched = build_lr_schedule("polynomial", 1e-3, total_steps=101, lr_params={"power": 1.0, "min_lr": 1e-6})
    assert float(sched(jnp.asarray(0))) == pytest.approx(1e-3)
    assert float(sched(jnp.asarray(100))) == pytest.approx(1e-6)
    mid = float(sched(jnp.asarray(50)))
    assert 4e-4 < mid < 6e-4


def test_lr_warmup_poly():
    sched = build_lr_schedule(
        "linear-warmup-polynomial", 1e-3, total_steps=100,
        lr_params={"warmup_iters": 10, "warmup_rate": 0.1, "power": 1.0},
    )
    assert float(sched(jnp.asarray(0))) < float(sched(jnp.asarray(5))) < float(sched(jnp.asarray(9)))
    assert float(sched(jnp.asarray(20))) < 1e-3


def test_lr_warmup_cosine():
    sched = build_lr_schedule("warmup-cosine", 1.0, total_steps=100, lr_params={"warm_up_steps": 10, "lr_max": 1.0})
    assert float(sched(jnp.asarray(10))) == pytest.approx(1.0, rel=1e-3)
    assert float(sched(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)


def test_timestep_distribution_t15():
    """t ~ t^1.5 over [1, T]: heavy tail toward T, never 0."""
    t = np.asarray(sample_train_timesteps(jax.random.key(0), 20000, 100))
    assert t.min() >= 1 and t.max() <= 100
    assert t.mean() > 50  # ^1.5 bias toward late steps (uniform would be ~50)


@pytest.fixture(scope="module")
def tiny_mask_setup():
    model = MaskSampler.create(
        num_classes=4, time_steps=20, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    spatial = (2, 8, 8)
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    tx = build_optimizer("AdamW", 1e-3, "polynomial", {"power": 1.0, "min_lr": 1e-6}, total_steps=100)
    state = EMATrainState.create(params, tx, ema_decay=0.99)
    return model, state, spatial


def test_mask_train_step_decreases_loss(tiny_mask_setup):
    model, state, spatial = tiny_mask_setup
    step = jax.jit(make_mask_train_step(model, jnp.ones((4,))))
    labels = np.zeros((2, *spatial), np.int32)
    labels[:, :, 2:6, 2:6] = 1
    batch = {
        "mask": jax.nn.one_hot(jnp.asarray(labels), 4),
        "image": jnp.zeros((2, *spatial, 1)),
    }
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
        assert bool(metrics["grad_finite"])
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_mask_train_step_ema_tracks(tiny_mask_setup):
    model, state, spatial = tiny_mask_setup
    step = jax.jit(make_mask_train_step(model, jnp.ones((4,))))
    batch = {
        "mask": jax.nn.one_hot(jnp.zeros((1, *spatial), jnp.int32), 4),
        "image": jnp.zeros((1, *spatial, 1)),
    }
    s1, _ = step(state, batch, jax.random.key(0))
    # ema = 0.99*old + 0.01*new for EVERY leaf, and at least one leaf moved
    moved = False
    for p0, p, e in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(s1.params), jax.tree.leaves(s1.ema_params)
    ):
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(p0) * 0.99 + np.asarray(p) * 0.01, rtol=1e-5, atol=1e-7
        )
        moved = moved or not np.allclose(np.asarray(p), np.asarray(e))
    assert moved


def test_ldm_train_step_runs():
    model = SliceLDM.create(
        timesteps=50, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    params = model.init_params(jax.random.key(0), 16)
    tx = build_optimizer("AdamW", 1e-4)
    state = EMATrainState.create(params, tx, ema_warmup=True)
    step = jax.jit(make_ldm_train_step(model))
    batch = {
        "image": jax.random.normal(jax.random.key(1), (2, 16, 16, 1)),
        "cond": jnp.zeros((2, 16, 16, 2)),
    }
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert "loss_simple" in metrics and "loss_vlb" in metrics


def test_build_optimizer_coerces_yaml_string_numerics():
    """YAML 1.1 parses '1e-3' (no decimal point) as a string; the factory
    must coerce it so configs written with exponent literals train."""
    tx = build_optimizer("AdamW", learning_rate="1e-3", weight_decay="1e-2",
                         grad_clip="1e0", betas=("0.9", "0.999"))
    p = {"w": jnp.ones((3,))}
    st = tx.init(p)
    upd, _ = tx.update({"w": jnp.ones((3,))}, st, p)
    assert float(jnp.abs(upd["w"]).max()) > 0
