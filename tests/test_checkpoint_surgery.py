"""init_from weight surgery (reference init_from_ckpt, ddpm.py:187-203)
and weight-only trainstep snapshots (main.py:720-736)."""

import numpy as np
import pytest

from jointimagegeneration_tpu.core.checkpoint import CheckpointManager, load_partial

pytestmark = pytest.mark.fast


def _tree(scale: float, head=4):
    # a wrapped params layout like MaskSampler with a refiner:
    # {'unet': flax-vars, 'refiner': flax-vars}
    return {
        "unet": {"params": {
            "in": {"kernel": np.full((3, 3), scale, np.float32)},
            "out": {"kernel": np.full((head,), scale * 2, np.float32)},
        }},
        "refiner": {"params": {"w": np.full((2, 2), scale * 3, np.float32)}},
    }


@pytest.fixture()
def ckpt_dir(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(7, {"params": _tree(1.0), "ema_params": _tree(10.0),
                 "opt_state": {"count": np.zeros((), np.int32)}, "step": np.int32(7)})
    mgr.wait()
    return tmp_path / "ck"


def test_full_surgery_load(ckpt_dir):
    out = load_partial(_tree(0.0), ckpt_dir)
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 1.0)
    np.testing.assert_allclose(out["refiner"]["params"]["w"], 3.0)


def test_ignore_keys_prefix_drop(ckpt_dir):
    """ignore_keys prefixes are dropped from the SOURCE; those template
    leaves keep fresh-init values (the reference's 'Deleting key' loop)."""
    out = load_partial(_tree(0.0), ckpt_dir, ignore_keys=("unet/params/out",))
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 1.0)
    np.testing.assert_allclose(out["unet"]["params"]["out"]["kernel"], 0.0)  # fresh
    np.testing.assert_allclose(out["refiner"]["params"]["w"], 3.0)


def test_only_model_restricts_to_unet(ckpt_dir):
    """only_model=True == the reference's self.model.load_state_dict branch:
    the refiner stays at fresh init."""
    out = load_partial(_tree(0.0), ckpt_dir, only_model=True)
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 1.0)
    np.testing.assert_allclose(out["refiner"]["params"]["w"], 0.0)  # fresh


def test_source_ema_and_bare_template(ckpt_dir):
    """source='ema_params' picks the EMA weights; a BARE template (no
    'unet' wrapper — a model with no refiner) loads from the wrapped
    source's unet subtree."""
    bare = _tree(0.0)["unet"]
    out = load_partial(bare, ckpt_dir, source="ema_params")
    np.testing.assert_allclose(out["params"]["in"]["kernel"], 10.0)


def test_shape_mismatch_skipped_nonstrict(ckpt_dir):
    """A template leaf with a different shape keeps fresh init instead of
    erroring — torch strict=False spirit, shapes reported not fatal."""
    tpl = _tree(0.0, head=6)  # out head resized 4 -> 6
    out = load_partial(tpl, ckpt_dir)
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 1.0)
    assert out["unet"]["params"]["out"]["kernel"].shape == (6,)
    np.testing.assert_allclose(out["unet"]["params"]["out"]["kernel"], 0.0)


def test_g_params_fallback(tmp_path):
    """AE checkpoints (cli.train_ae) store the generator as g_params."""
    mgr = CheckpointManager(tmp_path / "ae")
    mgr.save(3, {"g_params": {"params": {"w": np.full(3, 5.0, np.float32)}},
                 "d_params": {"params": {"w": np.zeros(3, np.float32)}}})
    mgr.wait()
    out = load_partial({"params": {"w": np.zeros(3, np.float32)}}, tmp_path / "ae")
    np.testing.assert_allclose(out["params"]["w"], 5.0)


def test_weight_only_snapshots_keep_all(tmp_path):
    """trainstep snapshots never FIFO (reference save_top_k=-1) and live
    apart from the rolling tree."""
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, {"w": np.full(2, float(s))})
        mgr.save_weights(s, {"params": {"w": np.full(2, float(s))}, "step": np.int32(s)})
    mgr.wait()
    steps = mgr.all_steps()
    assert steps["rolling"] == [3, 4]          # FIFO max_to_keep=2
    assert steps["trainstep"] == [1, 2, 3, 4]  # keep ALL (save_top_k=-1)


def test_maybe_init_from_config_plumbing(ckpt_dir):
    """CLI-side wrapper: str form, dict form, and resume precedence
    (resume restores the full state later and must win)."""
    from jointimagegeneration_tpu.cli.common import maybe_init_from

    tpl = _tree(0.0)
    out = maybe_init_from({"init_from": str(ckpt_dir)}, tpl)
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 1.0)

    out = maybe_init_from(
        {"init_from": {"path": str(ckpt_dir), "only_model": True, "source": "ema_params"}}, tpl)
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 10.0)
    np.testing.assert_allclose(out["refiner"]["params"]["w"], 0.0)

    # resuming runs ignore init_from entirely
    out = maybe_init_from({"init_from": str(ckpt_dir), "load_from": True}, tpl)
    np.testing.assert_allclose(out["unet"]["params"]["in"]["kernel"], 0.0)
    # and no init_from at all is a no-op
    assert maybe_init_from({}, tpl) is tpl


def test_load_partial_real_model_tree(tmp_path):
    """Surgery on an ACTUAL flax tree (tiny MaskSampler with a refiner):
    round-trips through orbax + flatten/unflatten + from_state_dict, and
    only_model leaves the refiner fresh."""
    import jax

    from jointimagegeneration_tpu.models import MaskSampler

    model = MaskSampler.create(
        num_classes=3, time_steps=8, model_channels=4, channel_mult=(1,),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=2,
        context_dim=8,
        text_refiner={"embed_dim": 8, "n_heads": 2, "model_depth": 1, "d_head": 4},
    )
    spatial = (2, 4, 4)
    trained = model.init_params(jax.random.key(1), spatial, cond_channels=1)
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(5, {"params": jax.device_get(trained), "step": np.int32(5)})
    mgr.wait()

    fresh = model.init_params(jax.random.key(2), spatial, cond_channels=1)
    out = load_partial(fresh, tmp_path / "ck", only_model=True)
    # unet subtree == trained, refiner subtree == fresh
    for a, b in zip(jax.tree.leaves(out["unet"]), jax.tree.leaves(trained["unet"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(out["refiner"]), jax.tree.leaves(fresh["refiner"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # full surgery loads the refiner too
    out2 = load_partial(fresh, tmp_path / "ck")
    for a, b in zip(jax.tree.leaves(out2), jax.tree.leaves(trained)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ignore_keys_match_bare_source_paths(tmp_path, capsys):
    """A BARE checkpoint (e.g. an AE generator: plain flax vars, no 'unet'
    wrapper) must honour ignore_keys written as natural state-dict paths
    ('params/decoder'), not the synthetic wrapped view — the reference
    matches keys as they appear in the actual state dict (ddpm.py:195-199)."""
    bare = {"params": {
        "encoder": {"kernel": np.full((2, 2), 1.0, np.float32)},
        "decoder": {"kernel": np.full((2, 2), 2.0, np.float32)},
    }}
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(1, {"params": bare})
    mgr.wait()
    tpl = {"params": {
        "encoder": {"kernel": np.zeros((2, 2), np.float32)},
        "decoder": {"kernel": np.zeros((2, 2), np.float32)},
    }}
    out = load_partial(tpl, tmp_path / "ck", ignore_keys=("params/decoder",))
    np.testing.assert_allclose(out["params"]["encoder"]["kernel"], 1.0)
    np.testing.assert_allclose(out["params"]["decoder"]["kernel"], 0.0)  # dropped
    # an ignore key that matches nothing warns instead of silently no-opping
    load_partial(tpl, tmp_path / "ck", ignore_keys=("no/such/prefix",))
    assert "matched no checkpoint leaves" in capsys.readouterr().out
