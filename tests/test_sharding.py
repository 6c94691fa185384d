"""Multi-device (8 virtual CPU) sharding tests — the pjit path that replaces
the reference's NCCL DDP (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from jointimagegeneration_tpu.parallel import make_mesh, replicate, shard_batch


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = shard_batch(mesh, batch)
    shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
    assert shard_shapes == {(1, 2)}


def test_replicated_train_step_psum_equivalence():
    """Gradient of a batch-sharded loss must equal the single-device value —
    i.e. jit inserted the all-reduce that DDP does by hand."""
    mesh = make_mesh()
    w = jnp.ones((4,))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    x = np.random.default_rng(0).standard_normal((8, 4)).astype(np.float32)
    g_single = jax.grad(loss)(w, jnp.asarray(x))

    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(w, NamedSharding(mesh, P()))
        g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded), rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    # light=True: tiny stage-1 (the deep-structure variant the driver runs
    # itself takes ~10 min of CPU compile; the wrapper checks the
    # entrypoint contract, not the deep program)
    __graft_entry__.dryrun_multichip(8, light=True)


@pytest.mark.slow
def test_sharded_batch_sampling_matches_unsharded():
    """Milestone config #5: batched multi-volume sampling sharded over the
    mesh must produce bit-identical volumes to the unsharded program."""
    import jax.numpy as jnp
    from jointimagegeneration_tpu.models import MaskSampler

    ms = MaskSampler.create(
        num_classes=4, time_steps=10, model_channels=8, channel_mult=(1, 2),
        attention_resolutions=(), num_res_blocks=1, num_head_channels=4,
    )
    spatial = (2, 8, 8)
    params = ms.init_params(jax.random.key(0), spatial, cond_channels=0)
    sample = jax.jit(lambda p, k: ms.sample(p, k, (8, *spatial), num_steps=3))
    ref = np.asarray(sample(params, jax.random.key(1)))

    mesh = make_mesh()
    with mesh:
        p_sharded = jax.device_put(params, NamedSharding(mesh, P()))
        out = np.asarray(sample(p_sharded, jax.random.key(1)))
    np.testing.assert_array_equal(ref, out)


@pytest.mark.slow
def test_spatial_sharding_unet_matches_unsharded():
    """Spatial ('model'-axis) sharding of UNet activations: XLA's SPMD conv
    partitioner must reproduce the unsharded result exactly."""
    import jax.numpy as jnp
    from jointimagegeneration_tpu.nn import UNet

    kwargs = dict(model_channels=8, out_channels=2, num_res_blocks=1,
                  attention_resolutions=(), channel_mult=(1, 2), dims=2, num_head_channels=4)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 2))
    t = jnp.asarray([3.0, 5.0])
    m_plain = UNet(**kwargs)
    params = m_plain.init(jax.random.key(1), x, t)
    ref = np.asarray(m_plain.apply(params, x, t))

    m_sharded = UNet(**kwargs, spatial_axis="model")
    mesh = make_mesh(data=2, model=4)
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = np.asarray(jax.jit(m_sharded.apply)(ps, xs, t))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_spatially_sharded_slice_sampling_matches():
    """Stage-2 DDIM slice chain with activations sharded over 'model':
    the north-star deployment shape (one volume, 8-way sharded UNet)."""
    import jax.numpy as jnp
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import SliceLDM

    def build(spatial_axis):
        return SliceLDM.create(
            timesteps=20, model_channels=8, channel_mult=(1, 2), attention_resolutions=(),
            num_res_blocks=1, num_head_channels=4, spatial_axis=spatial_axis,
        )

    plain = build(None)
    params = plain.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(plain.diffusion, 4)
    cond = jax.random.normal(jax.random.key(1), (1, 16, 16, 2))
    ref = np.asarray(plain.sample_slice(params, jax.random.key(2), cond, ddim))

    sharded = build("model")
    mesh = make_mesh(data=1, model=8)
    with mesh:
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        cs = jax.device_put(cond, NamedSharding(mesh, P(None, "model")))
        out = np.asarray(
            jax.jit(lambda p, c, k: sharded.sample_slice(p, k, c, ddim))(ps, cs, jax.random.key(2))
        )
    np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-4)


def test_make_mesh_for_batch_uses_compatible_subset():
    """batch sizes that don't divide the device count get the largest
    compatible data axis instead of a sharding crash (CLI debug configs)."""
    from jointimagegeneration_tpu.parallel.mesh import make_mesh_for_batch

    assert make_mesh_for_batch(2).devices.size == 2
    assert make_mesh_for_batch(8).devices.size == 8
    assert make_mesh_for_batch(3).devices.size == 3
    assert make_mesh_for_batch(6).devices.size == 6  # largest divisor, not gcd
    assert make_mesh_for_batch(4, model=2).devices.size == 8
    assert make_mesh_for_batch(16).devices.size == 8


def test_make_mesh_covers_all_devices_topology_path():
    """make_mesh routes through mesh_utils.create_device_mesh (topology-aware
    assignment on real TPU; plain reshape on CPU) — every device appears
    exactly once whatever the ordering."""
    mesh = make_mesh(data=4, model=2)
    ids = sorted(d.id for d in mesh.devices.flat)
    assert ids == sorted(d.id for d in jax.devices())


def test_make_mesh_hybrid_multislice(monkeypatch):
    """On multi-slice topologies the 'model' axis must stay inside a slice
    (ICI) and only 'data' crosses the DCN: make_mesh must call
    create_hybrid_device_mesh with the per-slice mesh (data/n_slices, model)
    and dcn mesh (n_slices, 1)."""
    from jax.experimental import mesh_utils

    from jointimagegeneration_tpu.parallel import mesh as mesh_mod

    calls = {}

    def fake_hybrid(mesh_shape, dcn_mesh_shape, devices=None, **kw):
        calls["mesh_shape"] = tuple(mesh_shape)
        calls["dcn_mesh_shape"] = tuple(dcn_mesh_shape)
        import numpy as np

        full = tuple(m * d for m, d in zip(mesh_shape, dcn_mesh_shape))
        return np.asarray(devices).reshape(full)

    monkeypatch.setattr(mesh_mod, "_num_slices", lambda devs: 2)
    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", fake_hybrid)
    mesh = make_mesh(data=4, model=2)
    assert calls == {"mesh_shape": (2, 2), "dcn_mesh_shape": (2, 1)}
    assert mesh.shape == {"data": 4, "model": 2}
