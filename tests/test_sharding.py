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


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
