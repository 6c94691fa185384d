"""Device mesh + sharding helpers.

Replaces the reference's entire distributed surface — ignite
`idist.Parallel(backend="nccl")` per-rank process spawn + DDP wrap +
DistributedSampler (ccdm/ddpm_train.py:32-39, trainer.py:719-786) and
Lightning `strategy="ddp"` (latentdiffusion/main.py:603-613) — with a
single `jax.sharding.Mesh`:

  * data parallelism = batch axis sharded over 'data'; gradient all-reduce
    is the XLA psum jit inserts, not a wrapper;
  * optional 'model' axis for spatial/tensor sharding of the 512² UNet;
  * rank-0 gating (`idist.one_rank_only`) becomes `jax.process_index()==0`;
  * DistributedSampler becomes host-local data +
    `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_mesh_for_batch", "shard_batch", "replicate", "is_chief",
           "maybe_initialize_distributed"]


def maybe_initialize_distributed() -> None:
    """Multihost bring-up (replaces idist.Parallel / PL ddp process spawn):
    one process per host, coordinated through jax.distributed.  No-op
    unless a coordinator is configured (env JAX_COORDINATOR_ADDRESS or a
    recognised cluster environment) or jax already initialised."""
    import os

    # ORDER MATTERS: probing jax.process_count() would itself initialise the
    # XLA backend, after which jax.distributed.initialize() raises — so the
    # no-coordinator fast path must be decided from the environment alone
    if not (os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already" in str(e).lower() or "must be called before" in str(e).lower():
            # a second CLI call in-process, or a caller that already brought
            # the backend up — distributed state is whatever it is; proceed
            print(f"WARNING: jax.distributed.initialize skipped: {e}")
        else:
            raise


def _num_slices(devices) -> int:
    """Distinct ICI domains among `devices` (multi-slice topologies expose
    `slice_index`; single-slice and non-TPU devices count as one)."""
    return len({getattr(d, "slice_index", 0) or 0 for d in devices})


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh over all (or given) devices; data fills the
    remainder by default.

    Device ordering is topology-aware, not enumeration order: the 'model'
    axis carries the heaviest traffic (spatial-sharding conv halo
    exchanges every block), so its devices must be ICI nearest neighbours
    on the physical torus — `mesh_utils.create_device_mesh` solves that
    assignment; on multi-slice topologies (chips connected over DCN, no
    ICI between slices) `create_hybrid_device_mesh` keeps 'model' entirely
    inside each slice and spreads only 'data' (one psum per step) across
    the DCN — the "collectives ride ICI, not DCN" layout.  Non-TPU
    backends (the CPU test mesh) reduce to the plain reshape."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    try:
        from jax.experimental import mesh_utils

        n_slices = _num_slices(devices)
        if n_slices > 1 and data % n_slices == 0:
            arr = mesh_utils.create_hybrid_device_mesh(
                (data // n_slices, model), (n_slices, 1), devices=devices)
        else:
            arr = mesh_utils.create_device_mesh((data, model), devices=devices)
        return Mesh(arr, ("data", "model"))
    except Exception:
        # subset meshes / exotic topologies mesh_utils cannot solve
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, ("data", "model"))


def make_mesh_for_batch(batch_size: int, model: int = 1) -> Mesh:
    """Mesh whose data axis divides `batch_size` — single-host runs use the
    largest batch divisor <= the available data extent instead of crashing
    when batch % n_devices != 0 (e.g. a debug batch of 2 on an 8-device
    backend).  Multihost runs never subset (a device-prefix mesh could
    exclude some process's local devices entirely), they demand a divisible
    batch up front."""
    devices = list(jax.devices())
    max_data = max(1, len(devices) // model)
    if jax.process_count() > 1:
        assert len(devices) % model == 0, (
            f"multihost: {len(devices)} devices not divisible by model={model} "
            f"(a device-prefix subset could strand a process)")
        assert batch_size % max_data == 0, (
            f"multihost: global batch {batch_size} must be divisible by the "
            f"data axis {max_data} ({len(devices)} devices / model={model})")
        return make_mesh(data=max_data, model=model, devices=devices)
    data = max(d for d in range(1, max_data + 1) if max(1, batch_size) % d == 0)
    use = devices[: data * model]
    if len(use) < len(devices) and is_chief():
        print(f"mesh: batch_size={batch_size} not divisible by {len(devices)} devices; "
              f"using {len(use)} ({data}x{model})")
    return make_mesh(data=data, model=model, devices=use)


def shard_batch(mesh: Mesh, batch, batch_axis: str = "data"):
    """Place a host-local batch pytree with the leading axis sharded over
    the data axis (per-process shards when multihost)."""
    sharding = NamedSharding(mesh, P(batch_axis))

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def is_chief() -> bool:
    """Rank-0 gate (reference: idist.one_rank_only / rank_zero_only)."""
    return jax.process_index() == 0
