# coding=utf-8
"""Device mesh and sharding helpers.

The reference's process-per-GPU DDP + NCCL stack (main.py:54-62,123-125,
utils/dist_utils.py:101-122) maps to a single-controller JAX program with a
1-D ``data`` mesh over all chips: parameters are replicated, batches are
sharded on the data axis, and XLA lowers the gradient reductions and the
contrastive feature all-gather to ICI collectives.  Multi-host runs call
`jax.distributed.initialize` once and use the same code path.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: int = 0,
                devices: Optional[list] = None) -> Mesh:
    """1-D data-parallel mesh.  `num_devices <= 0` uses every visible device
    (the analogue of the reference counting GPUs, main.py:44-53)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along axis 0.

    In multi-host runs each process holds its own slice of the global batch
    (the DistributedSampler analogue) and
    `jax.make_array_from_process_local_data` assembles the global array.

    The video tensor is flattened host-side to [B*pairs*T, C, H, W] (a free
    numpy view): XLA's chosen tiled layout for a 6-D uint8 device parameter
    forces an extra full repack before the patchify transpose (~1.1 ms/step
    at the flagship shape), which the 4-D parameter avoids.  The model
    accepts either shape (clip4clip.get_visual_output).
    """
    v = batch.get("video") if hasattr(batch, "get") else None
    if v is not None and v.ndim == 6:
        batch = dict(batch)
        batch["video"] = v.reshape(-1, *v.shape[-3:])
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def process_barrier(name: str, timeout_ms: int = 3600_000) -> None:
    """Cross-process barrier via the coordination service.

    NOT a device collective: Gloo/ICI collectives carry short rendezvous
    deadlines (~30 s), while rank-0-only work — per-epoch eval,
    checkpointing (reference main.py:250-272 does both on the master) —
    can take minutes.  Without this, a non-zero rank finishing its epoch
    runs ahead (or exits, tripping the 300 s shutdown barrier and killing
    rank 0 — observed in tests/test_multiprocess.py).  No-op when
    single-process."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        name, timeout_in_ms=timeout_ms)
