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
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def current_mesh():
    """The ambient compute mesh at trace time, or ``None``.

    Public-API replacement for reading ``thread_resources.env.physical_mesh``
    off ``jax._src`` (VERDICT r3 next #8).  Resolution order:

    1. ``jax.sharding.get_abstract_mesh()`` — the new-style context set by
       ``jax.set_mesh`` / ``jax.sharding.use_mesh``;
    2. ``jax.interpreters.pxla.thread_resources`` — the legacy
       ``with mesh:`` context manager's store.  Deprecated since jax 0.8.2
       but still a *public* namespace; guarded so its eventual removal
       degrades to (1) instead of breaking TP/SP/PP at import time.

    Callers only read ``.empty`` / ``.axis_names`` / ``.shape``, which both
    ``Mesh`` and ``AbstractMesh`` expose.
    """
    abstract = jax.sharding.get_abstract_mesh()
    if not abstract.empty:
        return abstract
    try:
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla
            legacy = pxla.thread_resources.env.physical_mesh
        if not legacy.empty:
            return legacy
    except (ImportError, AttributeError):  # removed in a future jax
        pass
    return None


def create_mesh(num_devices: int = 0,
                devices: Optional[list] = None,
                tensor_parallel: int = 1,
                pipeline_parallel: int = 1) -> Mesh:
    """Device mesh.  `num_devices <= 0` uses every visible device (the
    analogue of the reference counting GPUs, main.py:44-53).

    `tensor_parallel == 1` (the default, and the reference's only mode)
    gives the 1-D data mesh.  `tensor_parallel > 1` folds the devices into
    a 2-D ``(data, model)`` grid: batches stay sharded on `data`, while
    `param_shardings` splits the transformer matmul weights on `model`
    (Megatron-style column/row parallelism) — a capability the CUDA
    reference does not have (it is DDP-only).  `pipeline_parallel > 1`
    instead folds them into ``(data, pipe)`` for the GPipe schedule in
    `parallel/pipeline.py` (TP and PP are mutually exclusive for now).
    The second axis is the fastest-varying so its collectives ride
    adjacent-chip ICI links."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    tp = max(int(tensor_parallel), 1)
    pp = max(int(pipeline_parallel), 1)
    if tp > 1 and pp > 1:
        raise ValueError("tensor_parallel and pipeline_parallel cannot be "
                         "combined on one mesh")
    if tp == 1 and pp == 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    second, name = (tp, MODEL_AXIS) if tp > 1 else (pp, PIPE_AXIS)
    if len(devices) % second:
        raise ValueError(
            f"{name} extent {second} does not divide {len(devices)} devices")
    grid = np.asarray(devices).reshape(len(devices) // second, second)
    return Mesh(grid, (DATA_AXIS, name))


def shard_tokens(x):
    """Megatron-style sequence-parallel activation constraint.

    Shards a ``[batch, tokens, ...]`` activation as ``(data, model)`` so the
    LayerNorm/residual regions between the column/row-parallel matmuls hold
    only ``1/tp`` of the tokens per chip — the activation-memory half of
    Megatron-LM sequence parallelism (arXiv:2205.05198).  GSPMD materialises
    the boundary collectives: an all-gather of tokens feeding the
    column-parallel QKV/up-projections and a reduce-scatter replacing the
    all-reduce after the row-parallel contractions (same bytes moved, less
    live memory).

    No-op unless traced inside a mesh context whose axes include ``model``
    (jit outside a mesh cannot resolve a PartitionSpec, and a 1-D data mesh
    has no model axis to shard over) — so eval paths and single-chip runs
    are untouched.
    """
    m = current_mesh()
    if m is None or MODEL_AXIS not in m.axis_names:
        return x
    spec = P(DATA_AXIS, MODEL_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def data_shard_geometry(tensor_parallel: int = 1,
                        pipeline_parallel: int = 1):
    """``(shard_index, shard_count)`` for the host data pipeline.

    With a pure data mesh every process owns a distinct contiguous run of
    batch rows, so the loader shards by process — the DistributedSampler
    analogue (reference data_dataloaders.py:26-39).  When the mesh's second
    axis (model or pipe) is WIDER than one process's device count, the
    canonical ``reshape(data, second)`` layout makes consecutive processes
    share the same data-axis rows: the batch is replicated across them, and
    ``jax.make_array_from_process_local_data`` then expects each of those
    processes to supply the SAME full row set — sharding the loader by
    ``process_count`` would silently halve the global batch (found while
    building the cross-process TP smoke, tests/test_multiprocess.py).
    """
    pc, pi = jax.process_count(), jax.process_index()
    second = max(int(tensor_parallel), 1) * max(int(pipeline_parallel), 1)
    local = jax.local_device_count()
    if pc == 1 or second <= local:
        return pi, pc
    if second % local:
        raise ValueError(
            f"model/pipe extent {second} spans a fractional process "
            f"(local devices {local}); pick extents so one process's "
            f"devices divide the second mesh axis")
    group = second // local  # processes sharing one data-axis row set
    return pi // group, pc // group


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fetch_replicated(mesh: Mesh, tree):
    """COLLECTIVE: gather a cross-process-sharded pytree to host numpy on
    every process.

    TP/FSDP/PP shard params (and fp32 Adam moments) over mesh axes that can
    span hosts; the rank-0-only eval/export/checkpoint paths then need
    fully-addressable copies — ``jax.device_get`` of a non-addressable array
    raises, and a jit over one silently becomes a multi-host computation
    that deadlocks when only rank 0 dispatches it (found by the cross-host
    TP leg of tests/test_multiprocess.py).  Every process must call this
    (the resharding is an all-gather over ICI/DCN); afterwards the result
    is plain host data, safe for single-rank use.
    """
    rep = jax.jit(lambda t: t, out_shardings=replicated(mesh))(tree)
    return jax.device_get(rep)


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


def _tp_spec(path, leaf) -> P:
    """Megatron-style PartitionSpec for one param leaf.

    Column-parallel (split on output features): the fused QKV projection
    `in_proj` and the MLP up-projection `c_fc` — their biases shard the
    same way.  Row-parallel (split on input features): `out_proj` and
    `c_proj`, biases replicated (they add after the contraction).  GSPMD
    propagates the activation shardings and inserts the reduce for the
    row-parallel contractions; everything else (embeddings, LayerNorms,
    projections, cluster modules) is replicated.
    """
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    owner = names[-2] if len(names) >= 2 else ""
    if owner in ("in_proj", "c_fc"):
        if names[-1] == "kernel" and leaf.ndim == 2:
            return P(None, MODEL_AXIS)
        if names[-1] == "bias" and leaf.ndim == 1:
            return P(MODEL_AXIS)
    if owner in ("out_proj", "c_proj") and names[-1] == "kernel" \
            and leaf.ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def _with_fsdp(spec: P, leaf, data_size: int) -> P:
    """Fold ZeRO-style data-axis sharding into a param's PartitionSpec.

    The largest axis not already taken by tensor parallelism is sharded
    over `data` when its size divides the data-axis extent; params with
    no such axis (scalars, small biases, odd dims) stay as they were.
    XLA all-gathers the weight shards where layers consume them and
    reduce-scatters the grads — and because the optimizer moments inherit
    the params' placement (tx.init zeros_like), the fp32 Adam state is
    sharded too, the bulk of ZeRO's memory win."""
    if leaf.ndim == 0:
        return spec
    taken = list(spec) + [None] * (leaf.ndim - len(spec))
    candidates = [i for i in range(leaf.ndim)
                  if taken[i] is None and leaf.shape[i] % data_size == 0
                  and leaf.shape[i] >= data_size]
    if not candidates:
        return spec
    ax = max(candidates, key=lambda i: leaf.shape[i])
    taken[ax] = DATA_AXIS
    return P(*taken)


def param_shardings(mesh: Mesh, tree, fsdp: bool = False):
    """NamedSharding tree for the params.

    Replicated on a 1-D mesh; Megatron column/row-parallel on a
    ``(data, model)`` mesh; with `fsdp` additionally ZeRO-sharded over
    the data axis (composable with TP)."""
    tp = MODEL_AXIS in mesh.axis_names
    data_size = mesh.shape[DATA_AXIS]

    def spec(path, leaf):
        s = _tp_spec(path, leaf) if tp else P()
        if fsdp:
            s = _with_fsdp(s, leaf, data_size)
        return NamedSharding(mesh, s)

    if not tp and not fsdp:
        return jax.tree.map(lambda _: replicated(mesh), tree)
    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_params(mesh: Mesh, tree, fsdp: bool = False):
    """Place the param tree on the mesh per `param_shardings`.

    `may_alias=False`: the train step donates its state, and an aliased
    placement (device_put is free to alias when the layout already
    matches) would let that donation delete the caller's original tree
    out from under it (observed with the dryrun's scalar logit_scale).
    """
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s, may_alias=False),
        tree, param_shardings(mesh, tree, fsdp=fsdp))


def process_barrier(name: str, timeout_ms: int = 3600_000) -> None:
    """Cross-process barrier via the coordination service.

    NOT a device collective: Gloo/ICI collectives carry short rendezvous
    deadlines (~30 s), while rank-0-only work — per-epoch eval,
    checkpointing (reference main.py:250-272 does both on the master) —
    can take minutes.  Without this, a non-zero rank finishing its epoch
    runs ahead (or exits, tripping the 300 s shutdown barrier and killing
    rank 0 — observed in tests/test_multiprocess.py).  No-op when
    single-process.

    Implementation rides orbax's public multihost barrier (itself the
    coordination-service KV barrier, ``client.wait_at_barrier``) instead of
    importing ``jax._src.distributed`` directly — jax exposes no public
    handle to the coordination client, and orbax is already a hard
    dependency (train/state.py)."""
    if jax.process_count() <= 1:
        return
    from orbax.checkpoint import multihost
    multihost.get_barrier_sync_fn()(key=name, timeout_ms=timeout_ms)
