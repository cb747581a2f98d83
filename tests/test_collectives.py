# coding=utf-8
"""Explicit collectives under shard_map on the 8-device CPU mesh: the
local-gradient all-gather reproduces the reference's DDP semantics."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from centerclip_tpu.parallel.collectives import (all_gather,
                                                 all_gather_local_grads, psum)
from centerclip_tpu.parallel.mesh import create_mesh


def test_all_gather_local_grads_forward_and_backward(rng):
    mesh = create_mesh()
    n = len(mesh.devices.ravel())
    B, D = 2, 4
    x = rng.normal(size=(n * B, D)).astype(np.float32)

    def per_device_loss(xs):
        g = all_gather_local_grads(xs, "data")     # [n*B, D]
        # toy loss over the *global* gathered tensor, one value per device
        # (the local-slot substitution prevents static replication inference)
        return jnp.sum(g * g)[None]

    f = shard_map(per_device_loss, mesh=mesh, in_specs=P("data"),
                  out_specs=P("data"))

    # forward: every device sees the full tensor -> identical losses
    losses = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(losses, (x * x).sum(), rtol=1e-5)

    # backward: grads flow only through the local shard on each device;
    # summing the per-device losses (each = L) gives grad 2x per row since
    # each row is local to exactly one device
    grad = jax.grad(lambda xx: shard_map(
        per_device_loss, mesh=mesh, in_specs=P("data"),
        out_specs=P("data"))(xx).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), 2 * x, rtol=1e-4)


def test_plain_all_gather_and_psum(rng):
    mesh = create_mesh()
    n = len(mesh.devices.ravel())
    x = rng.normal(size=(n, 3)).astype(np.float32)

    def fn(xs):
        # per-device copies: [1, n, 3] gathered and [1] summed
        return all_gather(xs, "data")[None], psum(jnp.sum(xs), "data")[None]

    g, s = shard_map(fn, mesh=mesh, in_specs=P("data"),
                     out_specs=(P("data"), P("data")))(jnp.asarray(x))
    g, s = np.asarray(g), np.asarray(s)
    for d in range(n):
        np.testing.assert_allclose(g[d], x, rtol=1e-6)
        np.testing.assert_allclose(s[d], x.sum(), rtol=1e-5)


def test_data_shard_geometry(monkeypatch):
    """Host-loader sharding follows data-axis row ownership, not process
    count: processes whose devices all sit on the same data rows (model or
    pipe axis wider than one host) must read the same global-batch slice."""
    from centerclip_tpu.parallel import mesh as mesh_mod

    def fake(pc, pi, local):
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        monkeypatch.setattr(jax, "local_device_count", lambda: local)

    # pure DP: classic DistributedSampler split
    fake(2, 1, 4)
    assert mesh_mod.data_shard_geometry() == (1, 2)
    # 2 proc x 4 dev, tp=2: data rows disjoint per process -> still split
    assert mesh_mod.data_shard_geometry(tensor_parallel=2) == (1, 2)
    # 2 proc x 1 dev, tp=2: both processes sit on data row 0 -> same shard
    fake(2, 1, 1)
    assert mesh_mod.data_shard_geometry(tensor_parallel=2) == (0, 1)
    fake(2, 0, 1)
    assert mesh_mod.data_shard_geometry(tensor_parallel=2) == (0, 1)
    # 4 proc x 2 dev, pipe=4: pairs of processes share a row set
    fake(4, 3, 2)
    assert mesh_mod.data_shard_geometry(pipeline_parallel=4) == (1, 2)
    fake(4, 1, 2)
    assert mesh_mod.data_shard_geometry(pipeline_parallel=4) == (0, 2)
    # fractional-process spans are rejected
    fake(3, 0, 2)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mesh_mod.data_shard_geometry(tensor_parallel=3)
    # single process: always the trivial shard
    fake(1, 0, 8)
    assert mesh_mod.data_shard_geometry(tensor_parallel=8) == (0, 1)
