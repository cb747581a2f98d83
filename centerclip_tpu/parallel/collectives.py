# coding=utf-8
"""Explicit SPMD collectives (reference: modules/utils.py:25-64).

The training loop expresses the global contrastive loss under GSPMD, where
XLA inserts the gathers.  These explicit versions exist for `shard_map`-style
code: `all_gather_local_grads` reproduces the reference's trick of gathering
features from every device while letting gradients flow only through the
local shard (modules/utils.py:47-64 replaces the local slot of the gathered
list with the grad-carrying local tensor).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_local_grads(x: jax.Array, axis_name: str) -> jax.Array:
    """All-gather along `axis_name` with gradients only through the local
    shard.

    Inside shard_map/pmap: returns [world * B, ...] where the slot belonging
    to this device carries gradients and the remote slots are
    stop-gradient'd.  Summed across devices, the backward equals the full
    gradient of a loss computed on the gathered tensor — exactly the
    DDP-averaged semantics of the reference.
    """
    gathered = jax.lax.stop_gradient(
        jax.lax.all_gather(x, axis_name, tiled=False))  # [world, B, ...]
    idx = jax.lax.axis_index(axis_name)
    world = jax.lax.axis_size(axis_name)
    # replace slot `idx` with the grad-carrying local tensor:
    # out = gathered + onehot(idx) * (x - gathered)
    onehot = jax.nn.one_hot(idx, world, dtype=x.dtype)
    shaped = onehot.reshape((world,) + (1,) * x.ndim)
    out = gathered + shaped * (x[None] - gathered)
    return out.reshape((-1,) + x.shape[1:])


def all_gather(x: jax.Array, axis_name: str) -> jax.Array:
    """Plain tiled all-gather (the eval-side gather)."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def psum(x: jax.Array, axis_name: str) -> jax.Array:
    """Cross-device sum (gradient reduction / AverageMeter sync,
    reference: metrics.py:112-115)."""
    return jax.lax.psum(x, axis_name)
