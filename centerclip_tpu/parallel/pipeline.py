# coding=utf-8
"""GPipe-style pipeline parallelism over a ``(data, pipe)`` device mesh.

A third scaling strategy beyond the reference's DDP (reference is
DDP-only: main.py:54-62) and this framework's tensor parallelism: the
transformer block stack is split into `pipe` contiguous stages, the batch
into microbatches, and activations flow stage-to-stage over ICI
(`lax.ppermute`) on a static schedule — `lax.scan` over ``M + S - 1``
ticks, so the whole pipeline lives inside one jitted train step and
differentiates through (the backward pass is the reverse schedule, derived
by AD; `ppermute`'s transpose is the inverted permutation).

Design notes:
* Stage weights are device-resident: the per-block param subtrees are
  stacked to a ``[S, layers_per_stage, ...]`` tree and `shard_map`-split on
  the `pipe` axis, so each chip only ever holds its own stage's weights in
  the pipeline body.  The canonical checkpoint schema (per-block
  ``resblocks_i`` names) is untouched — stacking happens inside the step.
* The vision tower's token-count changes (cluster layers between blocks)
  partition the stack into homogeneous segments; each segment pipelines
  independently and the cluster ops run under plain GSPMD between them
  (models/clip.py wires this).
* Padding-free: microbatch rows must divide evenly; the caller sees a
  ``ValueError`` at trace time otherwise (static shapes — no silent drop).
* Each stage application is wrapped in `jax.checkpoint`, so the scan saves
  only the inter-stage activation buffers, not per-layer internals.

Measured cost (benchmarks/parallelism_bench.py, 8-device mesh, equal
global batch, full fwd+bwd+optimizer step; losses bit-identical across
all configs — the strategies are exact rearrangements, not approximations):

    config        step vs pure DP     GPipe bubble model   residual
    dp4_pp2_m2        1.95x           1.33x                1.30
    dp4_pp2_m4        1.68x           1.20x                1.34
    dp4_pp2_m8        1.60x           1.11x                1.42
    dp2_pp4_m4        2.34x           1.43x                1.34
    dp2_pp4_m8        1.67x           1.27x                1.21
    dp2_pp4_m16       1.45x           1.16x                1.22
    (dp4_tp2 1.15x, dp4_tp2_sp 1.01x, dp8_fsdp 1.06x for comparison)

The ~1.2-1.4x residual over the analytic bubble is the ppermute hop per
tick, the bubble-tick garbage compute (every stage computes every tick;
`jnp.where` keeps shapes static), and the lower arithmetic intensity of
microbatch-sized matmuls.  **When to use**: PP pays only when the model
or optimizer state does not fit replicated/FSDP-sharded — prefer plain
DP, then FSDP (~6% step cost for 1/N param+moment memory), then TP+SP
(~1% at ViT-B sizes, 1/tp activation memory) before reaching for PP; when
PP is required, run M >= 4*S microbatches (the 0/auto default picks this)
— deeper splits amortise both the bubble and the garbage ticks.
"""
from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, PIPE_AXIS, current_mesh


def context_pipe_size() -> int:
    """Extent of the `pipe` axis of the trace-time context mesh, or 0.

    Pipelining only activates when the computation is being traced inside
    a ``with mesh:`` whose axes include `pipe` (the Trainer's epoch loop);
    eval encoders and single-chip runs trace outside one and fall back to
    the sequential block loop.
    """
    m = current_mesh()
    if m is None or PIPE_AXIS not in m.axis_names:
        return 0
    return m.shape[PIPE_AXIS]


def pipeline_blocks(block_params: Sequence, apply_one: Callable,
                    x: jax.Array, *, microbatches: int = 0) -> jax.Array:
    """Run ``x`` through a homogeneous block stack on the GPipe schedule.

    block_params: per-block param subtrees (identical structure).  The
      largest prefix divisible by the pipe extent is pipelined
      (``layers_per_stage = len(block_params) // S`` blocks per stage);
      any remainder runs sequentially afterwards.
    apply_one(params, x) -> x: applies a single block functionally.
    x: ``[rows, ...]`` activations, leading axis (data-)sharded.
    microbatches: GPipe microbatch count M; 0 picks the largest M <= 4*S
      that divides the per-data-shard rows (benchmarks/parallelism_bench.py:
      on the 8-device mesh M=4*S cut PP overhead from 2.2x to 1.7x pure DP
      at S=2 — deeper splits amortise the bubble, (S-1)/(M+S-1), and the
      bubble-tick garbage compute).  Bubble fraction is ``(S-1)/(M+S-1)``.
    """
    mesh = current_mesh()
    if mesh is None or PIPE_AXIS not in mesh.axis_names:
        raise RuntimeError("pipeline_blocks must be traced inside a "
                           "(data, pipe) mesh context")
    S = mesh.shape[PIPE_AXIS]
    data = mesh.shape[DATA_AXIS]
    n = len(block_params)
    lps = n // S
    head, tail = list(block_params[:lps * S]), list(block_params[lps * S:])
    if lps == 0:
        for p in tail:
            x = apply_one(p, x)
        return x

    rows = x.shape[0]
    if microbatches:
        M = int(microbatches)
    else:
        per = max(rows // max(data, 1), 1)
        M = max(m for m in range(1, min(4 * S, per) + 1) if per % m == 0)
    if rows % data or (rows // data) % M:
        raise ValueError(
            f"pipeline_parallel: {rows} rows do not split into data={data} "
            f"shards of {M} microbatches; pick batch/microbatch counts so "
            f"rows/data/microbatches divide evenly")

    stacked = jax.tree.map(
        lambda *ls: jnp.stack(ls).reshape(S, lps, *ls[0].shape), *head)
    p_specs = jax.tree.map(
        lambda a: P(PIPE_AXIS, *([None] * (a.ndim - 1))), stacked)
    x_spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))

    def stage_apply(local_p, h):
        def body(c, p):
            return apply_one(p, c), None
        h, _ = jax.lax.scan(body, h, local_p)
        return h

    def gpipe(stacked_local, xl):
        local_p = jax.tree.map(lambda a: a[0], stacked_local)
        mb = xl.shape[0] // M
        xs = xl.reshape(M, mb, *xl.shape[1:])
        sidx = jax.lax.axis_index(PIPE_AXIS)
        vary = (DATA_AXIS, PIPE_AXIS)
        buf = jax.lax.pcast(jnp.zeros((mb,) + xl.shape[1:], xl.dtype),
                            vary, to="varying")
        out = jax.lax.pcast(jnp.zeros((M, mb) + xl.shape[1:], xl.dtype),
                            vary, to="varying")

        def tick(carry, t):
            buf, out = carry
            # stage 0 ingests microbatch t (clamped past the drain phase);
            # every other stage consumes its predecessor's permuted buffer
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, M - 1), 0, keepdims=False)
            cur = jnp.where(sidx == 0, feed, buf)
            y = jax.checkpoint(stage_apply)(local_p, cur)
            # the last stage retires microbatch t-(S-1) once warm
            widx = t - (S - 1)
            updated = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(widx, 0, M - 1), 0)
            out = jnp.where(jnp.logical_and(sidx == S - 1, widx >= 0),
                            updated, out)
            buf = jax.lax.ppermute(y, PIPE_AXIS,
                                   [(i, (i + 1) % S) for i in range(S)])
            return (buf, out), None

        (_, out), _ = jax.lax.scan(tick, (buf, out), jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum replicates them
        # (one activation all-reduce over pipe per segment)
        out = jax.lax.psum(out, PIPE_AXIS)
        return out.reshape(xl.shape)

    x = jax.shard_map(gpipe, mesh=mesh, in_specs=(p_specs, x_spec),
                      out_specs=x_spec)(stacked, x)
    for p in tail:
        x = apply_one(p, x)
    return x
