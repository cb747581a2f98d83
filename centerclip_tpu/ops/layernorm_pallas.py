# coding=utf-8
"""Fused LayerNorm Pallas kernel (TPU) — **research artifact, not wired**.

Round-2 disposition: correct (oracle + grad tests in
tests/test_layernorm_pallas.py, compiled equality on TPU) but wiring it
into the towers measured ~5% SLOWER end-to-end (895 vs ~940 clips/s on
the ViT-B/32 encode).  The profiled ~0.5 ms `convert_reduce_fusion`
instances looked like pure LN overhead, but XLA fuses that lowering into
the consumer matmul's operand read — an opaque custom call forfeits the
fusion, so the normalized tensor round-trips HBM *and* pays kernel
launches.  Lesson recorded: a Pallas kernel must beat the *fused*
neighborhood, not the isolated op (same conclusion as
ops/kmedoids_pallas.py; the attention kernel wins precisely because XLA
cannot fuse across the two attention matmuls).

Original rationale: the towers pin LayerNorm to fp32 (reference runs LN in
fp32 under AMP, modules/clip.py:163-170); this kernel reads a bf16
row-tile into VMEM once, computes the fp32 statistics and normalisation
in-core, and writes bf16 back — exact fp32 LN semantics, one pass.

Differentiable: the custom VJP recomputes x-hat in VMEM (residuals are the
bf16 input + fp32 gamma) and accumulates dgamma/dbeta across the
sequential grid, like the attention kernel's mask cotangent
(ops/attention_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid program: in+out bf16 blocks are double-buffered; 512 rows of
# D=768 is ~3.1 MB of blocks + ~3 MB fp32 temporaries — comfortable in the
# ~16 MB/core VMEM alongside the [D] params
_BLOCK_ROWS = 512


def _ln_fwd_kernel(eps: float, x_ref, g_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                     # [R, D] fp32
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(eps: float, x_ref, g_ref, dy_ref,
                   dx_ref, dg_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    D = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    dyg = dy * g_ref[...]
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = inv * (dyg - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dg_ref[...] += jnp.sum(dy * xhat, axis=0)              # [1, D]
    db_ref[...] += jnp.sum(dy, axis=0)


def _pad_rows(arr, Rb):
    R = arr.shape[0]
    pad = (-R) % Rb
    if pad:
        arr = jnp.pad(arr, ((0, pad), (0, 0)))
    return arr, R + pad


def _ln_fwd_call(x, gamma, beta, eps, interpret):
    R, D = x.shape
    Rb = min(_BLOCK_ROWS, R)
    xp, Rp = _pad_rows(x, Rb)
    block = pl.BlockSpec((Rb, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pblock = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps),
        grid=(Rp // Rb,),
        in_specs=[block, pblock, pblock],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(xp, gamma.reshape(1, D).astype(jnp.float32),
      beta.reshape(1, D).astype(jnp.float32))
    return out[:R] if Rp != R else out


def _ln_bwd_call(x, gamma, dy, eps, interpret):
    R, D = x.shape
    Rb = min(_BLOCK_ROWS, R)
    xp, Rp = _pad_rows(x, Rb)
    dyp, _ = _pad_rows(dy, Rb)     # zero dy rows -> zero dx/dg/db contrib
    block = pl.BlockSpec((Rb, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pblock = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps),
        grid=(Rp // Rb,),
        in_specs=[block, pblock, block],
        out_specs=(block, pblock, pblock),
        out_shape=(jax.ShapeDtypeStruct((Rp, D), x.dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            # dgamma/dbeta accumulate across grid steps
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, gamma.reshape(1, D).astype(jnp.float32), dyp)
    return (dx[:R] if Rp != R else dx), dg.reshape(D), db.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x, gamma, beta, eps, interpret):
    return _ln_fwd_call(x, gamma, beta, eps, interpret)


def _ln_fwd(x, gamma, beta, eps, interpret):
    return _ln_fwd_call(x, gamma, beta, eps, interpret), (x, gamma)


def _ln_bwd(eps, interpret, res, dy):
    x, gamma = res
    dx, dg, db = _ln_bwd_call(x, gamma, dy, eps, interpret)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_ln.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layernorm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                    *, eps: float = 1e-5,
                    interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics, any input rank.

    Semantics match ``LayerNormF32`` (models/layers.py): compute in fp32,
    scale/shift by fp32 gamma/beta, return in x's dtype.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = _ln(x2, gamma, beta, float(eps), interpret)
    return out.reshape(shape)
