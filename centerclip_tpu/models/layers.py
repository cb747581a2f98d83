# coding=utf-8
"""Transformer building blocks for the CLIP towers (flax.linen).

Numerics parity notes vs the reference (modules/clip.py:183-253):
* LayerNorm always computes in float32 and casts back (clip.py:183-189).
* QuickGELU = x * sigmoid(1.702 x) (clip.py:192-194).
* Attention softmax runs in float32 even when activations are bfloat16.
Layout: [batch, tokens, dim] throughout — the reference's LND permutes exist
only to feed torch's nn.MultiheadAttention and are dropped here.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype.

    (A fused Pallas LN exists as documented research —
    ops/layernorm_pallas.py; measured end-to-end it LOSES ~5% because
    XLA fuses this lowering into the consumer matmul, which an opaque
    kernel call forfeits.  The `fused` flag is accepted for call-site
    symmetry but ignored.)

    Round-3 negative result — do NOT re-chase the profiler here: the XLA
    trace attributes ~0.5 ms/instance to these LNs' mean/var reduce
    fusions (~6 ms of a 27 ms encode step).  Rewriting the stats as MXU
    dots against a ones vector (with an optimization_barrier so the
    simplifier can't undo it; verified gone from the optimized HLO)
    changed end-to-end encode by 0% at both Precision.HIGHEST and HIGH —
    and the decisive ablation, replacing LN with identity entirely,
    gained only +3.8% (1220 vs 1175 clips/s).  All of LayerNorm is worth
    ~1 ms/step end-to-end; the per-op attribution over-counts intervals
    that overlap with other work.  Falsify with an ablation before
    optimizing anything the trace blames."""
    epsilon: float = 1e-5
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(
                             x.astype(jnp.float32))
        return y.astype(orig)


class MultiHeadAttention(nn.Module):
    """Self-attention with a fused QKV projection.

    Weight layout mirrors torch nn.MultiheadAttention (in_proj packs Q,K,V
    rows in that order) so checkpoints convert with a single transpose.

    With `fused=True` on a TPU backend the score/softmax/PV stage runs in
    the fused Pallas kernel (ops/attention_pallas.py) — same math, no
    layout copies, fp32 logits never leave VMEM, and the custom VJP
    recomputes probabilities in VMEM on backward.
    """
    width: int
    heads: int
    dtype: Dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        B, L, D = x.shape
        H = self.heads
        hd = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        from ..ops.attention_pallas import (FUSED_MAX_ROWS_X_SEQ,
                                            FUSED_MIN_ROWS_X_SEQ,
                                            FUSED_MIN_SEQ_ALWAYS)
        # explicit TPU allowlist: the Mosaic kernel only lowers on TPU-like
        # backends (this image's tunnel registers as "tpu"; "axon" kept in
        # case the plugin ever reports its own name) — a GPU backend must
        # fall through to the XLA path, as the --fused_attention help
        # promises
        if (self.fused and jax.default_backend() in ("tpu", "axon")
                and (L >= FUSED_MIN_SEQ_ALWAYS
                     or FUSED_MIN_ROWS_X_SEQ <= B * L
                     <= FUSED_MAX_ROWS_X_SEQ)):
            from ..ops.attention_pallas import fused_mha
            out = fused_mha(q, k, v, attn_mask, heads=H)
            return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                            name="out_proj")(out)
        # keep the [B, L, H, hd] layout end-to-end: explicit
        # .transpose(0, 2, 1, 3) materialises ~B*L*D copies around every
        # einsum (measured 25% of the encode step on v5e); dot_general takes
        # the head axis as a batch dim without moving data
        q = q.reshape(B, L, H, hd)
        k = k.reshape(B, L, H, hd)
        v = v.reshape(B, L, H, hd)

        scale = hd ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:
            logits = logits + attn_mask.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        out = out.reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(out)


class MLP(nn.Module):
    """c_fc -> QuickGELU -> c_proj (reference: clip.py:207-211)."""
    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.width * 4, dtype=self.dtype,
                     param_dtype=jnp.float32, name="c_fc")(x)
        h = quick_gelu(h)
        return nn.Dense(self.width, dtype=self.dtype,
                        param_dtype=jnp.float32, name="c_proj")(h)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (reference: clip.py:197-253), without the
    cluster hooks — those are owned by the vision tower so that the token
    count can change *between* blocks with static shapes.

    `sp`: Megatron-style sequence parallelism — the residual stream is
    constrained to a token-sharded (data, model) layout so the LN/residual
    regions hold 1/tp of the activations; GSPMD turns the TP boundary
    collectives into all-gather / reduce-scatter pairs
    (parallel/mesh.py::shard_tokens).  Only meaningful under a 2-D mesh
    with tensor parallelism; a no-op everywhere else."""
    width: int
    heads: int
    dtype: Dtype = jnp.float32
    fused: bool = False
    sp: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        if self.sp:
            from ..parallel.mesh import shard_tokens
            x = shard_tokens(x)
        x = x + MultiHeadAttention(self.width, self.heads, self.dtype,
                                   fused=self.fused, name="attn")(
            LayerNormF32(fused=self.fused, name="ln_1")(x), attn_mask)
        if self.sp:
            from ..parallel.mesh import shard_tokens
            x = shard_tokens(x)
        x = x + MLP(self.width, self.dtype, name="mlp")(
            LayerNormF32(fused=self.fused, name="ln_2")(x))
        if self.sp:
            from ..parallel.mesh import shard_tokens
            x = shard_tokens(x)
        return x


def causal_mask(length: int) -> jax.Array:
    """Additive causal mask (reference: clip.py:448-454): -inf above the
    diagonal, 0 elsewhere."""
    mask = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    return jnp.triu(mask, k=1)
