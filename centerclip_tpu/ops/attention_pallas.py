# coding=utf-8
"""Fused multi-head self-attention Pallas kernel (TPU).

Why this exists: the CLIP towers run attention at tiny sequence lengths
(L = 50 patch tokens for ViT-B/32, 32-77 text tokens), where XLA's generic
attention lowering is dominated by **data movement, not FLOPs** — profiling
the video-encode step on v5e showed ~25% of device time in layout copies
around the per-head transposes ([B, L, H, hd] <-> [B, H, L, hd]) plus the
fp32 logits/probs HBM round-trips; the attention matmuls themselves are ~1%
of the model's FLOPs (reference attention: modules/clip.py:197-253
nn.MultiheadAttention).

The kernel consumes q/k/v in the layout the QKV projection produces
([B, L, H*hd], no transposes anywhere) and keeps logits, the fp32 softmax,
and probabilities entirely in VMEM.  HBM traffic per block drops to the
bare reads/writes of q, k, v and out.

Semantics match the XLA path in models/layers.py exactly:
  logits = (q * hd^-0.5) @ k^T  accumulated in fp32
  probs  = softmax(logits + mask, axis=-1) in fp32
  out    = probs.astype(bf16) @ v
Numerics: within bf16 tolerance of the XLA path (both accumulate the
logits/PV matmuls in fp32; the reference pins softmax to fp32 under AMP).

Grid: one program per G frames; heads are unrolled inside the program so a
program issues G*H back-to-back [L, hd] matmul pairs — small on the MXU but
entirely VMEM-resident.  Measured on v5e (ViT-B/32 12-frame encode, B=32,
uint8 in): 35.8 -> 34.0 ms/step, 894 -> 942 clips/s (+5.4%), MFU 38.3%.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _mha_kernel(H: int, scale: float, has_mask: bool, *refs):
    """One program: [G, L, D] q/k/v block -> [G, L, D] out block."""
    if has_mask:
        mask_ref, q_ref, k_ref, v_ref, o_ref = refs
        mask = mask_ref[...]                                # [L, L] fp32
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        mask = None
    G, L, D = q_ref.shape
    hd = D // H
    for g in range(G):
        q = q_ref[g]                                        # [L, D] bf16
        k = k_ref[g]
        v = v_ref[g]
        for h in range(H):
            qs = q[:, h * hd:(h + 1) * hd]
            ks = k[:, h * hd:(h + 1) * hd]
            vs = v[:, h * hd:(h + 1) * hd]
            logits = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [L, L] fp32
            if mask is not None:
                logits = logits + mask
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                probs.astype(v.dtype), vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [L, hd]
            o_ref[g, :, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)


def _pad_batch(arrs, G: int):
    B = arrs[0].shape[0]
    pad = (-B) % G
    if pad:
        arrs = [jnp.pad(a, ((0, pad), (0, 0), (0, 0))) for a in arrs]
    return arrs, B + pad


def _mha_fwd_call(q, k, v, attn_mask, heads, group, interpret):
    B, L, D = q.shape
    scale = float((D // heads) ** -0.5)
    if group is None:
        group = _auto_group(L, D, q.dtype.itemsize, buffers=4)
    G = min(group, B)
    (q, k, v), Bp = _pad_batch([q, k, v], G)

    kernel = functools.partial(_mha_kernel, heads, scale,
                               attn_mask is not None)
    block = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [block, block, block]
    operands = [q, k, v]
    if attn_mask is not None:
        in_specs.insert(0, pl.BlockSpec((L, L), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(0, attn_mask.astype(jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=in_specs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((Bp, L, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * heads * L * L * (D // heads),
            bytes_accessed=4 * Bp * L * D * q.dtype.itemsize,
            transcendentals=Bp * heads * L * L),
        interpret=interpret,
    )(*operands)
    return out[:B] if Bp != B else out


def _mha_bwd_kernel(H: int, scale: float, has_mask: bool, *refs):
    """One program: recompute probs in VMEM, then the attention VJP.

    Per (g, h):  dv = P^T @ dO ;  dP = dO @ V^T ;
    dS = P * (dP - rowsum(dP * P))  [softmax VJP] ;
    dQ = scale * dS @ K ;  dK = scale * dS^T @ Q ;  dmask += sum_g,h dS.
    All matmuls take bf16 operands with fp32 accumulation, matching the
    autodiff of the XLA path at the same compute dtype.
    """
    if has_mask:
        (mask_ref, q_ref, k_ref, v_ref, do_ref,
         dq_ref, dk_ref, dv_ref, dmask_ref) = refs
        mask = mask_ref[...]
    else:
        q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        mask = None
        dmask_ref = None
    G, L, D = q_ref.shape
    hd = D // H
    if dmask_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dmask_ref[...] = jnp.zeros_like(dmask_ref)
        dmask_acc = jnp.zeros((L, L), jnp.float32)
    for g in range(G):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        for h in range(H):
            qs = q[:, h * hd:(h + 1) * hd]
            ks = k[:, h * hd:(h + 1) * hd]
            vs = v[:, h * hd:(h + 1) * hd]
            dos = do[:, h * hd:(h + 1) * hd]
            logits = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                logits = logits + mask
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)    # [L, L] fp32
            pb = probs.astype(vs.dtype)
            dv = jax.lax.dot_general(                          # P^T @ dO
                pb, dos, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(                          # dO @ V^T
                dos, vs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            dsb = ds.astype(qs.dtype)
            dq = jax.lax.dot_general(                          # dS @ K
                dsb, ks, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(                          # dS^T @ Q
                dsb, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[g, :, h * hd:(h + 1) * hd] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, h * hd:(h + 1) * hd] = dk.astype(dk_ref.dtype)
            dv_ref[g, :, h * hd:(h + 1) * hd] = dv.astype(dv_ref.dtype)
            if dmask_ref is not None:
                dmask_acc = dmask_acc + ds
    if dmask_ref is not None:
        dmask_ref[...] += dmask_acc


def _mha_bwd_call(q, k, v, attn_mask, do, heads, group, interpret):
    B, L, D = q.shape
    scale = float((D // heads) ** -0.5)
    if group is None:
        group = _auto_group(L, D, q.dtype.itemsize, buffers=7)
    G = min(group, B)
    # padded rows carry zero dO, so their dS/dQ/dK/dV (and the dmask
    # contribution) are exactly zero — safe to slice off
    (q, k, v, do), Bp = _pad_batch([q, k, v, do], G)

    kernel = functools.partial(_mha_bwd_kernel, heads, scale,
                               attn_mask is not None)
    block = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mask_block = pl.BlockSpec((L, L), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [block] * 4
    operands = [q, k, v, do]
    out_specs = [block] * 3
    out_shape = [jax.ShapeDtypeStruct((Bp, L, D), a.dtype)
                 for a in (q, k, v)]
    if attn_mask is not None:
        in_specs.insert(0, mask_block)
        operands.insert(0, attn_mask.astype(jnp.float32))
        out_specs.append(mask_block)
        out_shape.append(jax.ShapeDtypeStruct((L, L), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            # the dmask output accumulates across grid steps, which forbids
            # the parallel annotation when a mask is present
            dimension_semantics=(
                "arbitrary" if attn_mask is not None else "parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * Bp * heads * L * L * (D // heads),
            bytes_accessed=7 * Bp * L * D * q.dtype.itemsize,
            transcendentals=Bp * heads * L * L),
        interpret=interpret,
    )(*operands)
    dq, dk, dv = res[0][:B], res[1][:B], res[2][:B]
    dmask = res[3] if attn_mask is not None else None
    return dq, dk, dv, dmask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(q, k, v, attn_mask, heads, group, interpret):
    return _mha_fwd_call(q, k, v, attn_mask, heads, group, interpret)


def _fused_fwd(q, k, v, attn_mask, heads, group, interpret):
    out = _mha_fwd_call(q, k, v, attn_mask, heads, group, interpret)
    return out, (q, k, v, attn_mask)


def _fused_bwd(heads, group, interpret, res, do):
    q, k, v, attn_mask = res
    dq, dk, dv, dmask = _mha_bwd_call(q, k, v, attn_mask, do,
                                      heads, group, interpret)
    return dq, dk, dv, dmask


_fused.defvjp(_fused_fwd, _fused_bwd)


# VMEM is ~16 MB/core and the grid pipeline double-buffers every block.
# Budget 11 MB for the [G, L, D] blocks, leaving headroom for the fp32
# [L, L] logits/probs temporaries and the mask; size the group per call
# (forward holds 4 blocks, backward 7).  At ViT-B/32's L=50 this yields
# G=8; at ViT-B/16's L=197 it drops to G=3 fwd / 2 bwd (a fixed G=8 there
# OOMs the core).  G>8 measured slower at every shape (909 vs 942 clips/s
# on the flagship encode) — more unrolled serial matmuls per program, no
# bandwidth gain — so 8 is the cap, not just a default.
_VMEM_BLOCK_BUDGET = 11 * 1024 * 1024

# Static-shape crossover vs the XLA path (all measured on v5e, bf16,
# end-to-end encode/train steps).  Two regimes:
#
# Long sequences (L >= FUSED_MIN_SEQ_ALWAYS): XLA's lowering round-trips
# the fp32 [B, H, L, L] logits and probs through HBM — traffic that grows
# with L^2 — while the kernel keeps them in VMEM.  Fused wins at every
# measured row count: ViT-B/16 L=197, B*T=96 rows: +16%; 192 rows: +15%.
#
# Short sequences: the L^2 term is small and the win comes only from the
# per-head layout copies, so the band is narrow (rows*L):
#   19.2k (ViT-B/32 encode, B=32, L=50):   +5%  fused
#   24k   (ActivityNet 60-frame, L=50):    -3%  fused
#   4.8k  (train step fwd+bwd, B=8, L=50): -11% fused
# Callers (models/layers.py) use the kernel when L >= FUSED_MIN_SEQ_ALWAYS
# or rows*L falls inside [MIN, MAX].
FUSED_MIN_SEQ_ALWAYS = 96
FUSED_MIN_ROWS_X_SEQ = 10_000
FUSED_MAX_ROWS_X_SEQ = 21_000


def _auto_group(L: int, D: int, itemsize: int, buffers: int) -> int:
    per_g = L * D * itemsize * buffers * 2
    return max(1, min(8, _VMEM_BLOCK_BUDGET // per_g))


@functools.partial(jax.jit, static_argnames=("heads", "group", "interpret"))
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              attn_mask: Optional[jax.Array] = None, *, heads: int,
              group: Optional[int] = None,
              interpret: bool = False) -> jax.Array:
    """Fused self-attention (differentiable: custom VJP recomputes the
    probabilities in VMEM, so no [B, H, L, L] tensor is ever saved to HBM
    for the backward pass — the residuals are just q, k, v).

    Args:
        q, k, v: [B, L, D] (D = heads * head_dim), any float dtype.
        attn_mask: optional additive [L, L] mask (e.g. causal), fp32.
        heads: number of attention heads.
        group: frames per grid program (amortises program launch; B is
            padded up to a multiple of it).  None = largest group whose
            double-buffered blocks fit the VMEM budget.
    Returns:
        [B, L, D] attention output in q's dtype.
    """
    return _fused(q, k, v, attn_mask, heads, group, interpret)
