# coding=utf-8
"""Fused Pallas k-medoids kernel (TPU) — **research artifact, not wired**.

Round-2 disposition: the kernel is correct (interpret-mode equality tests in
tests/test_kmedoids_pallas.py) but loses to the XLA path at every production
shape, so the `kmedoids_backend` config flag was removed and
TokenClusterInter always uses ops/kmedoids.py.  Why it cannot win here: the
Lloyd iterations cost ~2*N^2*K FLOPs/sample/iter in fp32 (argmin semantics
pin fp32 — CLAUDE.md), which on the MXU runs as 3-pass bf16 at ~1/3 peak;
at N=196, K=49, B=384 that compute floor is ~6-8 ms regardless of how the
grid is batched, while the XLA path hides its HBM re-reads behind the same
compute and finishes in ~2.6 ms.  A batched-G grid only amortises program
launch (not the bottleneck).  The kernel would win only where D re-reads
dominate compute: N >> K and few iterations — shapes CenterCLIP never runs.

The jnp implementation (ops/kmedoids.py) re-reads the [B, N, N] distance
matrix from HBM on every Lloyd iteration (assign gather + update matmul).
This kernel loads each sample's distance matrix into VMEM **once** and runs
KKZ seeding plus the full convergence loop on-chip.

Measured trade-off on v5e (N=196, K=49, B=384): the XLA path is memory-bound
at ~2.6 ms (~165x the reference's RTX-3090 recording) while this kernel is
~9 ms — its grid programs execute sequentially per core and the per-sample
[Np, Np] @ [Np, Kp] fp32 (3-pass) matmuls under-fill the MXU, which costs
more than the saved HBM re-reads.  The kernel wins when D re-reads dominate
(very large N with many iterations); the XLA path is the default in
TokenClusterInter.  Outputs agree with the jnp path except on exact fp32
summation ties (~1/384 samples on synthetic blobs), where both answers are
equally valid medoids.

Kernel structure:

* one grid program per batch element; D[b] ([N, N] fp32, ~2.5 MB for the
  ViT-B/16 worst case N=784) lives in VMEM for the whole program;
* both Lloyd steps are expressed as one [N, N] @ [N, K] matmul against a
  one-hot matrix (MXU) + an argmin: ``assign = argmin_k (D @ onehot(meds))``
  and ``meds = argmin_n (D @ onehot(assign)) * onehot(assign)`` — the
  all-negative distance trick makes zeroed non-members lose the argmin
  (semantics of reference fast_kmeans.py:72-88);
* the loop exits when the medoid set reaches its fixed point (medoids
  unchanged ⇒ assignment unchanged ⇒ converged).  The reference's
  `center_shift < threshold` stop can in principle exit one step earlier on
  a sub-threshold move; at the default threshold 1e-5 both stop at the same
  fixed point.

N and K are padded to lane multiples (128); padding rows/columns of D are
zero, which the all-negative trick keeps inert in every argmin/sum.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distances import pairwise_distance
from .kmedoids import _take_rows

LANE = 128
NEG_INF = -1e30
POS_INF = 1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kmedoids_kernel(K: int, N: int, iter_limit: int,
                     d_ref, l2_ref, meds_ref):
    """One batch element: KKZ init + Lloyd loop, entirely in VMEM.

    d_ref:   [1, Np, Np] distances (all-negative + self-nearest tricks,
             zero in padding).
    l2_ref:  [1, 1, Np] L2 norms of the points (-inf in padding).
    meds_ref:[1, 1, Kp] output medoid indices (first K valid).
    """
    D = d_ref[0]                                    # [Np, Np]
    l2 = l2_ref[0]                                  # [1, Np]
    Np = D.shape[0]
    Kp = meds_ref.shape[2]

    n_iota = jax.lax.broadcasted_iota(jnp.int32, (Np, Kp), 0)   # row ids
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (Np, Kp), 1)   # col ids
    valid_n = (jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1) < N)
    valid_k_row = (jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1) < K)

    # ---- KKZ seeding (reference cluster_utils.py:77-118):
    # first medoid = max-norm point; then repeatedly the point farthest from
    # its nearest chosen medoid.  mindist is kept in registers/VMEM.
    k_row = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    n_row = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

    def gather_row(idx):
        """Row D[idx, :] as a [1, Np] exact one-hot matmul.

        Dynamic sublane indexing has alignment hazards in Mosaic; a one-hot
        row times D on the MXU is exact (single nonzero product) at HIGHEST
        precision.
        """
        onehot = (n_row == idx).astype(jnp.float32)          # [1, Np]
        return jax.lax.dot_general(
            onehot, D, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [1, Np]

    first = jnp.argmax(jnp.where(valid_n, l2, NEG_INF), axis=1)[0]
    # scatter is not lowerable in Mosaic: place values with iota selects
    meds0 = jnp.where(k_row == 0, first.astype(jnp.int32), 0)
    mindist0 = gather_row(first)

    def kkz_body(i, carry):
        meds, mindist = carry
        # pad entries of D are 0 > real (negative) distances, so their
        # mindist stays 0; mask them out of the argmax
        cand = jnp.argmax(jnp.where(valid_n, mindist, NEG_INF), axis=1)[0]
        meds = jnp.where(k_row == i, cand.astype(jnp.int32), meds)
        mindist = jnp.minimum(mindist, gather_row(cand))
        return meds, mindist

    meds, _ = jax.lax.fori_loop(1, K, kkz_body, (meds0, mindist0))

    # ---- Lloyd loop to the medoid fixed point --------------------------------
    def argmin_first(x, axis):
        """First-index argmin via min + where + int-min.

        Mosaic's native argmin lowering is unreliable (cross-sublane argmin
        miscompiles; keepdims argmin fails to legalize), so build it from
        reductions that do lower: value min, equality hit mask, index min.
        """
        m = jnp.min(x, axis=axis, keepdims=True)
        idx = n_iota if axis == 0 else k_iota
        sentinel = Np if axis == 0 else Kp
        return jnp.min(jnp.where(x == m, idx, sentinel), axis=axis,
                       keepdims=True)

    def lloyd_once(meds):
        M = (n_iota == meds).astype(jnp.float32)    # [Np, Kp] one-hot meds
        M = M * valid_k_row.astype(jnp.float32)
        # assign[n] = argmin_k D[meds[k], n]  (D symmetric -> D @ M).
        # HIGHEST precision: the MXU's default bf16 input rounding would
        # perturb argmin decisions vs the fp32 reference.
        S1 = jax.lax.dot_general(D, M, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        S1 = jnp.where(valid_k_row, S1, POS_INF)
        assign = argmin_first(S1, axis=1)                      # [Np, 1]
        # medoid update: within-cluster row sums via D @ onehot(assign)
        A = ((assign == k_iota)
             & (n_iota < N) & valid_k_row).astype(jnp.float32)
        S2 = jax.lax.dot_general(D, A, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        scores = jnp.where(A > 0, S2, 0.0)
        # all-negative trick: non-members (0.0) lose against member sums
        new_meds = argmin_first(scores, axis=0)                # [1, Kp]
        new_meds = jnp.where(valid_k_row, new_meds, 0)
        return new_meds.astype(jnp.int32)

    def cond(state):
        step, _, changed = state
        return jnp.logical_and(step < iter_limit, changed)

    def body(state):
        step, meds, _ = state
        new_meds = lloyd_once(meds)
        # integer reduction (bool-vector selects don't lower in Mosaic)
        diff = jnp.sum(jnp.abs(new_meds - meds)
                       * valid_k_row.astype(jnp.int32))
        return step + 1, new_meds, diff > 0

    _, meds, _ = jax.lax.while_loop(cond, body,
                                    (jnp.int32(0), meds, jnp.bool_(True)))
    meds_ref[0] = meds


@functools.partial(jax.jit, static_argnames=("K", "distance", "iter_limit",
                                             "id_sort", "norm_p", "pre_norm",
                                             "interpret"))
def batch_fast_kmedoids_pallas(X: jax.Array, K: int,
                               distance: str = "euclidean",
                               iter_limit: int = 60, id_sort: bool = True,
                               norm_p: float = 2.0, pre_norm: bool = False,
                               interpret: bool = False
                               ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for `batch_fast_kmedoids` backed by the fused
    kernel.  Returns (assign [B, N] int32, medoids [B, K] int32)."""
    if not interpret and not fits_in_vmem(X.shape[1], K):
        # shape exceeds the kernel's VMEM working set: use the XLA path
        from .kmedoids import batch_fast_kmedoids
        return batch_fast_kmedoids(X, K, distance=distance,
                                   iter_limit=iter_limit, id_sort=id_sort,
                                   norm_p=norm_p, pre_norm=pre_norm)
    X = X.astype(jnp.float32)
    if pre_norm:
        X = X / (jnp.linalg.norm(X, axis=-1, keepdims=True) + 1e-6)
    D = pairwise_distance(X, X, metric=distance, p=norm_p,
                          all_negative=True, self_nearest=True)
    l2 = jnp.linalg.norm(X, axis=-1)                          # [B, N]
    return kmedoids_from_distances(D, l2, K, iter_limit=iter_limit,
                                   id_sort=id_sort, interpret=interpret)


VMEM_BUDGET_BYTES = 12 << 20  # leave headroom under the 16 MiB/core VMEM


def fits_in_vmem(N: int, K: int) -> bool:
    """Whether one sample's working set (double-buffered D + one-hot/score
    intermediates) fits the kernel's VMEM budget.  ViT-B/16 worst cases
    (N=784, K=160 -> ~13 MB) exceed it; callers fall back to the XLA path."""
    Np = _round_up(N, LANE)
    Kp = _round_up(K, LANE)
    return 2 * Np * Np * 4 + 10 * Np * Kp * 4 + (2 << 20) <= VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("K", "iter_limit", "id_sort",
                                             "interpret"))
def kmedoids_from_distances(D: jax.Array, l2: jax.Array, K: int,
                            iter_limit: int = 60, id_sort: bool = True,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Kernel entry on a precomputed distance matrix (all-negative +
    self-nearest tricks already applied)."""
    B, N, _ = D.shape
    Np = _round_up(N, LANE)
    Kp = _round_up(K, LANE)
    D = jnp.pad(D, ((0, 0), (0, Np - N), (0, Np - N)))
    l2 = jnp.pad(l2, ((0, 0), (0, Np - N)),
                 constant_values=NEG_INF)[:, None, :]       # [B, 1, Np]

    kernel = functools.partial(_kmedoids_kernel, K, N, iter_limit)
    meds = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Kp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Kp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # D is double-buffered by the grid pipeline; one-hot/score
            # intermediates need ~8 [Np, Kp] buffers; generous slack for
            # Mosaic's stack
            vmem_limit_bytes=int(2 * Np * Np * 4 + 10 * Np * Kp * 4)
            + (4 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * iter_limit * 2 * Np * Np * Kp,
            bytes_accessed=Np * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(D, l2)

    meds = meds[:, 0, :K]
    if id_sort:
        meds = jnp.sort(meds, axis=1)
    # final assignment from the (sorted) medoids, like the reference's
    # post-sort re-assign (fast_kmeans.py:90-94)
    sub = _take_rows(D[:, :N, :N], meds)
    assign = jnp.argmin(sub, axis=1).astype(jnp.int32)
    return assign, meds
