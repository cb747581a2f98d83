# coding=utf-8
"""Batched k-medoids with deterministic KKZ initialisation, TPU-first.

Functionally equivalent to the reference's `batch_fast_kmedoids_with_split`
(reference: modules/cluster/fast_kmeans.py:14-97, cluster_utils.py:77-118) but
reformulated for XLA/TPU:

* The medoid-update step in the reference materialises a ``[B, K, N, N]``
  masked tensor and row-sums it (fast_kmeans.py:79-82).  Here the same
  quantity is one batched matmul: with ``A = one_hot(assign)`` ([B, N, K]),
  ``(D @ A)[b, n, k] = sum_{m in cluster k} D[b, n, m]``.  Multiplying by the
  candidate's own membership mask and argmin-ing over n reproduces the
  reference exactly (the all-negative distance trick makes zeroed-out rows
  lose the argmin).  O(B*N^2*K) MXU FLOPs, O(B*N*K) memory — no split_size
  chunking needed.
* The data-dependent convergence loop becomes `lax.while_loop`.  Lloyd
  iterations are a per-sample fixed point: once a sample converges further
  iterations are no-ops, so running all samples to the *global* convergence
  criterion yields bitwise-identical assignments to the reference's
  per-chunk early stopping.
* Everything is fp32 (clustering is a stop-gradient region).

A pure-NumPy loop oracle (`kmedoids_oracle`) mirrors the reference's
non-batched implementation (modules/cluster/kmeans.py:52-114) for testing.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distances import pairwise_distance

# Barrier-free fixed-step switch: when the caller's iter_limit is at least
# this, the first FIXED_ITER_CAP Lloyd steps run unrolled (no per-step
# convergence barrier) and a residual while_loop covers the — never yet
# observed — case of an input that needs more (see batch_fast_kmedoids).
# Cap = 2x the observed worst-case iterations-to-convergence (max 6,
# p99.9 6, mean 2.9 over 380 inputs — benchmarks/kmedoids_iters_study.py).
FIXED_ITER_CAP = 12


def _take_rows(D: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of a batched matrix: out[b, k, :] = D[b, idx[b, k], :]."""
    return jnp.take_along_axis(D, idx[..., None], axis=1)


def kkz_init(X: jax.Array, D: jax.Array, K: int) -> jax.Array:
    """Deterministic KKZ seeding (reference: cluster_utils.py:77-118).

    1. First medoid: the point with maximum L2 norm.
    2. Medoid i: the point whose distance to its nearest already-chosen medoid
       is largest (max-min criterion), computed on the *modified* distance
       matrix (all-negative + self-nearest) exactly as the reference does.

    Args:
        X: [B, N, Dim] points (fp32).
        D: [B, N, N] pairwise distances (with tricks applied).
        K: number of clusters.
    Returns:
        [B, N]-indexed medoid ids, [B, K] int32.
    """
    B, N = X.shape[0], X.shape[1]
    l2 = jnp.linalg.norm(X.astype(jnp.float32), axis=-1)      # [B, N]
    first = jnp.argmax(l2, axis=1).astype(jnp.int32)          # [B]
    meds0 = jnp.zeros((B, K), jnp.int32).at[:, 0].set(first)
    # min distance from every point to the chosen medoid set
    mindist0 = _take_rows(D, first[:, None])[:, 0, :]          # [B, N]

    def body(i, state):
        meds, mindist = state
        nxt = jnp.argmax(mindist, axis=1).astype(jnp.int32)    # [B]
        meds = meds.at[:, i].set(nxt)
        rows = _take_rows(D, nxt[:, None])[:, 0, :]            # [B, N]
        mindist = jnp.minimum(mindist, rows)
        return meds, mindist

    meds, _ = jax.lax.fori_loop(1, K, body, (meds0, mindist0))
    return meds


def kmeans_plusplus_init(distance_matrix: jax.Array, K: int,
                         rng: jax.Array) -> jax.Array:
    """k-means++ style seeding with deterministic farthest-point step 3
    (reference: cluster_utils.py:46-74 — unused at runtime, provided for
    surface parity): first medoid uniform-random, then repeatedly the point
    farthest from the chosen set."""
    N = distance_matrix.shape[-1]
    first = jax.random.randint(rng, (), 0, N).astype(jnp.int32)
    meds0 = jnp.zeros((K,), jnp.int32).at[0].set(first)
    mindist0 = distance_matrix[first, :]

    def body(i, carry):
        meds, mindist = carry
        nxt = jnp.argmax(mindist).astype(jnp.int32)
        meds = meds.at[i].set(nxt)
        mindist = jnp.minimum(mindist, distance_matrix[nxt, :])
        return meds, mindist

    meds, _ = jax.lax.fori_loop(1, K, body, (meds0, mindist0))
    return meds


def _assign_step(D: jax.Array, meds: jax.Array) -> jax.Array:
    """Assign each point to its nearest medoid (fast_kmeans.py:75-76)."""
    sub = _take_rows(D, meds)                                  # [B, K, N]
    return jnp.argmin(sub, axis=1).astype(jnp.int32)           # [B, N]


def _update_step(D: jax.Array, assign: jax.Array, K: int) -> jax.Array:
    """Medoid update as a single batched matmul (see module docstring).

    Equivalent to fast_kmeans.py:79-82 (masked [B,K,N,N] row-sum argmin).
    Requires D to be the all-negative shifted matrix.
    """
    onehot = jax.nn.one_hot(assign, K, dtype=jnp.float32)      # [B, N, K]
    # within[b, n, k] = sum over cluster-k members m of D[b, n, m];
    # HIGHEST precision so TPU does not round D to bf16 before summing
    within = jnp.matmul(D, onehot, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    scores = within * onehot                                   # zero non-members
    return jnp.argmin(scores, axis=1).astype(jnp.int32)        # [B, K]


@functools.partial(jax.jit, static_argnames=("K", "distance", "threshold",
                                             "iter_limit", "id_sort", "norm_p",
                                             "pre_norm"))
def batch_fast_kmedoids(X: jax.Array, K: int, distance: str = "euclidean",
                        threshold: float = 1e-5, iter_limit: int = 60,
                        id_sort: bool = True, norm_p: float = 2.0,
                        pre_norm: bool = False
                        ) -> Tuple[jax.Array, jax.Array]:
    """Batched Lloyd-style k-medoids.

    Args:
        X: [B, N, D] points; cast to fp32 internally.
        K: number of clusters (static).
        distance: 'euclidean' | 'cosine'.
        threshold: stop when the mean total medoid shift falls below this.
        iter_limit: hard iteration cap.
        id_sort: sort medoid ids ascending and re-assign (reference default).
        norm_p: p of the Minkowski metric for 'euclidean'.
        pre_norm: L2-normalise rows first (fast_kmeans.py:21-22).
    Returns:
        (assign [B, N] int32, medoids [B, K] int32)
    """
    X = X.astype(jnp.float32)
    if pre_norm:
        X = X / (jnp.linalg.norm(X, axis=-1, keepdims=True) + 1e-6)
    D = pairwise_distance(X, X, metric=distance, p=norm_p,
                          all_negative=True, self_nearest=True)
    meds0 = kkz_init(X, D, K)
    assign0 = jnp.zeros(X.shape[:2], jnp.int32)

    def cond(state):
        step, _, _, shift = state
        return jnp.logical_and(step < iter_limit, shift >= threshold)

    def lloyd(meds):
        assign = _assign_step(D, meds)
        new_meds = _update_step(D, assign, K)
        # center shift (fast_kmeans.py:85-86): mean over batch of the summed
        # per-cluster L2 movement of medoid feature vectors
        moved = jnp.take_along_axis(X, new_meds[..., None], axis=1) \
            - jnp.take_along_axis(X, meds[..., None], axis=1)
        shift = jnp.mean(jnp.sum(jnp.sqrt(jnp.sum(moved * moved, axis=-1)),
                                 axis=-1))
        return new_meds, assign, shift

    def body(state):
        step, meds, _, _ = state
        # Two Lloyd steps per while_loop iteration: the loop converges in
        # ~5-6 steps but each while_loop round is a scheduling barrier
        # (profiled ~450 us for ~30 us of matmuls at the flagship shape);
        # unrolling halves the barriers and lets XLA overlap step 1's shift
        # reduction with step 2's matmuls.  Results are bit-identical to
        # the single-step loop: the state at the FIRST exit condition
        # (shift < threshold, or the step cap) is selected, so a converged
        # step 1 discards step 2's speculative work.
        m1, a1, s1 = lloyd(meds)
        m2, a2, s2 = lloyd(m1)
        stop1 = jnp.logical_or(s1 < threshold, step + 1 >= iter_limit)
        return (jnp.where(stop1, step + 1, step + 2),
                jnp.where(stop1, m1, m2),
                jnp.where(stop1, a1, a2),
                jnp.where(stop1, s1, s2))

    if iter_limit >= FIXED_ITER_CAP:
        # Barrier-free fixed-step fast path (the runtime default,
        # iter_limit=100): FIXED_ITER_CAP unrolled Lloyd steps with no
        # per-step convergence check — every while_loop round cost a ~450us
        # scheduling barrier on the tunnelled TPU for ~30us of matmuls.
        # Lloyd with KKZ init is a fixed point, and the measured
        # iterations-to-convergence distribution
        # (benchmarks/kmedoids_iters_study.py: 380 inputs across gaussians,
        # blobs at 3 separations, random-ViT tokens, cosine+euclidean,
        # N in {100, 196}, K=49) is mean 2.9 / p99.9 = 6 / max = 6, so the
        # cap runs 2x the observed worst case; converged samples make the
        # extra steps exact no-ops.  The caller's convergence contract
        # (iterate to shift < threshold, hard cap iter_limit) is still
        # honored exactly: the final unrolled step computes the shift and a
        # residual while_loop takes over iff the cap was not enough — for
        # any input that converged within the cap, the shift is 0 and the
        # residual loop exits on its first (cheap) cond evaluation
        # (tests/test_kmedoids.py pins equality against the pure loop).
        meds, assign = meds0, assign0
        for _ in range(FIXED_ITER_CAP - 1):
            assign = _assign_step(D, meds)
            meds = _update_step(D, assign, K)
        meds, assign, shift = lloyd(meds)
        init = (jnp.int32(FIXED_ITER_CAP), meds, assign, shift)
    else:
        init = (jnp.int32(0), meds0, assign0, jnp.float32(jnp.inf))

    _, meds, assign, _ = jax.lax.while_loop(cond, body, init)

    if id_sort:
        meds = jnp.sort(meds, axis=1)
        assign = _assign_step(D, meds)
    return assign, meds


def batch_fast_kmedoids_with_split(X, K, distance="euclidean", threshold=1e-5,
                                   iter_limit=60, id_sort=True, norm_p=2.0,
                                   split_size: int = 0, pre_norm=False):
    """API-parity wrapper for the reference's OOM-chunking entry point
    (fast_kmeans.py:14-40).  TPU memory is O(B*N^2) here, so no split is
    performed — results are identical either way (see module docstring)."""
    del split_size
    return batch_fast_kmedoids(X, K, distance=distance, threshold=threshold,
                               iter_limit=iter_limit, id_sort=id_sort,
                               norm_p=norm_p, pre_norm=pre_norm)


# ---------------------------------------------------------------------------
# NumPy loop oracle (the reference's equivalence-test pattern,
# modules/cluster/test.py:22-114): slow, per-sample, obviously-correct.
# ---------------------------------------------------------------------------
def _pairwise_np(x, metric="euclidean", p=2.0, all_negative=True,
                 self_nearest=True):
    x = np.asarray(x, np.float32)
    if metric == "euclidean":
        diff = x[:, None, :] - x[None, :, :]
        if p == 2.0:
            d = np.sqrt(np.sum(diff * diff, axis=-1))
        else:
            d = np.power(np.sum(np.power(np.abs(diff), p), axis=-1), 1.0 / p)
    elif metric == "cosine":
        xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
        d = 1.0 - xn @ xn.T
    else:
        raise NotImplementedError(metric)
    if all_negative:
        d = d - d.max() - 1.0
    if self_nearest:
        d[np.arange(len(d)), np.arange(len(d))] -= 1.0
    return d


def kmedoids_oracle(x, K, metric="euclidean", p=2.0, threshold=1e-5,
                    iter_limit=60, id_sort=True):
    """Single-sample loop k-medoids with KKZ init; mirrors the reference's
    slow implementation (kmeans.py:52-114) as a test oracle."""
    x = np.asarray(x, np.float32)
    N = x.shape[0]
    D = _pairwise_np(x, metric=metric, p=p)
    # KKZ
    meds = np.zeros(K, np.int64)
    meds[0] = int(np.argmax(np.linalg.norm(x, axis=-1)))
    for i in range(1, K):
        sub = D[:, meds[:i]]
        mindist = sub.min(axis=1)
        meds[i] = int(np.argmax(mindist))
    assign = np.zeros(N, np.int64)
    for _ in range(iter_limit):
        prev = meds.copy()
        assign = np.argmin(D[meds, :], axis=0)
        for k in range(K):
            members = np.where(assign == k)[0]
            if len(members) == 0:
                meds[k] = 0
                continue
            # sum of (all-negative) distances to members, for every candidate n
            sums = np.zeros(N, np.float64)
            for n in range(N):
                if assign[n] == k:
                    sums[n] = D[n, members].sum()
            meds[k] = int(np.argmin(sums))
        shift = np.sum(np.sqrt(np.sum((x[meds] - x[prev]) ** 2, axis=-1)))
        if shift < threshold:
            break
    if id_sort:
        meds = np.sort(meds)
        assign = np.argmin(D[meds, :], axis=0)
    return assign.astype(np.int32), meds.astype(np.int32)
