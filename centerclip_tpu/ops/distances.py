# coding=utf-8
"""Pairwise distance kernels (fp32, MXU-friendly).

Semantics match the reference's distance helpers
(reference: modules/cluster/cluster_utils.py:7-43,121-133) including the two
numerical tricks the clustering pipeline relies on:

* ``all_negative``: shift the whole matrix by ``-(max + 1)`` so every entry is
  strictly negative.  The medoid-update step multiplies rows by a 0/1 cluster
  mask and takes an argmin — negative entries make "masked out" (=0) rows
  automatically lose, no +inf needed.
* ``self_nearest``: subtract 1 on the diagonal so each point is strictly its
  own nearest neighbour even when duplicates exist.

Everything runs in float32: clustering is a no-grad region and fp32 keeps the
argmin decisions deterministic (reference pins this via
``custom_fwd(cast_inputs=float32)``, fast_kmeans.py:13,44).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def squared_l2_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Batched squared L2 distance via one matmul (MXU path).

    ||xi - yj||^2 = |xi|^2 + |yj|^2 - 2 xi.yj
    (reference: cluster_utils.py:121-133 `batched_cdist_l2`)

    Args:
        x: [..., N, D] float array.
        y: [..., M, D] float array.
    Returns:
        [..., N, M] float32, clamped at 0 (the matmul identity can go slightly
        negative in floating point).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # The matmul identity's error is ABSOLUTE (~eps * |x| * |y|), so close
    # pairs carry huge RELATIVE error — enough to flip medoid/assignment
    # argmins (found by tests/test_reference_oracle.py).  torch.cdist makes
    # the same trade: direct (x-y)^2 up to 25 rows, matmul above
    # (compute_mode='use_mm_for_euclid_dist_if_necessary'), so the
    # reference's own real configs (N = 98/196 clustering points) run the
    # mm identity too.  Mirror that: small-N goes direct (exact, O(N*M*D)
    # VPU — trivial at these sizes and what the tiny torch oracle compares
    # against), large-N stays on the MXU.
    if x.shape[-2] <= 25 and y.shape[-2] <= 25:
        diff = x[..., :, None, :] - y[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    # Mean-center before the matmul identity: distances are translation-
    # invariant, and LN'd ViT tokens share positional structure
    # (||x|| >> ||x - y||) — centering shrinks norms to the data spread,
    # cutting the absolute error ~3x at zero MXU cost.
    mu = jnp.mean(x, axis=-2, keepdims=True)
    x = x - mu
    y = y - mu
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)            # [..., N, 1]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)            # [..., M, 1]
    # HIGHEST precision: on TPU the default matmul rounds inputs to bf16,
    # which perturbs distances by ~0.4% — enough to flip argmin decisions
    # in the clustering (the torch reference computes cdist in full fp32)
    xy = jnp.matmul(x, jnp.swapaxes(y, -1, -2),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)     # [..., N, M]
    # grouping matters: (x2 + y2^T) - 2xy is bitwise SYMMETRIC for x == y
    # (fp addition is commutative and xy[i,j] == xy[j,i] accumulate
    # identically), while the naive (x2 - 2xy) + y2^T is not — an
    # asymmetric-at-the-ulp matrix breaks the exact within-cluster-sum tie
    # of every 2-point cluster in the medoid update, flipping medoid ids
    # vs the reference's first-index argmin (found by the torch oracle,
    # tests/test_reference_oracle.py)
    d2 = (x2 + jnp.swapaxes(y2, -1, -2)) - 2.0 * xy
    return jnp.maximum(d2, 0.0)


def minkowski_distance(x: jax.Array, y: jax.Array, p: float) -> jax.Array:
    """General p-norm distance (elementwise broadcast path, used when p != 2).

    torch.cdist(p) equivalent; O(N*M*D) VPU work, only used for exotic configs.
    """
    x = x.astype(jnp.float32)[..., :, None, :]             # [..., N, 1, D]
    y = y.astype(jnp.float32)[..., None, :, :]             # [..., 1, M, D]
    diff = jnp.abs(x - y)
    if p == 1.0:
        return jnp.sum(diff, axis=-1)
    if p == float("inf"):
        return jnp.max(diff, axis=-1)
    return jnp.power(jnp.sum(jnp.power(diff, p), axis=-1), 1.0 / p)


def cosine_distance(x: jax.Array, y: jax.Array, eps: float = 1e-6) -> jax.Array:
    """1 - cosine similarity (reference: cluster_utils.py:24-30)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)
    yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + eps)
    sim = jnp.matmul(xn, jnp.swapaxes(yn, -1, -2),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return 1.0 - sim


def pairwise_distance(x: jax.Array, y: jax.Array, metric: str = "euclidean",
                      p: float = 2.0, all_negative: bool = False,
                      self_nearest: bool = False) -> jax.Array:
    """Pairwise distance with the clustering pipeline's two tricks.

    Matches reference `pairwise_distance` (cluster_utils.py:7-43): euclidean is
    the true p-norm (sqrt for p=2), the global max over the *whole* tensor is
    used for the all-negative shift, and the diagonal trick assumes x is y.
    """
    if metric == "euclidean":
        if p == 2.0:
            dis = jnp.sqrt(squared_l2_distance(x, y))
        else:
            dis = minkowski_distance(x, y, p)
    elif metric == "cosine":
        dis = cosine_distance(x, y)
    else:
        raise NotImplementedError(f"{metric} metric is not implemented")

    if all_negative:
        # Deviation from the reference (cluster_utils.py:35-36), which
        # subtracts the max over the WHOLE batch chunk: we shift per sample.
        # The offset is algebraically irrelevant (every argmin/argmax the
        # clustering performs is invariant to a constant shift within a
        # sample), but a batch-global offset couples a sample's floating-
        # point rounding to unrelated samples in the batch — per-sample
        # offsets make results independent of batch composition.
        dis = dis - jnp.max(dis, axis=(-2, -1), keepdims=True) - 1.0
    if self_nearest:
        n = dis.shape[-1]
        eye = jnp.eye(n, dtype=dis.dtype)
        dis = dis - eye  # subtract 1.0 on the diagonal
    return dis
