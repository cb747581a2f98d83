# coding=utf-8
"""Lloyd-iteration distribution study for the k-medoids fixed-cap switch
(VERDICT r2 next #5).

The while_loop convergence check is a scheduling barrier (~450 us/round at
the flagship shape); if virtually every input converges within M iterations,
a barrier-free `fori_loop(M)` is result-identical (shift < threshold means
the medoid set is a fixed point — fp32 feature vectors at distinct rows are
never within 1e-5, so "converged" means "medoids stopped moving" and extra
Lloyd steps are no-ops).

This script measures per-sample iterations-to-convergence with the NumPy
oracle across input families resembling the runtime distribution (ViT token
features at the flagship shape are ~continuous dense vectors):
  * isotropic gaussians (worst case: no cluster structure)
  * clustered blobs at several separation levels (the reference's own
    micro-bench generator, modules/cluster/test.py:14-19)
  * features from a randomly-initialised tiny ViT on random frames
    (rotated-gaussian-like, matching pre-training statistics)
  * cosine metric variants (the runtime default for cluster_embedding=0)

Run: python benchmarks/kmedoids_iters_study.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centerclip_tpu.ops.kmedoids import _pairwise_np  # noqa: E402


def iters_to_convergence(x, K, metric="euclidean", threshold=1e-5,
                         iter_limit=200):
    """Oracle Lloyd loop instrumented to return the iteration count at which
    shift < threshold (i.e. the count the while_loop would run)."""
    x = np.asarray(x, np.float32)
    N = x.shape[0]
    D = _pairwise_np(x, metric=metric)
    meds = np.zeros(K, np.int64)
    meds[0] = int(np.argmax(np.linalg.norm(x, axis=-1)))
    for i in range(1, K):
        mindist = D[:, meds[:i]].min(axis=1)
        meds[i] = int(np.argmax(mindist))
    for it in range(1, iter_limit + 1):
        prev = meds.copy()
        assign = np.argmin(D[meds, :], axis=0)
        onehot = np.eye(K, dtype=np.float32)[assign]            # [N, K]
        within = D @ onehot                                     # [N, K]
        scores = within * onehot
        meds = np.argmin(scores, axis=0).astype(np.int64)
        shift = np.sum(np.sqrt(np.sum((x[meds] - x[prev]) ** 2, axis=-1)))
        if shift < threshold:
            return it
    return iter_limit + 1  # did not converge


def tiny_vit_tokens(n_samples, N, D, seed=0):
    """Token features from a random tiny ViT on random frames."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn

    class Tok(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(D)(x)
            for _ in range(3):
                h = nn.LayerNorm()(x)
                x = x + nn.Dense(D)(nn.gelu(nn.Dense(2 * D)(h)))
            return x

    rng = np.random.default_rng(seed)
    raw = rng.normal(size=(n_samples, N, 48)).astype(np.float32)
    m = Tok()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 48)))
    return np.asarray(m.apply(params, jnp.asarray(raw)))


def main():
    families = {}
    rng = np.random.default_rng(0)
    N, D, K = 196, 768, 49  # flagship cluster-block shape (2 frames x 98? —
    # the reference micro-bench shape, test.py:196-206)

    gauss = rng.normal(size=(60, N, D)).astype(np.float32)
    families["gauss_euclid"] = (gauss, "euclidean")
    families["gauss_cosine"] = (gauss, "cosine")

    for sep in (5.0, 1.0, 0.2):
        centers = rng.normal(size=(K, D)).astype(np.float32) * sep
        labels = rng.integers(0, K, size=(40, N))
        blob = centers[labels] + rng.normal(
            size=(40, N, D)).astype(np.float32) * 0.5
        families[f"blobs_sep{sep}"] = (blob.astype(np.float32), "euclidean")

    vit = tiny_vit_tokens(40, N, D)
    families["vit_tokens_euclid"] = (vit, "euclidean")
    families["vit_tokens_cosine"] = (vit, "cosine")

    # the actual runtime shape too: 100 tokens (2 frames x 50) -> 49 medoids
    small = rng.normal(size=(60, 100, D)).astype(np.float32)
    families["gauss_N100"] = (small, "euclidean")

    all_iters = []
    print(f"{'family':22s} {'n':>4s} {'mean':>6s} {'p99':>4s} {'max':>4s}")
    for name, (data, metric) in families.items():
        its = [iters_to_convergence(x, K, metric=metric) for x in data]
        all_iters += its
        print(f"{name:22s} {len(its):4d} {np.mean(its):6.2f} "
              f"{int(np.percentile(its, 99)):4d} {max(its):4d}", flush=True)
    a = np.asarray(all_iters)
    print(f"\nALL: n={len(a)} mean={a.mean():.2f} p99={np.percentile(a, 99):.0f} "
          f"p99.9={np.percentile(a, 99.9):.0f} max={a.max()}")


if __name__ == "__main__":
    main()
