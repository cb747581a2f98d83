# coding=utf-8
"""Cluster micro-benchmark harness (reference: modules/cluster/test.py).

Reproduces the reference's three recorded comparisons on TPU:
  1. single-sample vs batched k-medoids equivalence + speed
  2. batched k-medoids on X=[384, 196, 768], K=49
     (RTX 3090 recording: 4.30 s / 10 runs)
  3. spectral clustering on the same shape (3090: 6.00 s / 10 runs)

Run: python benchmarks/cluster_bench.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def device_time(fn, runs: int = 10) -> float:
    """Slope-based chained-dispatch timing (block_until_ready does not block
    over the tunnelled TPU backend; see bench.py device_time)."""
    import jax.numpy as jnp
    fn()
    np.asarray(jnp.sum(fn()))

    def total(n):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fn()
        np.asarray(jnp.sum(last))
        return time.perf_counter() - t0

    base = max(runs // 2, 1)
    slopes = []
    for _ in range(3):
        t_short = total(base)
        t_long = total(base + runs)
        slopes.append((t_long - t_short) / runs)
    med = sorted(slopes)[1]
    if med <= 1e-6:
        med = total(base + runs) / (base + runs)
    return max(med, 1e-9)


def make_blobs(rng, B, N, D, K, spread=0.5):
    centers = rng.normal(size=(K, D)).astype(np.float32) * 5.0
    labels = rng.integers(0, K, size=N)
    return centers[labels][None] + \
        rng.normal(size=(B, N, D)).astype(np.float32) * spread


def main():
    import jax.numpy as jnp
    from centerclip_tpu.ops import (batch_fast_kmedoids,
                                    batch_spectral_clustering, kmedoids_oracle)
    from centerclip_tpu.ops.kmedoids_pallas import batch_fast_kmedoids_pallas

    rng = np.random.default_rng(0)

    # 1. equivalence: batched vs loop oracle (test.py:62-114 pattern).
    # On TPU the distance matmul and the NumPy oracle produce different fp32
    # roundings, so near-tied medoid sums can legitimately flip — report the
    # per-medoid agreement fraction (exact equality holds on CPU, see
    # tests/test_kmedoids.py)
    x_small = make_blobs(rng, 4, 196, 64, 49)
    a, m = batch_fast_kmedoids(jnp.asarray(x_small), 49, iter_limit=60)
    m = np.asarray(m)
    agree = np.mean([
        np.mean(m[b] == kmedoids_oracle(x_small[b], 49, iter_limit=60)[1])
        for b in range(4)])
    print(f"[1] batched vs loop oracle medoid agreement: {agree:.3f}")

    # 2. k-medoids on the recorded config (test.py:196-206)
    x = jnp.asarray(make_blobs(rng, 384, 196, 768, 49))
    t_xla = device_time(lambda: batch_fast_kmedoids(x, 49, iter_limit=60)[1])
    print(f"[2] batch_fast_kmedoids [384,196,768] K=49: {t_xla * 1e3:.2f} "
          f"ms/run (3090 recording: 430 ms -> {0.430 / t_xla:.0f}x)")
    try:
        t_pl = device_time(
            lambda: batch_fast_kmedoids_pallas(x, 49, iter_limit=60)[1])
        print(f"    fused pallas kernel: {t_pl * 1e3:.2f} ms/run")
    except Exception as e:
        print(f"    fused pallas kernel unavailable: {type(e).__name__}")

    # 3. spectral clustering, same shape (test.py:208-218)
    t_sp = device_time(
        lambda: batch_spectral_clustering(x, 49, iter_limit=60)[1], runs=3)
    print(f"[3] batch_spectral_clustering: {t_sp * 1e3:.2f} ms/run "
          f"(3090 recording: 600 ms -> {0.600 / t_sp:.0f}x)")


if __name__ == "__main__":
    sys.exit(main())
