# coding=utf-8
"""IVF vs flat gallery index at production scale (default: the real chip).

Measures, on an N x D int8 gallery (default 1M x 512 — the flat index's
HBM-read worst case):

* build time (on-device k-means + host grouping),
* DEVICE-ONLY search time at B=1 and B=32 for flat vs IVF at several
  nprobe settings (chained-dispatch timing — the public path's wall clock
  is tunnel-dominated on this image and belongs to bench.py's serve
  section),
* recall@10 of IVF vs the flat exact ranking on the same queries.

Expected shape of the result (the reason serve/ivf.py exists): flat cost
is one N·D HBM read per dispatch regardless of batch, so IVF wins at
small batch by reading only nprobe·cap·D per query, and the advantage
shrinks as batch x nprobe·cap approaches N (the probe gather is
duplicated per query).  Run me to get the measured crossover.

Usage: python benchmarks/ivf_bench.py [--n 1000000] [--d 512] [--cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import device_time  # noqa: E402  (tunnel-safe chained timing)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, nargs="+", default=[8, 32, 64])
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from centerclip_tpu.serve.index import VideoIndex
    from centerclip_tpu.serve.ivf import IVFVideoIndex

    rng = np.random.default_rng(0)
    # clusterable gallery: CLIP video embeddings are far from uniform on
    # the sphere — model that with center + noise structure
    n_centers = args.clusters
    centers = rng.normal(size=(n_centers, args.d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, n_centers, size=args.n)
    emb = (centers[which]
           + 0.25 * rng.normal(size=(args.n, args.d)).astype(np.float32))
    ids = [str(i) for i in range(args.n)]

    flat = VideoIndex(emb, ids, quantize="int8")
    t0 = time.perf_counter()
    ivf = IVFVideoIndex(emb, ids, quantize="int8",
                        n_clusters=args.clusters, iters=5)
    build_s = time.perf_counter() - t0
    print(json.dumps({"bench": "build", "n": args.n, "d": args.d,
                      "clusters": args.clusters, "capacity": ivf.capacity,
                      "build_s": round(build_s, 2)}), flush=True)

    # incremental add latency at scale (VERDICT r4 weak #5): append a
    # 100-video batch — must be O(M) scatter, not an O(N) re-group
    add_emb = (centers[rng.integers(0, n_centers, size=100)]
               + 0.25 * rng.normal(size=(100, args.d)).astype(np.float32))
    cap_before = ivf.capacity
    t0 = time.perf_counter()
    ivf.add(add_emb, [f"add{i}" for i in range(100)])
    add_s = time.perf_counter() - t0
    print(json.dumps({"bench": "add", "rows_added": 100, "n": len(ivf),
                      "add_s": round(add_s, 4),
                      "incremental": ivf.capacity == cap_before,
                      "spilled_total": ivf._spilled}), flush=True)

    q_host = (centers[rng.integers(0, n_centers, size=32)]
              + 0.25 * rng.normal(size=(32, args.d)).astype(np.float32)
              ).astype(np.float32)
    qn = q_host / np.linalg.norm(q_host, axis=1, keepdims=True)
    k = 10
    _, exact = flat.search(q_host, k=k)

    rows = []
    for batch in (1, 32):
        q = jnp.asarray(qn[:batch])

        core, ops_ = flat.score_core(k)
        fn = jax.jit(core)
        flat_t = device_time(lambda: fn(q, *ops_)[0], args.runs)
        rows.append({"bench": "search", "index": "flat", "batch": batch,
                     "ms_per_batch": round(flat_t * 1e3, 3),
                     "ms_per_query": round(flat_t * 1e3 / batch, 3)})
        print(json.dumps(rows[-1]), flush=True)

        for p in args.nprobe:
            corep, opsp = ivf.score_core(k, nprobe=p)
            fnp = jax.jit(corep)
            t = device_time(lambda: fnp(q, *opsp)[0], args.runs)
            _, approx = ivf.search(q_host, k=k, nprobe=p)
            rec = float(np.mean([len(set(a) & set(e)) / k
                                 for a, e in zip(approx, exact)]))
            rows.append({"bench": "search", "index": f"ivf@{p}",
                         "batch": batch,
                         "ms_per_batch": round(t * 1e3, 3),
                         "ms_per_query": round(t * 1e3 / batch, 3),
                         "recall_at_10": round(rec, 4),
                         "read_frac": round(p * ivf.capacity / args.n, 4)})
            print(json.dumps(rows[-1]), flush=True)

    return rows


if __name__ == "__main__":
    main()
