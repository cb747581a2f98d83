# coding=utf-8
"""Benchmark harness — prints ONE JSON line.

Headline metric: batched k-medoids clustering on the reference's own recorded
configuration (X = [384, 196, 768], K = 49, 10 timed runs after warmup —
reference: modules/cluster/test.py:196-206, RTX 3090: 4.30 s for the 10 runs,
i.e. 0.430 s/run).  `vs_baseline` is the speedup over that recorded GPU
number (>1 = faster than the reference on its own hardware).

Secondary numbers (clips/sec video encode) are printed to stderr for the
log, not the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_SECONDS_PER_RUN = 4.30 / 10  # RTX 3090, modules/cluster/test.py:196-206
B, N, D, K = 384, 196, 768, 49
RUNS = 10


def device_time(fn, runs: int) -> float:
    """Per-run device time via the slope of two chained-dispatch batches.

    On this image's tunnelled TPU backend `block_until_ready` does not block,
    so timing must force a host transfer (np.asarray of a scalar).  Taking
    the difference between an N-run chain and an (N+runs)-run chain cancels
    both the tunnel roundtrip and any queue-drain effects that make single
    measurements look impossibly fast.
    """
    fn()  # warmup/compile
    np.asarray(fn())

    def total(n):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fn()
        np.asarray(last)
        return time.perf_counter() - t0

    base = max(runs // 2, 1)
    # tunnel latency is jittery: take the median of three slope samples and
    # fall back to the long chain's mean (an upper bound) if they collapse
    slopes = []
    for _ in range(3):
        t_short = total(base)
        t_long = total(base + runs)
        slopes.append((t_long - t_short) / runs)
    med = sorted(slopes)[1]
    if med <= 1e-6:
        med = total(base + runs) / (base + runs)
    return max(med, 1e-9)


def bench_kmedoids() -> float:
    import jax.numpy as jnp
    from centerclip_tpu.ops import batch_fast_kmedoids

    rng = np.random.default_rng(0)
    # clusterable synthetic data like the reference harness (test.py:14-19)
    centers = rng.normal(size=(K, D)).astype(np.float32) * 5.0
    labels = rng.integers(0, K, size=N)
    x = centers[labels][None] + rng.normal(size=(B, N, D)).astype(np.float32) * 0.5
    x = jnp.asarray(x)

    def run():
        a, m = batch_fast_kmedoids(x, K, distance="euclidean",
                                   threshold=1e-5, iter_limit=60,
                                   id_sort=True)
        return jnp.sum(a) + jnp.sum(m)

    return device_time(run, RUNS)


def bench_encode_throughput() -> float:
    """Video-encode clips/sec/chip: ViT-B/32, 12 frames, kmediods++ 12->6
    (BASELINE.json north-star config), bf16."""
    import jax
    import jax.numpy as jnp
    from centerclip_tpu.config import make_run_config
    from centerclip_tpu.models.clip4clip import CLIP4Clip

    run_cfg = make_run_config(
        clip_name="ViT-B/32", sim_header="meanP", max_words=32, max_frames=12,
        inter=True, algo="kmediods++",
        cluster_num_blocks=(49,) * 12,
        target_frames_blocks=(12,) * 6 + (6,) * 6)
    model = CLIP4Clip(run_cfg.model)
    Bc, T = 16, 12
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(Bc, 1, T, 3, 224, 224)),
                        jnp.float32)
    vmask = jnp.ones((Bc, T), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video=video,
                        video_mask=vmask)["params"]

    @jax.jit
    def encode(params, video, vmask):
        out = model.apply({"params": params}, video=video, video_mask=vmask)
        return jnp.sum(out["visual_output"])

    dt = device_time(lambda: encode(params, video, vmask), 5)
    return Bc / dt


def main():
    # always emit exactly one JSON line, even if the TPU worker hiccups
    # (observed transient crashes on very large dispatches over the tunnel)
    kmedoids_s = None
    for attempt in range(2):
        try:
            kmedoids_s = bench_kmedoids()
            break
        except Exception as e:
            print(f"[bench] kmedoids attempt {attempt} failed: {e}",
                  file=sys.stderr)
            time.sleep(30)
    try:
        clips_per_sec = bench_encode_throughput()
        print(f"[bench] encode throughput: {clips_per_sec:.2f} clips/sec/chip "
              "(ViT-B/32, 12 frames, kmediods++ 12->6)", file=sys.stderr)
    except Exception as e:  # encode bench is informational only
        print(f"[bench] encode bench failed: {e}", file=sys.stderr)
    if kmedoids_s is None:
        print(json.dumps({
            "metric": "batch_kmedoids[384,196,768]K49 time (ref 3090: 0.430s)",
            "value": None, "unit": "s/run", "vs_baseline": None,
        }))
        return
    print(json.dumps({
        "metric": "batch_kmedoids[384,196,768]K49 time (ref 3090: 0.430s)",
        "value": round(kmedoids_s, 4),
        "unit": "s/run",
        "vs_baseline": round(REF_SECONDS_PER_RUN / kmedoids_s, 3),
    }))


if __name__ == "__main__":
    main()
