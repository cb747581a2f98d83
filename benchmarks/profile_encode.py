# coding=utf-8
"""Capture an XLA trace of the video-encode step and summarise device time.

Drives the perf work between rounds: prints the top ops by device time,
grouped into coarse categories (matmul fusions, copies/transposes, custom
calls = Pallas kernels, clustering loop, elementwise fusions).  Works over
the tunnelled TPU: `jax.profiler.trace` writes
<dir>/plugins/profile/<ts>/*.trace.json.gz, which this script parses — no
TensorBoard needed.

Run: python benchmarks/profile_encode.py [batch] [steps]

CAVEAT (measured, round 3): per-op attribution in these traces
over-counts.  The trace blamed ~6 ms/step on LayerNorm reduce fusions
(~0.5 ms x 13 visible instances), but ablating LayerNorm to identity
moved the end-to-end step by only ~1 ms (+3.8%), and moving the
reductions to MXU dots (verified in the optimized HLO) moved it 0%.
Treat the category split as a hypothesis generator; confirm any target
with an end-to-end ablation before optimizing it.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))


def categorize(name: str) -> str:
    n = name.lower()
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas custom-call"
    if "while" in n:
        return "cluster while-loop"
    if "dot" in n or "conv" in n:
        return "matmul/conv"
    if "fusion" in n:
        return "fusion (elementwise/mixed)"
    if "all-" in n or "reduce-scatter" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    Bc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from benchmarks.readme_bench import _flagship_cfg, _encode_fn

    fn = _encode_fn(_flagship_cfg(), Bc, 12)
    np.asarray(fn())  # compile outside the trace

    trace_dir = "/tmp/jax_trace_encode"
    with jax.profiler.trace(trace_dir):
        last = None
        for _ in range(steps):
            last = fn()
        np.asarray(last)

    traces = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    assert traces, f"no trace written under {trace_dir}"
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])

    # device-side complete events: pid/tid threads named like "TensorCore"
    # / "XLA Ops"; robustly: keep duration events whose name is an HLO-ish
    # op (exclude host-side python markers)
    host_markers = ("$", "np.asarray", "jit_", "PjitFunction", "python",
                    "Thread", "process_")
    per_op = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if any(m in name for m in host_markers):
            continue
        per_op[name] += e["dur"]

    total = sum(per_op.values())
    per_cat = collections.Counter()
    for name, d in per_op.items():
        per_cat[categorize(name)] += d
    print(f"batch={Bc} steps={steps}  device-side total: {total/1e3:.2f} ms "
          f"({total/steps/1e3:.2f} ms/step)")
    print("\n-- by category --")
    for cat, d in per_cat.most_common():
        print(f"{d/total*100:5.1f}%  {d/steps/1e3:8.3f} ms/step  {cat}")
    print("\n-- top 15 ops --")
    for name, d in per_op.most_common(15):
        print(f"{d/total*100:5.1f}%  {d/steps/1e3:8.3f} ms/step  {name[:90]}")


if __name__ == "__main__":
    main()
