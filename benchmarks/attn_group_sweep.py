# coding=utf-8
"""Sweep the fused-attention group size G at the encode shape (real TPU).

The kernel's auto-group picks G=8 at L=50 from VMEM budgets; this measures
whether that is actually the throughput optimum (G trades wasted MXU FLOPs
(G x) against per-program issue/DMA overhead (1/G programs)).

Run: python benchmarks/attn_group_sweep.py [B] [L]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax.numpy as jnp  # noqa: E402

from bench import device_time  # noqa: E402
from centerclip_tpu.ops.attention_pallas import fused_mha  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    D, H = 768, 12
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, D), jnp.bfloat16)

    for G in (2, 3, 4, 6, 8, 12, 16):
        if B % G:
            continue
        fn = jax.jit(lambda q, k, v, G=G: jnp.sum(
            fused_mha(q, k, v, None, heads=H, group=G).astype(jnp.float32)))
        t = device_time(lambda: fn(q, k, v), 10) * 1e6
        print(f"G={G:2d}: {t:8.0f} us", flush=True)


if __name__ == "__main__":
    main()
