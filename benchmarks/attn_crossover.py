# coding=utf-8
"""Fused-vs-XLA attention crossover measurement (real TPU).

Times forward-only and forward+backward at the shapes the towers actually
see, for both the Pallas kernel and the XLA einsum path, to set the routing
constants in ops/attention_pallas.py (VERDICT r2 next #4: does the
diagonal-only softmax close the training-regime gap?).

Run: python benchmarks/attn_crossover.py [--row NAME]
Each row runs in its own subprocess (a crashed tunnelled dispatch poisons
the in-process client).
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

from bench import device_time  # noqa: E402

# (name, B, L, D, H): encode = eval batches, train = B=8 x 12 frames,
# post-cluster = 6 segments x 8 clips
SHAPES = [
    ("encode_B384_L50", 384, 50, 768, 12),
    ("train_B96_L50", 96, 50, 768, 12),
    ("postcluster_B48_L50", 48, 50, 768, 12),
    ("b16_B192_L197", 192, 197, 768, 12),
]


def make_fns(B, L, D, H):
    import jax.numpy as jnp
    from centerclip_tpu.ops.attention_pallas import fused_mha

    def xla_mha(q, k, v):
        hd = D // H
        qh = q.reshape(B, L, H, hd)
        kh = k.reshape(B, L, H, hd)
        vh = v.reshape(B, L, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * (hd ** -0.5), kh,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh)
        return out.reshape(B, L, D)

    key = jax.random.PRNGKey(0)
    kq, kk, kv, kw = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, D), jnp.bfloat16)
    w = jax.random.normal(kw, (B, L, D), jnp.bfloat16)

    fused = lambda q, k, v: fused_mha(q, k, v, None, heads=H)

    out = {}
    for name, f in (("fused", fused), ("xla", xla_mha)):
        fwd = jax.jit(lambda q, k, v, f=f: jnp.sum(
            f(q, k, v).astype(jnp.float32)))
        gradf = jax.jit(jax.grad(
            lambda q, k, v, f=f: jnp.sum(
                (f(q, k, v) * w).astype(jnp.float32)), argnums=(0, 1, 2)))
        out[name + "_fwd"] = lambda fwd=fwd: fwd(q, k, v)
        out[name + "_fb"] = lambda gradf=gradf: gradf(q, k, v)[0]
    return out


def run_row(name):
    cfg = dict((n, (B, L, D, H)) for n, B, L, D, H in SHAPES)[name]
    fns = make_fns(*cfg)
    res = {}
    for key in ("fused_fwd", "xla_fwd", "fused_fb", "xla_fb"):
        res[key] = device_time(fns[key], 10) * 1e6  # us
    print(f"{name}: fwd fused={res['fused_fwd']:.0f}us "
          f"xla={res['xla_fwd']:.0f}us "
          f"({res['xla_fwd'] / res['fused_fwd']:.2f}x) | "
          f"fwd+bwd fused={res['fused_fb']:.0f}us "
          f"xla={res['xla_fb']:.0f}us "
          f"({res['xla_fb'] / res['fused_fb']:.2f}x)")


def main():
    if "--row" in sys.argv:
        run_row(sys.argv[sys.argv.index("--row") + 1])
        return
    for name, *_ in SHAPES:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--row", name],
                capture_output=True, text=True, timeout=1200)
            out = (r.stdout.strip().splitlines()[-1]
                   if r.returncode == 0 and r.stdout.strip()
                   else f"FAILED: {r.stderr.strip()[-200:]}")
        except subprocess.TimeoutExpired:
            out = "TIMEOUT"
        print(out, flush=True)


if __name__ == "__main__":
    main()
