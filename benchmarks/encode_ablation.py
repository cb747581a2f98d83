# coding=utf-8
"""Ablation timings for the video-encode path on the real TPU.

Answers: where does encode time go (ViT blocks vs cluster region), how does
throughput scale with batch, and what MFU are we at?  Used to drive the
round-2 perf work; bench.py stays the canonical single-number harness.

Run: python benchmarks/encode_ablation.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_time(fn, runs: int = 8) -> float:
    """Chained-dispatch slope timing (see bench.py docstring)."""
    fn()
    np.asarray(fn())

    def total(n):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fn()
        np.asarray(last)
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


def vit_b32_flops_per_clip(frames: int, final_frames: int,
                           cluster_block: int = 6, tokens: int = 50,
                           width: int = 768, layers: int = 12,
                           patch: int = 32) -> float:
    """Forward FLOPs (2*MACs) for one clip through the clustered ViT-B/32."""
    per_tok_block = 2 * (12 * width * width + 2 * tokens * width)
    pre = cluster_block * frames * tokens * per_tok_block
    post = (layers - cluster_block) * final_frames * tokens * per_tok_block
    patchify = frames * (tokens - 1) * 2 * (3 * patch * patch * width)
    return pre + post + patchify


def make_encode(Bc: int, inter: bool, dtype=np.float32, frames: int = 12):
    import jax
    import jax.numpy as jnp
    from centerclip_tpu.config import make_run_config
    from centerclip_tpu.models.clip4clip import CLIP4Clip

    run_cfg = make_run_config(
        clip_name="ViT-B/32", sim_header="meanP", max_words=32,
        max_frames=frames, inter=inter, algo="kmediods++",
        cluster_num_blocks=(49,) * 12,
        target_frames_blocks=(frames,) * 6 + (frames // 2,) * 6)
    model = CLIP4Clip(run_cfg.model)
    rng = np.random.default_rng(0)
    if dtype == np.uint8:
        video = jnp.asarray(
            rng.integers(0, 256, size=(Bc, 1, frames, 3, 224, 224)),
            jnp.uint8)
    else:
        video = jnp.asarray(
            rng.normal(size=(Bc, 1, frames, 3, 224, 224)), jnp.float32)
    vmask = jnp.ones((Bc, frames), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video=video,
                        video_mask=vmask)["params"]

    @jax.jit
    def encode(params, video, vmask):
        out = model.apply({"params": params}, video=video, video_mask=vmask)
        return jnp.sum(out["visual_output"])

    return lambda: encode(params, video, vmask)


def main():
    peak_tflops = 197e12  # v5e bf16
    # B=64 reproducibly crashes the tunnelled TPU worker; stop at 32
    for inter in (True, False):
        for dtype in (np.uint8, np.float32):
            for Bc in (16, 32):
                fn = make_encode(Bc, inter, dtype=dtype)
                dt = device_time(fn, 5)
                clips = Bc / dt
                fl = vit_b32_flops_per_clip(12, 6 if inter else 12)
                mfu = clips * fl / peak_tflops
                print(f"inter={int(inter)} in={np.dtype(dtype).name:7s} "
                      f"Bc={Bc:3d}: {dt*1e3:8.2f} ms  {clips:8.1f} clips/s"
                      f"  MFU={mfu*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
