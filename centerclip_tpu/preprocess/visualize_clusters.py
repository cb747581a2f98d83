# coding=utf-8
"""Cluster-assignment visualization (reference: preprocess/patch_video.py +
preprocess/visualize_video.py): run the ViT with token clustering on a clip
and dump per-frame cluster-id maps / patch grids as PNGs."""
from __future__ import annotations

import argparse
import os

import numpy as np


def colorize(assign: np.ndarray, num_clusters: int) -> np.ndarray:
    """[N] cluster ids -> [N, 3] uint8 colors (deterministic palette)."""
    rng = np.random.default_rng(0)
    palette = rng.integers(40, 255, size=(num_clusters, 3)).astype(np.uint8)
    return palette[assign % num_clusters]


def overlay_clusters(frames: np.ndarray, assign: np.ndarray,
                     tokens_per_frame: int, alpha: float = 0.5) -> np.ndarray:
    """Blend cluster colors over the patch grid of each frame.

    frames: [T, H, W, 3] uint8; assign: [T * tokens_per_frame] ids over the
    flattened (frame-major) patch tokens.
    """
    T, H, W, _ = frames.shape
    g = int(tokens_per_frame ** 0.5)
    ph, pw = H // g, W // g
    out = frames.astype(np.float32).copy()
    colors = colorize(assign, int(assign.max()) + 1)
    for t in range(T):
        for p in range(tokens_per_frame):
            y, x = (p // g) * ph, (p % g) * pw
            c = colors[t * tokens_per_frame + p].astype(np.float32)
            out[t, y:y + ph, x:x + pw] = (1 - alpha) * \
                out[t, y:y + ph, x:x + pw] + alpha * c
    return out.clip(0, 255).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", type=str, required=True,
                        help="video file / .npy frames")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--max_frames", type=int, default=12)
    parser.add_argument("--cluster_num", type=int, default=49)
    parser.add_argument("--segment_frames", type=int, default=6)
    args = parser.parse_args()

    import jax.numpy as jnp
    from PIL import Image
    from ..data.decode import VideoDecoder
    from ..ops.kmedoids import batch_fast_kmedoids

    os.makedirs(args.output_dir, exist_ok=True)
    dec = VideoDecoder(size=224, is_train=False,
                       num_segments=args.max_frames)
    clip, n = dec.get_video_data(args.video)           # [T, C, 224, 224]
    T = clip.shape[0]
    grid = 7                                           # ViT-B/32 patch grid
    tokens = clip.reshape(T, 3, grid, 32, grid, 32)
    tokens = tokens.transpose(0, 2, 4, 1, 3, 5).reshape(T, grid * grid, -1)
    dur = T // max(T // args.segment_frames, 1)
    S = T // dur
    seg_tokens = tokens.reshape(S, dur * grid * grid, -1)
    assign, meds = batch_fast_kmedoids(jnp.asarray(seg_tokens),
                                       args.cluster_num)
    assign = np.asarray(assign)

    frames_u8 = (np.transpose(clip, (0, 2, 3, 1)) * 64 + 128).clip(
        0, 255).astype(np.uint8)
    for s in range(S):
        seg = overlay_clusters(frames_u8[s * dur:(s + 1) * dur], assign[s],
                               grid * grid)
        for i, frame in enumerate(seg):
            Image.fromarray(frame).save(
                os.path.join(args.output_dir, f"seg{s}_frame{i}.png"))
    print(f"wrote visualisations for {S} segments to {args.output_dir}")


if __name__ == "__main__":
    main()
