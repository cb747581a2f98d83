# coding=utf-8
"""Pack videos into a FrameStore (the TPU-native analogue of the reference's
LMDB builder, preprocess/folder2lmdb.py).

Unlike the LMDB path — which stores compressed video bytes and pays an
FFmpeg decode per training sample — this decodes ONCE offline at the training
fps/resolution and stores raw frames for zero-copy mmap reads.

Inputs per video: a playable video file (requires PyAV), a directory of
image frames, or a pre-decoded .npy of [T, H, W, C] uint8.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.framestore import FrameStoreWriter


def iter_videos(input_root: str):
    for root, _, files in os.walk(input_root):
        for fname in sorted(files):
            yield os.path.join(root, fname)


def decode_video_file(path: str, short_side: int = 224, fps: float = 3.0
                      ) -> np.ndarray:
    """Decode + resample a video to `fps`, short side `short_side`."""
    import av
    container = av.open(path)
    stream = container.streams.video[0]
    in_fps = float(stream.average_rate)
    step = max(int(round(in_fps / fps)), 1)
    frames = []
    for i, frame in enumerate(container.decode(video=0)):
        if i % step:
            continue
        img = frame.to_rgb().to_ndarray()
        frames.append(_resize_short_side(img, short_side))
    return np.stack(frames)


def _resize_short_side(img: np.ndarray, short: int) -> np.ndarray:
    from PIL import Image
    h, w = img.shape[:2]
    if min(h, w) == short:
        return img
    if h < w:
        nh, nw = short, max(int(round(w * short / h)) // 2 * 2, 2)
    else:
        nw, nh = short, max(int(round(h * short / w)) // 2 * 2, 2)
    return np.asarray(Image.fromarray(img).resize((nw, nh),
                                                  Image.BILINEAR))


def load_frames(path: str, short_side: int, fps: float) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if os.path.isdir(path):
        from PIL import Image
        files = sorted(f for f in os.listdir(path)
                       if f.lower().endswith((".jpg", ".jpeg", ".png")))
        return np.stack([np.asarray(Image.open(os.path.join(path, f))
                                    .convert("RGB")) for f in files])
    return decode_video_file(path, short_side, fps)


def main():
    parser = argparse.ArgumentParser(
        description="Pack a video folder into a .fstore frame container")
    parser.add_argument("--input_root", type=str, required=True)
    parser.add_argument("--output", type=str, required=True,
                        help="output .fstore path")
    parser.add_argument("--short_side", type=int, default=224)
    parser.add_argument("--fps", type=float, default=3.0)
    args = parser.parse_args()
    n = 0
    with FrameStoreWriter(args.output) as writer:
        for path in iter_videos(args.input_root):
            key = ".".join(os.path.basename(path).split(".")[:-1]) \
                if "." in os.path.basename(path) else os.path.basename(path)
            try:
                frames = load_frames(path, args.short_side, args.fps)
            except Exception as e:
                print(f"SKIP {path}: {e}")
                continue
            writer.add(key, np.ascontiguousarray(frames, np.uint8))
            n += 1
            if n % 100 == 0:
                print(f"packed {n} videos")
    print(f"done: {n} videos -> {args.output}")


if __name__ == "__main__":
    main()
