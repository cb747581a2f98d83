# coding=utf-8
"""Offline video compression: re-encode to 3 fps, 224-px short side
(reference: preprocess/compress_video.py).  Requires ffmpeg on PATH."""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor

# the reference's exact filter: scale the short side to 224, keep aspect,
# force even dimensions (compress_video.py:17-24)
SCALE_FILTER = ("scale='if(gt(a,1),trunc(oh*a/2)*2,224)'"
                ":'if(gt(a,1),224,trunc(ow*a/2)*2)'")


def compress(pair, fps: int = 3):
    src, dst = pair
    cmd = ["ffmpeg", "-y", "-i", src, "-filter:v", SCALE_FILTER,
           "-map", "0:v", "-r", str(fps), dst]
    proc = subprocess.run(cmd, stdin=subprocess.PIPE,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    return dst, proc.returncode


def prepare_pairs(input_root: str, output_root: str, ignore_exist=True):
    pairs = []
    for root, _, files in os.walk(input_root):
        for fname in files:
            dst = os.path.join(output_root, fname)
            if ignore_exist and os.path.exists(dst):
                continue
            pairs.append((os.path.join(root, fname), dst))
    return pairs


def main():
    parser = argparse.ArgumentParser(
        description="Compress videos to 3fps / 224px for training")
    parser.add_argument("--input_root", type=str, required=True)
    parser.add_argument("--output_root", type=str, required=True)
    parser.add_argument("--num_works", type=int, default=16)
    parser.add_argument("--fps", type=int, default=3)
    args = parser.parse_args()
    assert args.input_root != args.output_root
    if shutil.which("ffmpeg") is None:
        raise SystemExit("ffmpeg not found on PATH")
    os.makedirs(args.output_root, exist_ok=True)
    pairs = prepare_pairs(args.input_root, args.output_root)
    print(f"Total videos to process: {len(pairs)}")
    with ThreadPoolExecutor(max_workers=args.num_works) as pool:
        for i, (dst, code) in enumerate(
                pool.map(lambda p: compress(p, args.fps), pairs)):
            if code != 0:
                print(f"FAILED: {dst}")
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(pairs)}")


if __name__ == "__main__":
    main()
