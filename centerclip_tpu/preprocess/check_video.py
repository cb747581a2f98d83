# coding=utf-8
"""Integrity scan of a video folder (reference: preprocess/check_video.py):
try to open + decode every file, report broken ones for the dataset skip
lists.  Works on video files (PyAV), .npy frame dumps and .fstore
containers."""
from __future__ import annotations

import argparse
import os

import numpy as np


def check_file(path: str) -> bool:
    try:
        if path.endswith(".npy"):
            arr = np.load(path, mmap_mode="r")
            return arr.ndim == 4 and arr.shape[0] > 0
        if path.endswith(".fstore"):
            from ..data.framestore import FrameStore
            store = FrameStore(path)
            for key in store.keys():
                frames = store.get(key)
                assert frames.shape[0] > 0
            return True
        import av
        container = av.open(path)
        n = 0
        for _ in container.decode(video=0):
            n += 1
        return n > 0
    except Exception:
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_root", type=str, required=True)
    args = parser.parse_args()
    broken = []
    total = 0
    for root, _, files in os.walk(args.input_root):
        for fname in sorted(files):
            path = os.path.join(root, fname)
            total += 1
            if not check_file(path):
                broken.append(path)
                print(f"BROKEN: {path}")
    print(f"checked {total} files; {len(broken)} broken")
    return broken


if __name__ == "__main__":
    main()
