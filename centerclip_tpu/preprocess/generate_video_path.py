# coding=utf-8
"""Generate the video_id -> relative-path json used by the LSMDC and
ActivityNet loaders (reference: preprocess/generate_video_path.py)."""
from __future__ import annotations

import argparse
import json
import os

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".webm", ".3gp", ".mpg", ".mov",
              ".npy")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--features_path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args()
    mapping = {}
    for root, _, files in os.walk(args.features_path):
        for fname in sorted(files):
            if not fname.lower().endswith(VIDEO_EXTS):
                continue
            vid = ".".join(fname.split(".")[:-1])
            rel = os.path.relpath(os.path.join(root, fname),
                                  args.features_path)
            mapping[vid] = rel
    with open(args.output, "w") as f:
        json.dump(mapping, f, indent=2)
    print(f"wrote {len(mapping)} entries to {args.output}")


if __name__ == "__main__":
    main()
