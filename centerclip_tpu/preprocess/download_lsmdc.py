# coding=utf-8
"""LSMDC downloader (reference: preprocess/download_lsmdc.py): parallel
authenticated fetch of the clip list + ffmpeg resize.  Network access and
credentials required; the pipeline after download is compress_video /
build_framestore."""
from __future__ import annotations

import argparse
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor


def download_one(url: str, out_dir: str, user: str, password: str) -> int:
    name = url.split("/")[-1]
    dst = os.path.join(out_dir, name)
    if os.path.exists(dst):
        return 0
    cmd = ["wget", "-q", f"--user={user}", f"--password={password}",
           "-O", dst, url]
    return subprocess.run(cmd).returncode


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--url_list", type=str, required=True,
                        help="text file with one clip URL per line")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--user", type=str, required=True)
    parser.add_argument("--password", type=str, required=True)
    parser.add_argument("--num_works", type=int, default=8)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.url_list) as f:
        urls = [u.strip() for u in f if u.strip()]
    with ThreadPoolExecutor(max_workers=args.num_works) as pool:
        codes = list(pool.map(
            lambda u: download_one(u, args.output_dir, args.user,
                                   args.password), urls))
    failed = sum(1 for c in codes if c != 0)
    print(f"downloaded {len(urls) - failed}/{len(urls)}")


if __name__ == "__main__":
    main()
