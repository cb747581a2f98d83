# coding=utf-8
"""Preprocess tooling: framestore builder end-to-end, integrity checker,
video_path generator, CLI entry points importable."""
import importlib
import json
import os
import sys

import numpy as np
import pytest

from centerclip_tpu.data.framestore import FrameStore


def test_build_framestore_cli(tmp_path, monkeypatch):
    src = tmp_path / "vids"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(src / f"clip{i}.npy",
                rng.integers(0, 255, size=(5, 16, 20, 3)).astype(np.uint8))
    out = str(tmp_path / "packed.fstore")
    from centerclip_tpu.preprocess import build_framestore as bf
    monkeypatch.setattr(sys, "argv",
                        ["x", "--input_root", str(src), "--output", out])
    bf.main()
    store = FrameStore(out)
    assert set(store.keys()) == {"clip0", "clip1", "clip2"}
    assert store.get("clip1").shape == (5, 16, 20, 3)


def test_check_video_cli(tmp_path, monkeypatch, capsys):
    root = tmp_path / "vids"
    root.mkdir()
    np.save(root / "good.npy",
            np.zeros((4, 8, 8, 3), np.uint8))
    (root / "broken.npy").write_bytes(b"not a numpy file")
    from centerclip_tpu.preprocess import check_video as cv
    monkeypatch.setattr(sys, "argv", ["x", "--input_root", str(root)])
    broken = cv.main()
    assert len(broken) == 1 and broken[0].endswith("broken.npy")


def test_generate_video_path_cli(tmp_path, monkeypatch):
    root = tmp_path / "vids"
    (root / "sub").mkdir(parents=True)
    np.save(root / "a.npy", np.zeros((1, 4, 4, 3), np.uint8))
    np.save(root / "sub" / "b.npy", np.zeros((1, 4, 4, 3), np.uint8))
    out = str(tmp_path / "video_path.json")
    from centerclip_tpu.preprocess import generate_video_path as gvp
    monkeypatch.setattr(sys, "argv", ["x", "--features_path", str(root),
                                      "--output", out])
    gvp.main()
    with open(out) as f:
        mapping = json.load(f)
    assert mapping == {"a": "a.npy", "b": os.path.join("sub", "b.npy")}


@pytest.mark.parametrize("mod", [
    "compress_video", "folder2lmdb", "download_lsmdc", "visualize_clusters"])
def test_cli_modules_import(mod):
    importlib.import_module(f"centerclip_tpu.preprocess.{mod}")
