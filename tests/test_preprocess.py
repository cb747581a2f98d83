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


def _synthetic_clip(tmp_path, T=4, hw=224):
    """Clusterable .npy clip: quadrant-colored frames."""
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 40, size=(T, hw, hw, 3)).astype(np.uint8)
    clip[:, : hw // 2, : hw // 2, 0] += 200     # distinct quadrants
    clip[:, : hw // 2, hw // 2:, 1] += 200
    clip[:, hw // 2:, : hw // 2, 2] += 200
    path = tmp_path / "clip.npy"
    np.save(path, clip)
    return str(path)


def test_visualize_patches_mode(tmp_path):
    """patch_video.py parity: crop-{i}.png + per-frame patch grid dumps."""
    from centerclip_tpu.preprocess import visualize_clusters as vc
    video = _synthetic_clip(tmp_path)
    out = tmp_path / "out"
    vc.main(["--video", video, "--output_dir", str(out),
             "--mode", "patches", "--max_frames", "4"])
    assert (out / "crop-1.png").exists() and (out / "crop-4.png").exists()
    # 224/32 = 7x7 = 49 patch files per frame, raster order, 1-based
    patches = sorted(os.listdir(out / "crop-2"))
    assert len(patches) == 49
    assert "crop-2-1.png" in patches and "crop-2-49.png" in patches


def test_visualize_mask_mode_and_ids_roundtrip(tmp_path):
    """visualize_video.py parity: masked frames; ids dump save + reload."""
    from PIL import Image
    from centerclip_tpu.preprocess import visualize_clusters as vc
    video = _synthetic_clip(tmp_path)
    out = tmp_path / "out"
    vc.main(["--video", video, "--output_dir", str(out), "--mode", "mask",
             "--max_frames", "4", "--segment_frames", "2",
             "--cluster_num", "8", "--save_ids", "1"])
    assert (out / "crop-masked-1.png").exists()
    assert (out / "crop-masked-4.png").exists()
    ids = np.load(out / "ids_0.npy")
    assert ids.shape == (2, 8)              # [segments, K]
    masked = np.asarray(Image.open(out / "crop-masked-1.png"))
    plain = np.asarray(Image.open(out / "crop-1.png"))
    assert masked.shape == plain.shape and not np.array_equal(masked, plain)

    # reference flow: render from a saved ids dump (visualize_video.py:74-97)
    out2 = tmp_path / "out2"
    vc.main(["--video", video, "--output_dir", str(out2), "--mode", "mask",
             "--max_frames", "4", "--id_path", str(out / "ids_0.npy")])
    masked2 = np.asarray(Image.open(out2 / "crop-masked-1.png"))
    assert np.array_equal(masked2, masked)


def test_visualize_overlay_mode(tmp_path):
    from centerclip_tpu.preprocess import visualize_clusters as vc
    video = _synthetic_clip(tmp_path)
    out = tmp_path / "out"
    vc.main(["--video", video, "--output_dir", str(out), "--mode", "overlay",
             "--max_frames", "4", "--segment_frames", "2",
             "--cluster_num", "8"])
    assert (out / "seg0_frame0.png").exists()
    assert (out / "seg1_frame1.png").exists()
