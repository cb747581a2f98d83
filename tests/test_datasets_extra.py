# coding=utf-8
"""ActivityNet and DiDeMo datasets over synthetic fixtures (time-window
decode paths)."""
import json

import numpy as np
import pytest

from centerclip_tpu.data.datasets import ActivityNetDataset, DiDeMoDataset
from centerclip_tpu.models.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def _write_npy(path, T, seed=0):
    rng = np.random.default_rng(seed)
    np.save(path, rng.integers(0, 255, size=(T, 40, 48, 3)).astype(np.uint8))


def test_activitynet_dataset(tmp_path, tok):
    root = tmp_path / "act"
    (root / "videos").mkdir(parents=True)
    pseudo = [f"v_vid{i}" for i in range(3)]
    vids = [p[2:] for p in pseudo]
    for i, v in enumerate(vids):
        _write_npy(root / "videos" / f"{v}.npy", T=30, seed=i)
    with open(root / "val_ids.json", "w") as f:
        json.dump(pseudo, f)
    corpus = {p: {"duration": 7.5,
                  "sentences": [f"first thing {i}.", f"second thing {i}."]}
              for i, p in enumerate(pseudo)}
    with open(root / "val_1.json", "w") as f:
        json.dump(corpus, f)
    with open(root / "video_path.json", "w") as f:
        json.dump({v: f"{v}.npy" for v in vids}, f)

    ds = ActivityNetDataset(subset="val", data_path=str(root),
                            features_path=str(root / "videos"),
                            tokenizer=tok, max_words=16, max_frames=6)
    assert len(ds) == 3  # one paragraph per video
    s = ds[0]
    assert s["video"].shape == (1, 6, 3, 224, 224)
    # paragraph = joined sentences, truncated to max_words
    assert s["input_ids"][0, 0] == tok.encoder["<|startoftext|>"]
    # duration 7.5 -> window [0, 8] at preprocess fps 3 -> frames 0..24
    assert s["video_mask"].sum() == 6


def test_didemo_dataset(tmp_path, tok):
    root = tmp_path / "didemo"
    (root / "videos").mkdir(parents=True)
    vids = [f"flickr_vid_{i}.mp4" for i in range(3)]
    for i, v in enumerate(vids):
        _write_npy(root / "videos" / f"{v}.npy", T=40, seed=i)
    with open(root / "test_list.txt", "w") as f:
        f.write("\n".join(vids))
    corpus = []
    for i, v in enumerate(vids):
        for j in range(2):
            corpus.append({"video": v, "description": f"moment {i}-{j}",
                           "times": [[0, 2], [1, 3]]})
    with open(root / "test_data.json", "w") as f:
        json.dump(corpus, f)

    ds = DiDeMoDataset(subset="test", data_path=str(root),
                       features_path=str(root / "videos"),
                       tokenizer=tok, max_words=16, max_frames=4,
                       video_suffix=".npy")
    # whole-video [0,31] override collapses to one caption per video
    assert len(ds) == 3
    s = ds[0]
    assert s["video"].shape == (1, 4, 3, 224, 224)
    assert 1 <= s["video_mask"].sum() <= 4
