# coding=utf-8
"""Data layer tests: sampling goldens, transforms, decoder backends,
datasets over synthetic fixtures, loader sharding, framestore roundtrip."""
import json
import os
import pickle

import numpy as np
import pytest

from centerclip_tpu.config import make_run_config
from centerclip_tpu.data.datasets import (MSRVTTEvalDataset,
                                          MSRVTTTrainDataset, MSVDDataset,
                                          LSMDCDataset)
from centerclip_tpu.data.decode import VideoDecoder
from centerclip_tpu.data.framestore import FrameStore, build_framestore
from centerclip_tpu.data.loader import BatchLoader, collate
from centerclip_tpu.data.registry import DATALOADER_DICT
from centerclip_tpu.data.transforms import (CLIP_MEAN, CLIP_STD, center_crop,
                                            clip_eval_transform,
                                            group_to_bchw, normalize)
from centerclip_tpu.models.tokenizer import SimpleTokenizer
from centerclip_tpu.ops.sampling import (multi_segments_sampling,
                                         uniform_sampling)


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


# --- sampling goldens (formulas from reference sampling.py) -----------------
def test_uniform_sampling_golden():
    # num_frames=24, clip=12 -> tick=2, centers at 1,3,5,...
    np.testing.assert_array_equal(uniform_sampling(12, 24),
                                  np.arange(1, 24, 2))
    # short video: clipped arange, repeats the last frame
    np.testing.assert_array_equal(uniform_sampling(8, 5),
                                  [0, 1, 2, 3, 4, 4, 4, 4])
    # twice_sample doubles the indices
    assert len(uniform_sampling(12, 60, twice_sample=True)) == 24


def test_multi_segments_sampling():
    rng = np.random.default_rng(0)
    inds = multi_segments_sampling(12, 48, random_shift=True, rng=rng)
    assert len(inds) == 12
    # each index within its segment: avg_duration=4
    assert ((inds >= np.arange(12) * 4) & (inds < (np.arange(12) + 1) * 4)).all()
    # deterministic path == uniform centers
    got = multi_segments_sampling(12, 48, random_shift=False)
    np.testing.assert_array_equal(got, uniform_sampling(12, 48))


# --- transforms ---------------------------------------------------------------
def test_transform_pipeline(rng):
    frames = [rng.integers(0, 255, size=(240, 320, 3)).astype(np.uint8)
              for _ in range(4)]
    out = clip_eval_transform(frames, 224)
    assert out.shape == (4, 3, 224, 224)
    # spot-check: normalize(crop(x/255)) of the center pixel
    x = group_to_bchw(frames)
    cc = center_crop(x, 224)
    manual = (cc - np.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)) \
        / np.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    np.testing.assert_allclose(out, manual, rtol=1e-5, atol=1e-5)
    # pad path for small frames
    small = [rng.integers(0, 255, size=(100, 120, 3)).astype(np.uint8)]
    assert clip_eval_transform(small, 224).shape == (1, 3, 224, 224)


# --- decoder backends ----------------------------------------------------------
def _write_npy_video(path, T=20, H=240, W=320, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(T, H, W, 3)).astype(np.uint8)
    np.save(path, arr)
    return arr


def test_npy_backend(tmp_path):
    p = str(tmp_path / "vid.npy")
    _write_npy_video(p)
    dec = VideoDecoder(size=224, is_train=False, num_segments=12)
    clip, n = dec.get_video_data(p)
    assert clip.shape == (12, 3, 224, 224) and n == 12
    # short video -> mask length = num real frames
    p2 = str(tmp_path / "short.npy")
    _write_npy_video(p2, T=5)
    clip2, n2 = dec.get_video_data(p2)
    assert clip2.shape == (12, 3, 224, 224) and n2 == 5


def test_uint8_raw_pixel_path(tmp_path):
    """emit_uint8 ships cropped raw pixels whose on-device normalisation
    ((x/255 - mean)/std, clip4clip.py get_visual_output) reproduces the host
    float32 pipeline exactly."""
    p = str(tmp_path / "vid.npy")
    _write_npy_video(p)
    dec8 = VideoDecoder(size=224, is_train=False, num_segments=12,
                        emit_uint8=True)
    clip8, n8 = dec8.get_video_data(p)
    assert clip8.dtype == np.uint8 and clip8.shape == (12, 3, 224, 224)
    decf = VideoDecoder(size=224, is_train=False, num_segments=12)
    clipf, nf = decf.get_video_data(p)
    assert n8 == nf
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 3, 1, 1)
    device_norm = (clip8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(device_norm, clipf, rtol=1e-5, atol=1e-6)


def test_framestore_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vids = {f"video{i}": rng.integers(0, 255, size=(6, 8, 10, 3)).astype(
        np.uint8) for i in range(3)}
    path = build_framestore(vids, str(tmp_path / "train.fstore"))
    store = FrameStore(path)
    assert set(store.keys()) == set(vids)
    for k, v in vids.items():
        np.testing.assert_array_equal(store.get(k), v)
    # decoder integration: <store>.fstore/<key>
    dec = VideoDecoder(size=8, is_train=False, num_segments=4)
    clip, n = dec.get_video_data(path + "/video1")
    assert clip.shape == (4, 3, 8, 8) and n == 4


# --- datasets over synthetic fixtures ------------------------------------------
@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    vids = [f"video{i}" for i in range(6)]
    (root / "videos").mkdir()
    for i, v in enumerate(vids):
        _write_npy_video(str(root / "videos" / f"{v}.npy"), T=10 + i, seed=i)
    import pandas as pd
    pd.DataFrame({"video_id": vids[:4],
                  "sentence": [f"caption of clip {v}" for v in vids[:4]]}
                 ).to_csv(root / "test.csv", index=False)
    pd.DataFrame({"video_id": vids}).to_csv(root / "train.csv", index=False)
    corpus = {"sentences": [{"video_id": v,
                             "caption": f"{v} does something {j}"}
                            for v in vids for j in range(3)],
              "videos": [{"video_id": v, "url": f"x?v=parent_{v}"}
                         for v in vids]}
    with open(root / "MSRVTT_data.json", "w") as f:
        json.dump(corpus, f)
    return root


def test_msrvtt_eval_dataset(msrvtt_root, tok):
    ds = MSRVTTEvalDataset(csv_path=str(msrvtt_root / "test.csv"),
                           features_path=str(msrvtt_root / "videos"),
                           tokenizer=tok, max_words=16, max_frames=6,
                           video_suffix=".npy")
    assert len(ds) == 4
    s = ds[0]
    assert s["input_ids"].shape == (1, 16)
    assert s["video"].shape == (1, 6, 3, 224, 224)
    assert s["video_mask"].sum() == 6
    assert s["input_ids"][0, 0] == tok.encoder["<|startoftext|>"]


def test_msrvtt_train_dataset_unfold(msrvtt_root, tok):
    ds = MSRVTTTrainDataset(csv_path=str(msrvtt_root / "train.csv"),
                            json_path=str(msrvtt_root / "MSRVTT_data.json"),
                            features_path=str(msrvtt_root / "videos"),
                            unfold_sentences=True, tokenizer=tok,
                            max_words=16, max_frames=6, video_suffix=".npy")
    assert len(ds) == 18  # 6 videos x 3 captions
    s = ds[7]
    assert s["video"].shape == (1, 6, 3, 224, 224)


def test_threaded_loader_is_run_deterministic(msrvtt_root, tok):
    """Augmentation draws are keyed per (seed, epoch, sample), so a threaded
    loader yields bit-identical batches for ANY thread count or run —
    a dataset-level shared Generator made every TSN draw depend on thread
    interleaving (run-to-run loss divergence, found by the cross-process
    strategy-equivalence smoke in test_multiprocess.py)."""
    def batches(threads, epoch):
        ds = MSRVTTTrainDataset(csv_path=str(msrvtt_root / "train.csv"),
                                json_path=str(msrvtt_root / "MSRVTT_data.json"),
                                features_path=str(msrvtt_root / "videos"),
                                unfold_sentences=True, tokenizer=tok,
                                max_words=16, max_frames=6,
                                video_suffix=".npy")
        loader = BatchLoader(ds, 4, shuffle=True, drop_last=True, seed=7,
                             num_threads=threads)
        loader.set_epoch(epoch)
        return list(loader)

    a, b, c = batches(4, 1), batches(4, 1), batches(1, 1)
    for x, y, z in zip(a, b, c):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])   # same run twice
            np.testing.assert_array_equal(x[k], z[k])   # any thread count
    # a new epoch re-keys the TSN frame sampling itself (same sample idx,
    # different epoch -> different random segment offsets for some video
    # long enough to have >1 frame per segment)
    ds = MSRVTTTrainDataset(csv_path=str(msrvtt_root / "train.csv"),
                            json_path=str(msrvtt_root / "MSRVTT_data.json"),
                            features_path=str(msrvtt_root / "videos"),
                            unfold_sentences=True, tokenizer=tok,
                            max_words=16, max_frames=6, video_suffix=".npy")
    def epoch_videos(epoch):
        ds.set_epoch(epoch)
        return [ds[i]["video"] for i in range(len(ds))]
    e1, e2 = epoch_videos(1), epoch_videos(2)
    assert any(not np.array_equal(x, y) for x, y in zip(e1, e2))


def test_msvd_dataset_and_registry(tmp_path, tok):
    root = tmp_path / "msvd"
    (root / "videos").mkdir(parents=True)
    vids = [f"clip{i}" for i in range(4)]
    for i, v in enumerate(vids):
        _write_npy_video(str(root / "videos" / f"{v}.npy"), T=8, seed=i)
    for split in ("train", "val", "test"):
        with open(root / f"{split}_list.txt", "w") as f:
            f.write("\n".join(vids))
    caps = {v: [["a", "cat", "plays"], ["someone", "runs"]][:(i % 2) + 1]
            for i, v in enumerate(vids)}
    with open(root / "raw-captions.pkl", "wb") as f:
        pickle.dump(caps, f)

    ds = MSVDDataset(subset="test", data_path=str(root),
                     features_path=str(root / "videos"), tokenizer=tok,
                     max_words=12, max_frames=4)
    assert ds.multi_sentence_per_video
    assert ds.video_num == 4
    assert ds.sentence_num == len(ds)
    assert ds.cut_off_points[-1] == len(ds)
    s = ds[0]
    assert s["video"].shape == (1, 4, 3, 224, 224)

    # through the registry
    cfg = make_run_config(datatype="msvd", data_path=str(root),
                          features_path=str(root / "videos"),
                          max_words=12, max_frames=4, batch_size_val=3)
    loader, n = DATALOADER_DICT["msvd"]["test"](cfg, tok)
    batches = list(loader)
    assert sum(b["input_ids"].shape[0] for b in batches) == n
    assert batches[0]["video"].shape[1:] == (1, 4, 3, 224, 224)
    assert batches[0]["video_mask"].shape == (3, 4)


def test_lsmdc_dataset(tmp_path, tok):
    root = tmp_path / "lsmdc"
    (root / "videos").mkdir(parents=True)
    clips = [f"0001_Movie_{i:02d}.00.00-00.10" for i in range(3)]
    for i, c in enumerate(clips):
        _write_npy_video(str(root / "videos" / f"{c}.npy"), T=9, seed=i)
    with open(root / "LSMDC16_challenge_1000_publictect.csv", "w") as f:
        for c in clips:
            f.write(f"{c}\t0\t1\t0\t1\tSomeone walks away.\n")
    with open(root / "video_path.json", "w") as f:
        json.dump({c: f"{c}.npy" for c in clips}, f)
    ds = LSMDCDataset(subset="test", data_path=str(root),
                      features_path=str(root / "videos"), tokenizer=tok,
                      max_words=12, max_frames=4)
    assert len(ds) == 3
    assert ds[1]["video"].shape == (1, 4, 3, 224, 224)


# --- loader -----------------------------------------------------------------
class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"input_ids": np.full((1, 4), i, np.int32),
                "video": np.zeros((1, 2, 3, 4, 4), np.float32),
                "video_mask": np.ones((1, 2), np.int32)}


def test_loader_shuffle_shard_threads():
    ds = _ToyDataset(23)
    l0 = BatchLoader(ds, 4, shuffle=True, drop_last=True, seed=7,
                     process_index=0, process_count=2, num_threads=2)
    l1 = BatchLoader(ds, 4, shuffle=True, drop_last=True, seed=7,
                     process_index=1, process_count=2)
    l0.set_epoch(1)
    l1.set_epoch(1)
    seen0 = np.concatenate([b["input_ids"][:, 0] for b in l0])
    seen1 = np.concatenate([b["input_ids"][:, 0] for b in l1])
    # equal per-process step counts (padded DistributedSampler semantics);
    # with n=23 over 2 procs exactly one padded duplicate may overlap
    assert len(l0) == len(l1) and len(seen0) == len(seen1)
    overlap = set(seen0.tolist()) & set(seen1.tolist())
    assert len(overlap) <= 1
    # same epoch -> deterministic
    seen0b = np.concatenate([b["input_ids"][:, 0] for b in l0])
    np.testing.assert_array_equal(seen0, seen0b)
    # different epoch -> different order
    l0.set_epoch(2)
    seen0c = np.concatenate([b["input_ids"][:, 0] for b in l0])
    assert not np.array_equal(seen0, seen0c)
    # collate squeezes text pair axis but keeps video pair axis
    b = collate([ds[0], ds[1]])
    assert b["input_ids"].shape == (2, 4)
    assert b["video"].shape == (2, 1, 2, 3, 4, 4)
    assert b["video_mask"].shape == (2, 2)


def test_loader_equal_shards_all_worlds():
    """Every rank must see the SAME batch count for any (n, world) combo —
    unequal counts desync jitted step counts and hang collectives
    (reference pads the same way: data_dataloaders.py:26-39)."""
    for n in (5, 7, 8, 23, 24, 25):
        ds = _ToyDataset(n)
        for world in (1, 2, 3, 4):
            for drop_last in (False, True):
                loaders = [BatchLoader(ds, 2, shuffle=True, seed=3,
                                       drop_last=drop_last,
                                       process_index=r, process_count=world)
                           for r in range(world)]
                counts = [sum(1 for _ in l) for l in loaders]
                assert len(set(counts)) == 1, (n, world, drop_last, counts)
                assert counts[0] == len(loaders[0])
                # global coverage: every sample appears on some rank
                seen = set()
                for l in loaders:
                    for b in l:
                        seen.update(b["input_ids"][:, 0].tolist())
                if not drop_last:
                    assert seen == set(range(n)), (n, world)
