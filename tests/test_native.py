# coding=utf-8
"""Native C++ FrameStore reader: parity with the Python transform pipeline
and the batched fast dataset path."""
import numpy as np
import pytest

from centerclip_tpu.data.framestore import build_framestore
from centerclip_tpu.data.native import NativeFrameStore, native_available
from centerclip_tpu.data.fast_dataset import FrameStoreClipDataset
from centerclip_tpu.data.loader import BatchLoader
from centerclip_tpu.data.transforms import clip_eval_transform
from centerclip_tpu.models.tokenizer import SimpleTokenizer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("fstore")
    rng = np.random.default_rng(0)
    vids = {}
    # mixed sizes: bigger than crop, exactly crop, smaller than crop (pad)
    for i, (h, w) in enumerate([(240, 320), (64, 64), (40, 72)]):
        vids[f"vid{i}"] = rng.integers(
            0, 255, size=(8 + i, h, w, 3)).astype(np.uint8)
    path = build_framestore(vids, str(root / "test.fstore"))
    return path, vids


def test_open_and_info(store):
    path, vids = store
    ns = NativeFrameStore(path)
    assert len(ns) == 3
    t, h, w, c = ns.entry_info(ns.entry_id("vid1"))
    assert (t, h, w, c) == (9, 64, 64, 3)
    with pytest.raises(KeyError):
        ns.entry_id("nope")


@pytest.mark.parametrize("size", [64, 56])
def test_gather_matches_python_transform(store, size):
    path, vids = store
    ns = NativeFrameStore(path, num_threads=3)
    keys = ["vid0", "vid1", "vid2"]
    T = 4
    rng = np.random.default_rng(1)
    frame_idx = np.stack([
        np.sort(rng.integers(0, len(vids[k]), size=T)) for k in keys])
    eids = [ns.entry_id(k) for k in keys]
    out = ns.gather_batch(eids, frame_idx, size=size)
    assert out.shape == (3, T, 3, size, size)
    for b, k in enumerate(keys):
        frames = [vids[k][i] for i in frame_idx[b]]
        ref = clip_eval_transform(frames, size)
        np.testing.assert_allclose(out[b], ref, rtol=1e-5, atol=1e-5)


def test_frame_index_clamping(store):
    path, vids = store
    ns = NativeFrameStore(path)
    # out-of-range indices clamp to [0, T-1] like the short-video sampling
    out = ns.gather_batch([ns.entry_id("vid0")],
                          np.array([[-5, 0, 999, 7]]), size=32)
    ref = ns.gather_batch([ns.entry_id("vid0")],
                          np.array([[0, 0, 7, 7]]), size=32)
    np.testing.assert_array_equal(out, ref)


def test_fast_dataset_and_loader(store):
    path, vids = store
    tok = SimpleTokenizer()
    pairs = [("vid0", "a dog runs"), ("vid1", "a cat sits"),
             ("vid2", "rain falls"), ("vid0", "the dog jumps")]
    ds = FrameStoreClipDataset(path, pairs, tok, max_words=8, max_frames=6,
                               image_resolution=48, is_train=False)
    loader = BatchLoader(ds, batch_size=3, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["video"].shape == (3, 1, 6, 3, 48, 48)
    assert b["input_ids"].shape == (3, 8)
    # vid2 has 10 frames -> all 6 slots valid; masks full here
    assert b["video_mask"].shape == (3, 6)
    # per-sample protocol agrees with the batch protocol
    s = ds[1]
    np.testing.assert_array_equal(s["input_ids"], b["input_ids"][1])


def test_u8_gather_plus_device_normalize(store):
    """uint8 crop-only gather + on-device normalization == float path."""
    import jax.numpy as jnp
    from centerclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    path, vids = store
    ns = NativeFrameStore(path)
    keys = ["vid0", "vid2"]
    T, size = 3, 56
    fidx = np.array([[0, 2, 4], [1, 3, 5]])
    eids = [ns.entry_id(k) for k in keys]
    f32 = ns.gather_batch(eids, fidx, size=size)
    u8 = ns.gather_batch_u8(eids, fidx, size=size)
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 1, 3, 1, 1)
    normed = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(normed, f32, rtol=1e-5, atol=1e-5)
