# coding=utf-8
"""Serving stack: VideoIndex top-k vs brute force, quantisation modes,
save/load roundtrip, and RetrievalEngine score parity with the batch
Evaluator (the engine's online scores must be EXACTLY the model's
`get_similarity_logits` for the loose headers, reference
clip4clip.py:324-367)."""
import dataclasses

import numpy as np
import pytest
import jax

from tests.test_train_eval import tiny_cfg, make_batch, T
from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.parallel.mesh import create_mesh
from centerclip_tpu.serve import RetrievalEngine, VideoIndex
from centerclip_tpu.serve.index import _next_bucket
from centerclip_tpu.train.evaluate import Evaluator


# --------------------------------------------------------------------- index
def test_next_bucket():
    assert _next_bucket(1) == 1
    assert _next_bucket(3) == 4
    assert _next_bucket(128) == 128
    assert _next_bucket(129) == 256  # beyond the table: round up to multiple


def _rand_index_inputs(rng, n=37, d=32):
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = [f"vid{i}" for i in range(n)]
    return emb, ids


def test_index_topk_matches_bruteforce(rng):
    emb, ids = _rand_index_inputs(rng)
    index = VideoIndex(emb, ids)
    q = rng.normal(size=(5, emb.shape[1])).astype(np.float32)

    scores, idx = index.search(q, k=7)
    assert scores.shape == (5, 7) and idx.shape == (5, 7)

    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    ref = qn @ en.T
    ref_order = np.argsort(-ref, axis=1)[:, :7]
    # bf16 matmul: rankings must match on well-separated random scores
    np.testing.assert_array_equal(idx, ref_order)
    np.testing.assert_allclose(
        scores, np.take_along_axis(ref, ref_order, axis=1),
        rtol=2e-2, atol=2e-2)
    # padding never escapes
    assert idx.max() < len(ids)


def test_index_k_clamped_and_single_query(rng):
    emb, ids = _rand_index_inputs(rng, n=6)
    index = VideoIndex(emb, ids)
    scores, idx = index.search(rng.normal(size=(emb.shape[1],)), k=100)
    assert scores.shape == (1, 6)          # k clamped to n_valid
    assert sorted(idx[0].tolist()) == list(range(6))
    with pytest.raises(ValueError):
        index.search(np.zeros((1, emb.shape[1])), k=0)


@pytest.mark.parametrize("quantize", ["bfloat16", "int8"])
def test_index_quantized_ranking(rng, quantize):
    emb, ids = _rand_index_inputs(rng, n=24, d=64)
    exact = VideoIndex(emb, ids, quantize="float32")
    quant = VideoIndex(emb, ids, quantize=quantize)
    q = rng.normal(size=(4, 64)).astype(np.float32)
    s_ex, i_ex = exact.search(q, k=24)
    s_q, i_q = quant.search(q, k=24)
    # top-1 survives quantisation on random (well-separated) galleries and
    # the full score vector stays close
    np.testing.assert_array_equal(i_ex[:, 0], i_q[:, 0])
    order = np.argsort(i_ex, axis=1)
    np.testing.assert_allclose(
        np.take_along_axis(s_ex, order, axis=1),
        np.take_along_axis(s_q, np.argsort(i_q, axis=1), axis=1),
        rtol=0.05, atol=0.05)


@pytest.mark.parametrize("quantize", ["float32", "bfloat16", "int8"])
def test_index_save_load_roundtrip(rng, tmp_path, quantize):
    emb, ids = _rand_index_inputs(rng, n=19)
    index = VideoIndex(emb, ids, quantize=quantize)
    path = str(tmp_path / "gallery.npz")
    index.save(path)
    loaded = VideoIndex.load(path)
    assert loaded.video_ids == index.video_ids
    assert loaded.quantize == quantize
    assert loaded.n_valid == index.n_valid
    # stored codes restored bit-exactly -> identical scores
    q = rng.normal(size=(3, emb.shape[1])).astype(np.float32)
    s0, i0 = index.search(q, k=10)
    s1, i1 = loaded.search(q, k=10)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(s0, s1)


def test_index_sharded_matches_unsharded(rng):
    emb, ids = _rand_index_inputs(rng, n=21)
    plain = VideoIndex(emb, ids)
    sharded = VideoIndex(emb, ids, mesh=create_mesh())
    assert sharded.n_padded % 8 == 0
    q = rng.normal(size=(2, emb.shape[1])).astype(np.float32)
    s0, i0 = plain.search(q, k=9)
    s1, i1 = sharded.search(q, k=9)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quantize", ["float32", "int8"])
def test_index_add_matches_fresh_build(rng, quantize):
    """Incremental add must equal building the full gallery at once (per-row
    quantisation makes appends exact), including the stale-executable and
    re-padding edges."""
    emb, ids = _rand_index_inputs(rng, n=13)
    more = rng.normal(size=(9, emb.shape[1])).astype(np.float32)
    grown = VideoIndex(emb, ids, quantize=quantize)
    q = rng.normal(size=(3, emb.shape[1])).astype(np.float32)
    grown.search(q, k=4)  # populate the executable cache pre-add
    grown.add(more, [f"new{i}" for i in range(9)])
    fresh = VideoIndex(np.concatenate([emb, more]),
                       ids + [f"new{i}" for i in range(9)],
                       quantize=quantize)
    assert grown.n_valid == fresh.n_valid == 22
    assert grown.video_ids == fresh.video_ids
    s0, i0 = grown.search(q, k=22)
    s1, i1 = fresh.search(q, k=22)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(s0, s1)
    with pytest.raises(ValueError):
        grown.add(more[:, :4], ["bad"] * 9)


# -------------------------------------------------------------------- engine
def _init_engine_model(rng, **over):
    # clustering off: k-medoids argmin ties on random frames flip under the
    # engine's different batch padding; the serving plumbing is under test
    base = dict(inter=False, cluster_num_blocks=(),
                target_frames_blocks=())
    base.update(over)
    run = tiny_cfg(**base)
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"],
                        training=True)["params"]
    return run, model, params


@pytest.mark.parametrize("sim_header", ["meanP", "seqTransf"])
def test_engine_matches_evaluator(rng, sim_header):
    """The full online path (pooled gallery + jitted query tower + top-k)
    must reproduce the batch Evaluator's similarity matrix."""
    run, model, params = _init_engine_model(rng, sim_header=sim_header)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    batches.append(make_batch(np.random.default_rng(9), 3))  # ragged tail

    sim = Evaluator(model, params).evaluate(batches)["sim_matrix"]

    engine = RetrievalEngine(model, params)
    video_ids = [f"v{i}" for i in range(sim.shape[1])]
    engine.build_index(
        ({"video": b["video"], "video_mask": b["video_mask"]}
         for b in batches), video_ids)
    n = len(video_ids)

    q = engine.encode_token_ids(
        np.concatenate([b["input_ids"] for b in batches]))
    scores, idx = engine.index.search(q, k=n)
    scores = scores * engine.logit_scale
    full = np.zeros_like(sim)
    np.put_along_axis(full, idx, scores, axis=1)
    # engine scores ride a bf16 MXU matmul; eval is fp32 — ranking-stable
    np.testing.assert_allclose(full, sim, rtol=2e-2, atol=2e-2)

    # and the top hit agrees with the eval matrix for every query
    np.testing.assert_array_equal(idx[:, 0], np.argmax(sim, axis=1))


def test_engine_search_end_to_end(rng):
    """String queries through the real tokenizer -> ranked ids; shape and
    ordering contracts of `search`."""
    run, model, params = _init_engine_model(rng)
    engine = RetrievalEngine(model, params)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    engine.build_index(
        ({"video": b["video"], "video_mask": b["video_mask"]}
         for b in batches), [f"v{i}" for i in range(16)])
    # tiny 64-token vocab can't fit the real tokenizer's ids -> clamp
    ids, _, _ = __import__(
        "centerclip_tpu.models.tokenizer", fromlist=["tokenize_batch"]
    ).tokenize_batch(engine.tokenizer, ["a cat", "a dog playing"],
                     max_words=run.model.max_words)
    ids = np.clip(ids, 0, 63).astype(np.int32)
    out = engine.encode_token_ids(ids)
    assert out.shape == (2, 16)  # EMBED=16
    scores, idx = engine.index.search(out, k=3)
    assert scores.shape == (2, 3)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # descending
    results = [[{"video_id": engine.index.video_ids[int(i)],
                 "score": float(s)} for s, i in zip(srow, irow)]
               for srow, irow in zip(scores, idx)]
    assert all(len(r) == 3 for r in results)


def test_engine_mesh_matches_single_device(rng):
    run, model, params = _init_engine_model(rng)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    vids = [f"v{i}" for i in range(16)]
    vb = lambda: ({"video": b["video"], "video_mask": b["video_mask"]}
                  for b in batches)

    single = RetrievalEngine(model, params)
    single.build_index(vb(), vids)
    sharded = RetrievalEngine(model, params, mesh=create_mesh())
    sharded.build_index(vb(), vids)

    ids = np.concatenate([b["input_ids"] for b in batches])[:5]
    q0 = single.encode_token_ids(ids)
    q1 = sharded.encode_token_ids(ids)
    np.testing.assert_allclose(q0, q1, rtol=2e-4, atol=2e-4)
    s0, i0 = single.index.search(q0, k=4)
    s1, i1 = sharded.index.search(q1, k=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-3, atol=1e-3)


def test_engine_fused_search_matches_two_step(rng):
    """`search_token_ids` (one fused dispatch) must reproduce the two-step
    encode_token_ids + VideoIndex.search path: same ranking, same scores up
    to the device-vs-host placement of the second normalise (ulps into a
    bf16 matmul)."""
    run, model, params = _init_engine_model(rng)
    engine = RetrievalEngine(model, params)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    engine.build_index(
        ({"video": b["video"], "video_mask": b["video_mask"]}
         for b in batches), [f"v{i}" for i in range(16)])
    ids = np.concatenate([b["input_ids"] for b in batches])[:5]

    q = engine.encode_token_ids(ids)
    s_two, i_two = engine.index.search(q, k=4)
    s_fused, i_fused = engine.search_token_ids(ids, k=4)

    np.testing.assert_allclose(s_fused, s_two * engine.logit_scale,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(i_fused[:, 0], i_two[:, 0])
    for rf, rt in zip(i_fused, i_two):           # same top-k set per query
        assert set(rf.tolist()) == set(rt.tolist())
    # k is clamped to the gallery like VideoIndex.search
    s_all, i_all = engine.search_token_ids(ids[:1], k=99)
    assert s_all.shape == (1, 16) and sorted(i_all[0]) == list(range(16))
    with pytest.raises(RuntimeError, match="no index"):
        RetrievalEngine(model, params).search_token_ids(ids, k=2)


def test_engine_warmup(rng):
    run, model, params = _init_engine_model(rng)
    engine = RetrievalEngine(model, params)
    assert engine.warmup(max_queries=8) == 4  # buckets 1, 2, 4, 8
    batches = [make_batch(np.random.default_rng(0), 8)]
    engine.build_index(
        ({"video": b["video"], "video_mask": b["video_mask"]}
         for b in batches), [f"v{i}" for i in range(8)])
    assert engine.warmup(k=3, max_queries=4) == 3


def test_engine_rejects_tighttransf(rng):
    run = tiny_cfg(sim_header="tightTransf", loose_type=False,
                   inter=False, cluster_num_blocks=(),
                   target_frames_blocks=())
    model = CLIP4Clip(run.model)
    with pytest.raises(ValueError, match="pooled index"):
        RetrievalEngine(model, params={"clip": {"logit_scale": np.zeros(())}})


def test_engine_chunks_large_batches_to_index_bucket(rng):
    """An index that advertises `max_query_bucket` (the IVF index: its
    probe gather materialises [Q, nprobe, cap, D]) must have large query
    batches split into per-chunk fused dispatches by the ENGINE — the
    public path, not just IVFVideoIndex.search — with results identical
    to the unchunked program (queries score independently)."""
    run, model, params = _init_engine_model(rng)
    engine = RetrievalEngine(model, params)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    engine.build_index(
        ({"video": b["video"], "video_mask": b["video_mask"]}
         for b in batches), [f"v{i}" for i in range(16)])
    ids = np.concatenate([b["input_ids"] for b in batches])  # 16 queries

    s_ref, i_ref = engine.search_token_ids(ids, k=4)   # flat: unchunked
    engine.index.max_query_bucket = 5                  # force chunking
    s_chk, i_chk = engine.search_token_ids(ids, k=4)
    np.testing.assert_allclose(s_chk, s_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i_chk, i_ref)
