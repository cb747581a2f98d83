# coding=utf-8
"""IVF (cluster-pruned) index: exactness at nprobe=K vs the flat
VideoIndex, recall on clusterable galleries, capacity/spill invariants,
save/load, add, and the fused RetrievalEngine path."""
import numpy as np
import pytest

from tests.test_serve import _init_engine_model, make_batch
from centerclip_tpu.serve import RetrievalEngine, VideoIndex
from centerclip_tpu.serve.ivf import (IVFVideoIndex, _capacity_assign,
                                      spherical_kmeans)


def _clustered_gallery(rng, n=512, d=32, n_centers=16, noise=0.15):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, n_centers, size=n)
    emb = centers[which] + noise * rng.normal(size=(n, d)).astype(np.float32)
    return emb.astype(np.float32)


# ------------------------------------------------------------------- builds
def test_spherical_kmeans_unit_centroids(rng):
    emb = _clustered_gallery(rng)
    c = spherical_kmeans(emb, 16, iters=8)
    assert c.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-4)
    with pytest.raises(ValueError):
        spherical_kmeans(emb, 0)
    with pytest.raises(ValueError):
        spherical_kmeans(emb[:4], 5)


def test_capacity_assign_respects_cap_and_prefers_best(rng):
    sims = rng.normal(size=(40, 4)).astype(np.float32)
    pref = np.argsort(-sims, axis=1)
    val = np.take_along_axis(sims, pref, axis=1)
    out = _capacity_assign(pref, val, k=4, cap=10)
    assert out.min() >= 0
    assert np.bincount(out, minlength=4).max() <= 10
    # uncapped rows go to their argmax
    loose = _capacity_assign(pref, val, k=4, cap=40)
    np.testing.assert_array_equal(loose, np.argmax(sims, axis=1))
    # truncated preference list: overflow rows still land in open cells
    trunc = _capacity_assign(pref[:, :1], val[:, :1], k=4, cap=10)
    assert trunc.min() >= 0
    assert np.bincount(trunc, minlength=4).max() <= 10
    with pytest.raises(ValueError, match="capacity"):
        _capacity_assign(pref, val, k=4, cap=9)


def test_ivf_full_probe_matches_flat_exact(rng):
    """nprobe == n_clusters scores every row -> must reproduce the flat
    index's ranking and scores (same bf16/fp32 math, different layout)."""
    emb = _clustered_gallery(rng)
    ids = [f"v{i}" for i in range(len(emb))]
    q = rng.normal(size=(5, emb.shape[1])).astype(np.float32)
    for quant in ("float32", "int8"):
        flat = VideoIndex(emb, ids, quantize=quant)
        ivf = IVFVideoIndex(emb, ids, quantize=quant, n_clusters=16)
        s0, i0 = flat.search(q, k=7)
        s1, i1 = ivf.search(q, k=7, nprobe=16)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-3, atol=1e-3)


def test_ivf_recall_and_pruning(rng):
    emb = _clustered_gallery(rng, n=1024, n_centers=16)
    ids = [str(i) for i in range(len(emb))]
    flat = VideoIndex(emb, ids)
    ivf = IVFVideoIndex(emb, ids, n_clusters=16, nprobe=4)
    q = _clustered_gallery(rng, n=32, n_centers=16)
    _, exact = flat.search(q, k=10)
    _, approx = ivf.search(q, k=10)            # default nprobe=4 of 16
    recall = np.mean([len(set(a) & set(e)) / 10.0
                      for a, e in zip(approx, exact)])
    assert recall >= 0.9, recall                # clusterable data: near-exact
    # indices are real rows, never padding/empty slots
    assert approx.min() >= 0 and approx.max() < len(emb)
    # probing fewer cells can only lower the returned scores
    s1, _ = ivf.search(q[:1], k=5, nprobe=1)
    s16, _ = ivf.search(q[:1], k=5, nprobe=16)
    assert np.all(s16 + 1e-5 >= s1)
    # k beyond the reachable rows clamps (like flat clamps to n_valid);
    # slots past the probed cells' occupancy are explicit no-results
    # (score -inf, id -1) — never a wrapped-around real id
    s, i = ivf.search(q[:1], k=2 * ivf.capacity, nprobe=1)
    assert s.shape[1] == ivf.capacity
    finite = np.isfinite(s)
    assert np.all(i[finite] >= 0) and np.all(i[~finite] == -1)
    assert finite.sum() > 0


def test_ivf_default_clusters_and_tiny_gallery(rng):
    emb = rng.normal(size=(12, 16)).astype(np.float32)
    ivf = IVFVideoIndex(emb, [str(i) for i in range(12)])
    assert 1 <= ivf.n_clusters <= 12
    s, i = ivf.search(emb[3], k=3, nprobe=ivf.n_clusters)
    assert i[0, 0] == 3                         # self-match survives
    assert len(ivf) == 12


def test_ivf_save_load_roundtrip(rng, tmp_path):
    emb = _clustered_gallery(rng, n=256)
    ids = [f"v{i}" for i in range(256)]
    for quant in ("float32", "bfloat16", "int8"):
        ivf = IVFVideoIndex(emb, ids, quantize=quant, n_clusters=8,
                            nprobe=3)
        path = str(tmp_path / f"ivf_{quant}.npz")
        ivf.save(path)
        back = IVFVideoIndex.load(path)
        assert back.n_clusters == 8 and back.nprobe == 3
        assert back.video_ids == ids
        q = rng.normal(size=(3, emb.shape[1])).astype(np.float32)
        s0, i0 = ivf.search(q, k=5)
        s1, i1 = back.search(q, k=5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-5)
    with pytest.raises(ValueError, match="single-device"):
        IVFVideoIndex.load(str(tmp_path / "ivf_int8.npz"), mesh=object())


def test_ivf_add_matches_fresh_build(rng):
    """Incremental add (O(M) scatter into free slots — no re-group) must
    stay EXACT at nprobe == n_clusters: every occupied row is scored, so
    results equal the flat index over the concatenated gallery."""
    emb = _clustered_gallery(rng, n=300)
    ids = [f"v{i}" for i in range(300)]
    ivf = IVFVideoIndex(emb[:200], ids[:200], quantize="int8",
                        n_clusters=8, seed=1)
    cap_before = ivf.capacity
    ivf.add(emb[200:], ids[200:])
    assert len(ivf) == 300 and ivf.video_ids == ids
    # the incremental path was taken: capacity untouched, invariants hold
    assert ivf.capacity == cap_before
    occ = (ivf._rowids_host >= 0).sum(axis=1)
    assert occ.sum() == 300 and occ.max() <= ivf.capacity
    present = np.sort(ivf._rowids_host[ivf._rowids_host >= 0])
    np.testing.assert_array_equal(present, np.arange(300))
    # host and device grouped arrays agree after the scatter
    np.testing.assert_array_equal(np.asarray(ivf._rowids),
                                  ivf._rowids_host)
    flat = VideoIndex(emb, ids, quantize="int8")
    q = rng.normal(size=(4, emb.shape[1])).astype(np.float32)
    s0, i0 = ivf.search(q, k=6, nprobe=8)
    s1, i1 = flat.search(q, k=6)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-4)


def test_ivf_add_regroups_when_out_of_room(rng):
    """Appending more rows than the cells' free slots triggers the full
    re-group fallback (capacity recomputed), still exact at full probe."""
    emb = _clustered_gallery(rng, n=400)
    ids = [f"v{i}" for i in range(400)]
    ivf = IVFVideoIndex(emb[:64], ids[:64], n_clusters=4,
                        capacity_factor=1.0, seed=1)
    room = ivf.n_clusters * ivf.capacity - 64
    assert room < 336   # the add below cannot fit incrementally
    ivf.add(emb[64:], ids[64:])
    assert len(ivf) == 400
    assert ivf.n_clusters * ivf.capacity >= 400
    s0, i0 = ivf.search(emb[:3], k=5, nprobe=ivf.n_clusters)
    s1, i1 = VideoIndex(emb, ids).search(emb[:3], k=5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-3, atol=1e-3)


def test_ivf_add_spill_threshold_regroups(rng):
    """Once cumulative add-time spill crosses SPILL_REGROUP_FRACTION the
    next add re-groups everything and resets the spill counter."""
    emb = _clustered_gallery(rng, n=256, n_centers=4)
    ids = [f"v{i}" for i in range(256)]
    ivf = IVFVideoIndex(emb[:128], ids[:128], n_clusters=4,
                        capacity_factor=3.0, seed=1)
    assert ivf._spilled == 0
    # force every appended row toward one (soon-full) cell: copies of the
    # row whose cell is already the most loaded
    occ = (ivf._rowids_host >= 0).sum(axis=1)
    hot = int(np.argmax(occ))
    hot_vec = ivf.centroids[hot][None]
    n_fill = int(ivf.capacity - occ[hot])
    fill = np.repeat(hot_vec, n_fill + 40, axis=0)
    fill += 0.01 * rng.normal(size=fill.shape).astype(np.float32)
    cap_before = ivf.capacity
    ivf.add(fill, [f"fill{i}" for i in range(len(fill))])
    # the hot cell overflowed by 40 rows -> spill 40 > 10% of the gallery:
    # the add must have fallen back to a full re-group (counter reset,
    # capacity recomputed for the larger gallery)
    assert ivf._spilled == 0
    assert ivf.capacity > cap_before
    occ = (ivf._rowids_host >= 0).sum(axis=1)
    assert occ.max() <= ivf.capacity and occ.sum() == len(ivf)


def test_ivf_large_batch_chunks_and_negative_lookup(rng):
    """Query batches above MAX_QUERY_BUCKET are chunked (bounding the
    [Q, nprobe, cap, D] probe gather) with identical results, and lookup
    refuses the -1 no-result sentinel instead of wrapping to the last id."""
    from centerclip_tpu.serve.ivf import MAX_QUERY_BUCKET
    emb = _clustered_gallery(rng, n=256)
    ids = [f"v{i}" for i in range(256)]
    ivf = IVFVideoIndex(emb, ids, n_clusters=8, nprobe=3)
    big = rng.normal(size=(MAX_QUERY_BUCKET + 9, emb.shape[1]))
    big = big.astype(np.float32)
    s, i = ivf.search(big, k=5)
    assert s.shape == (MAX_QUERY_BUCKET + 9, 5)
    s0, i0 = ivf.search(big[:MAX_QUERY_BUCKET], k=5)
    s1, i1 = ivf.search(big[MAX_QUERY_BUCKET:], k=5)
    np.testing.assert_array_equal(i, np.concatenate([i0, i1]))
    np.testing.assert_allclose(s, np.concatenate([s0, s1]), rtol=1e-6)
    assert ivf.lookup(np.array([3, 0])) == ["v3", "v0"]
    with pytest.raises(ValueError, match="sentinel"):
        ivf.lookup(np.array([2, -1]))


# ------------------------------------------------------------ engine fusion
def test_engine_fused_search_with_ivf(rng):
    """RetrievalEngine.search over an IVF index: the fused tower+probe
    program at nprobe=K must equal the same engine over the flat index."""
    run, model, params = _init_engine_model(rng)
    engine = RetrievalEngine(model, params)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    gallery = engine.embed_video_batches(
        {"video": b["video"], "video_mask": b["video_mask"]}
        for b in batches)
    ids = [f"v{i}" for i in range(16)]

    engine.index = VideoIndex(gallery, ids)
    flat_out = engine.search(["a man cooking", "a dog"], k=4)
    # re-attaching a different index must not need a manual cache clear:
    # the fused cache is keyed on index.version and self-evicts
    engine.index = IVFVideoIndex(gallery, ids, n_clusters=4, nprobe=4)
    ivf_out = engine.search(["a man cooking", "a dog"], k=4)
    assert all(key[1] == engine.index.version
               for key in engine._fused_cache)
    for a, b in zip(flat_out, ivf_out):
        assert [r["video_id"] for r in a] == [r["video_id"] for r in b]
        np.testing.assert_allclose([r["score"] for r in a],
                                   [r["score"] for r in b],
                                   rtol=1e-3, atol=1e-3)
