# coding=utf-8
"""k-medoids kernel tests: batched TPU implementation vs the NumPy loop
oracle (the reference's own testing pattern, modules/cluster/test.py:22-114)."""
import numpy as np
import pytest

from centerclip_tpu.ops import (batch_fast_kmedoids,
                                batch_fast_kmedoids_with_split,
                                kmedoids_oracle, pairwise_distance)
from centerclip_tpu.ops.kmedoids import _pairwise_np


def make_blobs(rng, B, N, D, K, spread=0.05):
    """K well-separated blobs per batch element."""
    out = np.zeros((B, N, D), np.float32)
    for b in range(B):
        centers = rng.normal(size=(K, D)).astype(np.float32) * 5.0
        labels = rng.integers(0, K, size=N)
        out[b] = centers[labels] + rng.normal(size=(N, D)) * spread
    return out


def test_pairwise_distance_matches_numpy(rng):
    # B=1: the all-negative shift subtracts the *global* max over the whole
    # batch (cluster_utils.py:35-36), so per-sample comparison needs B=1.
    x = rng.normal(size=(1, 17, 9)).astype(np.float32)
    d = np.asarray(pairwise_distance(x, x, all_negative=True,
                                     self_nearest=True))
    ref = _pairwise_np(x[0])
    np.testing.assert_allclose(d[0], ref, rtol=2e-4, atol=2e-4)


def test_cosine_distance(rng):
    x = rng.normal(size=(2, 11, 7)).astype(np.float32)
    d = np.asarray(pairwise_distance(x, x, metric="cosine"))
    xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
    ref = 1.0 - np.einsum("bnd,bmd->bnm", xn, xn)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_batched_matches_oracle(rng, metric):
    B, N, D, K = 6, 60, 16, 5
    x = make_blobs(rng, B, N, D, K)
    assign, meds = batch_fast_kmedoids(x, K, distance=metric,
                                       iter_limit=40, id_sort=True)
    assign, meds = np.asarray(assign), np.asarray(meds)
    for b in range(B):
        a_ref, m_ref = kmedoids_oracle(x[b], K, metric=metric, iter_limit=40)
        np.testing.assert_array_equal(assign[b], a_ref)
        if metric == "euclidean":
            np.testing.assert_array_equal(meds[b], m_ref)
        else:
            # cosine blobs are angularly tight: two candidates can have
            # within-cluster sums equal to fp precision, so only require the
            # chosen medoids to represent the same partition cells.
            np.testing.assert_array_equal(a_ref[meds[b]], a_ref[m_ref])


def test_split_wrapper_identical(rng):
    B, N, D, K = 9, 40, 8, 4
    x = make_blobs(rng, B, N, D, K)
    a1, m1 = batch_fast_kmedoids(x, K)
    a2, m2 = batch_fast_kmedoids_with_split(x, K, split_size=4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_recovers_planted_clusters(rng):
    """On well-separated blobs the partition must match the planted labels."""
    B, N, D, K = 2, 48, 12, 4
    x = np.zeros((B, N, D), np.float32)
    labels = np.repeat(np.arange(K), N // K)
    for b in range(B):
        centers = np.eye(K, D, dtype=np.float32) * 50.0
        x[b] = centers[labels] + rng.normal(size=(N, D)).astype(np.float32) * 0.01
    assign, _ = batch_fast_kmedoids(x, K)
    assign = np.asarray(assign)
    for b in range(B):
        # same planted group -> same cluster id
        for k in range(K):
            members = assign[b][labels == k]
            assert len(set(members.tolist())) == 1
    # K distinct clusters used
    assert len(set(assign[0].tolist())) == K


def test_fixed_cap_equals_while_loop(rng):
    """The barrier-free fixed-step path (iter_limit >= FIXED_ITER_CAP)
    must produce exactly the while_loop's results (VERDICT r2 next #5):
    Lloyd is a fixed point, so the extra unrolled steps are no-ops on
    every input that converges within the cap — the measured worst case
    is half the cap (benchmarks/kmedoids_iters_study.py)."""
    from centerclip_tpu.ops.kmedoids import FIXED_ITER_CAP
    assert FIXED_ITER_CAP == 12
    for seed, (B, N, D, K), metric in (
            (0, (6, 60, 16, 7), "euclidean"),
            (1, (4, 50, 12, 5), "cosine"),
            (2, (5, 40, 8, 4), "euclidean")):
        r = np.random.default_rng(seed)
        # half blobs, half structureless gaussians (the slower convergers)
        x = np.concatenate([make_blobs(r, B // 2 + 1, N, D, K),
                            r.normal(size=(B // 2, N, D))]).astype(np.float32)
        a_fix, m_fix = batch_fast_kmedoids(x, K, distance=metric,
                                           iter_limit=60)
        a_wl, m_wl = batch_fast_kmedoids(x, K, distance=metric,
                                         iter_limit=FIXED_ITER_CAP - 1)
        np.testing.assert_array_equal(np.asarray(a_fix), np.asarray(a_wl))
        np.testing.assert_array_equal(np.asarray(m_fix), np.asarray(m_wl))


def test_residual_loop_covers_slow_convergence(rng, monkeypatch):
    """When an input needs more Lloyd iterations than FIXED_ITER_CAP, the
    residual while_loop must carry it to convergence — the caller's
    iter_limit/threshold contract holds regardless of the cap.  The cap is
    shrunk to 1 so structureless gaussians (mean ~3 iterations to converge)
    overflow it; each variant uses a distinct iter_limit because iter_limit
    is a static jit arg and the cap is read at trace time (reusing one
    value would silently replay a stale compiled path)."""
    import centerclip_tpu.ops.kmedoids as km
    B, N, D, K = 4, 60, 12, 7
    x = rng.normal(size=(B, N, D)).astype(np.float32)

    monkeypatch.setattr(km, "FIXED_ITER_CAP", 999)  # pure while_loop
    a_ref, m_ref = km.batch_fast_kmedoids(x, K, iter_limit=58)
    a_cut, m_cut = km.batch_fast_kmedoids(x, K, iter_limit=1)
    # precondition: this data genuinely needs >1 iteration, so a cap of 1
    # without the residual loop would return the wrong answer
    assert not np.array_equal(np.asarray(m_ref), np.asarray(m_cut))

    monkeypatch.setattr(km, "FIXED_ITER_CAP", 1)    # unroll 1 + residual
    a_fix, m_fix = km.batch_fast_kmedoids(x, K, iter_limit=57)
    np.testing.assert_array_equal(np.asarray(a_fix), np.asarray(a_ref))
    np.testing.assert_array_equal(np.asarray(m_fix), np.asarray(m_ref))


def test_pre_norm(rng):
    x = make_blobs(rng, 3, 30, 8, 3)
    a1, m1 = batch_fast_kmedoids(x, 3, pre_norm=True)
    xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
    a2, m2 = batch_fast_kmedoids(xn, 3, pre_norm=False)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
