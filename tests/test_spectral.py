# coding=utf-8
"""Spectral clustering tests: planted-cluster recovery, graph modes,
Laplacian properties, sign-flip invariance, spatial-temporal mask."""
import numpy as np
import jax.numpy as jnp
import pytest

from centerclip_tpu.ops.spectral import (batch_spectral_clustering,
                                         construct_affinity,
                                         spatial_temporal_graph)
from tests.test_kmedoids import make_blobs


def _planted(rng, B, N, D, K, sep=12.0, spread=0.3):
    out = np.zeros((B, N, D), np.float32)
    labels = np.repeat(np.arange(K), N // K)
    for b in range(B):
        centers = rng.normal(size=(K, D)).astype(np.float32) * sep
        out[b] = centers[labels] + rng.normal(size=(N, D)) * spread
    return out, labels


@pytest.mark.parametrize("mode", ["HeatKernel", "KNN"])
def test_recovers_planted_clusters(rng, mode):
    B, N, D, K = 2, 24, 8, 3
    x, labels = _planted(rng, B, N, D, K)
    assign, meds = batch_spectral_clustering(
        jnp.asarray(x), K, mode=mode, knn_k=6, sigma=20.0, iter_limit=40)
    assign = np.asarray(assign)
    for b in range(B):
        for k in range(K):
            members = assign[b][labels == k]
            assert len(set(members.tolist())) == 1, (b, k, members)
        assert len(set(assign[b].tolist())) == K


def test_affinity_properties(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    W = np.asarray(construct_affinity(x, x, sigma=2.0))
    assert W.shape == (2, 10, 10)
    # heat kernel: symmetric, diag = 1 (zero self-distance)
    np.testing.assert_allclose(W, np.swapaxes(W, 1, 2), rtol=1e-5)
    np.testing.assert_allclose(np.diagonal(W, axis1=1, axis2=2), 1.0,
                               rtol=1e-5)
    # KNN sparsifies but keeps symmetry (OR symmetrisation)
    Wk = np.asarray(construct_affinity(x, x, sigma=2.0, mode="KNN", knn_k=3))
    assert (Wk == 0).sum() > 0
    assert ((Wk > 0) == (np.swapaxes(Wk, 1, 2) > 0)).all()


def test_sign_flip_invariance(rng):
    """svd_correct_sign must not change the clustering PARTITION (reflections
    are isometries of the spectral embedding; exact medoid ids can differ by
    fp rounding of the flipped coordinates)."""
    B, N, D, K = 2, 24, 8, 3
    x, labels = _planted(rng, B, N, D, K)
    a1, _ = batch_spectral_clustering(jnp.asarray(x), K, correct_sign=True,
                                      sigma=20.0)
    a2, _ = batch_spectral_clustering(jnp.asarray(x), K, correct_sign=False,
                                      sigma=20.0)
    a1, a2 = np.asarray(a1), np.asarray(a2)
    for b in range(B):
        # same partition up to label permutation
        mapping = {}
        for i in range(N):
            mapping.setdefault(a1[b, i], a2[b, i])
            assert mapping[a1[b, i]] == a2[b, i]


def test_spatial_temporal_graph_structure():
    """Locality mask (reference: spectral.py:140-167): token connects within
    t_kernel//2 frames and s_kernel//2 grid cells."""
    g = spatial_temporal_graph(N=2 * 9, tokens_per_frame=9, s_kernel=3,
                               t_kernel=3)
    assert g.shape == (18, 18) and g.dtype == bool
    assert g[0, 0]
    # token 0 = frame0 (0,0); token 4 = frame0 (1,1) -> within 3x3 kernel
    assert g[0, 4]
    # token 0 vs frame0 (2,2) = token 8 -> outside s_kernel//2=1
    assert not g[0, 8]
    # frame 1 same cell connects (t_kernel//2 = 1)
    assert g[0, 9]
    np.testing.assert_array_equal(g, g.T)


@pytest.mark.parametrize("mode", ["HeatKernel", "KNN"])
def test_subspace_solver_recovers_planted(rng, mode):
    """The MXU-shaped subspace-iteration solver recovers the same planted
    partition as exact eigh."""
    B, N, D, K = 2, 24, 8, 3
    x, labels = _planted(rng, B, N, D, K)
    a, _ = batch_spectral_clustering(jnp.asarray(x), K, mode=mode, knn_k=6,
                                     sigma=20.0, solver="subspace")
    a = np.asarray(a)
    for b in range(B):
        for k in range(K):
            members = a[b][labels == k]
            assert len(set(members.tolist())) == 1
        assert len(set(a[b].tolist())) == K
