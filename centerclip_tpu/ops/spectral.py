# coding=utf-8
"""Normalized spectral clustering, TPU-first.

Equivalent to the reference (modules/cluster/spectral.py:15-167) with one
deliberate redesign: the symmetric normalised Laplacian is decomposed with
`jnp.linalg.eigh` instead of batched SVD.  ``L_sym`` is symmetric PSD, so its
SVD *is* its eigendecomposition up to column order and signs — and pairwise
Euclidean/cosine distances between the row-normalised spectral embeddings are
invariant to both (coordinate permutations and reflections are isometries), so
the downstream k-medoids output is unchanged while eigh is substantially
cheaper than SVD on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distances import squared_l2_distance
from .kmedoids import batch_fast_kmedoids


def construct_affinity(x: jax.Array, y: jax.Array, sigma: float = 2.0,
                       mode: str = "HeatKernel", knn_k: int = 10,
                       mutual: bool = False,
                       spatial_temporal_graph: Optional[jax.Array] = None
                       ) -> jax.Array:
    """Affinity graph W (reference `constructW`, spectral.py:77-106).

    HeatKernel: exp(-||xi-xj||^2 / 2 sigma^2) on the *squared* L2 distance.
    KNN: heat-kernel affinities sparsified to each row's top-k (ties kept,
    symmetrised with OR by default / AND when mutual).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    W = jnp.exp(-1.0 * squared_l2_distance(x, y) / (2.0 * sigma ** 2))
    if mode == "KNN":
        kth = jax.lax.top_k(W, knn_k)[0][..., -1:]            # [B, N, 1]
        mask_last = W >= kth
        if mutual:
            mask = jnp.logical_and(mask_last, jnp.swapaxes(mask_last, -1, -2))
        else:
            mask = jnp.logical_or(mask_last, jnp.swapaxes(mask_last, -1, -2))
        W = W * mask
    elif mode != "HeatKernel":
        raise NotImplementedError(mode)
    if spatial_temporal_graph is not None:
        W = W * spatial_temporal_graph
    return W


def sign_flip_rasmus_bro(U: jax.Array, S: jax.Array, Vh: jax.Array) -> jax.Array:
    """Rasmus Bro SVD sign correction (reference: spectral.py:109-137).

    Orients each left singular vector toward the dominant direction of the
    data.  Output-neutral for the clustering (reflections are isometries) but
    kept for API parity and for users reading the spectral embedding.
    """
    SVh = S[..., :, None] * Vh                                 # [B, M, N]
    sign_left = jnp.sum(jnp.sign(SVh) * jnp.square(SVh), axis=-1)  # [B, M]
    return jnp.sign(sign_left)[..., None, :] * U


@functools.partial(jax.jit, static_argnames=(
    "K", "mode", "knn_k", "metric", "threshold", "iter_limit", "id_sort",
    "norm_p", "correct_sign", "sigma"))
def batch_spectral_clustering(X: jax.Array, K: int, mode: str = "HeatKernel",
                              knn_k: int = 10, metric: str = "euclidean",
                              threshold: float = 1e-5, iter_limit: int = 60,
                              id_sort: bool = True, norm_p: float = 2.0,
                              correct_sign: bool = True, sigma: float = 2.5,
                              spatial_temporal_graph: Optional[jax.Array] = None
                              ) -> Tuple[jax.Array, jax.Array]:
    """Normalized spectral clustering (reference: spectral.py:15-73).

    Pipeline: affinity W -> degree D -> L_sym = D^-1/2 (D - W) D^-1/2 ->
    K eigenvectors of the *smallest* eigenvalues -> row-normalise -> k-medoids.

    Returns (assign [B, N], medoids [B, K]) — medoid ids index the original
    token axis, as in the reference (k-medoids runs on the embedding rows).
    """
    X = X.astype(jnp.float32)
    W = construct_affinity(X, X, sigma=sigma, mode=mode, knn_k=knn_k,
                           spatial_temporal_graph=spatial_temporal_graph)
    diag_D = jnp.sum(W, axis=-1)                               # [B, N]
    inv_sqrt = jnp.power(diag_D, -0.5)
    # L_sym = D^-1/2 (D - W) D^-1/2 = I - D^-1/2 W D^-1/2, computed the
    # explicit way to match reference rounding (spectral.py:46-52)
    L = jax.vmap(jnp.diag)(diag_D) - W
    L_sym = inv_sqrt[..., :, None] * L * inv_sqrt[..., None, :]

    # eigh: ascending eigenvalues; smallest K live in the first K columns
    eigvals, eigvecs = jnp.linalg.eigh(L_sym)
    if correct_sign:
        # For symmetric PSD L_sym = Q diag(lam) Q^T, the SVD factors are
        # U = Q, S = lam, Vh = Q^T (lam >= 0), so the Bro correction can be
        # computed directly from the eigen pair.
        eigvecs = sign_flip_rasmus_bro(eigvecs, eigvals,
                                       jnp.swapaxes(eigvecs, -1, -2))
    Q = eigvecs[..., :K]                                       # [B, N, K]
    Q = Q / (jnp.linalg.norm(Q, axis=-1, keepdims=True) + 1e-6)

    return batch_fast_kmedoids(Q, K, distance=metric, threshold=threshold,
                               iter_limit=iter_limit, id_sort=id_sort,
                               norm_p=norm_p)


def spatial_temporal_graph(N: int, tokens_per_frame: int, s_kernel: int = 5,
                           t_kernel: int = 5) -> np.ndarray:
    """Boolean locality mask over the token axis (reference: spectral.py:140-167).

    Token i connects to token j iff they are within t_kernel//2 frames and
    s_kernel//2 grid cells (per axis) of each other.  Built once on host
    (static per config) and fed to the affinity as a constant.
    """
    H = W = int(tokens_per_frame ** 0.5)
    frames = N // tokens_per_frame
    half_t, half_s = t_kernel // 2, s_kernel // 2
    idx = np.arange(N)
    t = idx // tokens_per_frame
    h = (idx % tokens_per_frame) // W
    w = (idx % tokens_per_frame) % W
    dt = np.abs(t[:, None] - t[None, :]) <= half_t
    dh = np.abs(h[:, None] - h[None, :]) <= half_s
    dw = np.abs(w[:, None] - w[None, :]) <= half_s
    del frames, H
    return (dt & dh & dw)
