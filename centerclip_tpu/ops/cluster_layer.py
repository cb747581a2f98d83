# coding=utf-8
"""Multi-segment token clustering layer for the ViT tower.

The reference inserts `TokenClusterInter` modules between transformer blocks
(reference: modules/cluster/cluster.py:66-352).  This is the TPU-native
re-design: all tensors are [batch, tokens, dim] (no LND permutes — that layout
is a torch nn.MultiheadAttention artifact), every shape is static and derived
from a `BlockClusterSpec`, and the clustering itself runs under
`stop_gradient` in fp32 exactly like the reference's `no_grad` region.

Segment choreography (cluster.py:242-310):
  input  [B*T, 1+P, D]   T = before_frames, P = patch tokens per frame
  split CLS | patches; group frames into S = after_frames segments of
  `frame_duration` frames; per segment, cluster the dur*P patch tokens into K
  medoids; new CLS = mean of the segment's frame CLS tokens
  output [B*S, 1+K, D]
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import BlockClusterSpec, ClusterConfig
from .kmedoids import batch_fast_kmedoids
from .spectral import batch_spectral_clustering, spatial_temporal_graph
from .shift import temporal_shift_wo_cls, token_shift


def segment_major(res_x: jax.Array, S: int, dur: int) -> jax.Array:
    """[B, T, P, D] -> segment-major [S*B, dur*P, D].

    Matches torch.split(dim=1)+cat(dim=0) (cluster.py:249-250): sample b,
    segment s lands at row s*B + b.
    """
    B, T, P, D = res_x.shape
    assert T == S * dur
    x = res_x.reshape(B, S, dur, P, D)
    x = jnp.transpose(x, (1, 0, 2, 3, 4))          # [S, B, dur, P, D]
    return x.reshape(S * B, dur * P, D)


def segment_interleave(x_tmp: jax.Array, B: int, S: int) -> jax.Array:
    """Segment-major [S*B, K, D] -> clip-major [B*S, K, D].

    Matches stack(split(x, B, 0), 1).reshape (cluster.py:303): output row
    b*S + s corresponds to sample b, segment s.
    """
    SB, K, D = x_tmp.shape
    x = x_tmp.reshape(S, B, K, D)
    x = jnp.transpose(x, (1, 0, 2, 3))             # [B, S, K, D]
    return x.reshape(B * S, K, D)


class TokenClusterInter(nn.Module):
    """Clustering module for one insertion point.

    Attributes:
        spec: static shape plan for this block.
        cfg: the full cluster config (algorithm hyperparameters).
        deterministic: disables the random branch of sparse_sampling.
    """
    spec: BlockClusterSpec
    cfg: ClusterConfig
    width: int

    def setup(self):
        spec, cfg = self.spec, self.cfg
        scale = self.width ** -0.5
        if cfg.cluster_embedding and spec.algo in ("kmediods++", "spectral"):
            # learned per-medoid embedding (cluster.py:161-164)
            self.cluster_embed = self.param(
                "cluster_embed", nn.initializers.normal(scale),
                (spec.cluster_num, self.width))
        if cfg.cluster_frame_embedding and spec.algo in ("kmediods++", "spectral"):
            self.cluster_frame_embed = self.param(
                "cluster_frame_embed", nn.initializers.normal(scale),
                (spec.frame_duration, 1, self.width))
        if cfg.adaptive_cls and spec.algo in ("kmediods++", "spectral"):
            # learnable CLS fusion multiplier (cluster.py:170-172)
            init = np.full((1, spec.before_frames, 1, 1),
                           1.0 / spec.frame_duration, np.float32)
            self.cls_multiplier = self.param(
                "cls_multiplier", lambda key: jnp.asarray(init))
        if cfg.spectral_spg and spec.algo == "spectral":
            spg = spatial_temporal_graph(
                spec.before_cluster_num * spec.frame_duration,
                spec.before_cluster_num, s_kernel=spec.spg_s_kernel,
                t_kernel=spec.spg_t_kernel)
            self.spg = jnp.asarray(spg[None].astype(np.float32))
        else:
            self.spg = None

    def _cluster(self, res_tmp: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Run the configured clustering algorithm on segment-major tokens."""
        spec, cfg = self.spec, self.cfg
        res_tmp = jax.lax.stop_gradient(res_tmp.astype(jnp.float32))
        if spec.algo == "kmediods++":
            return batch_fast_kmedoids(
                res_tmp, spec.cluster_num, distance=cfg.distance,
                threshold=cfg.threshold, iter_limit=cfg.iter_limit,
                id_sort=cfg.id_sort, norm_p=cfg.minkowski_p,
                pre_norm=cfg.pre_norm)
        if spec.algo == "spectral":
            return batch_spectral_clustering(
                res_tmp, spec.cluster_num, mode=cfg.spectral_graph,
                knn_k=spec.spectral_knn_k, metric=cfg.distance,
                threshold=cfg.threshold, iter_limit=cfg.iter_limit,
                id_sort=cfg.id_sort, norm_p=cfg.minkowski_p,
                correct_sign=cfg.svd_correct_sign, sigma=cfg.spectral_sigma,
                spatial_temporal_graph=self.spg,
                solver=cfg.spectral_solver)
        raise NotImplementedError(spec.algo)

    def __call__(self, x: jax.Array, deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        """Apply token reduction.

        Args:
            x: [B*T_before, 1+P, D] tokens, CLS first.
        Returns:
            [B*T_after, 1+K, D] (or same-shape for the shift algorithms).
        """
        spec = self.spec
        Bt, num_tokens, width = x.shape
        T, S, dur = spec.before_frames, spec.after_frames, spec.frame_duration
        B = Bt // T
        K = spec.cluster_num

        if spec.algo in ("kmediods++", "spectral"):
            # CLS per frame -> per-segment mean (cluster.py:243-245,306-308)
            all_cls = x[:, 0, :].reshape(B, T, 1, width)
            if self.cfg.adaptive_cls:
                all_cls = all_cls * self.cls_multiplier
            cls_seg = all_cls.reshape(B, S, dur, width).mean(axis=2)
            cls_seg = cls_seg.reshape(B * S, 1, width)

            res_x = x[:, 1:, :].reshape(B, T, num_tokens - 1, width)
            res_tmp = segment_major(res_x, S, dur)          # [S*B, dur*P, D]
            assign, medoid_ids = self._cluster(res_tmp)

            if self.cfg.aggregation in (None, "None"):
                # pick the medoid tokens themselves (cluster.py:287-289)
                x_tmp = jnp.take_along_axis(
                    res_tmp, medoid_ids[..., None], axis=1)  # [S*B, K, D]
            else:
                # per-cluster mean of member tokens (cluster.py:291-300)
                onehot = jax.nn.one_hot(assign, K, dtype=res_tmp.dtype)
                sums = jnp.einsum("bnk,bnd->bkd", onehot, res_tmp)
                counts = jnp.sum(onehot, axis=1)[..., None]
                x_tmp = sums / jnp.maximum(counts, 1e-6)

            x_tmp = segment_interleave(x_tmp, B, S)          # [B*S, K, D]
            if self.cfg.cluster_embedding and hasattr(self, "cluster_embed"):
                x_tmp = x_tmp + self.cluster_embed.astype(x_tmp.dtype)
            return jnp.concatenate([cls_seg.astype(x_tmp.dtype), x_tmp], axis=1)

        if spec.algo == "pooling":
            # per-segment mean over frames, CLS included (cluster.py:315-320)
            res = x.reshape(B, S, dur, num_tokens, width).mean(axis=2)
            return res.reshape(B * S, num_tokens, width)

        if spec.algo == "sparse_sampling":
            # TSN-style token index sampling (cluster.py:322-341)
            all_cls = x[:, 0, :].reshape(B, T, 1, width)
            cls_seg = all_cls.reshape(B, S, dur, width).mean(axis=2)
            cls_seg = cls_seg.reshape(B * S, 1, width)
            res_x = x[:, 1:, :].reshape(B, S, dur * (num_tokens - 1), width)
            total = dur * (num_tokens - 1)
            if deterministic or rng is None:
                ind = _uniform_token_indices(K, total)
                ind = jnp.asarray(ind)
                picked = res_x[:, :, ind, :]                 # [B, S, K, D]
            else:
                rngs = jax.random.split(rng, S)
                cols = jnp.stack([_random_token_indices(r, K, total)
                                  for r in rngs])            # [S, K]
                picked = jnp.take_along_axis(
                    res_x, cols[None, :, :, None], axis=2)
            x_tmp = picked.reshape(B * S, K, width)
            return jnp.concatenate([cls_seg.astype(x_tmp.dtype), x_tmp], axis=1)

        if spec.algo == "temporal_shift":
            return temporal_shift_wo_cls(x, self.cfg_original_frames())
        if spec.algo == "token_shift":
            return token_shift(x, self.cfg_original_frames())
        raise NotImplementedError(spec.algo)

    def cfg_original_frames(self) -> int:
        # shift algorithms operate on the original clip length
        # (cluster.py:343-347 passes self.original_frame)
        return self.spec.before_frames


def _uniform_token_indices(target: int, total: int) -> np.ndarray:
    """Uniform token pick (reference: cluster_utils.py:163-173)."""
    if total > target:
        tick = total / float(target)
        return np.array([int(tick / 2.0 + tick * i) for i in range(target)])
    return np.clip(np.arange(target), 0, total)


def _random_token_indices(rng: jax.Array, target: int, total: int) -> jax.Array:
    """Random-in-segment token pick (reference: cluster_utils.py:150-161),
    expressed with static shapes for jit."""
    avg = total // target
    if avg > 0:
        base = jnp.arange(target) * avg
        jitter = jax.random.randint(rng, (target,), 0, avg)
        return base + jitter
    if total > target:
        perm = jax.random.permutation(rng, total)[:target]
        return jnp.sort(perm)
    return jnp.clip(jnp.arange(target), 0, total)


def video_mask_after_cluster(video_mask: jax.Array, final_frames: int,
                             f_frame_duration: int) -> jax.Array:
    """Subsample the frame mask to the post-clustering frame count.

    Takes the mask value of the *last* frame of each segment
    (reference: clip4clip.py:436-447).
    """
    T = video_mask.shape[-1]
    inds = np.arange(f_frame_duration - 1, T, T // final_frames)
    return video_mask[..., inds]
