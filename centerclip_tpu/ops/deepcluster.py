# coding=utf-8
"""Learned ("deep") clustering head (reference: modules/cluster/deepcluster.py).

Experimental in the reference (self-labelled "does not work now",
deepcluster.py:3) but part of the public surface: a token-MLP predicts K
centroids from the detached segment tokens, a within-cluster-SSE (WCSS) loss
is added to training, and the tokens nearest to the centroids continue as
medoids.  Mutually exclusive with `cluster_inter` (params.py:287).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import BlockClusterSpec, ClusterConfig, ModelConfig
from .distances import squared_l2_distance
from .cluster_layer import segment_major, segment_interleave


def deep_cluster_plan(cfg: ModelConfig) -> Tuple[Optional[BlockClusterSpec], ...]:
    """Which blocks get a DeepCluster head.

    Note the subtle indexing difference from the TokenClusterInter plan:
    frames are read straight off `target_frames_blocks` with no `max_frames`
    prepend (reference: deepcluster.py:25-34 vs cluster.py:23-34).
    """
    num_layers = cfg.arch["vision_layers"]
    cl = cfg.cluster
    if not cl.deep_cluster:
        return tuple(None for _ in range(num_layers))
    assert len(cl.cluster_num_blocks) == num_layers
    assert len(cl.target_frames_blocks) == num_layers
    plan = []
    for block_id in range(1, num_layers + 1):
        cluster_num = cl.cluster_num_blocks[block_id - 1]
        before_cluster_num = cl.cluster_num_blocks[max(block_id - 2, 0)]
        after_frames = cl.target_frames_blocks[block_id - 1]
        before_frames = cl.target_frames_blocks[max(block_id - 2, 0)]
        is_cluster = (cluster_num is not None and cluster_num > 1) and (
            before_frames > after_frames or before_cluster_num > cluster_num)
        if not is_cluster:
            plan.append(None)
            continue
        plan.append(BlockClusterSpec(
            block_id=block_id, algo="deepcluster",
            before_cluster_num=before_cluster_num, cluster_num=cluster_num,
            before_frames=before_frames, after_frames=after_frames,
            frame_duration=before_frames // after_frames))
    return tuple(plan)


def batch_within_cluster_sse(x: jax.Array, centroids: jax.Array
                             ) -> Tuple[jax.Array, jax.Array]:
    """WCSS loss + hard assignment (reference: deepcluster.py:203-218)."""
    d2 = squared_l2_distance(x, centroids)                 # [B, L, K]
    values = jnp.min(d2, axis=-1)
    assign = jnp.argmin(d2, axis=-1)
    return jnp.mean(jnp.sum(values, axis=-1)), assign


def get_medoids(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Indices of the tokens nearest each centroid
    (reference: deepcluster.py:221-246).

    Uses the reference's all-negative trick: entries for tokens not assigned
    to cluster k are zeroed by the mask and lose the min against the strictly
    negative member entries.
    """
    K = centroids.shape[1]
    d = jnp.sqrt(squared_l2_distance(x, centroids))        # [B, L, K]
    d = d - jnp.max(d) - 1.0
    cluster_distance = jnp.min(d, axis=-1)                 # [B, L]
    assign = jnp.argmin(d, axis=-1)                        # [B, L]
    onehot = jax.nn.one_hot(assign, K, dtype=d.dtype)      # [B, L, K]
    masked = onehot * cluster_distance[..., None]          # [B, L, K]
    medoids = jnp.argmin(masked, axis=1)                   # [B, K]
    return jnp.sort(medoids, axis=-1)


class DeepCluster(nn.Module):
    """Learned clustering head (reference: deepcluster.py:51-151)."""
    spec: BlockClusterSpec
    cfg: ClusterConfig
    width: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """x: [B*T_before, 1+P, D] -> ([B*T_after, 1+K, D], wcss loss)."""
        spec = self.spec
        Bt, num_tokens, width = x.shape
        T, S, dur = spec.before_frames, spec.after_frames, spec.frame_duration
        B = Bt // T
        K = spec.cluster_num
        L_in = dur * (num_tokens - 1)

        all_cls = x[:, 0, :].reshape(B, T, 1, width)
        cls_seg = all_cls.reshape(B, S, dur, width).mean(axis=2)
        cls_seg = cls_seg.reshape(B * S, 1, width)

        res_x = x[:, 1:, :].reshape(B, T, num_tokens - 1, width)
        data = segment_major(res_x, S, dur)                # [S*B, L_in, D]
        d_data = jax.lax.stop_gradient(data)

        # token MLP over the *token* axis (deepcluster.py:83-93,128):
        # operates on [.., D, L_in] and maps L_in -> 4*L_in -> dur*K -> K
        # eps=1e-5 matches torch nn.LayerNorm (deepcluster.py:86-92); flax
        # defaults to 1e-6, which the reference oracle flags at tolerance
        h = jnp.swapaxes(d_data, -1, -2)                   # [S*B, D, L_in]
        h = nn.Dense(4 * L_in, name="fc1",
                     kernel_init=nn.initializers.normal(0.01))(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(h)
        h = nn.Dense(dur * K, name="fc2",
                     kernel_init=nn.initializers.normal(0.01))(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(h)
        h = nn.Dense(K, name="fc3",
                     kernel_init=nn.initializers.normal(0.01))(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln3")(h)
        centroids = jnp.swapaxes(h, -1, -2)                # [S*B, K, D]

        if train:
            cluster_loss, _ = batch_within_cluster_sse(d_data, centroids)
        else:
            cluster_loss = jnp.float32(0.0)

        medoids = jax.lax.stop_gradient(get_medoids(d_data, centroids))
        new_data = jnp.take_along_axis(data, medoids[..., None], axis=1)
        sampled = segment_interleave(new_data, B, S)       # [B*S, K, D]
        out = jnp.concatenate([cls_seg.astype(sampled.dtype), sampled], axis=1)
        return out, cluster_loss
