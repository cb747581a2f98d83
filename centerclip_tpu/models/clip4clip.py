# coding=utf-8
"""CLIP4Clip retrieval model (reference: modules/clip4clip.py:127-471).

Flax re-design of the top-level video-text retrieval model:
* `get_sequence_output` / `get_visual_output` encode the two modalities
  (outputs fp32, as the reference forces via `.float()`).
* Similarity headers: `meanP` (masked mean pooling, parameter-free) and
  `seqTransf` (frame-position embeddings + small transformer + residual).
  `tightTransf` uses the cross model; `seqLSTM` raises like the reference.
* During training, the contrastive loss is computed over the *global* batch.
  The reference all-gathers features across ranks with a local-gradient slot
  trick (modules/utils.py:47-64); under pjit/GSPMD the same computation is
  expressed directly on the globally-sharded batch and XLA inserts the
  all-gathers over ICI — the total gradient is mathematically identical.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.cluster_layer import video_mask_after_cluster
from .clip import CLIP
from .cross import CrossConfig, CrossModel
from .layers import ResidualAttentionBlock
from .losses import cross_entropy


class CLIP4Clip(nn.Module):
    """Top-level retrieval model."""
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.clip = CLIP(cfg)
        # the seqTransf/cross headers run on the embed_dim-sized pooled
        # features; in real CLIP archs embed_dim == transformer_width == 512
        # (the reference uses cross_config.hidden_size, clip4clip.py:186-192)
        width = cfg.arch["embed_dim"]
        ctx = cfg.arch["context_length"]
        if cfg.sim_header in ("seqLSTM", "seqTransf"):
            # frame-position embedding table (clip4clip.py:186-187); seeded
            # from CLIP's text positional embedding at load time
            self.frame_position_embeddings = self.param(
                "frame_position_embeddings", nn.initializers.normal(0.02),
                (ctx, width))
        if cfg.sim_header == "seqTransf":
            self.transformerClip = [
                ResidualAttentionBlock(width, cfg.arch["transformer_heads"],
                                       jnp.float32,
                                       name=f"transformerClip_{i}")
                for i in range(cfg.cross_num_hidden_layers)]
        if not cfg.loose_type:
            # archive config first, task-config overrides last
            # (reference clip4clip.py:41 + base.py update_attr; hidden size
            # and max positions track CLIP's dims, clip4clip.py:175-178)
            cross_cfg = CrossConfig.get_config(
                cfg.cross_model_name,
                hidden_size=cfg.arch["embed_dim"],
                num_hidden_layers=cfg.cross_num_hidden_layers,
                max_position_embeddings=ctx)
            self.cross = CrossModel(cross_cfg)
            self.similarity_dense = nn.Dense(1, name="similarity_dense")

    # ------------------------------------------------------------------ text
    def get_sequence_output(self, input_ids: jax.Array,
                            deterministic: bool = True) -> jax.Array:
        """[B, L] -> [B, 1, D] fp32 (clip4clip.py:265-272)."""
        feats = self.clip.encode_text(
            input_ids, deterministic=deterministic).astype(jnp.float32)
        return feats[:, None, :]

    # ----------------------------------------------------------------- video
    def get_visual_output(self, video: jax.Array, video_mask: jax.Array,
                          deterministic: bool = True,
                          rng: Optional[jax.Array] = None
                          ) -> Tuple[jax.Array, jax.Array]:
        """video: [B, 1, T, C, H, W] or [B*T, C, H, W] -> ([B, T_final, D]
        fp32, cluster_loss) (clip4clip.py:222-243,274-281).

        uint8 inputs are normalised on-device (the host ships raw cropped
        pixels — 4x less host->device traffic than float32 frames).  On the
        2D-patchify ViT the normalisation is folded into the patch matmul
        (see VisionTransformer); only the conv3d / ResNet towers need the
        explicit fp32 normalise here."""
        B = video_mask.shape[0]
        if video.ndim == 6:
            _, _, _, C, H, W = video.shape
            video = video.reshape(-1, C, H, W)
        needs_explicit_norm = (self.cfg.linear_patch == "3d"
                               or isinstance(self.cfg.arch["vision_layers"],
                                             (tuple, list)))
        if video.dtype == jnp.uint8 and needs_explicit_norm:
            from ..data.transforms import CLIP_MEAN, CLIP_STD
            mean = jnp.asarray(CLIP_MEAN, jnp.float32).reshape(1, 3, 1, 1)
            std = jnp.asarray(CLIP_STD, jnp.float32).reshape(1, 3, 1, 1)
            video = (video.astype(jnp.float32) / 255.0 - mean) / std
        feats, cluster_loss = self.clip.encode_image(
            video, deterministic=deterministic, rng=rng)
        return feats.reshape(B, -1, feats.shape[-1]).astype(jnp.float32), \
            cluster_loss

    def video_mask_after_cluster(self, video_mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.cluster.inter or cfg.cluster.deep_cluster:
            if cfg.cluster.algo in ("kmediods++", "pooling", "sparse_sampling",
                                    "spectral") or cfg.cluster.deep_cluster:
                return video_mask_after_cluster(video_mask, cfg.final_frames,
                                                cfg.f_frame_duration)
        return video_mask

    # ------------------------------------------------------------ similarity
    def _mean_pooling_for_similarity_visual(self, visual_output, video_mask):
        """Masked mean over frames with zero-count guard
        (clip4clip.py:304-316), fp32."""
        m = video_mask.astype(jnp.float32)[..., None]
        s = jnp.sum(visual_output.astype(jnp.float32) * m, axis=1)
        cnt = jnp.sum(m, axis=1)
        cnt = jnp.where(cnt == 0.0, 1.0, cnt)
        return s / cnt

    def _seq_transf(self, visual_output, video_mask):
        """seqTransf header (clip4clip.py:335-349): add frame-position
        embeddings, run a small bidirectional transformer with a key-padding
        mask, residual back."""
        B, L, D = visual_output.shape
        pos = self.frame_position_embeddings[:L].astype(visual_output.dtype)
        x = visual_output + pos[None]
        ext = (1.0 - video_mask.astype(jnp.float32)) * -1000000.0
        ext = ext[:, None, None, :]                      # [B,1,1,L]
        for block in self.transformerClip:
            x = block(x, ext)
        return x + visual_output

    def loose_similarity(self, sequence_output, visual_output, attention_mask,
                         video_mask, logit_scale=None) -> jax.Array:
        """meanP / seqTransf similarity (clip4clip.py:324-367), fp32.

        Returns logits [num_texts, num_videos].
        """
        cfg = self.cfg
        del attention_mask
        visual_output = visual_output.astype(jnp.float32)
        sequence_output = sequence_output.astype(jnp.float32)
        if cfg.sim_header == "seqTransf":
            visual_output = self._seq_transf(visual_output, video_mask)
        elif cfg.sim_header == "seqLSTM":
            raise NotImplementedError("seqLSTM (parity: clip4clip.py:332-333)")

        already_pooled = visual_output.ndim == 2
        if not already_pooled:
            visual_output = visual_output / (jnp.linalg.norm(
                visual_output, axis=-1, keepdims=True) + 1e-12)
            visual_output = self._mean_pooling_for_similarity_visual(
                visual_output, video_mask)
            visual_output = visual_output / (jnp.linalg.norm(
                visual_output, axis=-1, keepdims=True) + 1e-12)

        seq = sequence_output.reshape(-1, sequence_output.shape[-1])
        seq = seq / (jnp.linalg.norm(seq, axis=-1, keepdims=True) + 1e-12)
        if logit_scale is None:
            logit_scale = jnp.exp(self.clip.logit_scale)
        return logit_scale * seq @ visual_output.T

    def _cross_score_rows(self, seq_rows, visual_output, video_mask
                          ) -> jax.Array:
        """Score a block of text rows against ALL videos: [c, s_text, D] ->
        [c, bv] (the loop body of clip4clip.py:389-407)."""
        c = seq_rows.shape[0]
        bv = visual_output.shape[0]
        s_text = seq_rows.shape[1]
        s_vis = visual_output.shape[1]
        # text branch carries only the pooled token -> mask of ones
        # (clip4clip.py:383-385)
        tmask_l = jnp.ones((c * bv, s_text), jnp.float32)

        seq_l = jnp.repeat(seq_rows[:, None], bv, axis=1)
        seq_l = seq_l.reshape(c * bv, s_text, -1)
        vis_r = jnp.tile(visual_output[None], (c, 1, 1, 1))
        vis_r = vis_r.reshape(c * bv, s_vis, -1)
        vmask_r = jnp.tile(video_mask[None], (c, 1, 1)).reshape(c * bv, s_vis)

        concat = jnp.concatenate([seq_l, vis_r], axis=1)
        concat_mask = jnp.concatenate([tmask_l, vmask_r], axis=1)
        concat_type = jnp.concatenate(
            [jnp.zeros_like(tmask_l), jnp.ones_like(vmask_r)], axis=1)
        _, pooled = self.cross(concat, concat_type, concat_mask)
        return self.similarity_dense(pooled).reshape(c, bv)

    def cross_similarity(self, sequence_output, visual_output, attention_mask,
                         video_mask) -> jax.Array:
        """tightTransf all-pairs similarity (clip4clip.py:369-410): every
        (text, video) pair is concatenated and scored by the cross model.

        With `cfg.cross_chunk_size > 0` the text rows are scored
        `cross_chunk_size` at a time (the reference's `step_size` split,
        clip4clip.py:377-391) so a large eval gallery never materialises the
        full [bt*bv, L, D] cross input; each chunk has identical static
        shapes so XLA compiles the block body once and reuses its buffers."""
        bt = sequence_output.shape[0]
        chunk = self.cfg.cross_chunk_size
        if chunk <= 0 or chunk >= bt:
            return self._cross_score_rows(sequence_output, visual_output,
                                          video_mask)
        n_pad = (-bt) % chunk
        seq_p = jnp.pad(sequence_output, ((0, n_pad), (0, 0), (0, 0)))
        rows = [self._cross_score_rows(seq_p[s:s + chunk], visual_output,
                                       video_mask)
                for s in range(0, bt + n_pad, chunk)]
        return jnp.concatenate(rows, axis=0)[:bt]

    def get_similarity_logits(self, sequence_output, visual_output,
                              attention_mask, video_mask,
                              logit_scale=None) -> jax.Array:
        """(clip4clip.py:412-434)"""
        if video_mask.shape[-1] != visual_output.shape[1] \
                and visual_output.ndim == 3:
            video_mask = self.video_mask_after_cluster(video_mask)
        if self.cfg.loose_type:
            assert self.cfg.sim_header in ("meanP", "seqTransf")
            return self.loose_similarity(sequence_output, visual_output,
                                         attention_mask, video_mask,
                                         logit_scale=logit_scale)
        assert self.cfg.sim_header == "tightTransf"
        return self.cross_similarity(sequence_output, visual_output,
                                     attention_mask, video_mask)

    # --------------------------------------------------------------- forward
    def __call__(self, input_ids=None, attention_mask=None, video=None,
                 video_mask=None, training: bool = False,
                 rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """Joint forward (clip4clip.py:199-263).

        Returns dict with sequence_output / visual_output / loss terms.
        """
        out: Dict[str, jax.Array] = {}
        cluster_loss = jnp.float32(0.0)
        sequence_output = visual_output = None
        if input_ids is not None:
            input_ids = input_ids.reshape(-1, input_ids.shape[-1])
            if attention_mask is not None:
                attention_mask = attention_mask.reshape(
                    -1, attention_mask.shape[-1])
            sequence_output = self.get_sequence_output(
                input_ids, deterministic=not training)
            out["sequence_output"] = sequence_output
        if video is not None:
            video_mask = video_mask.reshape(-1, video_mask.shape[-1])
            if self.cfg.cluster.inter or self.cfg.cluster.deep_cluster:
                video_mask = self.video_mask_after_cluster(video_mask)
            visual_output, cluster_loss = self.get_visual_output(
                video, video_mask, deterministic=not training, rng=rng)
            if not training and self.cfg.pre_visual_pooling:
                # eval-time pre-pooling OOM valve (clip4clip.py:237-243)
                v = visual_output / (jnp.linalg.norm(
                    visual_output, axis=-1, keepdims=True) + 1e-12)
                v = self._mean_pooling_for_similarity_visual(v, video_mask)
                visual_output = v / (jnp.linalg.norm(
                    v, axis=-1, keepdims=True) + 1e-12)
            out["visual_output"] = visual_output

        if training:
            sim = self.get_similarity_logits(sequence_output, visual_output,
                                             attention_mask, video_mask)
            sim_loss = 0.5 * (cross_entropy(sim) + cross_entropy(sim.T))
            out["sim_loss"] = sim_loss
            out["cluster_loss"] = cluster_loss
            out["loss"] = sim_loss + cluster_loss
        return out
