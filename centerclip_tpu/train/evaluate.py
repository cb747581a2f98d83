# coding=utf-8
"""Retrieval evaluation (reference: main.py:381-534), TPU-native.

Two phases, like the reference:
1. Feature caching: encode every test batch (multi-sentence datasets encode
   every caption but only the videos at cut-off rows, main.py:427-442).
   Encoders are jitted once per batch shape; the host pipeline pads the tail
   batch so only one compilation happens per tower.
2. Similarity assembly: one device matmul per (text-block, video-block) pair
   through `get_similarity_logits` — on a mesh the text blocks are sharded
   and the full matrix is gathered to host, replacing the reference's
   rank-0-only double loop.
Metrics: standard or multi-sentence protocol (main.py:466-494).
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip4clip import CLIP4Clip
from .metrics import (compute_metrics, reshape_multi_sentence_sim,
                      tensor_text_to_video_metrics, tensor_video_to_text_sim)

logger = logging.getLogger(__name__)


def _pad_to(x: np.ndarray, n: int) -> Tuple[np.ndarray, int]:
    valid = x.shape[0]
    if valid == n:
        return x, valid
    pad = np.zeros((n - valid,) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad], axis=0), valid


class Evaluator:
    """Stateless two-phase evaluator.

    With a mesh, phase-1 encoding shards every (padded) batch over the data
    axis — the multi-chip analogue of the reference's rank-0-only eval loop
    (main.py:232-239) without leaving chips idle.
    """

    def __init__(self, model: CLIP4Clip, params, mesh=None):
        self.model = model
        self.mesh = mesh
        self.update_params(params)
        self._encode_text = jax.jit(functools.partial(
            self._encode_text_impl, model))
        self._encode_video = jax.jit(functools.partial(
            self._encode_video_impl, model))
        self._sim_block = jax.jit(functools.partial(
            self._sim_block_impl, model))

    def update_params(self, params):
        """Swap in fresh params (per-epoch eval) without re-tracing the
        jitted encoders."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_params
            params = shard_params(self.mesh, params)
        self.variables = {"params": params}

    def _device_put(self, *arrays):
        if self.mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from ..parallel.mesh import shard_batch
        out = tuple(shard_batch(self.mesh, a) for a in arrays)
        return out if len(out) > 1 else out[0]

    def _pad_target(self, batch_size: int) -> int:
        if self.mesh is None:
            return batch_size
        n = len(self.mesh.devices.ravel())
        return (batch_size + n - 1) // n * n

    # --- jitted kernels -----------------------------------------------------
    @staticmethod
    def _encode_text_impl(model, variables, input_ids):
        return model.apply(variables, input_ids,
                           method=lambda m, t: m.get_sequence_output(t))

    @staticmethod
    def _encode_video_impl(model, variables, video, video_mask):
        def fn(m, v, vm):
            vm = m.video_mask_after_cluster(vm)
            visual, _ = m.get_visual_output(v, vm)
            if m.cfg.pre_visual_pooling:
                # ActivityNet eval OOM valve (clip4clip.py:237-243)
                x = visual / (jnp.linalg.norm(visual, axis=-1,
                                              keepdims=True) + 1e-12)
                x = m._mean_pooling_for_similarity_visual(x, vm)
                visual = x / (jnp.linalg.norm(x, axis=-1,
                                              keepdims=True) + 1e-12)
            return visual, vm
        return model.apply(variables, video, video_mask, method=fn)

    @staticmethod
    def _sim_block_impl(model, variables, seq, vis, vmask):
        def fn(m, s, v, vm):
            return m.get_similarity_logits(s, v, None, vm)
        return model.apply(variables, seq, vis, vmask, method=fn)

    # --- public API ----------------------------------------------------------
    def cache_features(self, batches: Iterable[Dict[str, np.ndarray]],
                       multi_sentence: bool = False,
                       cut_off_points: Optional[List[int]] = None
                       ) -> Dict[str, Any]:
        """Phase 1 (main.py:416-452).  `batches` yield dicts with input_ids /
        attention_mask / video / video_mask, all same batch size except the
        tail (padded internally)."""
        seq_list, vis_list, vmask_list = [], [], []
        batch_size = None
        total_video_num = 0
        cut0 = [c - 1 for c in (cut_off_points or [])]  # main.py:399
        t0 = time.time()
        for batch in batches:
            ids = np.asarray(batch["input_ids"])
            if batch_size is None:
                batch_size = self._pad_target(ids.shape[0])
            ids_p, valid = _pad_to(ids, batch_size)
            # device arrays accumulate un-fetched: every batch's encode is
            # queued back-to-back and the single fetch below overlaps the
            # whole phase with the host loop — a per-batch np.asarray would
            # insert one tunnel round-trip of dead time per batch
            seq = self._encode_text(self.variables,
                                    self._device_put(ids_p))[:valid]
            seq_list.append(seq)

            video = np.asarray(batch["video"])
            vmask = np.asarray(batch["video_mask"])
            if multi_sentence:
                # encode only the unique videos at caption cut-offs
                s_, e_ = total_video_num, total_video_num + ids.shape[0]
                filt = [i - s_ for i in cut0 if s_ <= i < e_]
                total_video_num += ids.shape[0]
                if not filt:
                    continue
                video, vmask = video[filt], vmask[filt]
            video_p, vvalid = _pad_to(video, batch_size)
            vmask_p, _ = _pad_to(vmask, batch_size)
            if video_p.ndim == 6:
                # ship [B*pairs*T, C, H, W]: a 6-D uint8 device parameter
                # costs an extra layout repack (see parallel.shard_batch)
                video_p = video_p.reshape(-1, *video_p.shape[-3:])
            video_p, vmask_p = self._device_put(video_p, vmask_p)
            vis, vmask_after = self._encode_video(self.variables, video_p,
                                                  vmask_p)
            vis_list.append(vis[:vvalid])
            vmask_list.append(vmask_after[:vvalid])
        # one blocking fetch for the whole phase (also the time fence: over
        # the tunnel only a host transfer truly synchronises)
        seq_list, vis_list, vmask_list = jax.device_get(
            (seq_list, vis_list, vmask_list))
        infer_time = time.time() - t0
        return {
            "sequence": np.concatenate(seq_list, axis=0),
            "visual": np.concatenate(vis_list, axis=0),
            "video_mask": np.concatenate(vmask_list, axis=0),
            "infer_time": infer_time,
        }

    def similarity_matrix(self, cached: Dict[str, Any],
                          text_block: int = 512) -> np.ndarray:
        """Phase 2 (main.py:463-464, 502-534): blockwise
        [n_texts, n_videos] similarity."""
        seq = cached["sequence"]
        vis = jnp.asarray(cached["visual"])
        vmask = jnp.asarray(cached["video_mask"])
        rows = []
        n = seq.shape[0]
        for s in range(0, n, text_block):
            blk = jnp.asarray(seq[s:s + text_block])
            # queue all blocks, fetch once (see cache_features)
            rows.append(self._sim_block(self.variables, blk, vis, vmask))
        return np.concatenate(jax.device_get(rows), axis=0)

    def evaluate(self, batches, multi_sentence: bool = False,
                 cut_off_points: Optional[List[int]] = None,
                 inference_speed_test: bool = False) -> Dict[str, Any]:
        """Full protocol; returns {'t2v': ..., 'v2t': ..., 'R1': float,
        'infer_time': float} (main.py:381-499)."""
        cached = self.cache_features(batches, multi_sentence=multi_sentence,
                                     cut_off_points=cut_off_points)
        logger.info("inference time: %.2fs", cached["infer_time"])
        if inference_speed_test:
            return {"R1": 0.0, "infer_time": cached["infer_time"]}
        sim = self.similarity_matrix(cached)
        if multi_sentence:
            logger.info("before reshape, sim matrix: %s", sim.shape)
            packed = reshape_multi_sentence_sim(sim, cut_off_points)
            tv = tensor_text_to_video_metrics(packed)
            vt = compute_metrics(tensor_video_to_text_sim(packed))
        else:
            tv = compute_metrics(sim)
            vt = compute_metrics(sim.T)
        logger.info(
            "Text-to-Video: R@1: %.1f - R@5: %.1f - R@10: %.1f - "
            "Median R: %.1f - Mean R: %.1f",
            tv["R1"], tv["R5"], tv["R10"], tv["MR"], tv["MeanR"])
        logger.info(
            "Video-to-Text: R@1: %.1f - R@5: %.1f - R@10: %.1f - "
            "Median R: %.1f - Mean R: %.1f",
            vt["R1"], vt["R5"], vt["R10"], vt["MR"], vt["MeanR"])
        return {"t2v": tv, "v2t": vt, "R1": tv["R1"], "sim_matrix": sim,
                "infer_time": cached["infer_time"]}
