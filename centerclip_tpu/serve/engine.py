# coding=utf-8
"""Online text→video retrieval engine.

Turns a trained CLIP4Clip model into a serving stack: tokenizer → jitted
text tower → `VideoIndex` top-k, all with static shapes so every query path
hits a cached TPU executable.  The scores it returns are EXACTLY the
model's `get_similarity_logits` for the loose headers (meanP / seqTransf,
reference clip4clip.py:324-367): the gallery stores the pooled, normalised
video vectors and the query applies the same normalisation and
`exp(logit_scale)` — pinned by tests/test_serve.py against the batch-eval
path.

tightTransf is rejected up front: its similarity is a cross-attention over
(text, video) pairs (clip4clip.py:369-421) and cannot be served from a
pooled index — use the batch `Evaluator` for that header.
"""
from __future__ import annotations

import functools
import logging
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.clip4clip import CLIP4Clip
from ..models.tokenizer import SimpleTokenizer, tokenize_batch
from .index import VideoIndex, _next_bucket, l2_normalize

logger = logging.getLogger(__name__)


class RetrievalEngine:
    """Stateless query engine over a `VideoIndex`.

    Parameters
    ----------
    model, params : the trained CLIP4Clip (loose sim header only).
    index : optional pre-built `VideoIndex` (else call `build_index`).
    mesh : optional mesh — index rows and encode batches shard over its
        data axis.
    """

    def __init__(self, model: CLIP4Clip, params,
                 index: Optional[VideoIndex] = None,
                 tokenizer: Optional[SimpleTokenizer] = None, mesh=None):
        if model.cfg.sim_header not in ("meanP", "seqTransf"):
            raise ValueError(
                f"sim_header={model.cfg.sim_header!r} cannot be served from "
                "a pooled index; meanP/seqTransf only (use train.evaluate."
                "Evaluator for tightTransf)")
        self.model = model
        self.mesh = mesh
        self.index = index
        self._tokenizer = tokenizer
        self.max_words = model.cfg.max_words
        if self.mesh is not None:
            from ..parallel.mesh import shard_params
            params = shard_params(self.mesh, params)
        self.variables = {"params": params}
        self.logit_scale = float(
            np.exp(np.asarray(params["clip"]["logit_scale"], np.float32)))
        self._embed_text = jax.jit(functools.partial(
            self._embed_text_impl, model))
        self._embed_video = jax.jit(functools.partial(
            self._embed_video_impl, model))
        self._fused_cache: Dict[Tuple[int, int], object] = {}

    # --------------------------------------------------------------- kernels
    @staticmethod
    def _embed_text_impl(model, variables, input_ids):
        def fn(m, ids):
            seq = m.get_sequence_output(ids)[:, 0, :]      # [B, D] fp32
            return seq / (jnp.linalg.norm(seq, axis=-1,
                                          keepdims=True) + 1e-12)
        return model.apply(variables, input_ids, method=fn)

    @staticmethod
    def _fused_search_impl(model, score_core, variables, input_ids,
                           *operands):
        """Text tower -> normalise -> index scoring core -> top-k, ONE
        program.

        The two-dispatch path (`_embed_text` + `index.search`) costs a
        device round-trip per stage — which dominates online latency when
        the host link is slow (the TPU tunnel here: measured 59 ms/query at
        B=1 of which the second dispatch+fetch is roughly half).  Fusing
        query embedding and top-k into one jitted program halves the
        round-trips and also lets XLA keep the [Q, D] query block on-device
        between the tower and the score matmul.  Math is identical to the
        two-step path: `score_core` IS the index's own scoring kernel
        (`VideoIndex.score_core` / `IVFVideoIndex.score_core`), inlined."""
        def fn(m, ids):
            seq = m.get_sequence_output(ids)[:, 0, :]      # [Q, D] fp32
            return seq / (jnp.linalg.norm(seq, axis=-1,
                                          keepdims=True) + 1e-12)
        q = model.apply(variables, input_ids, method=fn)
        return score_core(q, *operands)

    def _fused_search_fn(self, k: int):
        """Cached jitted (tokenised query batch -> top-k) executable +
        its index operands; keyed by (k, index.version) — `version` is a
        process-wide monotone counter bumped on every index build or
        mutation (serve/index.py), so `add`, re-attaching a different
        index (or index TYPE), and even id() reuse after GC can never hit
        a stale core.  Entries for other versions are evicted so a
        long-running server that mutates/reloads its index does not pin
        the OLD gallery's device buffers in HBM (ADVICE r4 #1); jit's
        shape cache handles query-bucket / gallery-shape changes."""
        version = self.index.version
        key = (k, version)
        hit = self._fused_cache.get(key)
        if hit is None:
            stale = [kk for kk in self._fused_cache if kk[1] != version]
            for kk in stale:
                del self._fused_cache[kk]
            core, operands = self.index.score_core(k)
            hit = (jax.jit(functools.partial(
                self._fused_search_impl, self.model, core)), operands)
            self._fused_cache[key] = hit
        return hit

    @staticmethod
    def _embed_video_impl(model, variables, video, video_mask):
        """Pooled video vector — the video side of `loose_similarity`
        (clip4clip.py:324-367): cluster-aware mask, per-frame normalise,
        optional seqTransf, masked mean, final normalise."""
        def fn(m, v, vm):
            vm = m.video_mask_after_cluster(vm)
            visual, _ = m.get_visual_output(v, vm)
            visual = visual.astype(jnp.float32)
            if m.cfg.sim_header == "seqTransf":
                visual = m._seq_transf(visual, vm)
            visual = visual / (jnp.linalg.norm(visual, axis=-1,
                                               keepdims=True) + 1e-12)
            pooled = m._mean_pooling_for_similarity_visual(visual, vm)
            return pooled / (jnp.linalg.norm(pooled, axis=-1,
                                             keepdims=True) + 1e-12)
        return model.apply(variables, video, video_mask, method=fn)

    # ------------------------------------------------------------- placement
    def _device_put(self, *arrays):
        if self.mesh is None:
            out = tuple(jnp.asarray(a) for a in arrays)
        else:
            from ..parallel.mesh import shard_batch
            out = tuple(shard_batch(self.mesh, a) for a in arrays)
        return out if len(out) > 1 else out[0]

    def _pad_rows(self, x: np.ndarray, n: int) -> np.ndarray:
        if x.shape[0] == n:
            return x
        pad = np.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
        return np.concatenate([x, pad], axis=0)

    def _bucket(self, n: int) -> int:
        b = _next_bucket(n)
        if self.mesh is not None:
            d = int(np.prod([self.mesh.shape[a]
                             for a in self.mesh.axis_names]))
            b = (b + d - 1) // d * d
        return b

    # ---------------------------------------------------------------- warmup
    def warmup(self, k: int = 5, max_queries: int = 32) -> int:
        """Precompile the online path for every query bucket <= max_queries
        (and top-k executable) so the first real query never eats a trace +
        compile.  Returns the number of executables warmed."""
        from .index import QUERY_BUCKETS
        buckets = [b for b in QUERY_BUCKETS if b <= max_queries] or [1]
        last = None
        for b in buckets:
            ids = np.ones((b, self.max_words), np.int32)
            if self.index is not None:
                # warm exactly what a live `search()` dispatches: the fused
                # (query-bucket, k) program
                last = self.search_token_ids(ids, k=k)
            else:
                last = jax.device_get(self._embed_text(
                    self.variables,
                    self._device_put(self._pad_rows(ids, self._bucket(b)))))
        if last is not None:
            jax.device_get(last)
        return len(buckets)

    # ----------------------------------------------------------------- texts
    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        """[Q] strings -> [Q, D] normalised fp32 query embeddings."""
        ids, _, _ = tokenize_batch(self.tokenizer, list(texts),
                                   max_words=self.max_words)
        return self.encode_token_ids(ids)

    def encode_token_ids(self, input_ids: np.ndarray) -> np.ndarray:
        n = input_ids.shape[0]
        ids = self._pad_rows(np.asarray(input_ids, np.int32),
                             self._bucket(n))
        emb = self._embed_text(self.variables, self._device_put(ids))
        return np.asarray(jax.device_get(emb))[:n]

    # ---------------------------------------------------------------- search
    def search(self, texts: Sequence[str], k: int = 5
               ) -> List[List[Dict[str, float]]]:
        """Queries -> per-query ranked [{video_id, score}]; scores are the
        model's similarity logits (cosine x exp(logit_scale)).

        Single device dispatch: tokenise on the host, then one fused
        (text tower + gallery top-k) program — see `_fused_search_impl`."""
        ids, _, _ = tokenize_batch(self.tokenizer, list(texts),
                                   max_words=self.max_words)
        scores, idx = self.search_token_ids(ids, k=k)
        out = []
        for q in range(len(texts)):
            # i < 0 is an IVF "no result" slot (probed cells ran light,
            # serve/ivf.py `search` docstring) — drop, don't wrap around
            out.append([
                {"video_id": self.index.video_ids[int(i)],
                 "score": float(s)}
                for s, i in zip(scores[q], idx[q]) if i >= 0])
        return out

    def search_token_ids(self, input_ids: np.ndarray, k: int = 5
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenised queries -> (scores [Q, k] incl. exp(logit_scale),
        gallery row indices [Q, k]) via the fused single-dispatch path.

        If the attached index advertises `max_query_bucket` (the IVF
        index: its probe gather materialises [Q, nprobe, cap, D] rows, so
        an unchunked 128-query batch against a 1M-row gallery would
        gather ~GBs in one dispatch), larger batches are split into
        per-chunk dispatches — queries score independently, so the
        concatenated result is identical."""
        if self.index is None:
            raise RuntimeError("no index attached — build or load one first")
        if k <= 0:
            raise ValueError("k must be positive")
        k = min(k, self.index.n_valid)
        input_ids = np.asarray(input_ids, np.int32)
        n = input_ids.shape[0]
        chunk = getattr(self.index, "max_query_bucket", None)
        if chunk is not None and n > chunk:
            parts = [self.search_token_ids(input_ids[i:i + chunk], k)
                     for i in range(0, n, chunk)]
            return (np.concatenate([p[0] for p in parts], axis=0),
                    np.concatenate([p[1] for p in parts], axis=0))
        ids = self._pad_rows(input_ids, self._bucket(n))
        fn, operands = self._fused_search_fn(k)
        scores, idx = fn(self.variables, self._device_put(ids), *operands)
        scores, idx = jax.device_get((scores, idx))
        return scores[:n] * self.logit_scale, idx[:n]

    # ----------------------------------------------------------- index build
    def embed_video_batches(
            self, batches: Iterable[Dict[str, np.ndarray]]) -> np.ndarray:
        """Encode video batches to pooled gallery vectors.

        `batches` yield {"video": [B,1,T,C,H,W] | [B*T,C,H,W],
        "video_mask": [B,T]}; the tail batch may be short (padded here).
        Device results are queued and fetched once, like
        `Evaluator.cache_features` — per-batch fetches would serialise the
        host loop on tunnel round-trips.
        """
        chunks, valid = [], []
        target = 0
        for batch in batches:
            vmask = np.asarray(batch["video_mask"])
            video = np.asarray(batch["video"])
            n = vmask.shape[0]
            # sticky bucket: the first (typically full-width) batch sets the
            # shape so ragged tails reuse its executable; a LARGER batch
            # re-buckets rather than crashing the pad
            target = max(target, self._bucket(n))
            if video.ndim == 6:
                video = video.reshape(-1, *video.shape[-3:])
            frames = video.shape[0] // n
            video = self._pad_rows(video, target * frames)
            vmask = self._pad_rows(vmask, target)
            video, vmask = self._device_put(video, vmask)
            chunks.append(self._embed_video(self.variables, video, vmask))
            valid.append(n)
        chunks = jax.device_get(chunks)
        return np.concatenate([c[:n] for c, n in zip(chunks, valid)], axis=0)

    def build_index(self, batches: Iterable[Dict[str, np.ndarray]],
                    video_ids: Sequence[str], quantize: str = "float32",
                    index_type: str = "flat", **index_kw) -> VideoIndex:
        """index_type "flat" (exact, mesh-shardable) or "ivf"
        (cluster-pruned, single-device — serve/ivf.py); extra kwargs go to
        the index constructor (n_clusters/nprobe/... for ivf)."""
        emb = self.embed_video_batches(batches)
        if emb.shape[0] != len(video_ids):
            raise ValueError(
                f"{emb.shape[0]} embeddings vs {len(video_ids)} ids")
        if index_type == "flat":
            self.index = VideoIndex(emb, video_ids, quantize=quantize,
                                    mesh=self.mesh, **index_kw)
        elif index_type == "ivf":
            if self.mesh is not None:
                raise ValueError("IVF index is single-device; drop the mesh "
                                 "or use index_type='flat'")
            from .ivf import IVFVideoIndex
            self.index = IVFVideoIndex(emb, video_ids, quantize=quantize,
                                       **index_kw)
        else:
            raise ValueError(f"unknown index_type {index_type!r}")
        logger.info("gallery index (%s): %d videos, dim=%d, quantize=%s",
                    index_type, len(self.index), self.index.dim, quantize)
        return self.index
