# coding=utf-8
"""Video-embedding gallery index for production serving.

The reference (CenterCLIP) stops at batch evaluation (main.py:381-534); a
deployed retrieval system instead keeps the gallery resident on-device and
answers text queries online.  This index holds the pooled, L2-normalised
video embeddings (the exact vectors `loose_similarity` scores against,
clip4clip.py:324-367) and serves top-k queries as one jitted
matmul + `lax.top_k` dispatch.

TPU-first design decisions:
* **Static shapes**: the gallery size is padded to a multiple of the mesh
  (or MXU lane) size at build time, and queries are padded to a small set
  of batch buckets, so every search hits a cached executable.
* **Quantisation**: ``int8`` storage (symmetric per-row max-abs) keeps a
  100M-clip gallery in 4x less HBM; scores are computed as
  ``(q @ codes.T) * scale`` — one bf16 matmul on the MXU plus a broadcast
  multiply, no dequantised copy is ever materialised.
* **Sharding**: with a mesh, gallery rows are sharded over the data axis;
  queries stay replicated, the [Q, N] score block is computed where the
  rows live and XLA inserts the gather for the final top-k (scores are
  tiny next to embeddings, so the collective is cheap ICI traffic).
"""
from __future__ import annotations

import itertools
import json
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

QUANT_MODES = ("float32", "bfloat16", "int8")

# process-wide monotone counter: every index construction or mutation gets a
# fresh number, so caches keyed on `index.version` can never hit a stale
# entry — unlike id(), which CPython reuses after GC (ADVICE r4 #1)
_INDEX_VERSIONS = itertools.count(1)

# queries are padded up to the nearest bucket so each (bucket, k) pair
# compiles exactly once
QUERY_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _next_bucket(n: int, buckets: Sequence[int] = QUERY_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


def l2_normalize(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = np.asarray(x, np.float32)
    return x / (np.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


class VideoIndex:
    """In-memory (device-resident) gallery of normalised video embeddings.

    Parameters
    ----------
    embeddings : [N, D] float array — pooled video embeddings.  They are
        L2-normalised here, so raw pooled vectors are fine.
    video_ids : N identifiers returned by queries.
    quantize : "float32" | "bfloat16" | "int8" storage for the gallery.
    mesh : optional `jax.sharding.Mesh`; gallery rows are sharded over its
        data axis and the padded size becomes a multiple of the mesh size.
    """

    def __init__(self, embeddings: np.ndarray, video_ids: Sequence[str],
                 quantize: str = "float32", mesh=None):
        if quantize not in QUANT_MODES:
            raise ValueError(f"quantize must be one of {QUANT_MODES}")
        emb = l2_normalize(np.asarray(embeddings, np.float32))
        if emb.ndim != 2:
            raise ValueError(f"embeddings must be [N, D], got {emb.shape}")
        if emb.shape[0] != len(video_ids):
            raise ValueError("len(video_ids) != embeddings rows")
        self.video_ids: List[str] = [str(v) for v in video_ids]
        self.quantize = quantize
        self.mesh = mesh
        self.dim = int(emb.shape[1])
        self.n_valid = int(emb.shape[0])

        codes, scales = self._quantize_rows(emb)
        self._codes_host, self._scales_host = self._pad_rows(codes, scales)
        self._place()
        self._search_cache = {}
        self.version = next(_INDEX_VERSIONS)

    # ---------------------------------------------------------- quantisation
    def _quantize_rows(self, emb: np.ndarray):
        """[N, D] fp32 (already L2-normalised) -> (codes, scales|None) in
        the index's storage dtype.  Single source of truth for __init__ and
        `add` so the two can never drift (add-vs-fresh exactness is pinned
        by tests/test_serve.py)."""
        if self.quantize == "int8":
            scale = np.max(np.abs(emb), axis=1, keepdims=True) / 127.0
            scale = np.where(scale == 0.0, 1.0, scale)
            codes = np.clip(np.rint(emb / scale), -127, 127).astype(np.int8)
            return codes, scale.astype(np.float32)
        if self.quantize == "bfloat16":
            return np.asarray(jnp.asarray(emb, jnp.bfloat16)), None
        return emb.astype(np.float32), None

    def _pad_rows(self, codes: np.ndarray, scales):
        """Pad rows so the on-device shape divides the mesh (and stays
        MXU-tileable); padded rows are masked to -inf inside the kernel.
        Sets self.n_padded; returns (codes_host, scales_host)."""
        mult = 8
        if self.mesh is not None:
            mult = max(mult, int(np.prod([self.mesh.shape[a]
                                          for a in self.mesh.axis_names])))
        self.n_padded = (self.n_valid + mult - 1) // mult * mult
        pad = self.n_padded - codes.shape[0]
        if pad:
            codes = np.concatenate(
                [codes, np.zeros((pad, self.dim), codes.dtype)])
            if scales is not None:
                scales = np.concatenate(
                    [scales, np.ones((pad, 1), np.float32)])
        return codes, scales

    # ------------------------------------------------------------- placement
    def _place(self):
        codes = jnp.asarray(self._codes_host)
        scales = (jnp.asarray(self._scales_host)
                  if self._scales_host is not None else None)
        if self.mesh is not None:
            from ..parallel.mesh import DATA_AXIS
            from jax.sharding import NamedSharding, PartitionSpec as P
            rows = NamedSharding(self.mesh, P(DATA_AXIS))
            codes = jax.device_put(codes, rows)
            if scales is not None:
                scales = jax.device_put(scales, rows)
        self._codes = codes
        self._scales = scales

    # ---------------------------------------------------------------- search
    def score_core(self, k: int):
        """(traceable_fn, device_operands) — the scoring kernel as a pure
        jax-traceable function so callers (RetrievalEngine's fused
        tower+search program, `_search_fn` itself) can inline it into a
        larger jitted program.  `fn(q, *operands)` maps normalised queries
        [Q, D] to (scores [Q, k], ORIGINAL gallery row indices [Q, k])."""
        n_valid = self.n_valid

        def fn(q, codes, scales):
            # bf16 matmul on the MXU with fp32 accumulate; cosine scores in
            # [-1, 1] so bf16's ~3 decimal digits keep ranking stable — the
            # int8 path's quantisation error dominates anyway
            scores = jnp.matmul(q.astype(jnp.bfloat16),
                                codes.astype(jnp.bfloat16).T,
                                preferred_element_type=jnp.float32)
            if scales is not None:
                scores = scores * scales[:, 0][None, :]
            pad_mask = jnp.arange(scores.shape[1]) >= n_valid
            scores = jnp.where(pad_mask[None, :], -jnp.inf, scores)
            return jax.lax.top_k(scores, k)

        return fn, (self._codes, self._scales)

    def _search_fn(self, k: int):
        """One jitted executable per k (query bucket handled by jit's shape
        cache)."""
        if k in self._search_cache:
            return self._search_cache[k]
        core, _ = self.score_core(k)
        search = jax.jit(lambda codes, scales, q: core(q, codes, scales))
        self._search_cache[k] = search
        return search

    def search(self, query_emb: np.ndarray, k: int = 5
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k over the gallery.

        query_emb: [Q, D] (need not be normalised).  Returns
        (scores [Q, k] fp32, indices [Q, k] int) for the ORIGINAL rows —
        padding never escapes.
        """
        if k <= 0:
            raise ValueError("k must be positive")
        k = min(k, self.n_valid)
        q = l2_normalize(np.asarray(query_emb, np.float32))
        if q.ndim == 1:
            q = q[None]
        n_q = q.shape[0]
        bucket = _next_bucket(n_q)
        if bucket != n_q:
            q = np.concatenate(
                [q, np.zeros((bucket - n_q, self.dim), np.float32)])
        scores, idx = self._search_fn(k)(self._codes, self._scales,
                                         jnp.asarray(q))
        scores, idx = jax.device_get((scores, idx))
        return scores[:n_q], idx[:n_q]

    def add(self, embeddings: np.ndarray, video_ids: Sequence[str]) -> None:
        """Append videos to a live gallery.

        Exact, not approximate: int8 quantisation is per-row symmetric, so
        new rows get their own scales and existing codes are untouched.
        The device copy is re-placed (new padded shape) and the per-k
        executables retrace on the next query — adds are meant to be
        batched, not per-item."""
        emb = l2_normalize(np.asarray(embeddings, np.float32))
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}], got {emb.shape}")
        if emb.shape[0] != len(video_ids):
            raise ValueError("len(video_ids) != embeddings rows")

        new_codes, new_scales = self._quantize_rows(emb)
        codes = np.concatenate([self._codes_host[: self.n_valid], new_codes])
        scales = (np.concatenate([self._scales_host[: self.n_valid],
                                  new_scales])
                  if new_scales is not None else None)

        self.video_ids += [str(v) for v in video_ids]
        self.n_valid = int(codes.shape[0])
        self._codes_host, self._scales_host = self._pad_rows(codes, scales)
        self._place()
        # the cached executables close over the OLD n_valid pad mask
        self._search_cache = {}
        self.version = next(_INDEX_VERSIONS)

    def lookup(self, indices: np.ndarray) -> List[str]:
        return [self.video_ids[int(i)] for i in np.asarray(indices).ravel()]

    def __len__(self) -> int:
        return self.n_valid

    # --------------------------------------------------------------- storage
    def save(self, path: str) -> None:
        """Single-file npz: codes + scales + ids + meta."""
        meta = dict(quantize=self.quantize, dim=self.dim,
                    n_valid=self.n_valid, version=1)
        codes = self._codes_host[: self.n_valid]
        if self.quantize == "bfloat16":
            # npz has no native bf16; fp32 is an exact superset
            codes = codes.astype(np.float32)
        np.savez_compressed(
            path,
            codes=codes,
            scales=(self._scales_host[: self.n_valid]
                    if self._scales_host is not None else np.zeros(0)),
            video_ids=np.asarray(self.video_ids),
            meta=json.dumps(meta))

    @classmethod
    def load(cls, path: str, mesh=None) -> "VideoIndex":
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            if meta.get("index_type", "flat") != "flat":
                raise ValueError(f"{path} holds a {meta['index_type']} "
                                 "index — use serve.load_index")
            codes = z["codes"]
            scales = z["scales"]
            ids = [str(v) for v in z["video_ids"]]
        if meta["quantize"] == "int8":
            emb = codes.astype(np.float32) * scales
        else:
            emb = codes.astype(np.float32)
        out = cls(emb, ids, quantize=meta["quantize"], mesh=mesh)
        # restore the EXACT stored codes (re-quantising the renormalised
        # dequantised floats would drift by an ulp per roundtrip); only the
        # padding rows are rebuilt
        pad = out.n_padded - out.n_valid
        if meta["quantize"] == "int8":
            out._codes_host = np.concatenate(
                [codes, np.zeros((pad, out.dim), np.int8)])
            out._scales_host = np.concatenate(
                [scales.astype(np.float32), np.ones((pad, 1), np.float32)])
        elif meta["quantize"] == "bfloat16":
            bf16 = np.asarray(jnp.asarray(codes, jnp.bfloat16))
            out._codes_host = np.concatenate(
                [bf16, np.zeros((pad, out.dim), bf16.dtype)])
        else:
            out._codes_host = np.concatenate(
                [codes.astype(np.float32), np.zeros((pad, out.dim),
                                                    np.float32)])
        out._place()
        out.version = next(_INDEX_VERSIONS)
        return out


def load_index(path: str, mesh=None):
    """Open a saved gallery index of either type (meta's `index_type`
    dispatches: flat `VideoIndex` vs cluster-pruned `IVFVideoIndex`)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
    if meta.get("index_type", "flat") == "ivf":
        from .ivf import IVFVideoIndex
        return IVFVideoIndex.load(path, mesh=mesh)
    return VideoIndex.load(path, mesh=mesh)
