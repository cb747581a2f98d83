# coding=utf-8
"""Deployment CLI: build a gallery index from a dataset + checkpoint, then
answer text queries against it online.

The reference stops at batch evaluation (reference main.py:381-534); this
turns the same model + dataset plumbing into a serving artifact:

  # one-off: encode the eval gallery and save a quantised index
  python -m centerclip_tpu.serve.cli build \\
      --output_dir /tmp/serve --datatype msrvtt --features_path ... \\
      --init_model ckpt.pth.tar --index_path gallery.npz --quantize int8

  # online: load the index and answer queries (JSON lines on stdout)
  python -m centerclip_tpu.serve.cli query \\
      --output_dir /tmp/serve --init_model ckpt.pth.tar \\
      --index_path gallery.npz --query "a man cooking" --topk 5

  # daemon: JSON-over-HTTP service (see serve/http.py for the API)
  python -m centerclip_tpu.serve.cli serve \\
      --output_dir /tmp/serve --init_model ckpt.pth.tar \\
      --index_path gallery.npz --port 8080

All standard flags (model variant, cluster config, dataset paths — see
centerclip_tpu.cli) are accepted; serve-specific flags are below.  Model
weights load exactly like training (main.py:79-108): --init_model >
pretrained CLIP archive > fresh.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _serve_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="centerclip_tpu.serve.cli", add_help=False,
        description="build / query a video retrieval index")
    p.add_argument("command", choices=["build", "query", "serve"])
    p.add_argument("--index_path", type=str, required=True,
                   help="gallery .npz (written by build, read by query)")
    p.add_argument("--index_type", type=str, default="flat",
                   choices=["flat", "ivf"],
                   help="flat = exact, mesh-shardable; ivf = cluster-pruned "
                        "low-latency (serve/ivf.py; build)")
    p.add_argument("--n_clusters", type=int, default=0,
                   help="IVF cells; 0 = ~sqrt(N) (build --index_type ivf)")
    p.add_argument("--nprobe", type=int, default=8,
                   help="IVF cells probed per query (build --index_type ivf)")
    p.add_argument("--quantize", type=str, default="float32",
                   choices=("float32", "bfloat16", "int8"),
                   help="gallery storage dtype (build)")
    p.add_argument("--query", action="append", default=[],
                   help="query text (repeatable)")
    p.add_argument("--queries_file", type=str, default="",
                   help="file with one query per line (query)")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--host", type=str, default="127.0.0.1",
                   help="bind address (serve)")
    p.add_argument("--port", type=int, default=8080,
                   help="bind port; 0 = pick a free port (serve)")
    return p


# --------------------------------------------------------------------- model
def load_model_and_params(cfg):
    """Init the model tree and load weights the way main.py:79-108 does."""
    import jax
    from ..models.clip4clip import CLIP4Clip
    from ..train import state as state_mod

    model = CLIP4Clip(cfg.model)
    d = cfg.data
    T, W, R = d.max_frames, d.max_words, d.image_resolution
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        input_ids=np.zeros((2, W), np.int32),
        attention_mask=np.ones((2, W), np.int32),
        video=np.zeros((2, 1, T, 3, R, R), np.float32),
        video_mask=np.ones((2, T), np.int32), training=True)["params"]

    pt_name = {"ViT-B/32": "ViT-B-32.pt", "ViT-B/16": "ViT-B-16.pt"}.get(
        cfg.model.clip_name)
    pretrained = os.path.join(cfg.pretrained_dir, pt_name or "")
    if cfg.init_model:
        params, report = state_mod.import_torch_checkpoint(
            cfg.init_model, cfg.model, init_params=params)
        logger.info("init_model loaded; missing=%d unexpected=%d",
                    len(report["missing"]), len(report["unexpected"]))
    elif pt_name and os.path.exists(pretrained):
        params, _ = state_mod.init_from_pretrained_clip(
            pretrained, cfg.model, params,
            temperature_new=cfg.model.temperature_new)
        logger.info("pretrained CLIP loaded from %s", pretrained)
    else:
        logger.warning("no checkpoint given and no pretrained CLIP at %s — "
                       "serving RANDOM weights", pretrained)
    return model, params


# ------------------------------------------------------------------- gallery
def gallery_video_ids(dataset, multi_sentence: bool,
                      cut_off_points: Sequence[int]) -> List[str]:
    """One id per gallery row, matching the rows the Evaluator encodes.

    Multi-sentence datasets repeat each video once per caption; the gallery
    keeps the unique videos at the caption cut-offs (evaluate.py cut0,
    reference main.py:399-452)."""
    if hasattr(dataset, "sentences_dict"):
        row_ids = [str(dataset.sentences_dict[i][0])
                   for i in range(len(dataset))]
    elif hasattr(dataset, "data") and "video_id" in getattr(
            dataset.data, "columns", ()):
        row_ids = [str(v) for v in dataset.data["video_id"].values]
    elif hasattr(dataset, "pairs"):
        # pairs shapes: FrameStoreClipDataset list[(video_id, caption)],
        # DiDeMo dict{i: (video_id, sub_id)}, ActivityNet
        # dict{i: (pseudo_id, video_id, sub_id)}
        pairs = dataset.pairs
        if isinstance(pairs, dict):
            pairs = [pairs[i] for i in range(len(pairs))]
        row_ids = [str(p[1] if len(p) == 3 else p[0]) for p in pairs]
    else:
        logger.warning(
            "dataset %s exposes no video ids (no sentences_dict / data "
            "frame / pairs) — falling back to synthetic video{i} ids; "
            "query results will NOT name real videos",
            type(dataset).__name__)
        row_ids = [f"video{i}" for i in range(len(dataset))]
    if multi_sentence:
        return [row_ids[c - 1] for c in cut_off_points]
    return row_ids


def gallery_batches(batches, multi_sentence: bool,
                    cut_off_points: Sequence[int], batch_size: int
                    ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield {"video", "video_mask"} gallery batches of `batch_size`.

    Multi-sentence rows are filtered to the unique videos (same cut-off rule
    as Evaluator.cache_features) and re-batched so every encode dispatch is
    full-width."""
    cut0 = [c - 1 for c in (cut_off_points or [])]
    pend_v, pend_m, seen = [], [], 0

    def drain(force: bool):
        nonlocal pend_v, pend_m
        while pend_v and (sum(m.shape[0] for m in pend_m) >= batch_size
                          or force):
            video = np.concatenate(pend_v, axis=0)
            vmask = np.concatenate(pend_m, axis=0)
            take = min(batch_size, vmask.shape[0])
            yield {"video": video[:take], "video_mask": vmask[:take]}
            pend_v = [video[take:]] if take < vmask.shape[0] else []
            pend_m = [vmask[take:]] if take < vmask.shape[0] else []

    for batch in batches:
        video = np.asarray(batch["video"])
        vmask = np.asarray(batch["video_mask"])
        if multi_sentence:
            s_, e_ = seen, seen + vmask.shape[0]
            filt = [i - s_ for i in cut0 if s_ <= i < e_]
            seen = e_
            if not filt:
                continue
            video, vmask = video[filt], vmask[filt]
        pend_v.append(video)
        pend_m.append(vmask)
        yield from drain(force=False)
    yield from drain(force=True)


# ---------------------------------------------------------------------- main
def main(argv: Optional[Sequence[str]] = None):
    serve_args, rest = _serve_parser().parse_known_args(argv)

    from ..cli import parse_args
    cfg = parse_args(rest)

    import jax
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))

    from ..models.tokenizer import SimpleTokenizer
    from ..parallel.mesh import create_mesh
    from .engine import RetrievalEngine
    from .index import load_index

    os.makedirs(cfg.output_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO)

    model, params = load_model_and_params(cfg)
    mesh = (create_mesh(cfg.data_parallel) if cfg.data_parallel
            else None)
    tokenizer = SimpleTokenizer()
    engine = RetrievalEngine(model, params, tokenizer=tokenizer, mesh=mesh)

    if serve_args.command == "build":
        from ..data.registry import DATALOADER_DICT
        slots = DATALOADER_DICT[cfg.data.datatype]
        test_fn = slots["test"] if slots["test"] is not None else slots["val"]
        loader, n = test_fn(cfg, tokenizer)
        ds = loader.dataset
        multi = bool(getattr(ds, "multi_sentence_per_video", False))
        cuts = list(getattr(ds, "cut_off_points", []))
        ids = gallery_video_ids(ds, multi, cuts)
        logger.info("building gallery: %d rows -> %d videos", n, len(ids))
        ivf_kw = {}
        if serve_args.index_type == "ivf":
            ivf_kw["nprobe"] = serve_args.nprobe
            if serve_args.n_clusters:
                ivf_kw["n_clusters"] = serve_args.n_clusters
        index = engine.build_index(
            gallery_batches(loader, multi, cuts, cfg.batch_size_val),
            ids, quantize=serve_args.quantize,
            index_type=serve_args.index_type, **ivf_kw)
        index.save(serve_args.index_path)
        print(json.dumps({"index_path": serve_args.index_path,
                          "videos": len(index), "dim": index.dim,
                          "index_type": serve_args.index_type,
                          "quantize": serve_args.quantize}))
        return index

    # ---- query / serve
    engine.index = load_index(serve_args.index_path, mesh=mesh)

    if serve_args.command == "serve":
        from .http import RetrievalServer
        server = RetrievalServer(engine, host=serve_args.host,
                                 port=serve_args.port,
                                 default_k=serve_args.topk)
        server.warmup()
        print(json.dumps({"listening": "http://%s:%d" % server.address,
                          "videos": len(engine.index)}), flush=True)
        server.serve_forever()
        return server

    queries = list(serve_args.query)
    if serve_args.queries_file:
        with open(serve_args.queries_file) as fp:
            queries += [ln.strip() for ln in fp if ln.strip()]
    if not queries:
        raise SystemExit("no queries: pass --query and/or --queries_file")
    results = engine.search(queries, k=serve_args.topk)
    for text, ranked in zip(queries, results):
        print(json.dumps({"query": text, "results": ranked}))
    return results


if __name__ == "__main__":
    main()
