# coding=utf-8
"""Torch-checkpoint ⇄ JAX-pytree conversion.

The reference's checkpoint key schema (``clip.*``,
``frame_position_embeddings.*``, ``transformerClip.*``, ``cross.*``,
``...tokencluster_inter.cluster_embed``) is the compatibility surface this
framework preserves (reference: modules/clip4clip.py:28-124, main.py:188-212).
This module converts in both directions and implements the reference's
from_pretrained "initialisation tricks":

* pure-CLIP state dicts are lifted under the ``clip.`` prefix
  (clip4clip.py:33-39), DDP ``module.`` prefixes are stripped (main.py:198-199);
* `frame_position_embeddings` seeds from CLIP's text positional embedding and
  `transformerClip` from the bottom text blocks (clip4clip.py:97-113);
* `cluster_embed` seeds from the visual positional embedding rows 1..K
  (clip.py:617-630);
* the 3D patch conv2 inflates from conv1 with zero temporal padding
  (clip4clip.py:47-76).

torch is used only to (de)serialise ``.pt``/``.pth.tar`` files; all conversion
logic operates on plain numpy dicts.
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import ModelConfig

Array = np.ndarray
StateDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# schema utilities
# ---------------------------------------------------------------------------
def strip_module_prefix(sd: StateDict) -> StateDict:
    """Remove DDP 'module.' prefixes (reference: main.py:196-200)."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def lift_clip_prefix(sd: StateDict) -> StateDict:
    """Wrap a raw OpenAI-CLIP state dict under 'clip.'
    (reference: clip4clip.py:33-39)."""
    if any(k.startswith("clip.") for k in sd):
        return dict(sd)
    out = {}
    for k, v in sd.items():
        if k in ("input_resolution", "context_length", "vocab_size"):
            continue
        out["clip." + k] = v
    return out


def _rename_gamma_beta(sd: StateDict) -> StateDict:
    """gamma/beta -> weight/bias (reference: base.py:205-215)."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"\bgamma\b", "weight", k)
        k = re.sub(r"\bbeta\b", "bias", k)
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# per-module mapping tables: flax path (tuple) <-> torch key + transform
# transform: 'T' transpose 2D, '' identity
# ---------------------------------------------------------------------------
def _block_entries(flax_prefix: Tuple[str, ...], torch_prefix: str):
    """Mapping entries for one ResidualAttentionBlock."""
    e = []
    e.append((flax_prefix + ("attn", "in_proj", "kernel"),
              torch_prefix + ".attn.in_proj_weight", "T"))
    e.append((flax_prefix + ("attn", "in_proj", "bias"),
              torch_prefix + ".attn.in_proj_bias", ""))
    e.append((flax_prefix + ("attn", "out_proj", "kernel"),
              torch_prefix + ".attn.out_proj.weight", "T"))
    e.append((flax_prefix + ("attn", "out_proj", "bias"),
              torch_prefix + ".attn.out_proj.bias", ""))
    for ln in ("ln_1", "ln_2"):
        e.append((flax_prefix + (ln, "norm", "scale"),
                  torch_prefix + f".{ln}.weight", ""))
        e.append((flax_prefix + (ln, "norm", "bias"),
                  torch_prefix + f".{ln}.bias", ""))
    for fc in ("c_fc", "c_proj"):
        e.append((flax_prefix + ("mlp", fc, "kernel"),
                  torch_prefix + f".mlp.{fc}.weight", "T"))
        e.append((flax_prefix + ("mlp", fc, "bias"),
                  torch_prefix + f".mlp.{fc}.bias", ""))
    return e


def _clip_entries(cfg: ModelConfig):
    """Full mapping table for the CLIP tower."""
    e = []
    arch = cfg.arch
    e.append((("clip", "logit_scale"), "clip.logit_scale", ""))
    v = ("clip", "visual")
    e.append((v + ("conv1",), "clip.visual.conv1.weight", ""))
    e.append((v + ("class_embedding",), "clip.visual.class_embedding", ""))
    e.append((v + ("positional_embedding",),
              "clip.visual.positional_embedding", ""))
    for ln in ("ln_pre", "ln_post"):
        e.append((v + (ln, "norm", "scale"), f"clip.visual.{ln}.weight", ""))
        e.append((v + (ln, "norm", "bias"), f"clip.visual.{ln}.bias", ""))
    e.append((v + ("proj",), "clip.visual.proj", ""))
    if cfg.linear_patch == "3d":
        e.append((v + ("conv2",), "clip.visual.conv2.weight", ""))
    for i in range(arch["vision_layers"]):
        e += _block_entries(v + (f"resblocks_{i}",),
                            f"clip.visual.transformer.resblocks.{i}")
    # learned cluster params live on the torch block module; only present
    # when the corresponding config flag enables them (cluster.py:159-172)
    cluster_param_names = []
    if cfg.cluster.cluster_embedding:
        cluster_param_names.append("cluster_embed")
    if cfg.cluster.cluster_frame_embedding:
        cluster_param_names.append("cluster_frame_embed")
    if cfg.cluster.adaptive_cls:
        cluster_param_names.append("cls_multiplier")
    for i, spec in enumerate(cfg.cluster_plan()):
        if spec is None or spec.algo not in ("kmediods++", "spectral"):
            continue
        tprefix = f"clip.visual.transformer.resblocks.{i}.tokencluster_inter"
        for name in cluster_param_names:
            e.append((v + (f"cluster_{i}", name), f"{tprefix}.{name}", ""))
    t = ("clip", "text")
    e.append((t + ("token_embedding",), "clip.token_embedding.weight", ""))
    e.append((t + ("positional_embedding",), "clip.positional_embedding", ""))
    e.append((t + ("ln_final", "norm", "scale"), "clip.ln_final.weight", ""))
    e.append((t + ("ln_final", "norm", "bias"), "clip.ln_final.bias", ""))
    e.append((t + ("text_projection",), "clip.text_projection", ""))
    for i in range(arch["transformer_layers"]):
        e += _block_entries(t + (f"resblocks_{i}",),
                            f"clip.transformer.resblocks.{i}")
    return e


def _clip4clip_entries(cfg: ModelConfig):
    e = _clip_entries(cfg)
    if cfg.sim_header in ("seqLSTM", "seqTransf"):
        e.append((("frame_position_embeddings",),
                  "frame_position_embeddings.weight", ""))
    if cfg.sim_header == "seqTransf":
        for i in range(cfg.cross_num_hidden_layers):
            e += _block_entries((f"transformerClip_{i}",),
                                f"transformerClip.resblocks.{i}")
    if not cfg.loose_type:
        e.append((("cross", "position_embeddings"),
                  "cross.embeddings.position_embeddings.weight", ""))
        for i in range(cfg.cross_num_hidden_layers):
            e += _block_entries(("cross", f"resblocks_{i}"),
                                f"cross.transformer.resblocks.{i}")
        e.append((("cross", "ln_pool", "norm", "scale"),
                  "cross.pooler.ln_pool.weight", ""))
        e.append((("cross", "ln_pool", "norm", "bias"),
                  "cross.pooler.ln_pool.bias", ""))
        e.append((("cross", "pooler_dense", "kernel"),
                  "cross.pooler.dense.weight", "T"))
        e.append((("cross", "pooler_dense", "bias"),
                  "cross.pooler.dense.bias", ""))
        e.append((("similarity_dense", "kernel"),
                  "similarity_dense.weight", "T"))
        e.append((("similarity_dense", "bias"), "similarity_dense.bias", ""))
    return e


def _set_path(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree: dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def apply_pretrain_tricks(sd: StateDict, cfg: ModelConfig) -> StateDict:
    """The reference's from_pretrained weight-seeding tricks
    (clip4clip.py:46-114, clip.py:617-630)."""
    sd = dict(sd)
    pos = sd.get("clip.positional_embedding")
    # seqTransf / seqLSTM seeding (clip4clip.py:97-113)
    if cfg.sim_header in ("seqLSTM", "seqTransf") \
            and "frame_position_embeddings.weight" not in sd and pos is not None:
        sd["frame_position_embeddings.weight"] = pos.copy()
    if cfg.sim_header == "seqTransf":
        for k in list(sd):
            m = re.match(r"clip\.transformer\.resblocks\.(\d+)\.(.*)", k)
            if m and int(m.group(1)) < cfg.cross_num_hidden_layers:
                nk = f"transformerClip.resblocks.{m.group(1)}.{m.group(2)}"
                sd.setdefault(nk, sd[k].copy())
    # tightTransf cross seeding (clip4clip.py:78-96)
    if not cfg.loose_type:
        if pos is not None:
            sd.setdefault("cross.embeddings.position_embeddings.weight",
                          pos.copy())
        for k in list(sd):
            m = re.match(r"clip\.transformer\.resblocks\.(\d+)\.(.*)", k)
            if m and int(m.group(1)) < cfg.cross_num_hidden_layers:
                nk = f"cross.transformer.resblocks.{m.group(1)}.{m.group(2)}"
                sd.setdefault(nk, sd[k].copy())
    # conv2 3D inflation (clip4clip.py:47-76): place conv1 in the middle
    # temporal slice, zeros elsewhere
    if cfg.linear_patch == "3d" and "clip.visual.conv2.weight" not in sd \
            and "clip.visual.conv1.weight" in sd:
        w = sd["clip.visual.conv1.weight"]
        kt = 3
        mid = (kt - 1) // 2
        conv2 = np.zeros((w.shape[0], w.shape[1], kt, w.shape[2], w.shape[3]),
                         w.dtype)
        conv2[:, :, mid] = w
        sd["clip.visual.conv2.weight"] = conv2
    # cluster_embed from visual positional embedding rows 1..K
    # (clip.py:617-630)
    if cfg.cluster.cluster_embedding and cfg.cluster.cluster_embed_from_clip:
        vpos = sd.get("clip.visual.positional_embedding")
        if vpos is not None:
            for i, spec in enumerate(cfg.cluster_plan()):
                if spec is None:
                    continue
                key = (f"clip.visual.transformer.resblocks.{i}"
                       ".tokencluster_inter.cluster_embed")
                sd.setdefault(key, vpos[1:spec.cluster_num + 1].copy())
    return sd


def state_dict_to_params(sd: StateDict, cfg: ModelConfig,
                         init_params: Optional[dict] = None,
                         apply_tricks: bool = True) -> Tuple[dict, dict]:
    """Convert a torch state dict (numpy values) to a flax param tree.

    Args:
        sd: torch-style state dict (raw CLIP or CLIP4Clip schema).
        cfg: model config (decides which heads exist).
        init_params: optional freshly-initialised param tree; entries not
            found in `sd` fall back to their initialised values (the
            reference logs these as "missing keys", base.py:221-250).
    Returns:
        (params, report) where report = {'missing': [...], 'unexpected': [...]}

    The returned tree OWNS its memory (the astype below always copies):
    jax's CPU backend zero-copy-aliases sufficiently aligned numpy arrays,
    and `sd` values are often views of LIVE torch parameter storage — a
    caller that keeps training the torch model in place must never be able
    to mutate the converted params (pinned by
    tests/test_weights_extra.py::test_converter_never_aliases_source_memory).
    """
    sd = _rename_gamma_beta(lift_clip_prefix(strip_module_prefix(
        {k: np.asarray(v) for k, v in sd.items()})))
    if apply_tricks:
        sd = apply_pretrain_tricks(sd, cfg)
    entries = _clip4clip_entries(cfg)
    params: dict = {} if init_params is None else _deepcopy_tree(init_params)
    used, missing = set(), []
    for path, tkey, tf in entries:
        if tkey in sd:
            val = sd[tkey].astype(np.float32)
            if tf == "T":
                val = val.T
            _set_path(params, path, val)
            used.add(tkey)
        else:
            missing.append(tkey)
    unexpected = [k for k in sd if k not in used]
    return params, {"missing": missing, "unexpected": unexpected}


def params_to_state_dict(params: dict, cfg: ModelConfig) -> StateDict:
    """Convert a flax param tree back to the torch checkpoint schema."""
    entries = _clip4clip_entries(cfg)
    sd: StateDict = {}
    for path, tkey, tf in entries:
        try:
            val = np.asarray(_get_path(params, path), np.float32)
        except KeyError:
            continue
        if tf == "T":
            val = val.T
        sd[tkey] = val
    return sd


def _deepcopy_tree(tree):
    if isinstance(tree, dict):
        return {k: _deepcopy_tree(v) for k, v in tree.items()}
    return tree


# ---------------------------------------------------------------------------
# torch file IO (the only place torch is imported)
# ---------------------------------------------------------------------------
def load_torch_state_dict(path: str) -> StateDict:
    """Load a .pt/.pth.tar file: raw state dict, JIT archive, or the
    reference's checkpoint dict {epoch, state_dict, ...} (misc.py:14-18)."""
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            sd = obj["state_dict"]
        elif isinstance(obj, dict) and "model" in obj and isinstance(
                obj["model"], dict):
            sd = obj["model"]
        else:
            sd = obj
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def save_torch_state_dict(sd: StateDict, path: str) -> None:
    import torch
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


# ---------------------------------------------------------------------------
# pretrained-weight download with SHA256 verification
# (reference: modules/clip.py:21-37,676-705)
# ---------------------------------------------------------------------------
CLIP_WEIGHT_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
}


def download_clip_weights(name: str, root: str) -> str:
    """Fetch + SHA256-verify an OpenAI CLIP archive (the URL path component
    is the expected digest).  Requires network access; the loaders otherwise
    read pre-placed local files like the reference (clip.py:644-658)."""
    import hashlib
    import urllib.request
    url = CLIP_WEIGHT_URLS[name]
    os.makedirs(root, exist_ok=True)
    expected = url.split("/")[-2]
    target = os.path.join(root, os.path.basename(url))
    if os.path.isfile(target):
        with open(target, "rb") as f:
            if hashlib.sha256(f.read()).hexdigest() == expected:
                return target
    with urllib.request.urlopen(url) as src, open(target, "wb") as dst:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            dst.write(buf)
    with open(target, "rb") as f:
        if hashlib.sha256(f.read()).hexdigest() != expected:
            raise RuntimeError(f"SHA256 mismatch for {target}")
    return target
