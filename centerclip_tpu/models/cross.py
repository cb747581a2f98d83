# coding=utf-8
"""Cross-fusion transformer for the `tightTransf` similarity header.

Functional equivalent of the reference cross model
(reference: modules/module_cross.py:126-226): learned position embeddings over
the concatenated [text ‖ video] token sequence, a small pre-LN transformer
with an additive key-padding mask, and a first-token pooler.  Config defaults
mirror `modules/cross-base/cross_config.json` (hidden 512, 4 layers, 8 heads,
max positions 77 — overwritten by CLIP's context length at build time,
clip4clip.py:178).
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNormF32, ResidualAttentionBlock, quick_gelu


@dataclass(frozen=True)
class CrossConfig:
    """reference: modules/cross-base/cross_config.json:1-12"""
    hidden_size: int = 512
    num_hidden_layers: int = 4
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    max_position_embeddings: int = 77
    vocab_size: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02

    @classmethod
    def get_config(cls, name_or_path: str = "cross-base",
                   cache_dir=None, **overrides) -> "CrossConfig":
        """Resolve a cross-model archive name to a config.

        Mirrors `PretrainedConfig.get_config` (reference base.py:34-73):
        a name is first tried relative to this module (the shipped
        `cross-base/` dir), then handed to the URL/S3/tar.gz resolver
        (utils/file_cache.py).  JSON keys the flax model has no use for
        (dropout probs, `hidden_act` — inference uses none, training uses
        the reference's defaults implicitly) are ignored; `overrides` win
        last, the slot the reference fills via `update_attr`."""
        from ..utils.file_cache import resolve_archive_dir
        local = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             str(name_or_path))
        target = local if os.path.exists(local) else name_or_path
        serialization_dir, tempdir = resolve_archive_dir(target, cache_dir)
        try:
            with open(os.path.join(serialization_dir,
                                   "cross_config.json")) as f:
                raw = json.load(f)
        finally:
            if tempdir:
                shutil.rmtree(tempdir, ignore_errors=True)
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in known}
        kw.update(overrides)
        return cls(**kw)


class CrossModel(nn.Module):
    """Fusion transformer over concatenated text+video features."""
    cfg: CrossConfig

    @nn.compact
    def __call__(self, concat_input: jax.Array, concat_type=None,
                 attention_mask=None):
        """concat_input: [B, L, H]; attention_mask: [B, L] 0/1.

        Returns (hidden [B, L, H], pooled [B, H]).
        """
        B, L, H = concat_input.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.float32)
        # additive key-padding mask broadcast over heads and query positions
        # (module_cross.py:205-210)
        ext = (1.0 - attention_mask.astype(jnp.float32)) * -1000000.0
        ext = ext[:, None, None, :]                       # [B, 1, 1, L]

        pos = self.param("position_embeddings",
                         nn.initializers.normal(self.cfg.initializer_range),
                         (self.cfg.max_position_embeddings, H))
        x = concat_input + pos[:L].astype(concat_input.dtype)

        for i in range(self.cfg.num_hidden_layers):
            x = ResidualAttentionBlock(H, self.cfg.num_attention_heads,
                                       x.dtype, name=f"resblocks_{i}")(x, ext)

        # first-token pooler (module_cross.py:157-170)
        pooled = LayerNormF32(name="ln_pool")(x)[:, 0]
        pooled = nn.Dense(H, name="pooler_dense",
                          param_dtype=jnp.float32)(pooled)
        return x, quick_gelu(pooled)
