# coding=utf-8
"""Converter coverage beyond the meanP tree: seqTransf/tightTransf key
schemas, from_pretrained seeding tricks, cluster_embed seeding, module.
prefix stripping."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerclip_tpu import config as cfg_mod
from centerclip_tpu.config import make_run_config
from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.models.weights import (apply_pretrain_tricks,
                                           params_to_state_dict,
                                           state_dict_to_params,
                                           strip_module_prefix)

TINY = dict(embed_dim=16, image_resolution=16, vision_layers=2,
            vision_width=32, vision_patch_size=8, vision_heads=2,
            context_length=8, vocab_size=64, transformer_width=16,
            transformer_heads=2, transformer_layers=2)
cfg_mod.CLIP_ARCHS["tiny-weights"] = TINY


def _cfg(**over):
    base = dict(clip_name="tiny-weights", max_frames=2, max_words=8,
                compute_dtype="float32", cross_num_hidden_layers=1)
    base.update(over)
    return make_run_config(**base).model


def _init_params(cfg):
    model = CLIP4Clip(cfg)
    B, T, R = 2, 2, 16
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(1, 62, size=(B, 8)), jnp.int32
                              ).at[:, -1].set(63),
        attention_mask=jnp.ones((B, 8), jnp.int32),
        video=jnp.asarray(rng.normal(size=(B, 1, T, 3, R, R)), jnp.float32),
        video_mask=jnp.ones((B, T), jnp.int32))
    return model.init(jax.random.PRNGKey(0), **batch,
                      training=True)["params"]


@pytest.mark.parametrize("header,loose", [("seqTransf", True),
                                          ("tightTransf", False)])
def test_header_schema_roundtrip(header, loose):
    cfg = _cfg(sim_header=header, loose_type=loose)
    params = _init_params(cfg)
    sd = params_to_state_dict(params, cfg)
    if header == "seqTransf":
        assert "frame_position_embeddings.weight" in sd
        assert "transformerClip.resblocks.0.attn.in_proj_weight" in sd
    else:
        assert "cross.embeddings.position_embeddings.weight" in sd
        assert "cross.transformer.resblocks.0.mlp.c_fc.weight" in sd
        assert "similarity_dense.weight" in sd
    params2, report = state_dict_to_params(sd, cfg, apply_tricks=False)
    assert not report["missing"] and not report["unexpected"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_seeding_tricks():
    """frame_position_embeddings / transformerClip / cluster_embed seeding
    (clip4clip.py:97-113, clip.py:617-630)."""
    cfg = _cfg(sim_header="seqTransf",
               inter=True, algo="kmediods++", cluster_embedding=True,
               cluster_num_blocks=(3,) * 2, target_frames_blocks=(2, 1))
    rng = np.random.default_rng(0)
    sd = {
        "clip.positional_embedding": rng.normal(size=(8, 16)).astype(
            np.float32),
        "clip.visual.positional_embedding": rng.normal(size=(5, 32)).astype(
            np.float32),
        "clip.transformer.resblocks.0.mlp.c_fc.weight": rng.normal(
            size=(64, 16)).astype(np.float32),
        "clip.transformer.resblocks.1.mlp.c_fc.weight": rng.normal(
            size=(64, 16)).astype(np.float32),
    }
    out = apply_pretrain_tricks(dict(sd), cfg)
    np.testing.assert_array_equal(out["frame_position_embeddings.weight"],
                                  sd["clip.positional_embedding"])
    # only blocks < cross_num_hidden_layers (=1) are copied
    assert "transformerClip.resblocks.0.mlp.c_fc.weight" in out
    assert "transformerClip.resblocks.1.mlp.c_fc.weight" not in out
    # cluster_embed from visual positional embedding rows 1..K (block idx 1)
    key = ("clip.visual.transformer.resblocks.1"
           ".tokencluster_inter.cluster_embed")
    assert key in out
    np.testing.assert_array_equal(
        out[key], sd["clip.visual.positional_embedding"][1:4])


def test_module_prefix_stripping():
    sd = {"module.clip.logit_scale": np.float32(1.0),
          "module.frame_position_embeddings.weight": np.zeros((2, 2))}
    out = strip_module_prefix(sd)
    assert set(out) == {"clip.logit_scale",
                        "frame_position_embeddings.weight"}
    # mixed prefixes left untouched
    sd2 = {"module.a": 1, "b": 2}
    assert strip_module_prefix(sd2) == sd2


def test_converter_never_aliases_source_memory():
    """No-aliasing contract: jax on the CPU backend can ZERO-COPY a
    sufficiently aligned numpy array (jnp.asarray of a torch-parameter
    view aliases the live torch storage), so the converter must hand
    back trees that own their memory — a caller that keeps training the
    torch model in place must not mutate the converted params.
    `astype(float32)` inside state_dict_to_params guarantees the copy;
    this pins it (see tests/test_optim_oracle.py for the observed
    in-suite drift when a conversion path skipped the copy)."""
    torch = pytest.importorskip("torch")
    cfg = _cfg()
    init = _init_params(cfg)
    sd = params_to_state_dict(init, cfg)
    # route through torch tensors so the values are real torch storage
    # (64-byte aligned allocations — the zero-copy-eligible case)
    tsd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    view_sd = {k: t.detach().numpy() for k, t in tsd.items()}
    params, report = state_dict_to_params(view_sd, cfg, init_params=init,
                                          apply_tricks=False)
    before = jax.tree_util.tree_map(np.array, params)
    for t in tsd.values():   # in-place mutation, like an optimizer step
        t.add_(123.0)
    after = jax.tree_util.tree_map(np.asarray, params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)
