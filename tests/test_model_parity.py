# coding=utf-8
"""Numerical parity of the flax CLIP towers against HuggingFace's torch CLIP.

HF's CLIPModel is an independent implementation of the same architecture
(quick_gelu activation, pre-LN blocks, EOT-argmax text pooling).  We map a
randomly-initialised HF model's weights into the OpenAI checkpoint schema,
run them through our converter, and require the text/image features to match
to fp32 tolerance.  This validates the model math AND the converter in one
shot without any pretrained files.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from centerclip_tpu import config as cfg_mod  # noqa: E402
from centerclip_tpu.config import make_run_config  # noqa: E402
from centerclip_tpu.models.clip4clip import CLIP4Clip  # noqa: E402
from centerclip_tpu.models.weights import (state_dict_to_params,  # noqa: E402
                                           params_to_state_dict)

WIDTH, LAYERS, HEADS, EMBED = 64, 2, 4, 32
PATCH, RES, VOCAB, CTX = 16, 32, 512, 16

TINY_ARCH = dict(embed_dim=EMBED, image_resolution=RES, vision_layers=LAYERS,
                 vision_width=WIDTH, vision_patch_size=PATCH,
                 vision_heads=HEADS, context_length=CTX, vocab_size=VOCAB,
                 transformer_width=WIDTH, transformer_heads=HEADS,
                 transformer_layers=LAYERS)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.CLIPConfig(
        text_config=dict(hidden_size=WIDTH, intermediate_size=WIDTH * 4,
                         num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                         max_position_embeddings=CTX, vocab_size=VOCAB,
                         hidden_act="quick_gelu",
                         eos_token_id=VOCAB - 1, bos_token_id=VOCAB - 2,
                         pad_token_id=0),
        vision_config=dict(hidden_size=WIDTH, intermediate_size=WIDTH * 4,
                           num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                           image_size=RES, patch_size=PATCH,
                           hidden_act="quick_gelu"),
        projection_dim=EMBED)
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model


def hf_to_openai_state_dict(model) -> dict:
    """Map HF CLIPModel weights to the OpenAI CLIP checkpoint schema."""
    hf = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd = {}
    sd["logit_scale"] = hf["logit_scale"]
    sd["text_projection"] = hf["text_projection.weight"].T
    sd["token_embedding.weight"] = \
        hf["text_model.embeddings.token_embedding.weight"]
    sd["positional_embedding"] = \
        hf["text_model.embeddings.position_embedding.weight"]
    sd["ln_final.weight"] = hf["text_model.final_layer_norm.weight"]
    sd["ln_final.bias"] = hf["text_model.final_layer_norm.bias"]
    sd["visual.proj"] = hf["visual_projection.weight"].T
    sd["visual.class_embedding"] = \
        hf["vision_model.embeddings.class_embedding"]
    sd["visual.conv1.weight"] = \
        hf["vision_model.embeddings.patch_embedding.weight"]
    sd["visual.positional_embedding"] = \
        hf["vision_model.embeddings.position_embedding.weight"]
    for ours, theirs in (("ln_pre", "pre_layrnorm"),
                         ("ln_post", "post_layernorm")):
        sd[f"visual.{ours}.weight"] = hf[f"vision_model.{theirs}.weight"]
        sd[f"visual.{ours}.bias"] = hf[f"vision_model.{theirs}.bias"]

    def blocks(src, dst):
        for i in range(LAYERS):
            p = f"{src}.encoder.layers.{i}"
            q = f"{dst}.resblocks.{i}"
            sd[f"{q}.attn.in_proj_weight"] = np.concatenate(
                [hf[f"{p}.self_attn.q_proj.weight"],
                 hf[f"{p}.self_attn.k_proj.weight"],
                 hf[f"{p}.self_attn.v_proj.weight"]], axis=0)
            sd[f"{q}.attn.in_proj_bias"] = np.concatenate(
                [hf[f"{p}.self_attn.q_proj.bias"],
                 hf[f"{p}.self_attn.k_proj.bias"],
                 hf[f"{p}.self_attn.v_proj.bias"]], axis=0)
            sd[f"{q}.attn.out_proj.weight"] = hf[f"{p}.self_attn.out_proj.weight"]
            sd[f"{q}.attn.out_proj.bias"] = hf[f"{p}.self_attn.out_proj.bias"]
            sd[f"{q}.ln_1.weight"] = hf[f"{p}.layer_norm1.weight"]
            sd[f"{q}.ln_1.bias"] = hf[f"{p}.layer_norm1.bias"]
            sd[f"{q}.ln_2.weight"] = hf[f"{p}.layer_norm2.weight"]
            sd[f"{q}.ln_2.bias"] = hf[f"{p}.layer_norm2.bias"]
            sd[f"{q}.mlp.c_fc.weight"] = hf[f"{p}.mlp.fc1.weight"]
            sd[f"{q}.mlp.c_fc.bias"] = hf[f"{p}.mlp.fc1.bias"]
            sd[f"{q}.mlp.c_proj.weight"] = hf[f"{p}.mlp.fc2.weight"]
            sd[f"{q}.mlp.c_proj.bias"] = hf[f"{p}.mlp.fc2.bias"]

    blocks("text_model", "transformer")
    blocks("vision_model", "visual.transformer")
    return sd


@pytest.fixture(scope="module")
def our_model_and_params(hf_model):
    cfg_mod.CLIP_ARCHS["tiny-test"] = TINY_ARCH
    cfg = make_run_config(clip_name="tiny-test", max_frames=2, max_words=CTX,
                          compute_dtype="float32").model
    model = CLIP4Clip(cfg)
    sd = hf_to_openai_state_dict(hf_model)
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 1, 2, 3, RES, RES), jnp.float32)
    vmask = jnp.ones((2, 2), jnp.int32)
    text = jnp.zeros((2, CTX), jnp.int32)
    init = model.init(rng, input_ids=text, attention_mask=text,
                      video=video, video_mask=vmask)["params"]
    params, report = state_dict_to_params(sd, cfg, init_params=init)
    assert not report["missing"], report["missing"]
    assert not report["unexpected"], report["unexpected"]
    return model, {"params": params}, cfg


def test_text_features_match(hf_model, our_model_and_params, rng):
    model, variables, _ = our_model_and_params
    B = 3
    ids = rng.integers(1, VOCAB - 2, size=(B, CTX)).astype(np.int64)
    ids[:, 0] = VOCAB - 2                       # BOS
    ids[:, -1] = VOCAB - 1                      # EOS (largest id -> argmax)
    with torch.no_grad():
        ref = hf_model.get_text_features(
            input_ids=torch.from_numpy(ids)).numpy()
    ours = np.asarray(model.apply(
        variables, jnp.asarray(ids, jnp.int32),
        method=lambda m, t: m.get_sequence_output(t)))[:, 0, :]
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_image_features_match(hf_model, our_model_and_params, rng):
    model, variables, _ = our_model_and_params
    T = 2
    pix = rng.normal(size=(4, 1, T, 3, RES, RES)).astype(np.float32)
    vmask = jnp.ones((4, T), jnp.int32)
    with torch.no_grad():
        ref = hf_model.get_image_features(pixel_values=torch.from_numpy(
            pix.reshape(-1, 3, RES, RES))).numpy()
    ours, closs = model.apply(
        variables, jnp.asarray(pix), vmask,
        method=lambda m, v, vm: m.get_visual_output(v, vm))
    ours = np.asarray(ours).reshape(-1, EMBED)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    assert float(closs) == 0.0


def test_roundtrip_state_dict(our_model_and_params):
    model, variables, cfg = our_model_and_params
    sd = params_to_state_dict(variables["params"], cfg)
    params2, report = state_dict_to_params(sd, cfg)
    assert not report["unexpected"]
    leaves1 = jax.tree.leaves(variables["params"])
    leaves2 = jax.tree.leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
