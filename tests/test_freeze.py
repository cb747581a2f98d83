# coding=utf-8
"""Layer-freezing semantics (reference: clip4clip.py:449-471)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train_eval import tiny_cfg, make_batch, LAYERS
from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.train.optim import trainable_mask
from centerclip_tpu.train.loop import Trainer


def _params(rng):
    run = tiny_cfg()
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"])["params"]
    return run, model, params, batch


@pytest.mark.slow
def test_trainable_mask_rules(rng):
    _, _, params, _ = _params(rng)
    mask = trainable_mask(params, freeze_layer_num=1)
    clip = mask["clip"]
    # frozen: embeddings + block 0
    assert clip["visual"]["conv1"] is False
    assert clip["visual"]["class_embedding"] is False
    assert clip["text"]["token_embedding"] is False
    assert clip["text"]["resblocks_0"]["mlp"]["c_fc"]["kernel"] is False
    # trainable: top layers + blocks >= 1
    assert clip["logit_scale"] is True
    assert clip["visual"]["proj"] is True
    assert clip["text"]["ln_final"]["norm"]["scale"] is True
    assert clip["text"][f"resblocks_{LAYERS-1}"]["mlp"]["c_fc"]["kernel"]
    # cluster module follows its block id (cluster at block index 1 here)
    if "cluster_1" in clip["visual"]:
        assert jax.tree.all(jax.tree.map(bool, clip["visual"]["cluster_1"]))
    # -1 disables freezing
    m2 = trainable_mask(params, freeze_layer_num=-1)
    assert all(jax.tree.leaves(m2))
    # freeze_clip freezes the whole tower
    m3 = trainable_mask(params, freeze_clip=True)
    assert not any(jax.tree.leaves(m3["clip"]))


@pytest.mark.slow
def test_frozen_params_do_not_move(rng):
    run, model, params, batch = _params(rng)
    import dataclasses
    run = dataclasses.replace(run, freeze_layer_num=LAYERS)  # freeze all blocks
    trainer = Trainer(run, model, params, total_steps=10)
    before = jax.device_get(trainer.state.params)
    trainer.train_epoch(0, [batch, batch], jax.random.PRNGKey(0),
                        n_display=1000)
    after = jax.device_get(trainer.state.params)
    # frozen: conv1 and all blocks
    np.testing.assert_array_equal(before["clip"]["visual"]["conv1"],
                                  after["clip"]["visual"]["conv1"])
    np.testing.assert_array_equal(
        before["clip"]["text"]["resblocks_0"]["mlp"]["c_fc"]["kernel"],
        after["clip"]["text"]["resblocks_0"]["mlp"]["c_fc"]["kernel"])
    # trainable top layers moved
    assert not np.array_equal(before["clip"]["visual"]["proj"],
                              after["clip"]["visual"]["proj"])
    assert not np.array_equal(
        before["clip"]["text"]["ln_final"]["norm"]["scale"],
        after["clip"]["text"]["ln_final"]["norm"]["scale"])
