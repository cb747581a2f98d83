# coding=utf-8
"""Optimizer schedule and param-group goldens (reference:
utils/optimization.py, utils/lr_scheduler.py)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerclip_tpu.config import OptimConfig
from centerclip_tpu.train.optim import (BERT_SCHEDULES, bert_adam,
                                        current_lr, group_labels,
                                        make_lr_schedule)


def test_bert_schedules_golden():
    """warmup_cosine/constant/linear formulas (optimization.py:26-45)."""
    wc = BERT_SCHEDULES["warmup_cosine"]
    assert float(wc(0.05, 0.1)) == pytest.approx(0.5)
    assert float(wc(0.5, 0.1)) == pytest.approx(0.5 * (1 + math.cos(math.pi * 0.5)))
    assert float(BERT_SCHEDULES["warmup_constant"](0.5, 0.1)) == 1.0
    wl = BERT_SCHEDULES["warmup_linear"]
    assert float(wl(0.55, 0.1)) == pytest.approx((0.55 - 1) / (0.1 - 1))
    assert float(wl(1.0, 0.1)) == 0.0


def test_adamw_scheduler_modes():
    for mode in ("cos", "poly", "HTD", "step"):
        cfg = OptimConfig(optim="AdamW", lr=1e-3, warmup_proportion=0.1,
                          lr_mode=mode)
        sched = make_lr_schedule(cfg, total_steps=100, lr_step=30)
        # warmup: below peak during slow start
        assert float(sched(5)) < 1e-3
        assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
        # decays after warmup, floored at end_lr
        assert float(sched(99)) <= 1e-3
        assert float(sched(10_000)) == pytest.approx(cfg.end_lr, rel=1e-5)


def test_group_labels_and_coef_lr():
    params = {
        "clip": {
            "visual": {"resblocks_0": {"mlp": {"c_fc": {
                "kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}}},
                       "ln_pre": {"norm": {"scale": jnp.ones(2),
                                           "bias": jnp.ones(2)}},
                       "deepcluster_1": {"fc1": {"kernel": jnp.ones((2, 2))}}},
            "logit_scale": jnp.ones(())},
        "frame_position_embeddings": jnp.ones((4, 2)),
    }
    labels = group_labels(params)
    cv = labels["clip"]["visual"]
    assert cv["resblocks_0"]["mlp"]["c_fc"]["kernel"] == "clip_decay"
    assert cv["resblocks_0"]["mlp"]["c_fc"]["bias"] == "clip_nodecay"
    # LayerNorm SCALES decay: the reference's no_decay list only ever
    # matches 'bias' substrings — no param is named LayerNorm.* (all its
    # LNs are ln_*), pinned by the trajectory oracle
    assert cv["ln_pre"]["norm"]["scale"] == "clip_decay"
    assert cv["ln_pre"]["norm"]["bias"] == "clip_nodecay"
    # new_added_modules (deepcluster) count as non-clip even under clip
    assert cv["deepcluster_1"]["fc1"]["kernel"] == "noclip_decay"
    assert labels["clip"]["logit_scale"] == "clip_decay"
    assert labels["frame_position_embeddings"] == "noclip_decay"

    # BertAdam applies lr*coef_lr to clip groups: with coef_lr=0 the clip
    # param must not move while the non-clip one does
    cfg = OptimConfig(optim="BertAdam", lr=1e-2, coef_lr=0.0,
                      weight_decay=0.0, warmup_proportion=0.1)
    tx = bert_adam(cfg, total_steps=10, labels=labels)
    state = tx.init(params)
    # the schedule is evaluated from state.step (optimization.py:159-162);
    # at step 0 warmup gives lr=0 exactly like the reference, so probe at a
    # mid-schedule step
    state = state._replace(step=jnp.asarray(5, jnp.int32))
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["clip"]["logit_scale"])) == 0.0
    assert float(jnp.abs(updates["frame_position_embeddings"]).max()) > 0.0


def test_current_lr_readout():
    cfg = OptimConfig(optim="AdamW", lr=2e-3, coef_lr=1e-3,
                      warmup_proportion=0.1)
    lr0 = current_lr(cfg, 1, 100)
    lr_peak = current_lr(cfg, 10, 100)
    assert 0 < lr0 < lr_peak <= 2e-3 * 1e-3 + 1e-9
