# coding=utf-8
"""Paths without prior coverage: sparse_sampling and shift algorithms inside
the model, the 3D tubelet patch, and ActivityNet-style eval pre-pooling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train_eval import tiny_cfg, make_batch, LAYERS, T
from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.train.evaluate import Evaluator
from centerclip_tpu.train.loop import Trainer


def _init(run, rng, n=8, training=True):
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, n)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"],
                        training=training,
                        rng=jax.random.PRNGKey(1))["params"]
    return model, params, batch


def test_sparse_sampling_trains(rng):
    run = tiny_cfg(algo="sparse_sampling")
    model, params, batch = _init(run, rng)
    # deterministic (eval) forward
    out = model.apply({"params": params}, video=batch["video"],
                      video_mask=batch["video_mask"])
    assert out["visual_output"].shape[1] == run.model.final_frames
    # random branch via rng + full training step
    trainer = Trainer(run, model, params, total_steps=10)
    loss, gstep = trainer.train_epoch(0, [batch], jax.random.PRNGKey(0),
                                      n_display=1000)
    assert np.isfinite(loss) and gstep == 1


@pytest.mark.parametrize("algo", ["temporal_shift", "token_shift"])
def test_shift_algos_in_model(rng, algo):
    # shift modules insert on the cluster-shrink condition but keep every
    # token and frame (cluster.py:32-37,343-347); a declining cluster count
    # with constant frames triggers insertion like the reference configs
    run = tiny_cfg(algo=algo, target_frames_blocks=(T,) * LAYERS,
                   cluster_num_blocks=(3,) + (2,) * (LAYERS - 1))
    plan = run.model.cluster_plan()
    assert any(p is not None for p in plan)  # the shift actually runs
    model, params, batch = _init(run, rng)
    out = model.apply({"params": params}, video=batch["video"],
                      video_mask=batch["video_mask"], training=True,
                      input_ids=batch["input_ids"],
                      attention_mask=batch["attention_mask"])
    assert out["visual_output"].shape[1] == T
    assert np.isfinite(float(out["loss"]))


def test_3d_linear_patch(rng):
    run = tiny_cfg(linear_patch="3d", inter=False,
                   cluster_num_blocks=(), target_frames_blocks=())
    model, params, batch = _init(run, rng)
    assert "conv2" in params["clip"]["visual"]
    out = model.apply({"params": params}, video=batch["video"],
                      video_mask=batch["video_mask"])
    assert out["visual_output"].shape == (8, T, 16)


def test_uint8_rejected_outside_2d_patchify(rng):
    """The uint8 normalisation fold lives only in the 2-D patchify matmul;
    raw uint8 reaching the 3-D tubelet path must fail loudly instead of
    being consumed as 0..255 (ADVICE r2)."""
    run = tiny_cfg(linear_patch="3d", inter=False,
                   cluster_num_blocks=(), target_frames_blocks=())
    model, params, batch = _init(run, rng)
    u8 = np.random.default_rng(0).integers(
        0, 256, size=batch["video"].shape).astype(np.uint8)
    # the supported route normalises explicitly before the tubelet conv
    out = model.apply({"params": params}, video=u8,
                      video_mask=batch["video_mask"])
    assert np.isfinite(np.asarray(out["visual_output"])).all()
    # a direct encode_image call skips that normalisation -> loud failure
    flat = u8.reshape(-1, *u8.shape[-3:])
    with pytest.raises(ValueError, match="uint8"):
        model.apply({"params": params}, flat,
                    method=lambda m, v: m.clip.encode_image(v))


def test_pre_visual_pooling_eval(rng):
    """ActivityNet eval OOM valve (clip4clip.py:237-243): visual features are
    pre-pooled to [B, D] at encode time and the similarity path accepts the
    pooled form."""
    run = tiny_cfg(datatype="activity", inter=False,
                   cluster_num_blocks=(), target_frames_blocks=())
    assert run.model.pre_visual_pooling
    model, params, batch = _init(run, rng)
    ev = Evaluator(model, params)
    res = ev.evaluate([make_batch(np.random.default_rng(s), 8)
                       for s in range(2)])
    assert res["sim_matrix"].shape == (16, 16)
    assert 0.0 <= res["R1"] <= 100.0
