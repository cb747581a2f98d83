# coding=utf-8
"""GPipe pipeline parallelism: the (data, pipe) mesh schedule must
reproduce the sequential block stack exactly — the pipeline only changes
WHERE each microbatch's blocks run, never the math (parallel/pipeline.py).
The CUDA reference is DDP-only; PP is a TPU-native scaling addition."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerclip_tpu import config as cfg_mod
from centerclip_tpu.config import make_run_config
from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.parallel.mesh import (DATA_AXIS, PIPE_AXIS, create_mesh)
from centerclip_tpu.parallel.pipeline import pipeline_blocks
from centerclip_tpu.train.loop import Trainer

from test_train_eval import make_batch, T

LAYERS4 = 4

cfg_mod.CLIP_ARCHS["tiny-pipe"] = dict(
    embed_dim=16, image_resolution=16, vision_layers=LAYERS4,
    vision_width=32, vision_patch_size=8, vision_heads=2,
    context_length=8, vocab_size=64, transformer_width=32,
    transformer_heads=2, transformer_layers=LAYERS4)


def cfg4(**over):
    base = dict(clip_name="tiny-pipe", max_frames=T, max_words=8,
                compute_dtype="float32",
                inter=True, algo="kmediods++",
                cluster_num_blocks=(3,) * LAYERS4,
                # token-count change at block 2: two homogeneous runs of 2
                target_frames_blocks=(T, T, T // 2, T // 2),
                optim="BertAdam", lr=1e-3, coef_lr=1.0, weight_decay=0.01,
                epochs=1, batch_size=16)
    base.update(over)
    return make_run_config(**base)


def test_create_mesh_pipe():
    mesh = create_mesh(8, pipeline_parallel=2)
    assert mesh.axis_names == (DATA_AXIS, PIPE_AXIS)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError, match="combined"):
        create_mesh(8, tensor_parallel=2, pipeline_parallel=2)
    with pytest.raises(ValueError):
        create_mesh(8, pipeline_parallel=3)


def test_pipeline_blocks_unit():
    """Toy 5-block stack on a (data=2, pipe=4) mesh: 4 blocks pipeline
    (1/stage), the 5th runs sequentially; forward AND gradients match the
    plain loop."""
    rng = np.random.default_rng(0)
    F = 8
    params = [dict(w=(rng.normal(size=(F, F)) * 0.3).astype(np.float32),
                   b=(rng.normal(size=(F,)) * 0.1).astype(np.float32))
              for _ in range(5)]

    def apply_one(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    x = rng.normal(size=(16, 3, F)).astype(np.float32)

    def seq_loss(params, x):
        for p in params:
            x = apply_one(p, x)
        return (x ** 2).sum()

    mesh = create_mesh(8, pipeline_parallel=4)

    def pp_loss(params, x):
        y = pipeline_blocks(params, apply_one, x, microbatches=2)
        return (y ** 2).sum()

    with mesh:
        loss_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(params, x)
    loss_s, g_s = jax.value_and_grad(seq_loss)(params, x)
    np.testing.assert_allclose(float(loss_pp), float(loss_s), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_rows_divisibility():
    mesh = create_mesh(8, pipeline_parallel=4)
    p = [dict(w=np.eye(4, dtype=np.float32))] * 4
    with mesh:
        with pytest.raises(ValueError, match="microbatch"):
            jax.jit(lambda x: pipeline_blocks(
                p, lambda pp_, h: h @ pp_["w"], x, microbatches=3))(
                np.ones((10, 4), np.float32))


def _train_two_steps(run, params, batches):
    model = CLIP4Clip(run.model)
    trainer = Trainer(run, model, params, total_steps=10)
    loss, _ = trainer.train_epoch(0, batches, jax.random.PRNGKey(0),
                                  n_display=1000)
    return loss, jax.device_get(trainer.state.params)


@pytest.mark.slow
def test_pp_matches_dp():
    """Two steps on dp=8 vs dp=4 x pipe=2 (clustering off — see
    test_tensor_parallel.test_tp_matches_dp for why): same loss, same
    updated params."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run_dp = cfg4(inter=False)
    model = CLIP4Clip(run_dp.model)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=b0["input_ids"],
                        attention_mask=b0["attention_mask"],
                        video=b0["video"],
                        video_mask=b0["video_mask"])["params"]
    params0 = jax.device_get(params)

    loss_dp, p_dp = _train_two_steps(run_dp, params0, batches)
    loss_pp, p_pp = _train_two_steps(cfg4(inter=False, pipeline_parallel=2),
                                     params0, batches)
    assert np.isfinite(loss_pp)
    np.testing.assert_allclose(loss_pp, loss_dp, rtol=2e-5)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(p_dp)[0],
            jax.tree.leaves(p_pp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_pp_cluster_smoke():
    """The clustered path (token-count change mid-stack) trains on the
    pipe mesh: the two homogeneous runs pipeline independently with the
    k-medoids cluster layer running under GSPMD between them."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run = cfg4(pipeline_parallel=2)
    model = CLIP4Clip(run.model)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=b0["input_ids"],
                        attention_mask=b0["attention_mask"],
                        video=b0["video"],
                        video_mask=b0["video_mask"])["params"]
    loss, p_new = _train_two_steps(run, jax.device_get(params), batches)
    assert np.isfinite(loss)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(jax.device_get(params)),
                        jax.tree.leaves(p_new)))
    assert changed


def test_pp_config_validation():
    with pytest.raises(ValueError, match="combined"):
        cfg4(pipeline_parallel=2, tensor_parallel=2)
    # PP forces the uniform XLA attention path like TP does
    assert not cfg4(pipeline_parallel=2).model.fused_attention
