# coding=utf-8
"""Tensor parallelism: a (data, model) 2-D mesh with Megatron-style
column/row-parallel transformer weights must reproduce the pure
data-parallel numerics exactly — GSPMD only changes the layout and the
collectives, never the math.  (The CUDA reference is DDP-only; TP is a
TPU-native scaling addition — see parallel/mesh.py::param_shardings.)"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, create_mesh,
                                          param_shardings)
from centerclip_tpu.train.loop import Trainer
from centerclip_tpu.train.evaluate import Evaluator

from test_train_eval import make_batch, tiny_cfg


def test_create_mesh_2d():
    mesh = create_mesh(8, tensor_parallel=2)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(8, tensor_parallel=3)
    # tp=1 keeps the 1-D data mesh (back-compat with every existing test)
    assert create_mesh(8, tensor_parallel=1).axis_names == (DATA_AXIS,)


def test_param_sharding_rules(rng):
    run = tiny_cfg(tensor_parallel=2)
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"])["params"]
    mesh = create_mesh(8, tensor_parallel=2)
    shardings = param_shardings(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {}
    for path, sh in flat:
        names = [p.key for p in path]
        specs["/".join(names)] = sh.spec
    # column-parallel QKV + MLP up-projection, row-parallel out/down
    blk = "clip/visual/resblocks_0"
    assert specs[f"{blk}/attn/in_proj/kernel"] == P(None, MODEL_AXIS)
    assert specs[f"{blk}/attn/in_proj/bias"] == P(MODEL_AXIS)
    assert specs[f"{blk}/mlp/c_fc/kernel"] == P(None, MODEL_AXIS)
    assert specs[f"{blk}/attn/out_proj/kernel"] == P(MODEL_AXIS, None)
    assert specs[f"{blk}/mlp/c_proj/kernel"] == P(MODEL_AXIS, None)
    assert specs[f"{blk}/attn/out_proj/bias"] == P()
    # everything non-matmul stays replicated
    assert specs[f"{blk}/ln_1/norm/scale"] == P()
    assert specs["clip/logit_scale"] == P()


def test_fsdp_sharding_rules(rng):
    """ZeRO sharding picks the largest free divisible axis for the data
    axis and composes with the TP specs."""
    run = tiny_cfg()
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"])["params"]
    mesh = create_mesh(8, tensor_parallel=2)  # dp=4 x tp=2
    shardings = param_shardings(mesh, params, fsdp=True)
    flat = {"/".join(p.key for p in path): sh.spec
            for path, sh in jax.tree_util.tree_flatten_with_path(
                shardings)[0]}
    blk = "clip/visual/resblocks_0"
    # [32, 96] column-parallel kernel: model on axis 1, data folds onto 0
    assert flat[f"{blk}/attn/in_proj/kernel"] == P(DATA_AXIS, MODEL_AXIS)
    # [32, 32] row-parallel: model on axis 0, data folds onto 1
    assert flat[f"{blk}/attn/out_proj/kernel"] == P(MODEL_AXIS, DATA_AXIS)
    # token embedding [vocab=64, 32]: largest divisible axis = 0
    assert flat["clip/text/token_embedding"] == P(DATA_AXIS, None)
    # scalars and small 1-D params stay replicated
    assert flat["clip/logit_scale"] == P()
    # every Adam-moment-sized fp32 leaf is actually sharded when possible:
    # count replicated 2-D kernels (should be none with these tiny dims)
    for name, spec in flat.items():
        if name.endswith("/kernel"):
            assert any(ax is not None for ax in spec), name


def _train_two_steps(run, params, batches):
    model = CLIP4Clip(run.model)
    trainer = Trainer(run, model, params, total_steps=10)
    loss, _ = trainer.train_epoch(0, batches, jax.random.PRNGKey(0),
                                  n_display=1000)
    return loss, jax.device_get(trainer.state.params)


@pytest.mark.slow
def test_tp_matches_dp(rng):
    """One epoch (2 steps) on dp=8 and on dp=4 x tp=2: same loss, same
    updated params.

    Clustering is disabled here on purpose: k-medoids takes a discrete
    argmin over fp32 distances, so the ulp-level reduction-order changes
    that come with ANY mesh-shape change (dp=8 vs dp=4, TP or not) can
    flip a near-tied medoid pick and shift the loss by percents — measured
    1e-7 loss agreement across dp8 / dp4x2 / tp8 without clustering vs
    ~2e-2 with it.  The clustered TP path is exercised by
    test_tp_cluster_smoke; the reference has the same property across
    GPU-count/cuDNN-algorithm changes."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run_dp = tiny_cfg(inter=False)
    model = CLIP4Clip(run_dp.model)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=b0["input_ids"],
                        attention_mask=b0["attention_mask"],
                        video=b0["video"],
                        video_mask=b0["video_mask"])["params"]
    params0 = jax.device_get(params)

    loss_dp, p_dp = _train_two_steps(run_dp, params0, batches)
    loss_tp, p_tp = _train_two_steps(
        tiny_cfg(inter=False, tensor_parallel=2), params0, batches)
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-5)
    flat_dp = jax.tree_util.tree_flatten_with_path(p_dp)[0]
    flat_tp = jax.tree.leaves(p_tp)
    assert len(flat_dp) == len(flat_tp)
    for (path, a), b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_fsdp_matches_dp(rng):
    """ZeRO-sharded params + moments (dp=8, fsdp) reproduce the replicated
    run exactly (clustering off — see test_tp_matches_dp)."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run_dp = tiny_cfg(inter=False)
    model = CLIP4Clip(run_dp.model)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=b0["input_ids"],
                        attention_mask=b0["attention_mask"],
                        video=b0["video"],
                        video_mask=b0["video_mask"])["params"]
    params0 = jax.device_get(params)

    loss_dp, p_dp = _train_two_steps(run_dp, params0, batches)
    loss_z, p_z = _train_two_steps(tiny_cfg(inter=False, fsdp=True),
                                   params0, batches)
    np.testing.assert_allclose(loss_z, loss_dp, rtol=2e-5)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(p_dp)[0],
            jax.tree.leaves(p_z)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_tp_cluster_smoke(rng):
    """The flagship cluster path (kmediods++ inter) trains on the 2-D mesh
    with ZeRO sharding on top: finite loss, params updated."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run = tiny_cfg(tensor_parallel=2, fsdp=True)
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


@pytest.mark.slow
def test_sp_matches_dp(rng):
    """Sequence parallelism (token-sharded residual stream over the model
    axis) is a pure layout change: dp=4 x tp=2 with sp reproduces the dp=8
    run (clustering off — see test_tp_matches_dp)."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run_dp = tiny_cfg(inter=False)
    model = CLIP4Clip(run_dp.model)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=b0["input_ids"],
                        attention_mask=b0["attention_mask"],
                        video=b0["video"],
                        video_mask=b0["video_mask"])["params"]
    params0 = jax.device_get(params)

    loss_dp, p_dp = _train_two_steps(run_dp, params0, batches)
    loss_sp, p_sp = _train_two_steps(
        tiny_cfg(inter=False, tensor_parallel=2, sequence_parallel=True),
        params0, batches)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-5)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(p_dp)[0],
            jax.tree.leaves(p_sp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_sp_cluster_fsdp_smoke(rng):
    """The full composition — dp x tp x sp x fsdp — trains the flagship
    cluster path to a finite loss (the dryrun leg's shape, pinned here)."""
    batches = [make_batch(np.random.default_rng(s), 16) for s in range(2)]
    run = tiny_cfg(tensor_parallel=2, sequence_parallel=True, fsdp=True)
    model = CLIP4Clip(run.model)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=b0["input_ids"],
                        attention_mask=b0["attention_mask"],
                        video=b0["video"],
                        video_mask=b0["video_mask"])["params"]
    loss, _ = _train_two_steps(run, jax.device_get(params), batches)
    assert np.isfinite(loss)


def test_sp_requires_tp():
    """sequence_parallel without tensor parallelism is a config error, and
    the sp constraint is a no-op outside a (data, model) mesh context."""
    with pytest.raises(ValueError, match="tensor_parallel"):
        tiny_cfg(sequence_parallel=True)
    # outside any mesh context shard_tokens must pass values through
    from centerclip_tpu.parallel.mesh import shard_tokens
    x = jnp.ones((2, 3, 4))
    np.testing.assert_array_equal(shard_tokens(x), x)


def test_tp_eval_matches_single_device(rng):
    """Two-phase eval on the (data, model) mesh equals the meshless run
    (clustering off — see test_tp_matches_dp for why)."""
    run = tiny_cfg(inter=False, tensor_parallel=2)
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"])["params"]
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]

    ref = Evaluator(model, params, mesh=None).evaluate(batches)
    mesh = create_mesh(8, tensor_parallel=2)
    got = Evaluator(model, params, mesh=mesh).evaluate(batches)
    np.testing.assert_allclose(got["sim_matrix"], ref["sim_matrix"],
                               rtol=2e-4, atol=2e-5)
    assert got["R1"] == ref["R1"]
