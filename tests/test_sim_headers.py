# coding=utf-8
"""Similarity headers: seqTransf and tightTransf train end-to-end; seqLSTM
raises like the reference; sharded eval matches single-device eval."""
import numpy as np
import pytest
import jax

from tests.test_train_eval import tiny_cfg, make_batch
from centerclip_tpu.models.clip4clip import CLIP4Clip
from centerclip_tpu.parallel.mesh import create_mesh
from centerclip_tpu.train.evaluate import Evaluator
from centerclip_tpu.train.loop import Trainer


def _init(run, rng, n=8):
    model = CLIP4Clip(run.model)
    batch = make_batch(rng, n)
    # training=True so every similarity-header submodule is materialised
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"],
                        training=True)["params"]
    return model, params, batch


@pytest.mark.slow
def test_seq_transf_trains(rng):
    run = tiny_cfg(sim_header="seqTransf")
    model, params, batch = _init(run, rng)
    # frame-position embeddings + transformerClip exist
    assert "frame_position_embeddings" in params
    assert "transformerClip_0" in params
    trainer = Trainer(run, model, params, total_steps=10)
    loss, gstep = trainer.train_epoch(0, [batch, batch],
                                      jax.random.PRNGKey(0), n_display=1000)
    assert np.isfinite(loss) and gstep == 2


@pytest.mark.slow
def test_tight_transf_trains(rng):
    run = tiny_cfg(sim_header="tightTransf", loose_type=False)
    model, params, batch = _init(run, rng, n=4)
    assert "cross" in params and "similarity_dense" in params
    trainer = Trainer(run, model, params, total_steps=10)
    loss, gstep = trainer.train_epoch(0, [make_batch(rng, 8)],
                                      jax.random.PRNGKey(0), n_display=1000)
    assert np.isfinite(loss) and gstep == 1


@pytest.mark.slow
def test_tight_transf_chunked_matches_unchunked(rng):
    """cross_chunk_size bounds the [chunk*bv, L, D] cross block on big
    galleries (reference step_size split, clip4clip.py:377-391); chunked
    scores must equal the single-block result, including a ragged tail."""
    import jax.numpy as jnp
    run = tiny_cfg(sim_header="tightTransf", loose_type=False)
    model, params, batch = _init(run, rng, n=4)

    bt, bv = 5, 4  # bt NOT divisible by the chunk size -> exercises padding
    key = jax.random.PRNGKey(3)
    seq = jax.random.normal(key, (bt, 1, 16))  # EMBED=16 in tiny arch
    vis = jax.random.normal(jax.random.fold_in(key, 1), (bv, 2, 16))
    vmask = jnp.ones((bv, 2), jnp.int32)

    def score(m, s, v, vm):
        return m.cross_similarity(s, v, None, vm)

    full = model.apply({"params": params}, seq, vis, vmask, method=score)
    import dataclasses
    run2 = dataclasses.replace(
        run, model=dataclasses.replace(run.model, cross_chunk_size=2))
    model2 = CLIP4Clip(run2.model)
    chunked = model2.apply({"params": params}, seq, vis, vmask, method=score)
    assert chunked.shape == (bt, bv)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)


def test_seq_lstm_raises(rng):
    # the reference rejects seqLSTM at the loose-type assert
    # (clip4clip.py:423) before its own NotImplementedError at :332
    run = tiny_cfg(sim_header="seqLSTM")
    with pytest.raises((NotImplementedError, AssertionError)):
        _init(run, rng)  # training=True init reaches the similarity head


def test_sharded_eval_matches_single_device(rng):
    # cluster_inter off: on random frames the k-medoids argmin decisions sit
    # on fp ties, and different XLA shardings legitimately flip them; the
    # sharding machinery itself (padding, ordering, gather) is what this
    # test pins down
    run = tiny_cfg(inter=False, cluster_num_blocks=(), target_frames_blocks=())
    model, params, _ = _init(run, rng)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    batches.append(make_batch(np.random.default_rng(7), 5))  # ragged tail
    res_single = Evaluator(model, params).evaluate(batches)
    mesh = create_mesh()
    res_sharded = Evaluator(model, params, mesh=mesh).evaluate(batches)
    np.testing.assert_allclose(res_sharded["sim_matrix"],
                               res_single["sim_matrix"], rtol=2e-4, atol=2e-4)
    assert res_sharded["t2v"]["R1"] == res_single["t2v"]["R1"]


def test_uint8_folded_normalisation_matches_float_path(rng):
    """Raw uint8 frames (normalisation folded into the patchify matmul,
    VisionTransformer) must produce the same visual features as host-side
    float32 CLIP normalisation to numerical tolerance."""
    from centerclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    # clustering off: k-medoids argmin ties flip under 1e-6 perturbations on
    # random data, which would amplify legitimate rounding differences into
    # wholesale medoid swaps (the fold itself is what's under test here)
    run = tiny_cfg(inter=False)
    model, params, batch = _init(run, rng)
    u8 = rng.integers(0, 256, size=batch["video"].shape).astype(np.uint8)
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 1, 1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 1, 1, 3, 1, 1)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    def vis(video):
        return model.apply(
            {"params": params}, video, batch["video_mask"],
            method=lambda m, v, vm: m.get_visual_output(v, vm)[0])

    out8 = np.asarray(vis(u8))
    outf = np.asarray(vis(f32))
    np.testing.assert_allclose(out8, outf, rtol=2e-4, atol=2e-4)
