# coding=utf-8
"""Golden tests for the retrieval metrics and the multi-sentence protocol."""
import numpy as np

from centerclip_tpu.train.metrics import (compute_metrics,
                                          reshape_multi_sentence_sim,
                                          tensor_text_to_video_metrics,
                                          tensor_video_to_text_sim)


def test_compute_metrics_perfect():
    sim = np.eye(10) * 10 + np.random.default_rng(0).normal(size=(10, 10))
    sim = np.eye(10) * 100 + sim
    m = compute_metrics(sim)
    assert m["R1"] == 100.0 and m["MR"] == 1.0 and m["MeanR"] == 1.0


def test_compute_metrics_known_ranks():
    # diag entries rank 1st, 2nd, 3rd in their rows
    sim = np.array([
        [9.0, 1.0, 2.0],   # rank 0
        [8.0, 5.0, 1.0],   # rank 1
        [9.0, 8.0, 7.0],   # rank 2
    ])
    m = compute_metrics(sim)
    assert m["R1"] == 100.0 / 3
    assert m["R5"] == 100.0
    assert m["MR"] == 2.0
    assert np.isclose(m["MeanR"], 2.0)
    assert m["cols"] == [0, 1, 2]


def test_multi_sentence_protocol():
    """3 videos with 2/1/3 captions; perfect retrieval."""
    n_videos = 3
    cut_off = [2, 3, 6]  # 1-based end indices
    sents_per_video = [2, 1, 3]
    rng = np.random.default_rng(1)
    sim = rng.normal(size=(6, n_videos))
    # make each caption's true video the argmax
    row = 0
    for v, n in enumerate(sents_per_video):
        for _ in range(n):
            sim[row, v] = 50.0
            row += 1
    packed = reshape_multi_sentence_sim(sim, cut_off)
    assert packed.shape == (3, 3, 3)
    assert np.isinf(packed[1, 1]).all()  # video 1 has 1 caption -> 2 pad rows
    tv = tensor_text_to_video_metrics(packed)
    assert tv["R1"] == 100.0 and tv["MR"] == 1.0
    vt_sim = tensor_video_to_text_sim(packed)
    assert vt_sim.shape == (3, 3)
    m = compute_metrics(vt_sim)
    assert m["R1"] == 100.0


def test_multi_sentence_partial_rank():
    """One caption ranks its video 2nd: R@1 = 5/6."""
    cut_off = [2, 3, 6]
    sim = np.full((6, 3), -1.0)
    truths = [0, 0, 1, 2, 2, 2]
    for r, v in enumerate(truths):
        sim[r, v] = 10.0
    sim[2, 0] = 20.0  # caption 2 (video 1) prefers video 0
    packed = reshape_multi_sentence_sim(sim, cut_off)
    tv = tensor_text_to_video_metrics(packed)
    assert np.isclose(tv["R1"], 5 / 6 * 100)
    assert np.isclose(tv["R5"], 100.0)
