# coding=utf-8
"""TokenClusterInter choreography: segment reshape round-trips, mask
subsampling rule, CLS averaging, aggregation modes, pooling/shift algos."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerclip_tpu.config import (BlockClusterSpec, ClusterConfig,
                                   build_cluster_plan)
from centerclip_tpu.ops.cluster_layer import (TokenClusterInter,
                                              segment_interleave,
                                              segment_major,
                                              video_mask_after_cluster)
from centerclip_tpu.ops.shift import temporal_shift_wo_cls, token_shift


def test_segment_major_layout():
    """Matches torch.split(dim=1)+cat(dim=0): row s*B+b holds sample b,
    segment s, frames in order (cluster.py:249-250)."""
    B, T, P, D = 2, 6, 3, 4
    S, dur = 3, 2
    x = np.arange(B * T * P * D, dtype=np.float32).reshape(B, T, P, D)
    out = np.asarray(segment_major(jnp.asarray(x), S, dur))
    assert out.shape == (S * B, dur * P, D)
    for s in range(S):
        for b in range(B):
            expect = x[b, s * dur:(s + 1) * dur].reshape(dur * P, D)
            np.testing.assert_array_equal(out[s * B + b], expect)
    # interleave inverse: clip-major rows b*S+s (cluster.py:303)
    back = np.asarray(segment_interleave(jnp.asarray(out), B, S))
    for b in range(B):
        for s in range(S):
            np.testing.assert_array_equal(
                back[b * S + s], x[b, s * dur:(s + 1) * dur].reshape(-1, D))


def test_video_mask_after_cluster():
    """Takes the LAST frame's mask value per segment (clip4clip.py:436-447)."""
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0]])
    out = np.asarray(video_mask_after_cluster(mask, final_frames=6,
                                              f_frame_duration=2))
    # inds = arange(1, 12, 2) -> frames 1,3,5,7,9,11
    np.testing.assert_array_equal(out, [[1, 1, 1, 1, 0, 0]])
    out4 = np.asarray(video_mask_after_cluster(mask, final_frames=4,
                                               f_frame_duration=3))
    # inds = arange(2, 12, 3) -> frames 2,5,8,11
    np.testing.assert_array_equal(out4, [[1, 1, 0, 0]])


def _make_spec(algo, B=2, T=4, S=2, P=4, K=3):
    return BlockClusterSpec(block_id=1, algo=algo, before_cluster_num=P,
                            cluster_num=K, before_frames=T, after_frames=S,
                            frame_duration=T // S)


def _apply(algo, x, cfg_kw=None, **kw):
    spec = _make_spec(algo)
    cfg = ClusterConfig(inter=True, algo=algo,
                        cluster_num_blocks=(3,), target_frames_blocks=(2,),
                        **(cfg_kw or {}))
    mod = TokenClusterInter(spec=spec, cfg=cfg, width=x.shape[-1])
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), **kw)
    return np.asarray(mod.apply(params, jnp.asarray(x), **kw))


def test_kmedoids_layer_shapes_and_cls(rng):
    B, T, P1, D = 2, 4, 5, 8          # 4 patch tokens + CLS
    x = rng.normal(size=(B * T, P1, D)).astype(np.float32)
    out = _apply("kmediods++", x)
    assert out.shape == (B * 2, 3 + 1, D)
    # CLS of each segment = mean of the two frame CLS tokens
    # (cluster.py:306-308); output row b*S+s
    xr = x.reshape(B, T, P1, D)
    for b in range(B):
        for s in range(2):
            expect_cls = xr[b, s * 2:(s + 1) * 2, 0].mean(0)
            np.testing.assert_allclose(out[b * 2 + s, 0], expect_cls,
                                       rtol=1e-5)


def test_aggregation_mean(rng):
    """aggregation='mean' replaces medoid tokens by cluster means
    (cluster.py:291-300)."""
    B, T, P1, D = 1, 4, 5, 8
    x = rng.normal(size=(B * T, P1, D)).astype(np.float32)
    out_none = _apply("kmediods++", x)
    out_mean = _apply("kmediods++", x, cfg_kw={"aggregation": "mean"})
    assert out_mean.shape == out_none.shape
    assert not np.allclose(out_mean[:, 1:], out_none[:, 1:])
    np.testing.assert_allclose(out_mean[:, 0], out_none[:, 0], rtol=1e-5)


def test_pooling_layer(rng):
    """pooling = per-segment mean incl. CLS (cluster.py:315-320)."""
    B, T, P1, D = 2, 4, 5, 8
    x = rng.normal(size=(B * T, P1, D)).astype(np.float32)
    spec = _make_spec("pooling")
    cfg = ClusterConfig(inter=True, algo="pooling",
                        cluster_num_blocks=(3,), target_frames_blocks=(2,))
    mod = TokenClusterInter(spec=spec, cfg=cfg, width=D)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (B * 2, P1, D)
    xr = x.reshape(B, 2, 2, P1, D).mean(axis=2).reshape(B * 2, P1, D)
    np.testing.assert_allclose(out, xr, rtol=1e-5)


def test_shift_ops_preserve_shape_and_channels(rng):
    x = rng.normal(size=(8, 5, 16)).astype(np.float32)  # B*T=8, T=4
    out = np.asarray(temporal_shift_wo_cls(jnp.asarray(x), 4))
    assert out.shape == x.shape
    # CLS untouched
    np.testing.assert_array_equal(out[:, 0], x[:, 0])
    # non-shifted channels (last 3/4) untouched
    np.testing.assert_array_equal(out[:, 1:, 4:], x[:, 1:, 4:])
    # fold channels shift in time: out[t, :fold] == x[t+1, :fold]
    xr = x.reshape(2, 4, 5, 16)
    outr = out.reshape(2, 4, 5, 16)
    np.testing.assert_array_equal(outr[:, :-1, 1:, :2], xr[:, 1:, 1:, :2])
    np.testing.assert_array_equal(outr[:, -1, 1:, :2], 0)

    out2 = np.asarray(token_shift(jnp.asarray(x), 4))
    assert out2.shape == x.shape
    np.testing.assert_array_equal(out2[:, 1:], x[:, 1:])  # only CLS shifts


def test_cluster_plan_rules():
    """get_cluster_inter decision semantics (cluster.py:23-37)."""
    cfg = ClusterConfig(inter=True,
                        cluster_num_blocks=(49,) * 12,
                        target_frames_blocks=(12,) * 6 + (6,) * 6)
    plan = build_cluster_plan(cfg, max_frames=12, num_layers=12)
    active = [i for i, p in enumerate(plan) if p is not None]
    assert active == [6]  # frames shrink 12->6 entering block 7 (1-based)
    spec = plan[6]
    assert spec.before_frames == 12 and spec.after_frames == 6
    assert spec.frame_duration == 2 and spec.cluster_num == 49
    # cluster-count shrink triggers too
    cfg2 = ClusterConfig(inter=True,
                         cluster_num_blocks=(196,) * 6 + (160,) * 6,
                         target_frames_blocks=(12,) * 12)
    plan2 = build_cluster_plan(cfg2, max_frames=12, num_layers=12)
    active2 = [i for i, p in enumerate(plan2) if p is not None]
    assert active2 == [6]
    assert plan2[6].before_cluster_num == 196
    assert plan2[6].cluster_num == 160


