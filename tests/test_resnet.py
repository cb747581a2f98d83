# coding=utf-8
"""ModifiedResNet tower: structure and CLIP integration (the reference
constructs these classes but never loads RN weights — clip.py:650-653)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centerclip_tpu.config import make_run_config
from centerclip_tpu.models.clip import CLIP
from centerclip_tpu.models.resnet import ModifiedResNet


@pytest.mark.slow
def test_rn50_tower_shapes_and_param_count():
    m = ModifiedResNet(layers=(3, 4, 6, 3), output_dim=1024, heads=32,
                       input_resolution=224, width=64)
    x = jnp.zeros((2, 3, 224, 224))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 1024)
    n = sum(p.size for p in jax.tree.leaves(params))
    # real CLIP RN50 visual tower is ~38.3M params
    assert abs(n / 1e6 - 38.3) < 0.5, n / 1e6


@pytest.mark.slow
def test_rn_clip_integration():
    cfg = make_run_config(clip_name="RN50", max_frames=2,
                          compute_dtype="float32").model
    model = CLIP(cfg)
    video = jnp.zeros((2, 3, 224, 224), jnp.float32)
    text = jnp.zeros((2, 8), jnp.int32).at[:, -1].set(49407)
    params = model.init(jax.random.PRNGKey(0), video, text)
    feats, closs = model.apply(params, video, method=CLIP.encode_image)
    assert feats.shape == (2, 1024)
    assert float(closs) == 0.0
    txt = model.apply(params, text, method=CLIP.encode_text)
    assert txt.shape == (2, 1024)


def test_stride_and_downsample():
    """stride>1 goes through avg-pool + 1x1 downsample (clip.py:50-68)."""
    from centerclip_tpu.models.resnet import Bottleneck
    x = jnp.ones((1, 64, 16, 16))
    blk = Bottleneck(planes=32, stride=2)
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == (1, 128, 8, 8)
    assert "downsample_conv" in params["params"]
