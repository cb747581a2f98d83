# coding=utf-8
"""ModifiedResNet vision tower (reference: modules/clip.py:40-180).

CLIP's anti-aliased ResNet: 3-conv stem with avg-pool, bottleneck blocks
whose strided convolutions are preceded by avg-pool, and a QKV attention
pool instead of global average pooling.

Support level mirrors the reference, which constructs these classes but
whose weight loader rejects RN checkpoints (clip.py:650-653): the tower is
buildable and runs inference (BatchNorm uses its stored running statistics
as fixed parameters); training RN variants would additionally need running-
stat updates (+ the reference's optional SyncBatchNorm, main.py:121-122).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-form BatchNorm: running stats stored as parameters."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        shape = (1, self.features, 1, 1)
        inv = jax.lax.rsqrt(var.reshape(shape) + self.eps)
        return (x - mean.reshape(shape)) * inv * scale.reshape(shape) \
            + bias.reshape(shape)


def _conv(features: int, kernel: int, stride: int = 1, name: str = "conv"):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2,) * 2] * 2, use_bias=False,
                   name=name)


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    # NCHW average pooling
    return nn.avg_pool(x.transpose(0, 2, 3, 1), (k, k), (k, k)
                       ).transpose(0, 3, 1, 2)


class Bottleneck(nn.Module):
    """reference: clip.py:40-83 — stride lives in an avgpool after conv2."""
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inplanes = x.shape[1]
        out = x.transpose(0, 2, 3, 1)                     # NCHW -> NHWC
        out = _conv(self.planes, 1, name="conv1")(out).transpose(0, 3, 1, 2)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = _conv(self.planes, 3, name="conv2")(
            out.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = _conv(self.planes * self.expansion, 1, name="conv3")(
            out.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        out = FrozenBatchNorm(self.planes * self.expansion, name="bn3")(out)

        identity = x
        if self.stride > 1 or inplanes != self.planes * self.expansion:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = _conv(self.planes * self.expansion, 1,
                             name="downsample_conv")(
                identity.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            identity = FrozenBatchNorm(self.planes * self.expansion,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (reference: clip.py:86-120)."""
    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, C, H, W = x.shape
        tokens = x.reshape(B, C, H * W).transpose(0, 2, 1)    # [B, HW, C]
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)      # [B, HW+1, C]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(C ** -0.5), (H * W + 1, C))
        tokens = tokens + pos[None]

        q = nn.Dense(C, name="q_proj")(tokens[:, :1])
        k = nn.Dense(C, name="k_proj")(tokens)
        v = nn.Dense(C, name="v_proj")(tokens)
        hd = C // self.num_heads
        q = q.reshape(B, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
        return nn.Dense(self.output_dim, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """reference: clip.py:123-180."""
    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, 3, H, W] -> [B, output_dim]."""
        w = self.width
        # 3-conv stem (clip.py:136-144)
        h = _conv(w // 2, 3, 2, name="conv1")(
            x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        h = nn.relu(FrozenBatchNorm(w // 2, name="bn1")(h))
        h = _conv(w // 2, 3, name="conv2")(
            h.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        h = nn.relu(FrozenBatchNorm(w // 2, name="bn2")(h))
        h = _conv(w, 3, name="conv3")(
            h.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        h = nn.relu(FrozenBatchNorm(w, name="bn3")(h))
        h = _avg_pool(h, 2)

        planes = [w, w * 2, w * 4, w * 8]
        strides = [1, 2, 2, 2]
        for li, (n_blocks, p, s) in enumerate(zip(self.layers, planes,
                                                  strides)):
            for bi in range(n_blocks):
                h = Bottleneck(p, stride=s if bi == 0 else 1,
                               name=f"layer{li + 1}_{bi}")(h)
        return AttentionPool2d(embed_dim=w * 32, num_heads=self.heads,
                               output_dim=self.output_dim,
                               name="attnpool")(h)
