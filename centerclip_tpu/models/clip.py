# coding=utf-8
"""CLIP text/vision towers with inter-block token clustering (flax).

Re-design of the reference CLIP (modules/clip.py:272-512) for TPU:
* patchify = reshape + one matmul (pure MXU) instead of a conv;
* the cluster modules live in the vision tower's block loop so the token and
  frame axes shrink with static shapes between blocks;
* activations run in `cfg.compute_dtype` (default bf16) with fp32 LayerNorm,
  softmax and fp32 outputs, matching the reference's AMP pinning.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.cluster_layer import TokenClusterInter
from ..ops.deepcluster import DeepCluster, deep_cluster_plan
from .layers import LayerNormF32, ResidualAttentionBlock, causal_mask


def _pp_active(module) -> bool:
    """True when this tower should run its block stack on the GPipe
    schedule: pipeline_parallel configured, applying (not initialising —
    init must construct every block so the canonical per-block param
    schema exists), and traced inside a mesh whose `pipe` extent matches.
    Eval and single-chip paths trace outside such a mesh and keep the
    sequential loop — deliberate, not an omission: PP exists for training
    memory capacity (stage-resident weights + optimizer state); at eval the
    weights fit replicated and the measured GPipe overhead (1.45-2.34x a
    pure-DP step, benchmarks/parallelism_bench.py) would only slow the
    encoders down."""
    cfg = module.cfg
    if cfg.pipeline_parallel <= 1 or module.is_initializing():
        return False
    from ..parallel.pipeline import context_pipe_size
    return context_pipe_size() == cfg.pipeline_parallel


class TextTransformer(nn.Module):
    """CLIP text encoder (reference: clip.py:402-417,471-496)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, text: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """text: [B, L] int32 token ids -> [B, L, embed_dim] hidden states."""
        arch = self.cfg.arch
        width = arch["transformer_width"]
        dtype = jnp.dtype(self.cfg.compute_dtype)

        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (arch["vocab_size"], width))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (arch["context_length"], width))
        x = tok[text].astype(dtype)
        x = x + pos[: text.shape[1]].astype(dtype)

        mask = causal_mask(text.shape[1])
        block_cls = ResidualAttentionBlock
        if self.cfg.remat:
            block_cls = nn.remat(ResidualAttentionBlock)
        fused = self.cfg.fused_attention and deterministic
        heads = arch["transformer_heads"]
        if _pp_active(self):
            # GPipe over the homogeneous 12-block stack: per-block param
            # subtrees are read from the scope (canonical checkpoint names)
            # and stacked inside parallel/pipeline.py
            from ..parallel.pipeline import pipeline_blocks
            blocks = [self.scope.get_variable("params", f"resblocks_{i}")
                      for i in range(arch["transformer_layers"])]
            x = pipeline_blocks(
                blocks,
                lambda p, h: ResidualAttentionBlock(width, heads, dtype)
                .apply({"params": p}, h, mask),
                x, microbatches=self.cfg.pipeline_microbatches)
        else:
            for i in range(arch["transformer_layers"]):
                x = block_cls(width, heads, dtype, fused=fused,
                              sp=self.cfg.sequence_parallel,
                              name=f"resblocks_{i}")(x, mask)
        x = LayerNormF32(fused=fused, name="ln_final")(x).astype(jnp.float32)
        proj = self.param("text_projection",
                          nn.initializers.normal(width ** -0.5),
                          (width, arch["embed_dim"]))
        return x @ proj                                        # fp32 hidden


class VisionTransformer(nn.Module):
    """CLIP ViT with inter-block token clustering
    (reference: clip.py:272-349 + cluster hooks clip.py:215-253)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, video: jax.Array, deterministic: bool = True,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """video: [B*T, 3, H, W] float (CLIP-normalised) frames.

        Returns (CLS features [B*T_final, embed_dim] fp32, cluster_loss
        scalar).  Like the reference (clip.py:463-464), ln_post + the output
        projection run on the CLS token only — no other token is consumed
        downstream, and projecting all 1+K tokens costs ~50x the FLOPs plus
        an fp32 [B*T, 1+K, embed] HBM round-trip.
        """
        cfg = self.cfg
        arch = cfg.arch
        width = arch["vision_width"]
        # vision heads = width // 64 in real CLIP (clip.py:389); overridable
        # for non-standard architectures
        vision_heads = arch.get("vision_heads", width // 64)
        P = arch["vision_patch_size"]
        dtype = jnp.dtype(cfg.compute_dtype)
        BT, C, H, W = video.shape
        gh, gw = H // P, W // P

        # patchify: conv(stride=kernel=P, no bias) == reshape + matmul.
        # kernel stored in torch conv layout [width, 3, P, P] for 1:1 ckpt
        # conversion (clip.py:282).
        conv1 = self.param("conv1", nn.initializers.lecun_normal(),
                           (width, 3, P, P))
        if cfg.linear_patch == "3d":
            x = self._patchify_3d(video, conv1, dtype)
        else:
            patches = video.reshape(BT, C, gh, P, gw, P)
            patches = patches.transpose(0, 2, 4, 1, 3, 5)      # [BT,gh,gw,C,P,P]
            patches = patches.reshape(BT, gh * gw, C * P * P).astype(dtype)
            kernel = conv1.reshape(width, C, P * P)
            bias = None
            if video.dtype == jnp.uint8:
                # raw uint8 frames: fold the CLIP normalisation
                # (x/255 - mean)/std into the (linear) patchify so no fp32
                # [BT, C, H, W] tensor is ever materialised —
                # x_norm @ K == x_raw @ (K * s_c) + shift_c . sum_p K.
                # uint8 0..255 is exact in bf16 (8 mantissa bits).
                from ..data.transforms import CLIP_MEAN, CLIP_STD
                mean = jnp.asarray(CLIP_MEAN, jnp.float32)
                std = jnp.asarray(CLIP_STD, jnp.float32)
                bias = jnp.einsum("c,ocp->o", -mean / std, kernel)
                kernel = kernel * (1.0 / (255.0 * std))[None, :, None]
            kernel = kernel.reshape(width, C * P * P).T.astype(dtype)
            x = patches @ kernel                               # [BT, gh*gw, width]
            if bias is not None:
                x = x + bias.astype(dtype)

        cls = self.param("class_embedding",
                         nn.initializers.normal(width ** -0.5), (width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(width ** -0.5),
                         (gh * gw + 1, width))
        cls_tok = jnp.broadcast_to(cls.astype(dtype), (BT, 1, width))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos.astype(dtype)
        fused = cfg.fused_attention and deterministic
        x = LayerNormF32(fused=fused, name="ln_pre")(x)

        plan = cfg.cluster_plan()
        dplan = deep_cluster_plan(cfg)
        cluster_loss = jnp.float32(0.0)
        block_cls = ResidualAttentionBlock
        if cfg.remat:
            block_cls = nn.remat(ResidualAttentionBlock)
        pp_active = _pp_active(self)

        def run_block(i, x):
            return block_cls(width, vision_heads, dtype, fused=fused,
                             sp=cfg.sequence_parallel,
                             name=f"resblocks_{i}")(x)

        run = []  # pending contiguous homogeneous blocks

        def flush(x):
            """Apply the pending block run: GPipe-pipelined when active
            (token counts are constant within a run — cluster layers only
            sit at run boundaries), else the plain sequential loop."""
            if not run:
                return x
            if pp_active:
                from ..parallel.pipeline import pipeline_blocks
                ps = [self.scope.get_variable("params", f"resblocks_{j}")
                      for j in run]
                x = pipeline_blocks(
                    ps,
                    lambda p, h: ResidualAttentionBlock(
                        width, vision_heads, dtype).apply({"params": p}, h),
                    x, microbatches=cfg.pipeline_microbatches)
            else:
                for j in run:
                    x = run_block(j, x)
            run.clear()
            return x

        for i in range(arch["vision_layers"]):
            spec = plan[i]
            dspec = dplan[i]
            if dspec is not None or spec is not None:
                x = flush(x)
            if dspec is not None:
                # learned clustering head before the block (clip.py:232-234);
                # the WCSS loss is computed in training only
                # (deepcluster.py:131-134)
                x, dl = DeepCluster(spec=dspec, cfg=cfg.cluster, width=width,
                                    name=f"deepcluster_{i}")(
                    x, train=not deterministic)
                cluster_loss = cluster_loss + dl
            if spec is not None:
                mod = TokenClusterInter(spec=spec, cfg=cfg.cluster,
                                        width=width, name=f"cluster_{i}")
                x = mod(x, deterministic=deterministic, rng=rng)
            if spec is not None and spec.algo == "token_shift":
                # token_shift runs again after attention (clip.py:247-248):
                # the post-op binds to this block, so it stays sequential
                x = run_block(i, x)
                x = TokenClusterInter(spec=spec, cfg=cfg.cluster, width=width,
                                      name=f"cluster_post_{i}")(x)
            else:
                run.append(i)
        x = flush(x)

        x = LayerNormF32(fused=fused, name="ln_post")(x[:, 0, :]).astype(jnp.float32)
        proj = self.param("proj", nn.initializers.normal(width ** -0.5),
                          (width, arch["embed_dim"]))
        return x @ proj, cluster_loss

    def _patchify_3d(self, video: jax.Array, conv1: jax.Array,
                     dtype) -> jax.Array:
        """3D tubelet patchify (reference: clip.py:298-321 conv2 path).

        Temporal kernel 3, stride 1, pad 1; spatial kernel=stride=P.  The
        conv2 weight is inflated from conv1 at load time (clip4clip.py:47-76);
        here it is its own parameter in torch Conv3d layout [O, I, 3, P, P].
        """
        cfg = self.cfg
        if video.dtype == jnp.uint8:
            # the uint8 normalisation fold exists only in the 2-D patchify
            # matmul; a conv can't absorb the per-channel affine without
            # rewriting its kernel, so raw frames here would be consumed as
            # 0..255 silently
            raise ValueError(
                "uint8 video reached the 3-D patchify — normalise to float "
                "(CLIP mean/std) before encode_image with linear_patch='3d'")
        P = cfg.arch["vision_patch_size"]
        width = cfg.arch["vision_width"]
        T = cfg.max_frames
        BT, C, H, W = video.shape
        B = BT // T
        conv2 = self.param("conv2", nn.initializers.lecun_normal(),
                           (width, C, 3, P, P))
        x5 = video.reshape(B, T, C, H, W).transpose(0, 2, 1, 3, 4)
        out = jax.lax.conv_general_dilated(
            x5.astype(dtype), conv2.astype(dtype),
            window_strides=(1, P, P), padding=((1, 1), (0, 0), (0, 0)),
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        # [B, width, T, gh, gw] -> [B*T, gh*gw, width]
        out = out.transpose(0, 2, 3, 4, 1)
        return out.reshape(BT, -1, width)


class CLIP(nn.Module):
    """Full CLIP with video-aware vision tower (reference: clip.py:352-512)."""
    cfg: ModelConfig

    def setup(self):
        arch = self.cfg.arch
        if isinstance(arch["vision_layers"], (tuple, list)):
            # ResNet tower (reference: clip.py:379-387); heads = width*32/64
            from .resnet import ModifiedResNet
            self.visual = ModifiedResNet(
                layers=tuple(arch["vision_layers"]),
                output_dim=arch["embed_dim"],
                heads=arch["vision_width"] * 32 // 64,
                input_resolution=arch["image_resolution"],
                width=arch["vision_width"])
            self._visual_is_resnet = True
        else:
            self.visual = VisionTransformer(self.cfg)
            self._visual_is_resnet = False
        self.text = TextTransformer(self.cfg)
        self.logit_scale = self.param("logit_scale",
                                      lambda key: jnp.asarray(np.log(1 / 0.07),
                                                              jnp.float32))

    def encode_text(self, text: jax.Array,
                    deterministic: bool = True) -> jax.Array:
        """[B, L] ids -> [B, embed_dim] fp32 features (EOT pooling: the EOT
        token has the largest id, so argmax over ids finds it —
        reference: clip.py:471-496)."""
        hidden = self.text(text, deterministic=deterministic)
        eot = jnp.argmax(text, axis=-1)
        return jnp.take_along_axis(
            hidden, eot[:, None, None], axis=1)[:, 0, :]

    def encode_text_hidden(self, text: jax.Array) -> Tuple[jax.Array, jax.Array]:
        hidden = self.text(text)
        eot = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0, :]
        return pooled, hidden

    def encode_image(self, video: jax.Array, deterministic: bool = True,
                     rng: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array]:
        """[B*T, 3, H, W] -> ([B*T_final, embed_dim] CLS features fp32,
        cluster_loss)."""
        if self._visual_is_resnet:
            if video.dtype == jnp.uint8:
                # no normalisation fold for the ResNet stem (stride-2 convs);
                # CLIP4Clip.get_visual_output normalises explicitly before
                # calling in — a direct caller must do the same
                raise ValueError(
                    "uint8 video reached the ResNet tower — normalise to "
                    "float (CLIP mean/std) before encode_image")
            return self.visual(video).astype(jnp.float32), jnp.float32(0.0)
        feats, cluster_loss = self.visual(video, deterministic=deterministic,
                                          rng=rng)
        return feats, cluster_loss

    def __call__(self, video: jax.Array, text: jax.Array):
        """Image/text contrastive logits (reference: clip.py:498-512)."""
        img, _ = self.encode_image(video)
        txt = self.encode_text(text)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T, scale * txt @ img.T
