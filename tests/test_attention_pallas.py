# coding=utf-8
"""Fused Pallas attention vs the XLA attention path (interpret mode on CPU;
the same assertions run compiled on a real TPU via benchmarks/encode_ablation
and the TPU-gated test below)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerclip_tpu.ops.attention_pallas import fused_mha


def xla_mha(q, k, v, heads, mask=None):
    B, L, D = q.shape
    hd = D // heads
    qq = q.reshape(B, L, heads, hd)
    kk = k.reshape(B, L, heads, hd)
    vv = v.reshape(B, L, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qq * hd ** -0.5, kk,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vv)
    return out.reshape(B, L, D)


@pytest.mark.parametrize("B,L,H,hd,group", [
    (6, 50, 12, 64, 4),     # ViT-B/32 patch shape, B % group != 0
    (3, 32, 8, 64, 8),      # text shape, B < group
])
def test_fused_matches_xla_fp32(B, L, H, hd, group):
    rng = np.random.default_rng(0)
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
               for _ in range(3))
    out = fused_mha(q, k, v, heads=H, group=group, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_mha(q, k, v, H)),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_xla_causal_mask():
    rng = np.random.default_rng(1)
    B, L, H, hd = 4, 32, 8, 64
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    out = fused_mha(q, k, v, mask, heads=H, group=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_mha(q, k, v, H, mask)),
                               rtol=1e-5, atol=1e-5)


def test_fused_bf16_tolerance():
    rng = np.random.default_rng(2)
    B, L, H, hd = 4, 50, 12, 64
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.bfloat16)
               for _ in range(3))
    out = fused_mha(q, k, v, heads=H, group=4, interpret=True)
    ref = xla_mha(q, k, v, H)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_towers_pick_fused_only_when_deterministic_on_tpu():
    """On the CPU backend the flag must be inert (kernel has no VJP and
    Mosaic doesn't compile on CPU) — the full model must train and evaluate
    with fused_attention=True without touching the kernel."""
    from tests.test_train_eval import tiny_cfg, make_batch
    from centerclip_tpu.models.clip4clip import CLIP4Clip
    run = tiny_cfg(fused_attention=True)
    model = CLIP4Clip(run.model)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, 4)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=batch["input_ids"],
                        attention_mask=batch["attention_mask"],
                        video=batch["video"],
                        video_mask=batch["video_mask"],
                        training=True)["params"]
    out = model.apply({"params": params}, **{k: jnp.asarray(v)
                                             for k, v in batch.items()},
                      training=True)
    assert np.isfinite(float(out["loss"]))


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled-kernel check needs the TPU backend")
def test_fused_compiled_matches_xla_on_tpu():
    rng = np.random.default_rng(3)
    B, L, H, hd = 16, 50, 12, 64
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.bfloat16)
               for _ in range(3))
    out = np.asarray(fused_mha(q, k, v, heads=H), np.float32)
    ref = np.asarray(xla_mha(q, k, v, H), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


# --------------------------------------------------------------- custom VJP
def test_fused_grads_match_xla_fp32():
    rng = np.random.default_rng(4)
    B, L, H, hd, G = 5, 40, 4, 32, 2     # B % group != 0 exercises pad-bwd
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
               for _ in range(3))
    w = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_mha(q, k, v, heads=H, group=G,
                                 interpret=True) * w)

    def loss_xla(q, k, v):
        return jnp.sum(xla_mha(q, k, v, H) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_fused_mask_cotangent_matches_xla():
    rng = np.random.default_rng(5)
    B, L, H, hd = 3, 32, 4, 32
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)

    gf = jax.grad(lambda m: jnp.sum(
        fused_mha(q, k, v, m, heads=H, group=2, interpret=True) ** 2))(mask)
    gx = jax.grad(lambda m: jnp.sum(xla_mha(q, k, v, H, m) ** 2))(mask)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=2e-4, atol=2e-4)


def test_long_seq_per_sample_regime():
    """L >= FUSED_MIN_SEQ_ALWAYS routes to the per-sample kernel branch
    (no block-diagonal batching) — outputs and grads must still match."""
    from centerclip_tpu.ops.attention_pallas import FUSED_MIN_SEQ_ALWAYS
    rng = np.random.default_rng(6)
    B, L, H, hd = 5, FUSED_MIN_SEQ_ALWAYS + 5, 4, 32
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)
    out = fused_mha(q, k, v, mask, heads=H, group=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_mha(q, k, v, H, mask)),
                               rtol=1e-5, atol=1e-5)
    gf = jax.grad(lambda q: jnp.sum(
        fused_mha(q, k, v, mask, heads=H, group=2, interpret=True) ** 2))(q)
    gx = jax.grad(lambda q: jnp.sum(xla_mha(q, k, v, H, mask) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=2e-4, atol=2e-4)
