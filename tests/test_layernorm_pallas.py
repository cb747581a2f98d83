# coding=utf-8
"""Fused Pallas LayerNorm vs the fp32 XLA reference (interpret mode on CPU;
a TPU-gated compiled check mirrors tests/test_attention_pallas.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerclip_tpu.ops.layernorm_pallas import fused_layernorm


def xla_ln(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x.dtype)


@pytest.mark.parametrize("R,D", [(100, 768), (512, 768), (700, 512)])
def test_fused_ln_matches_fp32(R, D):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(R, D)), jnp.float32)
    g = jnp.asarray(rng.normal(1.0, 0.1, size=(D,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    out = fused_layernorm(x, g, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_ln(x, g, b)),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_bf16_and_rank3():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 50, 768)), jnp.bfloat16)
    g = jnp.ones((768,), jnp.float32)
    b = jnp.zeros((768,), jnp.float32)
    out = fused_layernorm(x, g, b, interpret=True)
    assert out.dtype == jnp.bfloat16 and out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(xla_ln(x, g, b), np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_ln_grads_match():
    rng = np.random.default_rng(2)
    R, D = 300, 256     # R % block != 0 exercises the padded backward
    x = jnp.asarray(rng.normal(1.0, 2.0, size=(R, D)), jnp.float32)
    g = jnp.asarray(rng.normal(1.0, 0.1, size=(D,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)

    def loss_f(fn):
        return lambda x, g, b: jnp.sum(fn(x, g, b) * w)

    gf = jax.grad(loss_f(lambda x, g, b: fused_layernorm(
        x, g, b, interpret=True)), argnums=(0, 1, 2))(x, g, b)
    gx = jax.grad(loss_f(xla_ln), argnums=(0, 1, 2))(x, g, b)
    for a, r, name in zip(gf, gx, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled-kernel check needs the TPU backend")
def test_fused_ln_compiled_on_tpu():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(19200, 768)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(1.0, 0.1, size=(768,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(768,)), jnp.float32)
    out = np.asarray(fused_layernorm(x, g, b), np.float32)
    ref = np.asarray(xla_ln(x, g, b), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
