# coding=utf-8
"""Misc utilities (reference: utils/misc.py)."""
from __future__ import annotations

import random
from typing import Any

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key
    (reference: misc.py:49-58 seeds python/numpy/torch/cuda; JAX randomness
    is explicit via keys, so the key is returned rather than set globally)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_params(params: Any) -> int:
    """Total parameter count (reference: misc.py:61-65)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def count_params_million(params: Any) -> float:
    return count_params(params) / 1e6


def convert_params_to_fp32(params: Any) -> Any:
    import jax.numpy as jnp
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def convert_params_to_bf16(params: Any) -> Any:
    import jax.numpy as jnp
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
