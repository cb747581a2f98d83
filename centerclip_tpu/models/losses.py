# coding=utf-8
"""Training losses (reference: modules/losses.py).

`cross_entropy` (CrossEn) is the only loss wired into training; the MIL-NCE
and max-margin losses are provided for surface parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(sim_matrix: jax.Array) -> jax.Array:
    """Symmetric-InfoNCE half: mean of -diag(log_softmax(sim))
    (reference: losses.py:8-18).  Computed in fp32."""
    logpt = jax.nn.log_softmax(sim_matrix.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.diagonal(logpt))


def milnce_loss(sim_matrix: jax.Array, batch_size: int, n_pair: int
                ) -> jax.Array:
    """MIL-NCE (reference: losses.py:21-49)."""
    mm_mask = np.kron(np.eye(batch_size), np.ones((n_pair, n_pair)))
    mm_mask = jnp.asarray(mm_mask, jnp.float32)

    from_text = sim_matrix + mm_mask * -1e12
    from_video = sim_matrix.T
    new_sim = jnp.concatenate([from_video, from_text], axis=-1)
    logpt = jax.nn.log_softmax(new_sim.astype(jnp.float32), axis=-1)

    mask_logpt = jnp.concatenate([mm_mask, jnp.zeros_like(mm_mask)], axis=-1)
    masked = logpt + (1.0 - mask_logpt) * -1e12
    new_logpt = -jax.nn.logsumexp(masked, axis=-1)

    mark = np.arange(batch_size) * n_pair + n_pair // 2
    return jnp.mean(new_logpt[jnp.asarray(mark)])


def max_margin_ranking_loss(sim_matrix: jax.Array, margin: float = 1.0,
                            negative_weighting: bool = False,
                            batch_size: int = 1, n_pair: int = 1,
                            hard_negative_rate: float = 0.5) -> jax.Array:
    """Max-margin ranking loss (reference: losses.py:52-80)."""
    d = jnp.diagonal(sim_matrix)
    max_margin = (jax.nn.relu(margin + sim_matrix - d[:, None])
                  + jax.nn.relu(margin + sim_matrix - d[None, :]))
    if negative_weighting and n_pair > 1 and batch_size > 1:
        easy = 1.0 - hard_negative_rate
        alpha = easy / ((batch_size - 1) * (1.0 - easy))
        mm = (1.0 - alpha) * np.eye(batch_size) + alpha
        mm = np.kron(mm, np.ones((n_pair, n_pair))) * (batch_size * (1.0 - easy))
        max_margin = max_margin * jnp.asarray(mm, max_margin.dtype)
    return jnp.mean(max_margin)
