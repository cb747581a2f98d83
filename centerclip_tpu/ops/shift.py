# coding=utf-8
"""Temporal / token shift baselines (reference: modules/cluster/shift.py).

Channel-shift tricks from TSM/ActionCLIP and TokShift: exchange a 1/fold_div
slice of channels with the neighbouring frame.  Implemented with static slices
and `jnp.pad`-style rolls so XLA fuses them into pure data movement.
"""
from __future__ import annotations

import jax.numpy as jnp


def temporal_shift_wo_cls(x: jnp.ndarray, n_segment: int,
                          fold_div: int = 8) -> jnp.ndarray:
    """Shift 1/fold_div of channels forward and another 1/fold_div backward in
    time for every non-CLS token (reference: shift.py:15-36).

    Args:
        x: [B*T, L, C] tokens (CLS at position 0).
        n_segment: T, the number of frames per clip.
    """
    nt, hw, c = x.shape
    cls_ = x[:, 0:1, :]
    body = x[:, 1:, :].reshape(nt // n_segment, n_segment, hw - 1, c)
    fold = c // fold_div

    zeros = jnp.zeros_like(body[:, :1])
    # shift left: out[t] = x[t+1] for the first fold channels
    left = jnp.concatenate([body[:, 1:], zeros], axis=1)[..., :fold]
    # shift right: out[t] = x[t-1] for the second fold channels
    right = jnp.concatenate([zeros, body[:, :-1]], axis=1)[..., fold:2 * fold]
    out = jnp.concatenate([left, right, body[..., 2 * fold:]], axis=-1)
    out = out.reshape(nt, hw - 1, c)
    return jnp.concatenate([cls_, out], axis=1)


def token_shift(x: jnp.ndarray, n_segment: int, fold_div: int = 8) -> jnp.ndarray:
    """TokShift: same channel exchange but only for the CLS token
    (reference: shift.py:39-61)."""
    bt, n, c = x.shape
    t = n_segment
    b = bt // t
    xr = x.reshape(b, t, n, c)
    fold = c // fold_div

    cls_tok = xr[:, :, 0, :]                                  # [B, T, C]
    zeros = jnp.zeros_like(cls_tok[:, :1])
    left = jnp.concatenate([cls_tok[:, 1:], zeros], axis=1)[..., :fold]
    right = jnp.concatenate([zeros, cls_tok[:, :-1]], axis=1)[..., fold:2 * fold]
    new_cls = jnp.concatenate([left, right, cls_tok[..., 2 * fold:]], axis=-1)
    out = xr.at[:, :, 0, :].set(new_cls)
    return out.reshape(bt, n, c)
