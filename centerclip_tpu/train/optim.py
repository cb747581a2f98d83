# coding=utf-8
"""Optimizers and LR schedules (reference: utils/optimization.py,
utils/lr_scheduler.py), built on optax.

Param groups replicate `prep_optim_params_groups`
(reference: optimization.py:174-225): {CLIP, non-CLIP} × {decay, no-decay},
where CLIP params get `lr * coef_lr` and `new_added_modules`
(time/frame embeddings, deepcluster) count as non-CLIP even under the clip
tower.  No-decay = biases and LayerNorm scales/biases.

* ``BertAdam``: Adam without bias correction, decoupled weight decay added to
  the update, per-parameter gradient clipping, and the LR schedule evaluated
  *inside* the step from `state.step / t_total`
  (reference: optimization.py:106-171).
* ``AdamW``: torch.optim.AdamW semantics with an iteration-based scheduler
  writing `lr * lr_mult` per group (reference: lr_scheduler.py:65-121).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------
def warmup_cosine(x, warmup=0.002):
    """reference: optimization.py:26-29"""
    return jnp.where(x < warmup, x / warmup, 0.5 * (1.0 + jnp.cos(math.pi * x)))


def warmup_constant(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


BERT_SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


def make_lr_schedule(cfg: OptimConfig, total_steps: int,
                     lr_step: int = 0, lr_step_multiplier: float = 0.1
                     ) -> Callable:
    """Iteration-based scheduler used with AdamW
    (reference: lr_scheduler.py:65-110): linear warmup over
    `slow_start_iters = warmup_proportion * total_steps` then
    cos/poly/HTD/step decay, floored at end_lr."""
    # float, NOT int(...): the reference keeps slow_start_iters fractional
    # (lr_scheduler.py:46,73) and truncating shifts every lr whenever
    # warmup_proportion * total_steps is non-integral (caught by the
    # trajectory oracle, test_reference_oracle.py)
    slow_start = cfg.warmup_proportion * total_steps
    slow_start_lr = 1e-8
    total = max(total_steps - slow_start, 1e-9)
    init_lr = cfg.lr

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(
            (t / (slow_start if slow_start > 0 else 1.0))
            * (init_lr - slow_start_lr) + slow_start_lr, init_lr)
        tt = t - slow_start
        if cfg.lr_mode == "cos":
            decay = 0.5 * init_lr * (1.0 + jnp.cos(tt / total * math.pi))
        elif cfg.lr_mode == "poly":
            decay = init_lr * jnp.power(jnp.maximum(1.0 - tt / total, 0.0), 0.9)
        elif cfg.lr_mode == "HTD":
            ratio = tt / total
            decay = 0.5 * init_lr * (1.0 - jnp.tanh(-6.0 + 9.0 * ratio))
        elif cfg.lr_mode == "step":
            # step decay (lr_scheduler.py:95-105); iteration-based here
            k = jnp.floor(tt / max(lr_step or total, 1))
            decay = init_lr * jnp.power(lr_step_multiplier, k)
        else:
            raise NotImplementedError(cfg.lr_mode)
        lr = jnp.where((slow_start > 0) & (t <= slow_start), warm, decay)
        return jnp.maximum(lr, cfg.end_lr)

    return schedule


# ---------------------------------------------------------------------------
# param grouping
# ---------------------------------------------------------------------------
NEW_ADDED_MODULES = ("time_embedding", "frame_embedding", "deepcluster")


def _path_names(path) -> list:
    return [p.key if hasattr(p, "key") else str(p) for p in path]


def param_group_label(path, _=None) -> str:
    """Label a param path as {clip,noclip}_{decay,nodecay}
    (reference: optimization.py:180-194).

    The torch no_decay list is ['bias', 'LayerNorm.bias', 'LayerNorm.weight']
    matched as SUBSTRINGS of the dotted name — and no parameter in the
    reference model is actually named `LayerNorm.*` (CLIP and the cross
    module both use `ln_*` attribute names, module_cross.py:93-158), so in
    practice only 'bias' ever matches: every LayerNorm WEIGHT (and
    logit_scale, embeddings, …) sits in the DECAY group.  Caught by the
    trajectory oracle (test_reference_oracle.py) — an earlier version of
    this rule wrongly exempted `norm/scale` leaves from decay."""
    names = _path_names(path)
    is_clip = names[0] == "clip" and not any(
        any(nd in n for nd in NEW_ADDED_MODULES) for n in names)
    no_decay = names[-1] == "bias"
    return f"{'clip' if is_clip else 'noclip'}_{'nodecay' if no_decay else 'decay'}"


def group_labels(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, v: param_group_label(p), params)


# ---------------------------------------------------------------------------
# BertAdam
# ---------------------------------------------------------------------------
class BertAdamState(NamedTuple):
    step: jax.Array
    mu: Any
    nu: Any


def bert_adam(cfg: OptimConfig, total_steps: int,
              labels: Any) -> optax.GradientTransformation:
    """reference: optimization.py:106-171 + group table optimization.py:201-208.

    Groups: clip_* get lr*coef_lr; *_decay get weight_decay, *_nodecay get 0.
    """
    schedule_fct = BERT_SCHEDULES[cfg.schedule]
    max_grad_norm = 1.0  # BertAdam default (optimization.py:71)

    def group_lr(label):
        base = cfg.lr * (cfg.coef_lr if label.startswith("clip") else 1.0)
        return base

    def group_wd(label):
        return cfg.weight_decay if label.endswith("_decay") else 0.0

    def init_fn(params):
        return BertAdamState(
            step=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        assert params is not None
        progress = state.step.astype(jnp.float32) / max(total_steps, 1)
        sched = schedule_fct(progress, cfg.warmup_proportion)

        def per_leaf(g, mu, nu, p, label):
            g = g.astype(jnp.float32)
            # per-parameter clipping (optimization.py:137-139)
            gnorm = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            mu = cfg.beta1 * mu + (1.0 - cfg.beta1) * g
            nu = cfg.beta2 * nu + (1.0 - cfg.beta2) * g * g
            upd = mu / (jnp.sqrt(nu) + cfg.eps)
            upd = upd + group_wd(label) * p
            lr_t = group_lr(label) * sched
            return -lr_t * upd, mu, nu

        out = jax.tree.map(per_leaf, grads, state.mu, state.nu, params, labels)
        updates = jax.tree.map(lambda o: o[0], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        return updates, BertAdamState(step=state.step + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# AdamW + external scheduler
# ---------------------------------------------------------------------------
class AdamWState(NamedTuple):
    step: jax.Array
    mu: Any
    nu: Any


def adamw_grouped(cfg: OptimConfig, total_steps: int,
                  labels: Any) -> optax.GradientTransformation:
    """torch AdamW semantics with the reference's per-group lr_mult/decay_mult
    (optimization.py:210-222) and the iteration scheduler
    (lr_scheduler.py:65-121)."""
    schedule = make_lr_schedule(cfg, total_steps)

    def lr_mult(label):
        return cfg.coef_lr if label.startswith("clip") else 1.0

    def decay_mult(label):
        return 1.0 if label.endswith("_decay") else 0.0

    def init_fn(params):
        return AdamWState(
            step=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        assert params is not None
        lr_t = schedule(state.step)
        count = state.step + 1
        bc1 = 1.0 - cfg.beta1 ** count.astype(jnp.float32)
        bc2 = 1.0 - cfg.beta2 ** count.astype(jnp.float32)

        def per_leaf(g, mu, nu, p, label):
            g = g.astype(jnp.float32)
            mu = cfg.beta1 * mu + (1.0 - cfg.beta1) * g
            nu = cfg.beta2 * nu + (1.0 - cfg.beta2) * g * g
            mhat = mu / bc1
            vhat = nu / bc2
            step_lr = lr_t * lr_mult(label)
            upd = mhat / (jnp.sqrt(vhat) + cfg.eps)
            # decoupled weight decay, lr-coupled like torch AdamW
            delta = -step_lr * (upd + cfg.weight_decay * decay_mult(label) * p)
            return delta, mu, nu

        out = jax.tree.map(per_leaf, grads, state.mu, state.nu, params, labels)
        updates = jax.tree.map(lambda o: o[0], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        return updates, AdamWState(step=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def trainable_mask(params, freeze_layer_num: int = -1,
                   freeze_clip: bool = False):
    """Boolean pytree: True = trainable.

    Replicates `freeze_cip_layers` (reference: clip4clip.py:449-471): with
    freeze_layer_num in [0, 12], CLIP params are frozen EXCEPT (a) the top
    layers (ln_final, text_projection, logit_scale, visual.ln_post,
    visual.proj), (b) transformer blocks with index >= freeze_layer_num
    (cluster/deepcluster modules follow their block index), and (c) the 3D
    patch conv2.  freeze_layer_num = -1 disables freezing.  `freeze_clip`
    freezes the whole CLIP tower except `new_added_modules` (the intent of
    the reference's commented train() override, clip4clip.py:473-493).
    Everything outside the clip subtree always trains.
    """
    import re as _re

    def leaf_mask(path, _):
        names = _path_names(path)
        if names[0] != "clip":
            return True
        sub = names[1:]
        if freeze_clip:
            return any(any(nd in n for nd in NEW_ADDED_MODULES)
                       for n in names)
        if freeze_layer_num <= -1:
            return True
        # top layers always train
        if sub[:2] in (["text", "ln_final"], ["text", "text_projection"],
                       ["visual", "ln_post"], ["visual", "proj"]) \
                or sub[:1] == ["logit_scale"]:
            return True
        if len(sub) >= 2 and sub[1] == "conv2":
            return True
        m = _re.match(r"(?:resblocks|cluster|cluster_post|deepcluster)_(\d+)$",
                      sub[1] if len(sub) >= 2 else "")
        if m:
            return int(m.group(1)) >= freeze_layer_num
        return False

    return jax.tree_util.tree_map_with_path(
        lambda p, v: leaf_mask(p, v), params)


def freeze_grads(mask) -> optax.GradientTransformation:
    """Zero gradients of frozen params BEFORE clipping/optimizer, matching
    torch requires_grad=False semantics (frozen params contribute nothing to
    the global grad norm and accumulate no optimizer state updates)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(grads, state, params=None):
        del params
        out = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
        return out, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg: OptimConfig, params, total_steps: int,
                    freeze_layer_num: int = -1, freeze_clip: bool = False
                    ) -> optax.GradientTransformation:
    """Assemble the configured optimizer: freeze mask, then global-norm
    clipping (reference: main.py:323-334 applies clip_grad_norm_ to all
    params for both optimizers), then the update rule."""
    labels = group_labels(params)
    if cfg.optim == "BertAdam":
        inner = bert_adam(cfg, total_steps, labels)
    elif cfg.optim == "AdamW":
        inner = adamw_grouped(cfg, total_steps, labels)
    else:
        raise NotImplementedError(cfg.optim)
    chain = []
    mask = None
    if freeze_clip or freeze_layer_num > -1:
        mask = trainable_mask(params, freeze_layer_num, freeze_clip)
        chain.append(freeze_grads(mask))
    if cfg.clip_grad_norm and cfg.clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    chain.append(inner)
    if mask is not None:
        # zero the FINAL updates too: weight decay inside the update rule
        # must not move frozen params (torch skips them entirely)
        chain.append(freeze_grads(mask))
    return optax.chain(*chain)


def current_lr(cfg: OptimConfig, step: int, total_steps: int) -> float:
    """Host-side LR readout for logging (group 0 = clip_decay,
    main.py:351-352)."""
    if cfg.optim == "BertAdam":
        sched = BERT_SCHEDULES[cfg.schedule]
        return float(cfg.lr * cfg.coef_lr
                     * sched(jnp.asarray(step / max(total_steps, 1)),
                             cfg.warmup_proportion))
    return float(make_lr_schedule(cfg, total_steps)(step) * cfg.coef_lr)
