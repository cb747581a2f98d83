# coding=utf-8
"""Step-by-step trajectory equivalence of the optax optimizer ports against
the reference's actual torch implementations (VERDICT r2 weak #3 / next #2).

The oracle is the reference code itself, imported by file path:
* `utils/optimization.py` — BertAdam (schedule-in-step, per-param clipping,
  no bias correction) and `prep_optim_params_groups` (4 groups w/ coef_lr)
* `utils/lr_scheduler.py` — the iteration scheduler driving torch AdamW

A tiny 7-parameter model covering all 4 groups {clip,noclip}x{decay,nodecay}
plus a `new_added_modules` member is stepped N times with identical gradients
through both stacks; parameter trajectories must agree to ~1e-5.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from centerclip_tpu.config import OptimConfig  # noqa: E402
from centerclip_tpu.train.optim import build_optimizer  # noqa: E402

REF_DIR = "/root/reference/utils"
if not os.path.isdir(REF_DIR):
    pytest.skip("reference checkout not present at /root/reference",
                allow_module_level=True)


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_optim = _load("ref_optimization", "optimization.py")
ref_sched = _load("ref_lr_scheduler", "lr_scheduler.py")


# --------------------------------------------------------------- tiny model
class _TorchTiny(torch.nn.Module):
    """Names chosen so the reference's string matching puts one param in
    every group: clip_decay (clip.lin.weight AND clip.ln.weight — the
    reference names its LayerNorms `ln_*`, never `LayerNorm`, so the
    no_decay list's 'LayerNorm.weight' entry never matches and LN weights
    DO decay), clip_nodecay (clip.lin.bias, clip.ln.bias),
    new-added-inside-clip -> noclip (clip.frame_embedding),
    noclip_decay (head.weight), noclip_nodecay (head.bias)."""

    def __init__(self):
        super().__init__()
        self.clip = torch.nn.Module()
        self.clip.lin = torch.nn.Linear(4, 4)
        self.clip.ln = torch.nn.LayerNorm(4)
        self.clip.frame_embedding = torch.nn.Linear(3, 4, bias=False)
        self.head = torch.nn.Linear(4, 2)


# (torch name, jax tree path): LayerNorm maps to our `norm/{scale,bias}`
# naming, Linear.weight to `kernel` (the optimizer math is elementwise, so
# no transpose is needed as long as shapes pair up)
PAIRS = [
    ("clip.lin.weight", ("clip", "lin", "kernel")),
    ("clip.lin.bias", ("clip", "lin", "bias")),
    ("clip.ln.weight", ("clip", "ln", "norm", "scale")),
    ("clip.ln.bias", ("clip", "ln", "norm", "bias")),
    ("clip.frame_embedding.weight", ("clip", "frame_embedding", "kernel")),
    ("head.weight", ("head", "kernel")),
    ("head.bias", ("head", "bias")),
]


def _jax_tree_from(model):
    tree = {}
    named = dict(model.named_parameters())
    for tname, path in PAIRS:
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        # np.array(..., copy=True): `jnp.asarray` of a torch-parameter VIEW
        # can zero-copy alias the torch storage on the CPU backend (it does
        # so whenever the buffer happens to be 64-byte aligned — allocator-
        # history-dependent), and the in-place torch `opt.step()` below
        # would then silently mutate what jax reads as the initial params.
        # Observed as a rare order-dependent 4e-5 trajectory drift in the
        # full suite.  state_dict_to_params is immune (its astype copies).
        node[path[-1]] = jnp.asarray(
            np.array(named[tname].detach().numpy(), copy=True))
    return tree


def _grads_tree(model, grads_by_name):
    tree = {}
    for tname, path in PAIRS:
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = jnp.asarray(grads_by_name[tname])
    return tree


def _set_torch_grads(model, grads_by_name):
    for tname, p in model.named_parameters():
        p.grad = torch.from_numpy(grads_by_name[tname].copy())


def _make_grads(model, step, scale=3.0):
    """Deterministic per-step gradients, large enough that both the global
    clip and BertAdam's per-param clip actually engage."""
    rng = np.random.default_rng(1000 + step)
    return {n: (rng.normal(size=tuple(p.shape)) * scale).astype(np.float32)
            for n, p in model.named_parameters()}


def _assert_trajectories_close(model, jax_params, atol):
    named = dict(model.named_parameters())
    for tname, path in PAIRS:
        node = jax_params
        for key in path:
            node = node[key]
        np.testing.assert_allclose(
            np.asarray(node), named[tname].detach().numpy(),
            atol=atol, rtol=0, err_msg=tname)


def _args_ns(optim, lr, wd, coef_lr):
    return types.SimpleNamespace(
        optim=optim, lr=lr, wd=wd, coef_lr=coef_lr,
        new_added_modules=["time_embedding", "frame_embedding",
                           "deepcluster"])


N_STEPS = 30
LR, WD, COEF_LR, WARMUP = 1e-3, 0.05, 0.1, 0.2
CLIP_NORM = 0.5


def test_bert_adam_matches_reference_trajectory():
    torch.manual_seed(0)
    model = _TorchTiny()
    args = _args_ns("BertAdam", LR, WD, COEF_LR)
    groups = ref_optim.prep_optim_params_groups(args, model,
                                                coef_lr=COEF_LR)
    opt = ref_optim.BertAdam(groups, lr=LR, warmup=WARMUP,
                             schedule="warmup_cosine", b1=0.9, b2=0.98,
                             e=1e-6, t_total=N_STEPS, weight_decay=WD,
                             max_grad_norm=1.0)

    cfg = OptimConfig(optim="BertAdam", lr=LR, coef_lr=COEF_LR,
                      weight_decay=WD, warmup_proportion=WARMUP,
                      schedule="warmup_cosine", beta1=0.9, beta2=0.98,
                      eps=1e-6, clip_grad_norm=CLIP_NORM)
    params = _jax_tree_from(model)
    tx = build_optimizer(cfg, params, total_steps=N_STEPS)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

    for t in range(N_STEPS):
        g = _make_grads(model, t)
        # reference order (main.py:323-334): global clip on all params,
        # then BertAdam's internal per-param clip inside .step()
        _set_torch_grads(model, g)
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP_NORM)
        opt.step()
        params, opt_state = step(params, opt_state, _grads_tree(model, g))

    _assert_trajectories_close(model, params, atol=2e-5)


def test_adamw_matches_reference_trajectory():
    torch.manual_seed(0)
    model = _TorchTiny()
    args = _args_ns("AdamW", LR, WD, COEF_LR)
    groups = ref_optim.prep_optim_params_groups(args, model,
                                                coef_lr=COEF_LR)
    opt = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.98), eps=1e-6,
                            weight_decay=WD)
    sched = ref_sched.lr_scheduler(
        mode="cos", init_lr=LR, all_iters=N_STEPS,
        slow_start_iters=WARMUP * N_STEPS, weight_decay=WD)

    cfg = OptimConfig(optim="AdamW", lr=LR, coef_lr=COEF_LR,
                      weight_decay=WD, warmup_proportion=WARMUP,
                      lr_mode="cos", beta1=0.9, beta2=0.98, eps=1e-6,
                      clip_grad_norm=CLIP_NORM)
    params = _jax_tree_from(model)
    tx = build_optimizer(cfg, params, total_steps=N_STEPS)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

    for t in range(N_STEPS):
        g = _make_grads(model, t)
        # reference order (main.py:302,323-334): scheduler writes per-group
        # lr/weight_decay BEFORE the step; global clip; optimizer.step()
        sched(opt, global_step=t)
        _set_torch_grads(model, g)
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP_NORM)
        opt.step()
        params, opt_state = step(params, opt_state, _grads_tree(model, g))

    _assert_trajectories_close(model, params, atol=2e-5)
