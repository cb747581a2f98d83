# coding=utf-8
"""Training loop (reference: main.py:291-378), TPU-native.

One jitted `train_step` runs the whole update on the device mesh: forward
(global contrastive loss — under GSPMD the feature all-gather of
clip4clip.py:351-355 is inserted by XLA), backward, global-norm clip,
optimizer, and the logit-scale clamp to [0.1, ln 100] (main.py:336-340).
Gradient accumulation folds micro-batches with a `lax.scan`-free running sum
(the loop is host-side over already-materialised micro-batches, mirroring the
reference's step%accum pattern).
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import RunConfig
from ..models.clip4clip import CLIP4Clip
from ..parallel.mesh import (DATA_AXIS, create_mesh, shard_batch,
                             shard_params)
from .optim import build_optimizer, current_lr
from .state import TrainState

logger = logging.getLogger(__name__)

LOGIT_SCALE_MIN, LOGIT_SCALE_MAX = 0.1, 4.6052  # ln(100), main.py:336-340


def clamp_logit_scale(params):
    params = dict(params)
    clip = dict(params["clip"])
    clip["logit_scale"] = jnp.clip(clip["logit_scale"],
                                   LOGIT_SCALE_MIN, LOGIT_SCALE_MAX)
    params["clip"] = clip
    return params


def make_train_step(model: CLIP4Clip, tx, accum_steps: int = 1
                    ) -> Callable:
    """Build the jitted train step.

    Batch layout: dict(input_ids, attention_mask, video, video_mask) with
    leading axis sharded over the data mesh axis.
    """

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params},
                          input_ids=batch["input_ids"],
                          attention_mask=batch["attention_mask"],
                          video=batch["video"],
                          video_mask=batch["video_mask"],
                          training=True, rng=rng)
        return out["loss"], (out["sim_loss"], out["cluster_loss"])

    def _grad(params, batch, rng):
        (loss, (sim_loss, cluster_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        return loss, sim_loss, cluster_loss, grads

    def _apply(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                              state.params, updates)
        params = clamp_logit_scale(params)
        return state.replace(params=params, opt_state=opt_state,
                             global_step=state.global_step + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused_step(state: TrainState, batch, rng):
        """Single-micro-batch fast path: forward+backward+update in one
        compilation.  The state is donated: params and both Adam moments
        are updated in place (same shapes/shardings in and out), saving
        ~1.4 GB of HBM copies per step for ViT-B/32 — callers must rebind
        to the returned state (Trainer.train_epoch always does)."""
        loss, sim_loss, cluster_loss, grads = _grad(state.params, batch, rng)
        new_state = _apply(state, grads)
        return new_state, {"loss": loss, "sim_loss": sim_loss,
                           "cluster_loss": cluster_loss}

    if accum_steps <= 1:
        return fused_step

    @functools.partial(jax.jit, donate_argnums=(3,))
    def grad_accumulate(params, batch, rng, acc):
        """One micro-step: grads added into the (donated) accumulator; the
        loss triplet stays on device — no host sync per micro-batch."""
        loss, sim_loss, cluster_loss, grads = _grad(params, batch, rng)
        acc = jax.tree.map(jnp.add, acc, grads)
        return jnp.stack([loss, sim_loss, cluster_loss]), acc

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def finalize(state: TrainState, acc, losses):
        """Average grads (reference's loss/accum division, main.py:316-317),
        apply the update, reduce the [accum, 3] loss log to means.  Both
        the state (updated in place, see fused_step) and the spent grad
        accumulator are donated."""
        grads = jax.tree.map(lambda g: g / losses.shape[0], acc)
        new_state = _apply(state, grads)
        mean = jnp.mean(losses, axis=0)
        return new_state, {"loss": mean[0], "sim_loss": mean[1],
                           "cluster_loss": mean[2]}

    zeros_like = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))

    def accum_step(state: TrainState, micro_batches, rng):
        """Host loop dispatches micro-steps; everything (grads, losses)
        stays device-side until `finalize`."""
        acc = zeros_like(state.params)
        losses = []
        for i, mb in enumerate(micro_batches):
            sub = jax.random.fold_in(rng, i)
            triplet, acc = grad_accumulate(state.params, mb, sub, acc)
            losses.append(triplet)
        return finalize(state, acc, jnp.stack(losses))

    return accum_step


class Trainer:
    """Epoch driver (reference: main_worker + train_epoch, main.py:72-378)."""

    def __init__(self, cfg: RunConfig, model: CLIP4Clip, params,
                 total_steps: int, mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh if mesh is not None else create_mesh(
            cfg.data_parallel, tensor_parallel=cfg.tensor_parallel,
            pipeline_parallel=cfg.model.pipeline_parallel)
        self.tx = build_optimizer(cfg.optim, params, total_steps,
                                  freeze_layer_num=cfg.freeze_layer_num,
                                  freeze_clip=cfg.freeze_clip)
        # replicated on a 1-D data mesh; Megatron column/row-parallel on a
        # (data, model) mesh; optionally ZeRO-sharded over the data axis —
        # the optimizer moments inherit the placement through tx.init's
        # zeros_like
        params = shard_params(self.mesh, params, fsdp=cfg.fsdp)
        self.state = TrainState.create(params, self.tx)
        self.total_steps = total_steps
        self.accum = cfg.optim.gradient_accumulation_steps
        self._step_fn = make_train_step(model, self.tx, self.accum)
        self.metric_writer = None

    def train_epoch(self, epoch: int, batches: Iterable[Dict[str, np.ndarray]],
                    rng: jax.Array, n_display: int = 100) -> Tuple[float, int]:
        """Returns (mean loss, global_step)."""
        total_loss, n = 0.0, 0
        loss_log = []
        first_gstep = int(jax.device_get(self.state.global_step))
        micro = []
        end = time.time()
        # optional XLA profiler trace of the first steps (the TPU-native
        # upgrade of the reference's manual data_time/batch_time timers,
        # main.py:299-343)
        profiling = (epoch == 0 and self.cfg.profile_dir
                     and jax.process_index() == 0)
        if profiling:
            jax.profiler.start_trace(self.cfg.profile_dir)
        with self.mesh:
            for step, host_batch in enumerate(batches):
                if profiling and step == self.cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                batch = shard_batch(self.mesh, host_batch)
                data_time = time.time() - end
                if self.accum > 1:
                    micro.append(batch)
                    if len(micro) < self.accum:
                        continue
                    sub = jax.random.fold_in(rng, step)
                    self.state, logs = self._step_fn(self.state, micro, sub)
                    micro = []
                else:
                    sub = jax.random.fold_in(rng, step)
                    self.state, logs = self._step_fn(self.state, batch, sub)
                batch_time = time.time() - end
                end = time.time()
                # keep losses on device; fetching every step would force a
                # host sync per step (expensive: the dispatch is async)
                loss_log.append(logs["loss"])
                n += 1
                gstep = first_gstep + n
                if gstep % n_display == 0:
                    scale = float(jax.device_get(
                        self.state.params["clip"]["logit_scale"]))
                    lr = current_lr(self.cfg.optim, gstep, self.total_steps)
                    logger.info(
                        "Epoch: %d step %d\tSimLoss: %.4f CLoss %.4f\t"
                        "Data (t) %.3f\tBatch (t) %.3f\tLR: %.1e\t"
                        "logit_scale %.3f", epoch, gstep,
                        float(jax.device_get(logs["sim_loss"])),
                        float(jax.device_get(logs["cluster_loss"])),
                        data_time, batch_time, lr, scale)
                    if self.metric_writer is not None:
                        self.metric_writer.log(
                            {"train/sim_loss": float(jax.device_get(
                                logs["sim_loss"])),
                             "train/cluster_loss": float(jax.device_get(
                                 logs["cluster_loss"])),
                             "train/data_time": data_time,
                             "train/batch_time": batch_time,
                             "train/scale": scale, "train/lr": lr},
                            step=gstep)
            if micro:
                # epoch tail: step on the partial accumulator — `finalize`
                # divides by the true micro count, so the update is the mean
                # over however many micro-batches remain.  The reference
                # scales each loss by 1/accum and only steps on accum
                # boundaries (main.py:316-340), which silently drops the
                # tail; here no data is lost and main.py sizes
                # steps_per_epoch with a ceil to match.
                logger.info("Epoch %d: flushing %d tail micro-batch(es)",
                            epoch, len(micro))
                sub = jax.random.fold_in(rng, len(micro) + 2 ** 20)
                self.state, logs = self._step_fn(self.state, micro, sub)
                micro = []
                loss_log.append(logs["loss"])
                n += 1
        if profiling:
            jax.profiler.stop_trace()
        if loss_log:
            if all(isinstance(x, float) for x in loss_log):
                total_loss = float(np.sum(loss_log))
            else:
                total_loss = float(jax.device_get(
                    jnp.sum(jnp.stack(loss_log))))
        return total_loss / max(n, 1), int(jax.device_get(
            self.state.global_step))
