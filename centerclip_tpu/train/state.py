# coding=utf-8
"""Train state + checkpointing.

Checkpoints carry the same logical payload as the reference's
``ckpt.pth.tar`` (epoch, global_step, arch, model state, best R@1, optimizer
state — reference: main.py:262-272, utils/misc.py:14-18), stored with orbax;
`export_torch_checkpoint` / `import_torch_checkpoint` convert the model
weights to/from the reference's torch schema for cross-framework resume.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import flax
import jax
import numpy as np
import optax

from ..config import ModelConfig, RunConfig
from ..models.weights import (params_to_state_dict, state_dict_to_params,
                              load_torch_state_dict, save_torch_state_dict)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    global_step: jax.Array          # int32 scalar

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        import jax.numpy as jnp
        return cls(params=params, opt_state=tx.init(params),
                   global_step=jnp.zeros([], jnp.int32))


# ---------------------------------------------------------------------------
# orbax checkpointing
# ---------------------------------------------------------------------------
def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    best_r1: float, is_best: bool = False) -> str:
    """Save {epoch, global_step, params, opt_state, best_r1}; copy to
    ``best`` like the reference copies to ckpt.best.pth.tar (misc.py:14-18)."""
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{epoch}")
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "meta": {"epoch": epoch,
                 "global_step": int(jax.device_get(state.global_step)),
                 "best_r1": float(best_r1)},
    }
    # The payload is host numpy and only rank 0 calls save (reference
    # main.py:262-272 master-only checkpointing); orbax's default save
    # still runs cross-process sync barriers, which deadlocks — and then
    # kills the job via the 300 s shutdown barrier — when the other ranks
    # never enter save (observed in tests/test_multiprocess.py).  Restrict
    # the barrier group to this process.
    if jax.process_count() > 1:
        ckptr = ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()},
                barrier_sync_key_prefix=f"proc{jax.process_index()}"))
    else:
        ckptr = ocp.PyTreeCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    latest = os.path.join(os.path.abspath(ckpt_dir), "ckpt_latest")
    if os.path.islink(latest) or os.path.exists(latest):
        if os.path.islink(latest):
            os.unlink(latest)
        else:
            shutil.rmtree(latest)
    os.symlink(path, latest)
    if is_best:
        best = os.path.join(os.path.abspath(ckpt_dir), "ckpt_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def load_checkpoint(path: str, state: Optional[TrainState] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint dir; when `state` is given, the payload is
    restored with matching dtypes/shapes."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if state is not None:
        template = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "meta": {"epoch": 0, "global_step": 0, "best_r1": 0.0},
        }
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))


def resume(path: str, state: TrainState, load_weights_only: bool = False
           ) -> tuple:
    """Resume semantics of the reference (main.py:188-212): full restore, or
    weights-only when --load_from_pretrained."""
    import jax.numpy as jnp
    payload = load_checkpoint(path, state)
    params = payload["params"]
    if load_weights_only:
        new_state = state.replace(params=params)
        return new_state, 0, 0.0
    new_state = state.replace(
        params=params, opt_state=payload["opt_state"],
        global_step=jnp.asarray(payload["meta"]["global_step"], jnp.int32))
    return new_state, int(payload["meta"]["epoch"]), \
        float(payload["meta"]["best_r1"])


# ---------------------------------------------------------------------------
# torch interop
# ---------------------------------------------------------------------------
def export_torch_checkpoint(params, cfg: ModelConfig, path: str,
                            epoch: int = 0, global_step: int = 0,
                            best_r1: float = 0.0,
                            arch: str = "CLIP4Clip") -> None:
    """Write a reference-compatible ckpt.pth.tar (main.py:262-272 schema)."""
    sd = params_to_state_dict(jax.device_get(params), cfg)
    import torch
    torch.save({
        "epoch": epoch, "global_step": global_step, "arch": arch,
        "state_dict": {k: torch.from_numpy(np.asarray(v))
                       for k, v in sd.items()},
        "best_acc1": best_r1,
    }, path)


def import_torch_checkpoint(path: str, cfg: ModelConfig,
                            init_params=None) -> tuple:
    """Load a reference torch checkpoint (or raw CLIP weights) into a flax
    param tree."""
    sd = load_torch_state_dict(path)
    return state_dict_to_params(sd, cfg, init_params=init_params)


def init_from_pretrained_clip(pretrained_path: str, cfg: ModelConfig,
                              init_params, temperature_new: float = 1.0
                              ) -> tuple:
    """CLIP4Clip.from_pretrained analogue (clip4clip.py:28-124): load the
    OpenAI CLIP weights, apply the seeding tricks, optionally override the
    temperature."""
    params, report = import_torch_checkpoint(pretrained_path, cfg,
                                             init_params=init_params)
    if temperature_new > 1.0:
        import jax.numpy as jnp
        params["clip"]["logit_scale"] = jnp.asarray(temperature_new,
                                                    jnp.float32)
    return params, report
