# coding=utf-8
"""Parallelism-strategy step-time bench on the 8-virtual-device CPU mesh.

Measures the full jitted train step (fwd+bwd+optimizer) at EQUAL global
batch for every strategy the framework supports — pure DP, Megatron TP
(+SP), ZeRO/FSDP, and GPipe PP across microbatch counts — and prints one
JSON line per config plus a recommendation summary.

Why CPU: the build environment has one real TPU chip, so multi-device
strategies can only be *timed* on the simulated host mesh.  Absolute
numbers are meaningless for TPU; the RELATIVE ordering of schedule
overheads (pipeline bubble + ppermute traffic vs pure-DP psum) and the
bubble-model fit are what transfer — the same caveat the GPipe paper makes
when reporting bubble fractions analytically.  The GPipe bubble model:

    overhead(M) ~ (S - 1) / (M + S - 1)

(S pipeline stages, M microbatches) predicts step time scaled from the
per-microbatch work; the bench reports the measured-vs-model residual so a
schedule bug (e.g. a stage idling outside the bubble) shows up as a bad
fit rather than hiding inside "CPU noise".

Run:  python benchmarks/parallelism_bench.py [--steps N] [--quick]
The measured table + recommendation live in parallel/pipeline.py's
docstring and README.md; re-run this after touching the GPipe schedule or
the Megatron shardings.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from centerclip_tpu import config as cfg_mod  # noqa: E402
from centerclip_tpu.config import make_run_config  # noqa: E402
from centerclip_tpu.models.clip4clip import CLIP4Clip  # noqa: E402
from centerclip_tpu.parallel.mesh import shard_batch  # noqa: E402
from centerclip_tpu.train.loop import Trainer  # noqa: E402

# structurally real but CPU-sized: 8+8 pre-LN blocks, 65 visual tokens, so
# per-stage MatMul work dominates schedule/dispatch overhead
LAYERS = 8
T_FRAMES = 8
cfg_mod.CLIP_ARCHS["bench-par"] = dict(
    embed_dim=64, image_resolution=64, vision_layers=LAYERS,
    vision_width=128, vision_patch_size=8, vision_heads=4,
    context_length=16, vocab_size=1024, transformer_width=128,
    transformer_heads=4, transformer_layers=LAYERS)


def make_cfg(**over):
    base = dict(clip_name="bench-par", max_frames=T_FRAMES, max_words=16,
                compute_dtype="float32", inter=False,
                optim="AdamW", lr=1e-4, coef_lr=1.0, weight_decay=0.01,
                epochs=1, batch_size=32)
    base.update(over)
    return make_run_config(**base)


def make_batch(rng: np.random.Generator, n: int):
    ids = rng.integers(1, 1000, size=(n, 16)).astype(np.int32)
    return {
        "input_ids": ids,
        "attention_mask": np.ones((n, 16), np.int32),
        "video": rng.integers(0, 255, size=(n, 1, T_FRAMES, 3, 64, 64)
                              ).astype(np.uint8),
        "video_mask": np.ones((n, T_FRAMES), np.int32),
    }


def time_config(name: str, run, params0, batch, steps: int):
    model = CLIP4Clip(run.model)
    trainer = Trainer(run, model, params0, total_steps=10_000)
    rng = jax.random.PRNGKey(0)
    with trainer.mesh:
        dev_batch = shard_batch(trainer.mesh, batch)
        # warmup: compile + first-touch allocations
        for i in range(2):
            trainer.state, logs = trainer._step_fn(
                trainer.state, dev_batch, jax.random.fold_in(rng, i))
        float(jax.device_get(logs["loss"]))
        t0 = time.perf_counter()
        for i in range(steps):
            trainer.state, logs = trainer._step_fn(
                trainer.state, dev_batch, jax.random.fold_in(rng, 100 + i))
        loss = float(jax.device_get(logs["loss"]))
    ms = (time.perf_counter() - t0) / steps * 1e3
    rec = {"config": name, "step_ms": round(ms, 2), "loss": round(loss, 4)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--quick", action="store_true",
                    help="dp8 + one PP and one TP config only")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    batch = make_batch(rng, 32)
    run_dp = make_cfg()
    model = CLIP4Clip(run_dp.model)
    params0 = jax.device_get(model.init(
        jax.random.PRNGKey(0), input_ids=batch["input_ids"],
        attention_mask=batch["attention_mask"], video=batch["video"],
        video_mask=batch["video_mask"])["params"])

    configs = [("dp8", {})]
    if not args.quick:
        configs += [
            ("dp4_tp2", dict(tensor_parallel=2)),
            ("dp4_tp2_sp", dict(tensor_parallel=2, sequence_parallel=True)),
            ("dp8_fsdp", dict(fsdp=True)),
        ]
    pp_cfgs = [("dp4_pp2_m2", dict(pipeline_parallel=2,
                                   pipeline_microbatches=2))]
    if not args.quick:
        pp_cfgs += [
            ("dp4_pp2_m4", dict(pipeline_parallel=2,
                                pipeline_microbatches=4)),
            ("dp4_pp2_m8", dict(pipeline_parallel=2,
                                pipeline_microbatches=8)),
            ("dp2_pp4_m4", dict(pipeline_parallel=4,
                                pipeline_microbatches=4)),
            ("dp2_pp4_m8", dict(pipeline_parallel=4,
                                pipeline_microbatches=8)),
            ("dp2_pp4_m16", dict(pipeline_parallel=4,
                                 pipeline_microbatches=16)),
        ]
    configs += pp_cfgs

    results = {}
    for name, over in configs:
        results[name] = time_config(name, make_cfg(**over), params0, batch,
                                    args.steps)

    dp_ms = results["dp8"]["step_ms"]
    summary = {"baseline_dp8_ms": dp_ms, "overhead_vs_dp": {}, "bubble": {}}
    for name, rec in results.items():
        if name == "dp8":
            continue
        summary["overhead_vs_dp"][name] = round(rec["step_ms"] / dp_ms, 3)
        if "_pp" in name:
            S = int(name.split("_pp")[1].split("_")[0])
            M = int(name.split("_m")[1])
            # per-device work doubles when dp halves: dp8 -> dp{8/S}
            # means each data shard carries S x the rows, but each stage
            # holds 1/S of the layers -> ideal PP step == dp8 step, plus
            # the bubble
            model_ms = dp_ms * (1.0 + (S - 1) / M)
            summary["bubble"][name] = {
                "model_frac": round((S - 1) / (M + S - 1), 3),
                "model_ms": round(model_ms, 2),
                "measured_ms": rec["step_ms"],
                "residual": round(rec["step_ms"] / model_ms, 3),
            }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
