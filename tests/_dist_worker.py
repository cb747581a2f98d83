# coding=utf-8
"""Worker for the 2-process jax.distributed smoke (not collected by pytest).

Usage: python tests/_dist_worker.py <process_id> <port> <data_root> <out_dir> \
           [devices_per_proc] [extra argv...]

Forces the CPU platform with `devices_per_proc` virtual devices (default 4),
joins a 2-process Gloo cluster, then drives `main.main()` end-to-end on the
synthetic MSR-VTT fixture — exercising the `process_count > 1` branches:
per-process loader shards with wrap-around padding (data/loader.py),
`make_array_from_process_local_data` batch assembly (parallel/mesh.py),
rank-0-only eval/checkpointing/logging (main.py).  Extra argv (e.g.
``--tensor_parallel 2``) appends to the flag list so test_multiprocess.py
can run cross-process TP/SP/FSDP and GPipe-PP legs over the same contract.
"""
import os
import sys

pid, port, root, out = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                        sys.argv[4])
ndev = int(sys.argv[5]) if len(sys.argv) > 5 else 4
extra_argv = sys.argv[6:]

# conftest-inherited XLA_FLAGS may pin 8 host devices; this worker wants
# ndev per process (2 processes x 4 = the usual 8-device test mesh, or
# 2 x 1 so the model/pipe axis itself spans the process boundary)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append(f"--xla_force_host_platform_device_count={ndev}")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 2 * ndev

# Establish the Gloo communicator NOW, while both processes are aligned:
# the first cross-process collective has a hard 30s key-exchange deadline,
# and a compile-cache hit on one worker vs a cold compile on the other
# skews the workers past it if the context is first built mid-run.
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("dist_worker_warmup")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centerclip_tpu import config as cfg_mod  # noqa: E402

cfg_mod.CLIP_ARCHS["tiny-dist"] = dict(
    embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
    vision_patch_size=16, vision_heads=2, context_length=12,
    vocab_size=49408, transformer_width=32, transformer_heads=2,
    transformer_layers=2)

argv = [
    "--do_train", "1", "--do_eval", "1", "--datatype", "msrvtt",
    "--train_csv", f"{root}/train.csv", "--val_csv", f"{root}/test.csv",
    "--data_path", f"{root}/MSRVTT_data.json",
    "--features_path", f"{root}/videos", "--video_suffix", ".npy",
    "--output_dir", out, "--pretrained_clip_name", "tiny-dist",
    "--max_words", "12", "--max_frames", "4",
    "--batch_size", "8", "--batch_size_val", "4",
    "--epochs", "1", "--optim", "BertAdam", "--lr", "1e-3",
    "--loose_type", "--sim_header", "meanP", "--expand_msrvtt_sentences",
    "--cluster_inter", "1", "--cluster_algo", "kmediods++",
    "--cluster_num_blocks", "3", "3", "--target_frames_blocks", "4", "2",
    "--precision", "fp32", "--num_thread_reader", "2", "--n_display", "1",
] + extra_argv

import centerclip_tpu.cli as cli  # noqa: E402
import main as main_mod  # noqa: E402

_orig = cli.args_to_run_config


def _patched(args):
    import dataclasses
    cfg = _orig(args)
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, image_resolution=32))


cli.args_to_run_config = _patched

# capture this rank's epoch loss: rank-1 log records are dropped by the
# process-0 filter, so the cross-rank loss-agreement assertion in
# test_multiprocess.py needs the loss on stdout from every rank
from centerclip_tpu.train.loop import Trainer  # noqa: E402

_orig_epoch = Trainer.train_epoch
_losses = []


def _capture(self, *a, **k):
    loss, gstep = _orig_epoch(self, *a, **k)
    _losses.append(loss)
    return loss, gstep


Trainer.train_epoch = _capture
best_r1 = main_mod.main(argv)
print(f"DIST_WORKER_OK pid={pid} best_r1={best_r1} "
      f"mean_loss={_losses[-1]:.6f}", flush=True)
