# coding=utf-8
"""Entry point: train / evaluate CenterCLIP-TPU
(reference: main.py:31-288 `main` + `main_worker`).

Single-controller JAX replaces the reference's mp.spawn-per-GPU: one process
per host drives every local chip through the data mesh.  Multi-host runs call
`jax.distributed.initialize()` (controlled by JAX_COORDINATOR_ADDRESS etc.)
before anything touches devices.
"""
from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np


def main(argv=None):
    from centerclip_tpu.cli import parse_args
    cfg = parse_args(argv)

    # persistent XLA compilation cache: first-compile of the full train step
    # is minutes; subsequent runs hit the cache.  NB the env var is useless
    # here — this image's sitecustomize.py pre-imports jax at interpreter
    # startup, so the config default is already frozen; only a runtime
    # config update takes effect.
    import jax as _jax
    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update("jax_compilation_cache_dir",
                           os.path.expanduser("~/.cache/jax_comp_cache"))
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()
    import jax

    from centerclip_tpu.config import save_hparams
    from centerclip_tpu.data.registry import DATALOADER_DICT
    from centerclip_tpu.models.clip4clip import CLIP4Clip
    from centerclip_tpu.models.tokenizer import SimpleTokenizer
    from centerclip_tpu.train import state as state_mod
    from centerclip_tpu.train.evaluate import Evaluator
    from centerclip_tpu.train.loop import Trainer
    from centerclip_tpu.utils.logging import MetricWriter, setup_logging

    os.makedirs(cfg.output_dir, exist_ok=True)
    setup_logging(os.path.join(cfg.output_dir, "log.txt"),
                  level=logging.INFO, process_index=jax.process_index())
    logger = logging.getLogger("main")
    save_hparams(cfg.output_dir, cfg)
    logger.info("devices: %s, processes: %d", jax.device_count(),
                jax.process_count())

    # fail fast on bad data paths — model init takes minutes, a missing
    # features_path should not cost them
    d = cfg.data
    for label, path, needed in (
            ("features_path", d.features_path, True),
            ("train_csv", d.train_csv, cfg.do_train
             and d.datatype == "msrvtt"),
            ("val_csv", d.val_csv, d.datatype == "msrvtt"),
            ("data_path", d.data_path, d.datatype != "msrvtt"
             or cfg.do_train)):
        if needed and path and not os.path.exists(path):
            raise SystemExit(f"--{label} does not exist: {path}")

    tokenizer = SimpleTokenizer()
    model = CLIP4Clip(cfg.model)

    # ---- dataloaders (main.py:134-153: val falls back to test and
    # vice-versa per registry slots)
    assert cfg.data.datatype in DATALOADER_DICT, cfg.data.datatype
    slots = DATALOADER_DICT[cfg.data.datatype]
    test_fn = slots["test"] if slots["test"] is not None else slots["val"]
    test_loader, test_len = test_fn(cfg, tokenizer)
    logger.info("eval samples: %d", test_len)

    # ---- model init: fresh params, then pretrained CLIP weights when the
    # OpenAI archive is present (clip4clip.py:28-124)
    T, W, R = d.max_frames, d.max_words, d.image_resolution
    dummy = dict(
        input_ids=np.zeros((2, W), np.int32),
        attention_mask=np.ones((2, W), np.int32),
        video=np.zeros((2, 1, T, 3, R, R), np.float32),
        video_mask=np.ones((2, T), np.int32))
    # training=True so similarity-header submodules (seqTransf blocks, cross
    # model) are materialised in the param tree
    params = model.init(jax.random.PRNGKey(cfg.seed), **dummy,
                        training=True)["params"]

    pt_name = {"ViT-B/32": "ViT-B-32.pt", "ViT-B/16": "ViT-B-16.pt"}.get(
        cfg.model.clip_name)
    pretrained = os.path.join(cfg.pretrained_dir, pt_name or "")
    if cfg.init_model:
        params, report = state_mod.import_torch_checkpoint(
            cfg.init_model, cfg.model, init_params=params)
        logger.info("init_model loaded; missing=%d unexpected=%d",
                    len(report["missing"]), len(report["unexpected"]))
    elif pt_name and os.path.exists(pretrained):
        params, report = state_mod.init_from_pretrained_clip(
            pretrained, cfg.model, params,
            temperature_new=cfg.model.temperature_new)
        logger.info("pretrained CLIP loaded from %s; missing=%d",
                    pretrained, len(report["missing"]))
    else:
        logger.warning("no pretrained CLIP found at %s - training from "
                       "scratch", pretrained)

    # Single-process runs shard phase-1 eval encoding over the local data
    # mesh (all chips busy); multi-process runs keep the reference's
    # rank-0-only eval (main.py:232-239) — a global mesh would require every
    # process to participate in each eval dispatch.
    from centerclip_tpu.parallel.mesh import create_mesh, process_barrier
    use_local_mesh = jax.process_count() == 1
    multi_sentence = bool(getattr(test_loader.dataset,
                                  "multi_sentence_per_video", False))
    cut_offs = list(getattr(test_loader.dataset, "cut_off_points", []))

    # ---- eval-only path (main.py:232-239: eval runs on the master rank
    # only; other ranks wait so jax.distributed shuts down cleanly)
    if cfg.do_eval and not cfg.do_train:
        res = None
        if jax.process_index() == 0:
            mesh = (create_mesh(cfg.data_parallel,
                                tensor_parallel=cfg.tensor_parallel)
                    if use_local_mesh else None)
            res = Evaluator(model, params, mesh=mesh).evaluate(
                test_loader, multi_sentence=multi_sentence,
                cut_off_points=cut_offs,
                inference_speed_test=cfg.inference_speed_test)
            logger.info("eval R@1: %.2f", res["R1"])
        process_barrier("eval_only_done")
        return res

    # ---- training path (main.py:244-288)
    train_loader, n_train, sampler = slots["train"](cfg, tokenizer)
    # ceil: the epoch-tail partial accumulator still steps (train/loop.py)
    accum = cfg.optim.gradient_accumulation_steps
    steps_per_epoch = (len(train_loader) + accum - 1) // accum
    total_steps = steps_per_epoch * cfg.epochs
    logger.info("train samples: %d, steps/epoch: %d, total steps: %d",
                n_train, steps_per_epoch, total_steps)

    trainer = Trainer(cfg, model, params, total_steps=total_steps)
    trainer.metric_writer = MetricWriter(
        os.path.join(cfg.output_dir, "tensorboard"))
    # reuse the trainer's mesh for per-epoch eval (one Evaluator for the
    # whole run: its jitted encoders re-trace per instance otherwise)
    evaluator = Evaluator(
        model, trainer.state.params,
        mesh=trainer.mesh if use_local_mesh else None)

    start_epoch, best_r1, best_epoch = 0, 0.0, -1
    if cfg.resume:
        trainer.state, start_epoch, best_r1 = state_mod.resume(
            cfg.resume, trainer.state,
            load_weights_only=cfg.load_from_pretrained)
        logger.info("resumed from %s at epoch %d (best R@1 %.2f)",
                    cfg.resume, start_epoch, best_r1)

    # TP/FSDP/PP shard weights across processes; the rank-0-only
    # eval/export/checkpoint block below then needs host copies gathered by
    # a COLLECTIVE all ranks run (see parallel.mesh.fetch_replicated)
    cross_sharded = jax.process_count() > 1 and (
        cfg.tensor_parallel > 1 or cfg.fsdp
        or cfg.model.pipeline_parallel > 1)

    rng = jax.random.PRNGKey(cfg.seed)
    for epoch in range(start_epoch, cfg.epochs):
        sampler.set_epoch(epoch)
        t0 = time.time()
        loss, gstep = trainer.train_epoch(
            epoch, train_loader, jax.random.fold_in(rng, epoch),
            n_display=cfg.n_display)
        logger.info("Epoch %d/%d done in %.1fs, mean loss %.4f", epoch + 1,
                    cfg.epochs, time.time() - t0, loss)
        state_for_io = trainer.state
        if cross_sharded:
            from centerclip_tpu.parallel.mesh import fetch_replicated
            host = fetch_replicated(
                trainer.mesh, {"params": trainer.state.params,
                               "opt": trainer.state.opt_state})
            state_for_io = trainer.state.replace(
                params=host["params"], opt_state=host["opt"])
        r1 = 0.0
        # the reference evaluates every epoch on the master rank,
        # unconditionally (main.py:250-262; --do_eval is its eval-only-and-
        # exit flag, main.py:232-239)
        if jax.process_index() == 0:
            evaluator.update_params(state_for_io.params)
            res = evaluator.evaluate(
                test_loader, multi_sentence=multi_sentence,
                cut_off_points=cut_offs)
            r1 = res["R1"]
        # ties update best (reference main.py:257 `best_R1 <= R1`): the
        # first eval always writes ckpt_best, later epochs win ties
        is_best = r1 >= best_r1
        if is_best:
            best_r1, best_epoch = r1, epoch
        if jax.process_index() == 0:
            state_mod.save_checkpoint(cfg.output_dir, state_for_io, epoch,
                                      best_r1, is_best=is_best)
            state_mod.export_torch_checkpoint(
                state_for_io.params, cfg.model,
                os.path.join(cfg.output_dir, "ckpt.pth.tar"), epoch=epoch,
                global_step=gstep, best_r1=best_r1)
        # hold non-zero ranks here while rank 0 evaluates/saves: running
        # ahead into the next epoch's collectives (or exiting) desyncs the
        # distributed runtime (see parallel.mesh.process_barrier)
        process_barrier(f"epoch_{epoch}_done")
    logger.info("The best R1 is: %.4f, best_epoch=%d", best_r1, best_epoch)
    return best_r1


if __name__ == "__main__":
    main()
