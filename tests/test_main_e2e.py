# coding=utf-8
"""End-to-end smoke of the main entry point: synthetic MSR-VTT data, tiny
CLIP arch, 1 training epoch + eval + checkpoints, then eval-only reload."""
import json
import os

import numpy as np
import pytest

from centerclip_tpu import config as cfg_mod

TINY = dict(embed_dim=16, image_resolution=32, vision_layers=2,
            vision_width=32, vision_patch_size=16, vision_heads=2,
            context_length=12, vocab_size=49408, transformer_width=32,
            transformer_heads=2, transformer_layers=2)
cfg_mod.CLIP_ARCHS["tiny-e2e"] = TINY


@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt_e2e")
    rng = np.random.default_rng(0)
    vids = [f"video{i}" for i in range(8)]
    (root / "videos").mkdir()
    for i, v in enumerate(vids):
        arr = rng.integers(0, 255, size=(10, 40, 48, 3)).astype(np.uint8)
        np.save(root / "videos" / f"{v}.npy", arr)
    import pandas as pd
    pd.DataFrame({"video_id": vids,
                  "sentence": [f"a clip about thing {i}" for i in
                               range(len(vids))]}).to_csv(
        root / "test.csv", index=False)
    pd.DataFrame({"video_id": vids}).to_csv(root / "train.csv", index=False)
    corpus = {"sentences": [{"video_id": v, "caption": f"{v} doing stuff {j}"}
                            for v in vids for j in range(2)],
              "videos": [{"video_id": v, "url": f"u?v=p{v}"} for v in vids]}
    with open(root / "MSRVTT_data.json", "w") as f:
        json.dump(corpus, f)
    return root


def _argv(root, out, extra=()):
    return [
        "--do_train", "1", "--do_eval", "1",
        "--datatype", "msrvtt",
        "--train_csv", str(root / "train.csv"),
        "--val_csv", str(root / "test.csv"),
        "--data_path", str(root / "MSRVTT_data.json"),
        "--features_path", str(root / "videos"),
        "--video_suffix", ".npy",
        "--output_dir", str(out),
        "--pretrained_clip_name", "tiny-e2e",
        "--max_words", "12", "--max_frames", "4",
        "--batch_size", "8", "--batch_size_val", "4",
        "--epochs", "1", "--optim", "AdamW", "--lr", "1e-3",
        "--loose_type", "--sim_header", "meanP",
        "--expand_msrvtt_sentences",
        "--cluster_inter", "1", "--cluster_algo", "kmediods++",
        "--cluster_num_blocks", "3", "3",
        "--target_frames_blocks", "4", "2",
        "--precision", "fp32",
        "--num_thread_reader", "2",
    ] + list(extra)


@pytest.mark.slow
def test_main_train_then_eval(msrvtt_root, tmp_path):
    import main as main_mod
    out = tmp_path / "out"
    # image_resolution must match the tiny arch
    from centerclip_tpu import cli as cli_mod
    argv = _argv(msrvtt_root, out)
    # patch DataConfig image resolution through the parser default
    import centerclip_tpu.config as C
    best_r1 = _run_with_res(main_mod, argv, 32)
    assert best_r1 is not None
    assert os.path.exists(out / "hparams_train.json")
    assert os.path.exists(out / "ckpt.pth.tar")
    assert os.path.exists(out / "ckpt_0")
    # ties update best (reference main.py:257 `best_R1 <= R1`): even a
    # tiny-model run whose R1 equals the 0.0 initial must write ckpt_best
    assert os.path.exists(out / "ckpt_best")
    assert os.path.exists(out / "log.txt")
    assert os.path.exists(out / "tensorboard" / "scalars.jsonl")

    # eval-only from the exported torch checkpoint
    argv2 = _argv(msrvtt_root, tmp_path / "out2",
                  extra=["--init_model", str(out / "ckpt.pth.tar")])
    argv2[1] = "0"  # do_train off
    res = _run_with_res(main_mod, argv2, 32)
    assert isinstance(res, dict) and 0.0 <= res["R1"] <= 100.0


def _run_with_res(main_mod, argv, resolution):
    """Run main() with the dataset image resolution forced to the tiny
    arch's input size."""
    import centerclip_tpu.cli as cli
    orig = cli.args_to_run_config

    def patched(args):
        cfg = orig(args)
        import dataclasses
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          image_resolution=resolution))

    cli.args_to_run_config = patched
    try:
        return main_mod.main(argv)
    finally:
        cli.args_to_run_config = orig


def test_cli_default_ships_uint8(msrvtt_root, tmp_path):
    """The CLI-default pipeline (raw_pixels=1) must deliver uint8 video
    batches end-to-end — the torch-ckpt eval in test_main_train_then_eval
    therefore runs on uint8 input; this pins the dtype explicitly."""
    from centerclip_tpu import cli
    from centerclip_tpu.data.registry import DATALOADER_DICT
    from centerclip_tpu.models.tokenizer import SimpleTokenizer
    cfg = cli.parse_args(_argv(msrvtt_root, tmp_path / "o"))
    assert cfg.data.raw_pixels
    loader, _ = DATALOADER_DICT["msrvtt"]["val"](cfg, SimpleTokenizer())
    batch = next(iter(loader))
    assert batch["video"].dtype == np.uint8


def test_main_with_framestore_fast_path(msrvtt_root, tmp_path):
    """--features_path pointing at a .fstore engages the native batched
    gather + on-device normalization path through the CLI."""
    from centerclip_tpu.data.native import native_available
    if not native_available():
        import pytest
        pytest.skip("native library not built")
    import numpy as np
    from centerclip_tpu.data.framestore import build_framestore
    rng = np.random.default_rng(3)
    vids = {f"video{i}": rng.integers(0, 255, size=(10, 40, 48, 3)).astype(
        np.uint8) for i in range(8)}
    store = build_framestore(vids, str(tmp_path / "msrvtt.fstore"))

    import main as main_mod
    argv = _argv(msrvtt_root, tmp_path / "out_fs")
    # swap the features path for the framestore
    i = argv.index("--features_path")
    argv[i + 1] = store
    best_r1 = _run_with_res(main_mod, argv, 32)
    assert best_r1 is not None
