# coding=utf-8
"""Serve CLI end-to-end: build a quantised gallery index from the synthetic
MSR-VTT dataset through the real data registry, then answer text queries
from the saved index — the deployment path a reference user gets on top of
batch eval (reference main.py:381-534)."""
import json
import os
from contextlib import contextmanager

import numpy as np

from tests.test_main_e2e import msrvtt_root  # noqa: F401 (fixture)


@contextmanager
def _res32():
    """Force the dataset image resolution to the tiny arch's input size
    (same trick as tests/test_main_e2e._run_with_res)."""
    import dataclasses
    import centerclip_tpu.cli as cli
    orig = cli.args_to_run_config

    def patched(args):
        cfg = orig(args)
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, image_resolution=32))

    cli.args_to_run_config = patched
    try:
        yield
    finally:
        cli.args_to_run_config = orig


def _flags(root, out):
    return [
        "--datatype", "msrvtt",
        "--train_csv", str(root / "train.csv"),
        "--val_csv", str(root / "test.csv"),
        "--data_path", str(root / "MSRVTT_data.json"),
        "--features_path", str(root / "videos"),
        "--video_suffix", ".npy",
        "--output_dir", str(out),
        "--pretrained_clip_name", "tiny-e2e",
        "--max_words", "12", "--max_frames", "4",
        "--batch_size_val", "3",  # 8 videos -> ragged tail batch of 2
        "--loose_type", "--sim_header", "meanP",
        "--cluster_inter", "1", "--cluster_algo", "kmediods++",
        "--cluster_num_blocks", "3", "3",
        "--target_frames_blocks", "4", "2",
        "--precision", "fp32",
        "--num_thread_reader", "0",
    ]


def test_serve_cli_build_then_query(msrvtt_root, tmp_path, capsys):  # noqa: F811
    from centerclip_tpu.serve import cli as serve_cli
    from centerclip_tpu.serve.index import VideoIndex

    idx_path = str(tmp_path / "gallery.npz")
    flags = _flags(msrvtt_root, tmp_path / "out")
    with _res32():
        index = serve_cli.main(
            ["build", "--index_path", idx_path, "--quantize", "int8"]
            + flags)
    assert os.path.exists(idx_path)
    assert len(index) == 8 and index.quantize == "int8"
    assert index.video_ids == [f"video{i}" for i in range(8)]
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["videos"] == 8 and built["quantize"] == "int8"

    with _res32():
        results = serve_cli.main(
            ["query", "--index_path", idx_path, "--topk", "3",
             "--query", "a person cooking in a kitchen",
             "--query", "someone driving a car"] + flags)
    out_lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
    assert len(results) == 2 and len(out_lines) == 2
    for line, ranked in zip(out_lines, results):
        assert len(ranked) == 3
        ids = [r["video_id"] for r in ranked]
        assert set(ids) <= {f"video{i}" for i in range(8)}
        scores = [r["score"] for r in ranked]
        assert scores == sorted(scores, reverse=True)
        assert [r["video_id"] for r in line["results"]] == ids

    # the saved index round-trips standalone
    loaded = VideoIndex.load(idx_path)
    assert loaded.video_ids == index.video_ids


def test_serve_cli_build_query_ivf(msrvtt_root, tmp_path, capsys):  # noqa: F811
    """--index_type ivf end-to-end: build a cluster-pruned index from the
    dataset, reload it through the meta dispatcher, answer queries."""
    from centerclip_tpu.serve import cli as serve_cli
    from centerclip_tpu.serve.index import VideoIndex, load_index
    from centerclip_tpu.serve.ivf import IVFVideoIndex

    idx_path = str(tmp_path / "gallery_ivf.npz")
    flags = _flags(msrvtt_root, tmp_path / "out")
    with _res32():
        index = serve_cli.main(
            ["build", "--index_path", idx_path, "--index_type", "ivf",
             "--n_clusters", "4", "--nprobe", "4", "--quantize", "int8"]
            + flags)
    assert isinstance(index, IVFVideoIndex)
    assert index.n_clusters == 4 and len(index) == 8
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["index_type"] == "ivf"

    with _res32():
        results = serve_cli.main(
            ["query", "--index_path", idx_path, "--topk", "3",
             "--query", "a person cooking in a kitchen"] + flags)
    assert len(results) == 1 and len(results[0]) == 3
    assert all(r["video_id"].startswith("video") for r in results[0])

    # the meta dispatcher picks the right class; the flat loader refuses
    assert isinstance(load_index(idx_path), IVFVideoIndex)
    import pytest
    with pytest.raises(ValueError, match="load_index"):
        VideoIndex.load(idx_path)


def test_serve_cli_http_daemon(msrvtt_root, tmp_path, capsys, monkeypatch):  # noqa: F811
    """`serve` command: load index, bind, warm up, answer a live request."""
    import urllib.request
    from centerclip_tpu.serve import cli as serve_cli
    from centerclip_tpu.serve.http import RetrievalServer

    idx_path = str(tmp_path / "gallery.npz")
    flags = _flags(msrvtt_root, tmp_path / "out")
    with _res32():
        serve_cli.main(
            ["build", "--index_path", idx_path, "--quantize", "int8"]
            + flags)
    capsys.readouterr()

    # serve_forever blocks; run the request inside it instead
    def fake_serve_forever(self):
        url = "http://%s:%d/search" % self.address
        req = urllib.request.Request(
            url, data=json.dumps({"queries": ["a person cooking"],
                                  "k": 2}).encode(),
            headers={"Content-Type": "application/json"})
        self._httpd.timeout = 1
        import threading
        out = {}

        def ask():
            with urllib.request.urlopen(req, timeout=60) as resp:
                out["body"] = json.loads(resp.read())
        t = threading.Thread(target=ask)
        t.start()
        while t.is_alive():
            self._httpd.handle_request()
        t.join()
        fake_serve_forever.body = out["body"]

    monkeypatch.setattr(RetrievalServer, "serve_forever", fake_serve_forever)
    with _res32():
        server = serve_cli.main(
            ["serve", "--index_path", idx_path, "--port", "0",
             "--topk", "3"] + flags)
    assert isinstance(server, RetrievalServer)
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["videos"] == 8 and line["listening"].startswith("http://")
    ranked = fake_serve_forever.body["results"][0]
    assert len(ranked) == 2
    assert all(r["video_id"].startswith("video") for r in ranked)
    server._httpd.server_close()


def test_gallery_batches_multi_sentence_dedupe():
    """Multi-sentence filtering + re-batching: unique videos at cut-offs,
    full-width batches, ragged tail."""
    from centerclip_tpu.serve.cli import gallery_batches, gallery_video_ids

    # 3 videos with 2/3/2 captions -> cut_off_points [2, 5, 7]
    cuts = [2, 5, 7]
    rows = 7
    video = np.arange(rows, dtype=np.float32).reshape(rows, 1, 1, 1, 1, 1)
    batches = [  # loader batch size 3 -> batches of 3, 3, 1 rows
        {"video": video[s:s + 3],
         "video_mask": np.ones((min(3, rows - s), 2), np.int32)}
        for s in range(0, rows, 3)]
    out = list(gallery_batches(batches, True, cuts, batch_size=2))
    got = np.concatenate([b["video"] for b in out]).ravel()
    # rows 1, 4, 6 are the last caption of each video
    np.testing.assert_array_equal(got, [1.0, 4.0, 6.0])
    assert [b["video_mask"].shape[0] for b in out] == [2, 1]

    class DS:
        sentences_dict = {i: (f"vid{v}", "cap") for i, v in
                          enumerate([0, 0, 1, 1, 1, 2, 2])}

        def __len__(self):
            return 7

    assert gallery_video_ids(DS(), True, cuts) == ["vid0", "vid1", "vid2"]
    assert gallery_video_ids(DS(), False, cuts)[:3] == ["vid0", "vid0",
                                                        "vid1"]
