# coding=utf-8
"""URL/file cache machinery (utils/file_cache.py) vs the reference's
semantics (modules/file.py, modules/base.py:34-70).  HTTP paths are driven
against a localhost server (no egress needed)."""
import io
import json
import os
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from centerclip_tpu.utils.file_cache import (
    cached_path, filename_to_url, get_file_extension, get_from_cache,
    read_set_from_file, resolve_archive_dir, split_s3_path, url_to_filename)


# ------------------------------------------------------------- pure helpers
def test_url_to_filename_repeatable_and_etag_suffixed():
    a = url_to_filename("http://x/y")
    assert a == url_to_filename("http://x/y")
    b = url_to_filename("http://x/y", etag='"abc"')
    assert b.startswith(a + ".") and b != a


def test_split_s3_path():
    assert split_s3_path("s3://bucket/a/b.txt") == ("bucket", "a/b.txt")
    with pytest.raises(ValueError):
        split_s3_path("s3://bucket-only")


def test_get_file_extension():
    assert get_file_extension("a/b/C.NPY") == ".npy"
    assert get_file_extension("a/b/C.NPY", dot=False, lower=False) == "NPY"


def test_read_set_from_file(tmp_path):
    p = tmp_path / "skip.txt"
    p.write_text("vid1\nvid2\nvid1\n")
    assert read_set_from_file(p) == {"vid1", "vid2"}


# ---------------------------------------------------------- local resolution
def test_cached_path_local_passthrough(tmp_path):
    f = tmp_path / "weights.pt"
    f.write_bytes(b"x")
    assert cached_path(f) == str(f)
    with pytest.raises(FileNotFoundError):
        cached_path(tmp_path / "missing.pt")
    with pytest.raises(ValueError):
        cached_path("gopher://weird/scheme")


# ------------------------------------------------------------- http caching
class _Handler(BaseHTTPRequestHandler):
    payload = b"payload-v1"
    etag = '"etag-1"'
    hits = {"GET": 0, "HEAD": 0}

    def _serve(self, body: bool):
        type(self).hits[self.command] += 1
        self.send_response(200)
        self.send_header("ETag", type(self).etag)
        self.send_header("Content-Length", str(len(type(self).payload)))
        self.end_headers()
        if body:
            self.wfile.write(type(self).payload)

    def do_GET(self):
        self._serve(body=True)

    def do_HEAD(self):
        self._serve(body=False)

    def log_message(self, *a):
        pass


@pytest.fixture()
def http_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.hits = {"GET": 0, "HEAD": 0}
    _Handler.payload, _Handler.etag = b"payload-v1", '"etag-1"'
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_get_from_cache_downloads_once_per_etag(http_server, tmp_path):
    url = http_server + "/model.bin"
    p1 = get_from_cache(url, cache_dir=tmp_path)
    assert open(p1, "rb").read() == b"payload-v1"
    # sidecar metadata roundtrip (file.py:47-70)
    assert filename_to_url(os.path.basename(p1), tmp_path) == (url, '"etag-1"')
    # second resolve: HEAD only, no re-download
    p2 = cached_path(url, cache_dir=tmp_path)
    assert p2 == p1 and _Handler.hits["GET"] == 1
    # remote object changed -> new etag -> new cache entry
    _Handler.payload, _Handler.etag = b"payload-v2", '"etag-2"'
    p3 = cached_path(url, cache_dir=tmp_path)
    assert p3 != p1 and open(p3, "rb").read() == b"payload-v2"


def test_get_from_cache_heals_missing_sidecar(http_server, tmp_path):
    """An interrupt used to leave a payload without its .json sidecar, making
    filename_to_url raise forever (ADVICE r2); now the sidecar is written
    before the payload is published AND a missing one is re-created."""
    url = http_server + "/model.bin"
    p1 = get_from_cache(url, cache_dir=tmp_path)
    os.unlink(p1 + ".json")  # simulate the legacy interrupted state
    p2 = get_from_cache(url, cache_dir=tmp_path)
    assert p2 == p1 and _Handler.hits["GET"] == 1  # no re-download
    assert filename_to_url(os.path.basename(p1), tmp_path) == (url, '"etag-1"')


# ----------------------------------------------------------------- archives
def _make_targz(tmp_path, name="arch.tar.gz"):
    cfg = {"hidden_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "vocab_size": 512}
    raw = json.dumps(cfg).encode()
    arch = tmp_path / name
    with tarfile.open(arch, "w:gz") as tf:
        info = tarfile.TarInfo("cross_config.json")
        info.size = len(raw)
        tf.addfile(info, io.BytesIO(raw))
    return arch, cfg


def test_resolve_archive_dir_extracts_and_dir_passthrough(tmp_path):
    arch, cfg = _make_targz(tmp_path)
    d, tempdir = resolve_archive_dir(arch)
    assert tempdir == d
    assert json.load(open(os.path.join(d, "cross_config.json"))) == cfg
    # a directory resolves to itself with no tempdir (base.py:60-62)
    d2, t2 = resolve_archive_dir(tmp_path)
    assert (d2, t2) == (str(tmp_path), None)


# ------------------------------------------------- CrossConfig.get_config
def test_cross_config_shipped_name_and_overrides():
    from centerclip_tpu.models.cross import CrossConfig
    cfg = CrossConfig.get_config("cross-base")
    assert cfg == CrossConfig()  # shipped JSON matches dataclass defaults
    cfg2 = CrossConfig.get_config("cross-base", hidden_size=640,
                                  num_hidden_layers=2)
    assert (cfg2.hidden_size, cfg2.num_hidden_layers) == (640, 2)
    assert cfg2.num_attention_heads == 8


def test_cross_config_from_targz(tmp_path):
    from centerclip_tpu.models.cross import CrossConfig
    arch, _ = _make_targz(tmp_path)
    cfg = CrossConfig.get_config(str(arch))
    assert (cfg.hidden_size, cfg.num_hidden_layers) == (256, 2)
    # unknown keys in the JSON are ignored, defaults fill the rest
    assert cfg.intermediate_size == 2048
