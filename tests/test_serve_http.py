# coding=utf-8
"""HTTP serving daemon: the JSON API over a live socket must return exactly
what `RetrievalEngine.search` returns (which tests/test_serve.py pins to the
batch Evaluator), plus the error contract a network caller relies on."""
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.test_serve import _init_engine_model, make_batch
from centerclip_tpu.serve import RetrievalEngine
from centerclip_tpu.serve.http import (MAX_QUERIES_PER_REQUEST,
                                       RetrievalServer)


def _build_engine(rng):
    run, model, params = _init_engine_model(rng)
    engine = RetrievalEngine(model, params)
    batches = [make_batch(np.random.default_rng(s), 8) for s in range(2)]
    engine.build_index(
        ({"video": b["video"], "video_mask": b["video_mask"]}
         for b in batches), [f"v{i}" for i in range(16)])
    return engine


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, body, raw=None):
    data = raw if raw is not None else json.dumps(body).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server():
    engine = _build_engine(np.random.default_rng(42))
    srv = RetrievalServer(engine, port=0, default_k=3).start()
    yield srv
    srv.stop()


def _base(server):
    return "http://%s:%d" % server.address


def test_healthz(server):
    code, body = _get(_base(server) + "/healthz")
    assert code == 200
    assert body["ok"] is True and body["videos"] == 16
    assert body["dim"] == server.engine.index.dim
    assert body["quantize"] == "float32"
    assert body["sim_header"] == "meanP"


def test_search_matches_engine(server):
    queries = ["a man cooking in a kitchen", "a dog running"]
    code, body = _post(_base(server) + "/search",
                       {"queries": queries, "k": 4})
    assert code == 200 and body["took_ms"] > 0
    direct = server.engine.search(queries, k=4)
    assert len(body["results"]) == 2
    for got, want in zip(body["results"], direct):
        assert [r["video_id"] for r in got] == [r["video_id"] for r in want]
        np.testing.assert_allclose([r["score"] for r in got],
                                   [r["score"] for r in want], rtol=1e-5)
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True)


def test_search_defaults_and_string_query(server):
    # bare string + omitted k -> default_k results
    code, body = _post(_base(server) + "/search", {"queries": "hello world"})
    assert code == 200
    assert len(body["results"]) == 1 and len(body["results"][0]) == 3


def test_error_contract(server):
    base = _base(server)
    assert _get(base + "/nope")[0] == 404
    assert _post(base + "/nope", {})[0] == 404
    # malformed bodies -> 400 with an "error" field
    for bad in ({}, {"queries": []}, {"queries": [1, 2]},
                {"queries": ["q"], "k": 0}, {"queries": ["q"], "k": "3"},
                {"queries": ["q"], "k": True},  # bool subclasses int
                {"queries": ["q"] * (MAX_QUERIES_PER_REQUEST + 1)}):
        code, body = _post(base + "/search", bad)
        assert code == 400 and "error" in body, bad
    code, body = _post(base + "/search", None, raw=b"[1, 2]")
    assert code == 400
    code, body = _post(base + "/search", None, raw=b"not json {")
    assert code in (400, 500) and "error" in body
    # oversized body -> 413 before any parse; the server replies without
    # reading and closes the connection, so a client mid-send may get a
    # socket error rather than the status — both are a valid rejection
    try:
        code, body = _post(base + "/search", None,
                           raw=b" " * ((1 << 20) + 1))
        assert code == 413
    except urllib.error.URLError:
        pass


def test_concurrent_clients(server):
    """N threads hitting /search at once: the engine lock serialises device
    dispatch, every request succeeds, results equal the single-client
    answer (no cross-request state)."""
    import threading
    queries = [f"query number {i}" for i in range(6)]
    want = [server.engine.search([q], k=3) for q in queries]
    out = [None] * len(queries)

    def hit(i):
        code, body = _post(_base(server) + "/search",
                           {"queries": [queries[i]], "k": 3})
        out[i] = (code, body)

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, (code, body) in enumerate(out):
        assert code == 200, (i, body)
        got = body["results"][0]
        assert [r["video_id"] for r in got] == \
            [r["video_id"] for r in want[i][0]]


def test_warmup_and_requires_index(server, rng):
    assert server.warmup(max_queries=2) >= 1
    run, model, params = _init_engine_model(rng)
    with pytest.raises(ValueError, match="no index"):
        RetrievalServer(RetrievalEngine(model, params), port=0)
