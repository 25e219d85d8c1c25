"""HTTP serving layer: the JSON API over Retriever (ance_tpu/serve_http.py).

Runs a real ThreadingHTTPServer on an ephemeral port and talks to it with
urllib — no device, the encoder is the same IdentityEncoder double the batch
serve tests use."""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.serve import Retriever
from ance_tpu.serve_http import RetrieverHTTPServer


class IdentityEncoder:
    def __call__(self, params, ids, mask):
        return jax.nn.one_hot(ids[:, 1], 8)


class Tok:
    pad_token_id = 0

    def encode(self, text, add_special_tokens=True, max_length=None):
        return [2, 3 if "cat" in text else 5][:max_length]


@pytest.fixture(scope="module")
def server():
    corpus = np.eye(8, dtype=np.float32)
    index = FlatIPIndex(dim=8, method="scan")
    index.add(corpus)
    r = Retriever(IdentityEncoder(), params=None, index=index,
                  tokenizer=Tok(), max_query_length=4)
    srv = RetrieverHTTPServer(r, host="127.0.0.1", port=0,
                              pid_space="offset", max_batch=16).start()
    yield srv
    srv.shutdown()


def _post(srv, path, payload, as_bytes=None):
    host, port = srv.address
    req = urllib.request.Request(
        f"http://{host}:{port}{path}",
        data=as_bytes if as_bytes is not None
        else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


def _get(srv, path):
    host, port = srv.address
    with urllib.request.urlopen(f"http://{host}:{port}{path}",
                                timeout=10) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server):
    status, body = _get(server, "/healthz")
    assert status == 200
    assert body["status"] == "ok" and body["ntotal"] == 8
    assert body["pid_space"] == "offset"


def test_search_tokens_matches_direct_call(server):
    ids = np.zeros((2, 4), np.int32)
    ids[0, 1], ids[1, 1] = 3, 5
    status, body = _post(server, "/search",
                         {"ids": ids.tolist(),
                          "mask": np.ones_like(ids).tolist(), "k": 2})
    assert status == 200
    want_scores, want_pids = server.retriever.search_tokens(
        ids, np.ones_like(ids), 2)
    got = body["results"]
    assert [r[0]["pid"] for r in got] == [3, 5]
    for row, ws, wp in zip(got, want_scores, want_pids):
        assert [e["pid"] for e in row] == [int(p) for p in wp if p >= 0]
        np.testing.assert_allclose([e["score"] for e in row],
                                   [s for s, p in zip(ws, wp) if p >= 0],
                                   rtol=1e-6)
    assert body["latency_ms"] >= 0


def test_search_text_queries(server):
    status, body = _post(server, "/search",
                         {"queries": ["a cat", "a dog"], "k": 1})
    assert status == 200
    assert [r[0]["pid"] for r in body["results"]] == [3, 5]


def test_mask_defaults_to_pad_id(server):
    ids = np.zeros((1, 4), np.int32)
    ids[0, 1] = 7
    status, body = _post(server, "/search", {"ids": ids.tolist(), "k": 1})
    assert status == 200
    assert body["results"][0][0]["pid"] == 7


def test_mask_default_respects_roberta_pad_one():
    """pad_token_id=1 (roberta/SEED): a defaulted mask must mask 1s, not
    0s — `ids != 0` would count padding as real tokens."""
    class PadOneTok(Tok):
        pad_token_id = 1

    seen = {}

    class SpyEncoder(IdentityEncoder):
        def __call__(self, params, ids, mask):
            seen["mask"] = np.asarray(mask).copy()
            return super().__call__(params, ids, mask)

    index = FlatIPIndex(dim=8, method="scan")
    index.add(np.eye(8, dtype=np.float32))
    r = Retriever(SpyEncoder(), None, index, tokenizer=PadOneTok(),
                  max_query_length=4)
    srv = RetrieverHTTPServer(r, port=0).start()
    try:
        ids = np.ones((1, 4), np.int32)
        ids[0, 1] = 7
        _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        np.testing.assert_array_equal(seen["mask"], [[0, 1, 0, 0]])
    finally:
        srv.shutdown()


def test_bad_requests(server):
    for payload, match in [
            ({"k": 0, "queries": ["x"]}, "k must be"),
            ({"k": True, "queries": ["x"]}, "k must be"),  # bool ⊂ int
            ({"queries": []}, "non-empty"),
            ({"k": 3}, "need 'queries'"),
            ({"ids": [[1, 2]], "mask": [[1]]}, "equal-shape"),
            ({"queries": ["x"] * 17}, "max_batch"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server, "/search", payload)
        assert exc.value.code == 400
        assert match in json.loads(exc.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, "/search", None, as_bytes=b"{not json")
    assert exc.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server, "/nope")
    assert exc.value.code == 404


def test_pad_id_arg_wins_without_tokenizer():
    """Tokenizer-less mode (cli --http degradation): the MODEL's pad id,
    passed explicitly, drives the defaulted mask."""
    seen = {}

    class SpyEncoder(IdentityEncoder):
        def __call__(self, params, ids, mask):
            seen["mask"] = np.asarray(mask).copy()
            return super().__call__(params, ids, mask)

    index = FlatIPIndex(dim=8, method="scan")
    index.add(np.eye(8, dtype=np.float32))
    r = Retriever(SpyEncoder(), None, index)  # no tokenizer
    srv = RetrieverHTTPServer(r, port=0, pad_token_id=1).start()
    try:
        ids = np.ones((1, 4), np.int32)
        ids[0, 1] = 7
        _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        np.testing.assert_array_equal(seen["mask"], [[0, 1, 0, 0]])
    finally:
        srv.shutdown()


def test_operator_topk_above_max_k_is_honored():
    index = FlatIPIndex(dim=8, method="scan")
    index.add(np.eye(8, dtype=np.float32))
    r = Retriever(IdentityEncoder(), None, index)
    srv = RetrieverHTTPServer(r, port=0, default_k=2000, max_k=1000).start()
    try:
        status, body = _get(srv, "/healthz")
        assert body["max_k"] == 2000
        ids = np.zeros((1, 4), np.int32)
        status, body = _post(srv, "/search", {"ids": ids.tolist()})
        assert status == 200 and body["k"] == 2000
    finally:
        srv.shutdown()


def test_metrics_endpoint():
    index = FlatIPIndex(dim=8, method="scan")
    index.add(np.eye(8, dtype=np.float32))
    r = Retriever(IdentityEncoder(), None, index)
    srv = RetrieverHTTPServer(r, port=0).start()
    try:
        ids = np.zeros((3, 4), np.int32)
        _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        with pytest.raises(urllib.error.HTTPError):
            _post(srv, "/search", {"k": 1})  # counted as an error
        status, m = _get(srv, "/metrics")
        assert status == 200
        # requests counts EVERY POST (errors included) so errors/requests
        # is a valid rate
        assert m["requests"] == 3 and m["queries"] == 6
        assert m["errors"] == 1 and m["latency_ms_ewma"] > 0
        # lock-wait accounting: present, finite, and only counts QUEUED
        # time (uncontended searches ≈ 0, never negative)
        assert m["lock_wait_ms_total"] >= 0.0
    finally:
        srv.shutdown()


def test_metrics_lock_wait_counts_contention():
    """lock_wait_ms_total grows when concurrent requests queue on the
    device lock (a retriever that holds the device for 30 ms forces the
    second of two simultaneous requests to wait)."""
    import threading as _threading

    class SlowRetriever:
        tokenizer = None
        index = FlatIPIndex(dim=8, method="scan")

        def __init__(self):
            self.index.add(np.eye(8, dtype=np.float32))
            self.embedding2id = None

        def search_tokens(self, ids, mask, k):
            time.sleep(0.03)
            return (np.zeros((len(ids), k), np.float32),
                    np.zeros((len(ids), k), np.int64))

    srv = RetrieverHTTPServer(SlowRetriever(), port=0).start()
    try:
        ids = np.zeros((1, 4), np.int32)
        threads = [_threading.Thread(target=_post, args=(
            srv, "/search", {"ids": ids.tolist(), "k": 1}))
            for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        _, m = _get(srv, "/metrics")
        # 4 requests serialized behind a 30 ms device hold: the last one
        # queued ~90 ms, total wait >= ~(1+2+3)*30 ms minus scheduling slop
        assert m["lock_wait_ms_total"] > 30.0
    finally:
        srv.shutdown()


def test_reload_hot_swaps_saved_index(tmp_path):
    """POST /reload swaps in a saved index + sidecar without a restart;
    disabled unless the server was constructed with allow_reload."""
    def saved(path, n):
        idx = FlatIPIndex(dim=8, method="scan")
        idx.add(np.eye(8, dtype=np.float32)[:n])
        idx.save(str(path))
        np.save(str(path) + ".ids.npy",
                np.arange(100, 100 + n, dtype=np.int64))
        return str(path)

    p_small = saved(tmp_path / "idx_small", 4)
    p_full = saved(tmp_path / "idx_full", 8)

    index = FlatIPIndex.load(p_small)
    r = Retriever(IdentityEncoder(), None, index,
                  embedding2id=np.arange(100, 104, dtype=np.int64))
    srv = RetrieverHTTPServer(r, port=0, allow_reload=True).start()
    try:
        ids = np.zeros((1, 4), np.int32)
        ids[0, 1] = 7  # row 7 exists only in the full index
        _, body = _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        assert body["results"][0][0]["pid"] != 107  # not present yet

        status, rep = _post(srv, "/reload", {"index": p_full})
        assert status == 200 and rep["ntotal"] == 8
        assert rep["kind"] == "flat"
        _, m = _get(srv, "/metrics")
        assert m["reloads"] == 1
        _, h = _get(srv, "/healthz")
        assert h["ntotal"] == 8
        _, body = _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        assert body["results"][0][0]["pid"] == 107

        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv, "/reload", {"index": str(tmp_path / "missing")})
        assert exc.value.code == 400
    finally:
        srv.shutdown()

    # default-off servers refuse
    srv2 = RetrieverHTTPServer(r, port=0).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv2, "/reload", {"index": p_full})
        assert exc.value.code == 400
        assert "disabled" in json.loads(exc.value.read())["error"]
    finally:
        srv2.shutdown()


def test_reload_npz_path_gap_mode_and_dim_guard(tmp_path):
    """Reload edges: (a) the '.npz' path the save CLI prints works — the
    sidecar lookup must strip the suffix; (b) {'gap': true} releases the
    old index before loading (no 2x HBM headroom needed) and still swaps
    correctly; (c) a wrong-dimension artifact is rejected with 400 BEFORE
    the swap, instead of 500ing every later /search."""
    def saved(path, n, dim=8):
        idx = FlatIPIndex(dim=dim, method="scan")
        idx.add(np.eye(max(8, dim), dtype=np.float32)[:n, :dim].copy())
        idx.save(str(path))
        np.save(str(path) + ".ids.npy",
                np.arange(300, 300 + n, dtype=np.int64))
        return str(path)

    p_a = saved(tmp_path / "idx_a", 8)
    p_b = saved(tmp_path / "idx_b", 6)
    p_wrong = saved(tmp_path / "idx_wrong", 6, dim=4)

    r = Retriever(IdentityEncoder(), None, FlatIPIndex.load(p_a),
                  embedding2id=np.arange(300, 308, dtype=np.int64))
    srv = RetrieverHTTPServer(r, port=0, allow_reload=True).start()
    try:
        # (a) POST the artifact WITH its .npz suffix, as the CLI prints it
        status, rep = _post(srv, "/reload", {"index": p_b + ".npz"})
        assert status == 200 and rep["ntotal"] == 6

        # (c) wrong dim: rejected up front, old index keeps serving
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv, "/reload", {"index": p_wrong})
        assert exc.value.code == 400
        assert "dim" in json.loads(exc.value.read())["error"]
        _, h = _get(srv, "/healthz")
        assert h["ntotal"] == 6  # the p_b index is still live

        # (b) gap mode: release-then-load, search works after
        status, rep = _post(srv, "/reload", {"index": p_a, "gap": True})
        assert status == 200 and rep["ntotal"] == 8
        ids = np.zeros((1, 4), np.int32)
        ids[0, 1] = 7
        _, body = _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        assert body["results"][0][0]["pid"] == 307
    finally:
        srv.shutdown()


def test_search_batch_and_k_bucketing(server):
    """Client-visible behavior is unchanged by the compile-shape buckets:
    an odd batch width returns exactly that many result rows (padding rows
    stripped, metrics count only real queries), and a non-power-of-two k
    returns exactly k-capped results identical to the direct call."""
    _, m0 = _get(server, "/metrics")
    ids = np.zeros((3, 4), np.int32)  # buckets to 4 internally
    ids[0, 1], ids[1, 1], ids[2, 1] = 1, 5, 7
    status, body = _post(server, "/search",
                         {"ids": ids.tolist(), "k": 3})  # depth buckets to 4
    assert status == 200 and len(body["results"]) == 3
    assert [r[0]["pid"] for r in body["results"]] == [1, 5, 7]
    assert all(len(r) <= 3 for r in body["results"])
    want_s, want_p = server.retriever.search_tokens(
        ids, (ids != 0).astype(np.int32), 3)
    for row, wp in zip(body["results"], want_p):
        assert [e["pid"] for e in row] == [int(p) for p in wp if p >= 0]
    _, m1 = _get(server, "/metrics")
    assert m1["queries"] - m0["queries"] == 3  # padding rows not counted


def test_reload_resets_pid_space_and_keeps_mesh(tmp_path):
    """The reload sidecar contract is REAL pids: a server started in
    pid_space='offset' must report 'real' after a swap, and a mesh-sharded
    index must come back sharded over the SAME mesh, not single-device."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    idx = FlatIPIndex(dim=8, method="scan", mesh=mesh)
    idx.add(np.eye(8, dtype=np.float32))
    idx.save(str(tmp_path / "idx"))
    np.save(str(tmp_path / "idx") + ".ids.npy",
            np.arange(200, 208, dtype=np.int64))

    r = Retriever(IdentityEncoder(), None, idx,
                  embedding2id=np.arange(8, dtype=np.int64))
    srv = RetrieverHTTPServer(r, port=0, pid_space="offset",
                              allow_reload=True).start()
    try:
        _, h = _get(srv, "/healthz")
        assert h["pid_space"] == "offset"
        status, rep = _post(srv, "/reload", {"index": str(tmp_path / "idx")})
        assert status == 200
        _, h = _get(srv, "/healthz")
        assert h["pid_space"] == "real"
        assert r.index.mesh is mesh and r.index.axis == "data"
        # and searches now resolve through the sidecar's real pids
        ids = np.zeros((1, 4), np.int32)
        ids[0, 1] = 3
        _, body = _post(srv, "/search", {"ids": ids.tolist(), "k": 1})
        assert body["results"][0][0]["pid"] == 203
    finally:
        srv.shutdown()


def test_healthz_503_while_loop_index_not_built():
    """GET handlers are exception-guarded: a LoopRetriever before bootstrap
    yields a JSON 503 'starting', not a dead handler thread and a client
    connection reset."""
    class _Stub:
        tokenizer = None

        @property
        def index(self):
            raise RuntimeError("loop index not built yet")

    srv = RetrieverHTTPServer(_Stub(), port=0).start()
    try:
        host, port = srv.address
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"http://{host}:{port}/healthz",
                                   timeout=10)
        assert exc.value.code == 503
        assert json.loads(exc.value.read())["status"] == "starting"
    finally:
        srv.shutdown()


def test_concurrent_requests_serialize_on_device_lock(server):
    """Parallel clients get consistent, complete answers (device work is
    lock-serialized; HTTP threads overlap only host-side)."""
    import concurrent.futures as cf

    def one(i):
        ids = np.zeros((1, 4), np.int32)
        ids[0, 1] = i % 8
        _, body = _post(server, "/search", {"ids": ids.tolist(), "k": 1})
        return body["results"][0][0]["pid"]

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(one, range(24)))
    assert got == [i % 8 for i in range(24)]
