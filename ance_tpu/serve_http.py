"""HTTP serving: the online face of :class:`ance_tpu.serve.Retriever`.

The reference frames ANCE as a production retrieval stage (~100× cheaper
than a BERT rerank cascade, reference README.md:16-17) but ships only batch
drivers; this exposes the frozen-encoder + HBM-resident-index pair behind a
minimal JSON API — stdlib only (http.server), no new dependencies, suitable
for sidecar deployment behind a real load balancer.

API:
  GET  /healthz            → {"status": "ok", "ntotal": N, "pid_space": ...}
  GET  /metrics            → {"requests": n, "queries": n, "errors": n,
                              "latency_ms_ewma": t,
                              "lock_wait_ms_total": t} — lock_wait is time
                           requests spent QUEUED on the device lock: the
                           contention signal to scale out on (chip busy),
                           distinct from per-request device latency
  POST /search             body {"queries": ["text", ...], "k": 10}
                           or  {"ids": [[...]], "mask": [[...]], "k": 10}
                           → {"results": [[{"pid": p, "score": s}, ...] per
                              query], "k": k, "latency_ms": t}
  POST /reload             body {"index": "/path/saved_index"} — hot-swap a
                           saved index (+ its .ids.npy sidecar) under the
                           device lock: refresh without dropping the server
                           (only enabled when constructed with
                           ``allow_reload=True``; the CLI sets it). Hot
                           mode needs 2× index HBM headroom;
                           {"gap": true} releases the old index first
                           (searches queue during the load) for
                           full-corpus-scale indexes.

Requests are batches — the TPU's throughput comes from batch width (measured
serve-path knee: 902 qps @ b64 → 6,674 qps @ b2048, docs/perf_serve_r4.py) —
so a client should pack queries per call. Device work is serialized with a
lock: one chip, one in-flight batch; HTTP threads only overlap host-side
parsing/tokenization.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

MAX_BODY_BYTES = 64 * 1024 * 1024


class RetrieverHTTPServer:
    """Wraps a :class:`~ance_tpu.serve.Retriever` in a ThreadingHTTPServer.

    ``serve_forever`` blocks (CLI use); ``start``/``shutdown`` run it on a
    daemon thread (tests, embedding in another process).
    """

    def __init__(self, retriever, host: str = "127.0.0.1", port: int = 8080,
                 pid_space: str = "real", default_k: int = 10,
                 max_k: int = 1000, max_batch: int = 4096,
                 pad_token_id: Optional[int] = None,
                 allow_reload: bool = False):
        self.retriever = retriever
        self.pid_space = pid_space
        self.default_k = default_k
        # a CLI --topk above max_k must not turn every defaulted request
        # into a 400 — the operator asked for that k
        self.max_k = max(max_k, default_k)
        self.max_batch = max_batch
        # mask default source of truth: explicit arg (model config) beats
        # the tokenizer; in tokenizer-less mode the MODEL's pad id is the
        # only correct one (roberta/SEED pad is 1; id 0 is CLS there)
        if pad_token_id is not None:
            self.pad_token_id = pad_token_id
        else:
            self.pad_token_id = getattr(retriever.tokenizer,
                                        "pad_token_id", 0) or 0
        self.allow_reload = allow_reload
        self._device_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._stats = {"requests": 0, "queries": 0, "errors": 0,
                       "reloads": 0, "latency_ms_ewma": 0.0,
                       "lock_wait_ms_total": 0.0}
        self._stats_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # bound every socket read: a client that promises a
            # Content-Length and stops sending would otherwise park this
            # handler thread in rfile.read forever (slow-loris), and
            # ThreadingHTTPServer creates threads without bound
            timeout = 60

            # quiet by default; errors still reach the client as JSON
            def log_message(self, fmt, *fmt_args):
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                # guarded like do_POST: a LoopRetriever before bootstrap (or
                # any index error) must yield a JSON 5xx, not a dead handler
                # thread and a client-side connection reset
                try:
                    if self.path == "/healthz":
                        return self._reply(200, {
                            "status": "ok",
                            "ntotal": int(outer.retriever.index.ntotal),
                            "pid_space": outer.pid_space,
                            "max_k": outer.max_k,
                            "max_batch": outer.max_batch,
                        })
                    if self.path == "/metrics":
                        with outer._stats_lock:
                            return self._reply(200, dict(
                                outer._stats,
                                latency_ms_ewma=round(
                                    outer._stats["latency_ms_ewma"], 2)))
                    self._reply(404, {"error": "unknown path"})
                except RuntimeError as e:
                    # LoopRetriever.index before bootstrap: not broken,
                    # just not serving yet
                    self._reply(503, {"status": "starting", "error": str(e)})
                except Exception as e:
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

            def do_POST(self):
                if self.path not in ("/search", "/reload"):
                    return self._reply(404, {"error": "unknown path"})
                # every POST counts as a request, success or not, so
                # errors/requests is a valid rate
                outer._count(requests=1)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    if n > MAX_BODY_BYTES:
                        outer._count(errors=1)
                        return self._reply(413, {"error": "body too large"})
                    req = json.loads(self.rfile.read(n))
                except (ValueError, json.JSONDecodeError) as e:
                    outer._count(errors=1)
                    return self._reply(400, {"error": f"bad json: {e}"})
                except OSError:
                    # read timed out (Handler.timeout) or socket died:
                    # release the thread; reply if the socket still writes
                    outer._count(errors=1)
                    self.close_connection = True
                    try:
                        return self._reply(408, {"error": "request timeout"})
                    except OSError:
                        return
                try:
                    payload = outer._reload(req) if self.path == "/reload" \
                        else outer._search(req)
                except _BadRequest as e:
                    outer._count(errors=1)
                    return self._reply(400, {"error": str(e)})
                except Exception as e:  # device/tokenizer failure
                    outer._count(errors=1)
                    return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                self._reply(200, payload)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    def _count(self, requests: int = 0, queries: int = 0, errors: int = 0,
               reloads: int = 0, latency_ms: Optional[float] = None,
               lock_wait_ms: float = 0.0) -> None:
        with self._stats_lock:
            self._stats["requests"] += requests
            self._stats["queries"] += queries
            self._stats["errors"] += errors
            self._stats["reloads"] += reloads
            self._stats["lock_wait_ms_total"] += lock_wait_ms
            if latency_ms is not None:
                prev = self._stats["latency_ms_ewma"]
                self._stats["latency_ms_ewma"] = latency_ms if prev == 0 \
                    else 0.9 * prev + 0.1 * latency_ms

    @contextlib.contextmanager
    def _locked_device(self):
        """The device lock, with the time spent WAITING for it accounted to
        /metrics' lock_wait_ms_total — the operator's queue-depth signal
        (wait grows ⇒ the chip is saturated or a refresh/reload holds it)."""
        t0 = time.perf_counter()
        with self._device_lock:
            self._count(lock_wait_ms=(time.perf_counter() - t0) * 1000.0)
            yield

    def _reload(self, req: dict) -> dict:
        """Hot-swap a SAVED index (FlatIPIndex.save layout + .ids.npy
        sidecar in real pid space — the serve CLI's --save_index artifact):
        refresh the corpus without dropping the server.

        Default (hot) mode loads the new index to the device while the old
        one still serves, so it needs BOTH resident at once — at
        full-corpus scale that 2× headroom may not exist (an 8.8M×768 bf16
        flat index is ~13.5 GB of a 16 GB v5e). ``{"gap": true}`` releases
        the old index FIRST and loads under the device lock: no extra
        headroom, but searches queue for the load's duration, and a load
        that fails AFTER the release leaves the server degraded (healthz
        5xx / searches 500) until a reload succeeds — the artifact is
        therefore pre-checked (sidecar present and consistent) before the
        old index is dropped."""
        if not self.allow_reload:
            raise _BadRequest("reload disabled on this server")
        if not isinstance(req, dict) or not isinstance(req.get("index"), str):
            raise _BadRequest("need {'index': '/path/to/saved_index'}")
        from ance_tpu.index.flat import FlatIPIndex
        from ance_tpu.index.ivf import IVFIPIndex
        path = req["index"]
        # a previously mesh-sharded index must not silently become
        # single-device after reload: carry the live index's mesh/axis over
        old = self.retriever.index
        mesh = getattr(old, "mesh", None)
        axis = getattr(old, "axis", "data")
        old_dim = getattr(old, "dim", None)
        lp = path if path.endswith(".npz") else path + ".npz"
        sidecar = (path[:-len(".npz")] if path.endswith(".npz") else path
                   ) + ".ids.npy"  # save() writes {prefix}.npz + {prefix}
        # .ids.npy — accept the .npz path the CLI prints as well
        try:
            # the file carries its own kind (same detection as the serve
            # CLI's --load_index): an IVF artifact must reload as IVF; the
            # sidecar and row count are validated BEFORE any swap work
            with np.load(lp, allow_pickle=False) as z:
                is_ivf = "bins_emb" in z.files
                saved_n = int(z["ntotal"]) if "ntotal" in z.files else None
            cls = IVFIPIndex if is_ivf else FlatIPIndex
            e2id = np.load(sidecar).astype(np.int64)
            if saved_n is not None and len(e2id) != saved_n:
                raise _BadRequest(
                    "saved index and its .ids.npy sidecar disagree")

            def load_new():
                idx = cls.load(lp, mesh=mesh, axis=axis)
                if old_dim is not None and idx.dim != old_dim:
                    # a wrong-geometry artifact must be rejected, not
                    # swapped in to 500 every later /search
                    raise _BadRequest(
                        f"index dim {idx.dim} != encoder dim {old_dim}")
                if len(e2id) != idx.ntotal:
                    raise _BadRequest(
                        "saved index and its .ids.npy sidecar disagree")
                return idx

            if req.get("gap"):
                with self._locked_device():
                    self.retriever.index = None   # free before loading
                    del old
                    new_index = load_new()
                    self.retriever.index = new_index
                    self.retriever.embedding2id = e2id
                    self.pid_space = "real"
            else:
                new_index = load_new()
                with self._locked_device():
                    self.retriever.index = new_index
                    self.retriever.embedding2id = e2id
                    # the sidecar contract is REAL pids: a server started
                    # in pid_space='offset' must serve real pids after
                    self.pid_space = "real"
        except _BadRequest:
            raise
        except (OSError, ValueError, KeyError) as e:
            raise _BadRequest(f"cannot load index {path!r}: {e}")
        self._count(reloads=1)
        return {"reloaded": path, "kind": "ivf" if is_ivf else "flat",
                "ntotal": int(new_index.ntotal)}

    def _search(self, req: dict) -> dict:
        if not isinstance(req, dict):
            raise _BadRequest("body must be a JSON object")
        k = req.get("k", self.default_k)
        # bool is a subclass of int — {"k": true} must not mean k=1
        if isinstance(k, bool) or not isinstance(k, int) \
                or not 1 <= k <= self.max_k:
            raise _BadRequest(f"k must be an int in [1, {self.max_k}]")
        t0 = time.perf_counter()
        if "queries" in req:
            queries = req["queries"]
            if (not isinstance(queries, list) or not queries
                    or not all(isinstance(q, str) for q in queries)):
                raise _BadRequest("queries must be a non-empty list of strings")
            if len(queries) > self.max_batch:
                raise _BadRequest(f"batch > max_batch ({self.max_batch})")
            if self.retriever.tokenizer is None:
                raise _BadRequest("server has no tokenizer; POST token "
                                  "arrays as ids/mask instead")
            # tokenize OUTSIDE the lock — only device work serializes
            ids, mask = self.retriever.tokenize_queries(queries)
        elif "ids" in req:
            try:
                ids = np.asarray(req["ids"], np.int32)
                if "mask" in req:
                    mask = np.asarray(req["mask"], np.int32)
                else:
                    # defaulted mask masks the configured pad id (roberta/
                    # SEED pad is 1, not 0 — `ids != 0` would count padding
                    # as real tokens and mask CLS)
                    mask = (ids != self.pad_token_id).astype(np.int32)
            except (ValueError, TypeError) as e:
                raise _BadRequest(f"bad ids/mask arrays: {e}")
            if ids.ndim != 2 or mask.shape != ids.shape:
                raise _BadRequest("ids/mask must be equal-shape 2-D arrays")
            if len(ids) > self.max_batch:
                raise _BadRequest(f"batch > max_batch ({self.max_batch})")
        else:
            raise _BadRequest("need 'queries' (text) or 'ids' (+'mask')")
        # bucket the batch width to a power of two: the encoder compiles
        # one program per distinct [B, L], so raw client widths would let
        # traffic force unbounded multi-second compiles under the device
        # lock (k-depth is bucketed the same way in Retriever.search_tokens;
        # the text path's L is pinned by max_query_length — ids/mask
        # clients should keep L fixed for the same reason). Padding rows
        # repeat row 0 and are stripped from the results.
        from ance_tpu.serve import bucket_pow2
        B = len(ids)
        pad = bucket_pow2(B, self.max_batch) - B
        if pad:
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, 0)], axis=0)
            mask = np.concatenate([mask, np.repeat(mask[:1], pad, 0)],
                                  axis=0)
        with self._locked_device():
            scores, pids = self.retriever.search_tokens(ids, mask, k)
        scores, pids = np.asarray(scores)[:B], np.asarray(pids)[:B]
        ms = (time.perf_counter() - t0) * 1000.0
        # requests counted in do_POST (success or failure)
        self._count(queries=int(np.asarray(pids).shape[0]), latency_ms=ms)
        results = [
            [{"pid": int(p), "score": float(s)}
             for p, s in zip(prow, srow) if p >= 0]
            for prow, srow in zip(np.asarray(pids), np.asarray(scores))
        ]
        return {"results": results, "k": k, "latency_ms": round(ms, 2)}

    def serve_forever(self) -> None:
        self._server.serve_forever()

    def start(self) -> "RetrieverHTTPServer":
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


class _BadRequest(ValueError):
    pass
