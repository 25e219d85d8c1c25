"""Round-4: the HTTP/JSON tax on the serving path.

The serve-path measurement (docs/perf_serve_r4.py) covered the in-process
pipeline (encode + int8 search + MaxP dedup: 6,674 qps @ b2048 on v5e).
This measures what the ONLINE layer adds on top: JSON parse of the request,
the lock round-trip, JSON serialization of [B, k] results, and the
localhost HTTP hop — everything in serve_http.py that is NOT device work.

Method: a null-device Retriever (encoder = one-hot of a token id, 8-dim
index) so device time is ~zero and the measured per-batch wall time IS the
HTTP layer. Token mode (ids/mask arrays) — the production client shape;
text mode adds tokenizer cost that belongs to the tokenizer, not the
server. Run on an otherwise-idle host (1 core here: contention doubles
everything).

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python docs/perf_http_r4.py
"""

import json
import time
import urllib.request

import numpy as np

import jax

from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.serve import Retriever
from ance_tpu.serve_http import RetrieverHTTPServer

K = 10
REPS = 20


class NullEncoder:
    def __call__(self, params, ids, mask):
        return jax.nn.one_hot(ids[:, 1], 8)


def main():
    index = FlatIPIndex(dim=8, method="scan")
    index.add(np.eye(8, dtype=np.float32))
    r = Retriever(NullEncoder(), params=None, index=index)
    srv = RetrieverHTTPServer(r, port=0, max_batch=8192).start()
    host, port = srv.address
    url = f"http://{host}:{port}/search"

    try:
        for B in (64, 512, 2048):
            ids = np.zeros((B, 16), np.int32)
            ids[:, 1] = np.arange(B) % 8
            payload = json.dumps({"ids": ids.tolist(),
                                  "mask": np.ones_like(ids).tolist(),
                                  "k": K}).encode()

            # direct call baseline (device+dedup path only); warm first —
            # the first call at each batch shape compiles
            mask = np.ones_like(ids)
            r.search_tokens(ids, mask, K)
            t0 = time.perf_counter()
            for _ in range(REPS):
                r.search_tokens(ids, mask, K)
            direct_ms = (time.perf_counter() - t0) / REPS * 1000

            req = urllib.request.Request(
                url, data=payload,
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=30).read()  # warm
            t0 = time.perf_counter()
            for _ in range(REPS):
                urllib.request.urlopen(req, timeout=30).read()
            http_ms = (time.perf_counter() - t0) / REPS * 1000

            overhead = http_ms - direct_ms
            print(json.dumps({
                "batch": B, "k": K,
                "direct_ms": round(direct_ms, 2),
                "http_ms": round(http_ms, 2),
                "http_overhead_ms": round(overhead, 2),
                "overhead_us_per_query": round(overhead * 1000 / B, 1),
                "http_qps_ceiling": round(B / http_ms * 1000, 1),
            }), flush=True)
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
