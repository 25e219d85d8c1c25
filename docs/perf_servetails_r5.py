"""Round-5: serving TAIL latency under concurrency, across refresh
boundaries — the follow-up to perf_liveserve_r4 (which measured training's
cost and aggregate qps, not per-request tails).

Setup mirrors the production `ance-loop --http` wiring (cli.py:526-560):
a real PipelinedAnce at 100k×768 (roberta-base bf16 encoder, bf16 HBM
index) refreshing + training on the chip, a LoopRetriever behind
RetrieverHTTPServer, and N_CLIENTS concurrent HTTP clients POSTing
batch-SERVE_B token searches back to back for WHOLE refresh cycles
(including the finalize's index-buffer swap under loop.index_lock).
Reports, per phase:

  * idle chip (loop not running): request p50/p90/p99 — the floor;
  * while training+refreshing: p50/p90/p99 across >= 1 full cycle with
    4 concurrent clients, plus throughput (requests served / wall);
  * /metrics lock_wait_ms_total before/after each phase — how much of
    the tail is QUEUEING on the device lock vs device work.

The serving claim this calibrates: the reference positions ANCE as the
cheap online stage (~100x under BERT rerank, reference README.md:16-17);
tails under a concurrent refresh are what an operator actually sees.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_servetails_r5.py > /tmp/servetails_r5.log 2>&1 < /dev/null &
"""

import json
import tempfile
import threading
import time
import urllib.request

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache, TokenCacheWriter
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.serve import LoopRetriever
from ance_tpu.serve_http import RetrieverHTTPServer
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

N_P, PLEN, QLEN = 100_000, 128, 32
N_TQ, N_DQ = 256, 64
SERVE_B = 64
N_CLIENTS = 4


def post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def get(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def pcts(ms):
    a = np.asarray(ms)
    return {"n": len(ms), "p50_ms": round(float(np.percentile(a, 50)), 1),
            "p90_ms": round(float(np.percentile(a, 90)), 1),
            "p99_ms": round(float(np.percentile(a, 99)), 1),
            "max_ms": round(float(a.max()), 1)}


def client_phase(base: str, body: dict, n_clients: int, stop: threading.Event,
                 lat_ms: list) -> list:
    """n_clients threads POST /search back to back until `stop`; per-request
    wall latencies (client-observed, incl. queueing) append to lat_ms."""
    def worker():
        url = base + "/search"
        while not stop.is_set():
            t0 = time.perf_counter()
            post(url, body)
            lat_ms.append((time.perf_counter() - t0) * 1000.0)

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(n_clients)]
    for t in threads:
        t.start()
    return threads


def main():
    rs = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        paths = {}
        for name, n, L in (("passages", N_P, PLEN),
                           ("train-query", N_TQ, QLEN),
                           ("dev-query", N_DQ, QLEN)):
            paths[name] = f"{td}/{name}"
            with TokenCacheWriter(paths[name], L) as w:
                for _ in range(n):
                    w.write(L, rs.randint(4, 50000, L).astype(np.int32))
        caches = {n: TokenCache(p).open() for n, p in paths.items()}

        cfg = EncoderConfig(dtype=jnp.bfloat16)
        model = RobertaDot(cfg, out_dim=768)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((2, QLEN), jnp.int32),
                                     jnp.ones((2, QLEN), jnp.int32))["params"]
        opt = make_optimizer("lamb", warmup_linear(1e-5, 100, 100_000))
        pcfg = PipelineConfig(
            train_steps_per_slice=8, encode_slice_size=4096,
            encode_batch_size=128, batch_size=32, topk_training=64,
            negative_sample=4, ann_chunk_factor=1, dev_search_depth=10,
            search_chunk_queries=256)
        loop = PipelinedAnce(
            pcfg, state=init_train_state(params, opt),
            train_step=make_train_step(triplet_loss_fn(model), opt),
            rng=jax.random.PRNGKey(1), params_of=lambda s: s.params,
            query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
            body_encode_fn=make_encode_fn(model, RobertaDot.body_emb),
            passage_cache=caches["passages"],
            train_query_cache=caches["train-query"],
            dev_query_cache=caches["dev-query"],
            train_qrels={q: {q % N_P: 1} for q in range(N_TQ)},
            dev_qrels={q: {q % N_P: 1} for q in range(N_DQ)})

        loop.bootstrap()
        steps = len(loop._work) * pcfg.train_steps_per_slice
        retriever = LoopRetriever(loop, loop.qfn)
        srv = RetrieverHTTPServer(retriever, port=0).start()
        host, port = srv.address
        base = f"http://{host}:{port}"
        body = {"ids": rs.randint(4, 50000, (SERVE_B, QLEN)).tolist(),
                "k": 10}
        post(base + "/search", body)  # compile serve shapes
        print(json.dumps({"stage": "ready", "ntotal": int(loop.index.ntotal),
                          "steps_per_cycle": steps,
                          "clients": N_CLIENTS, "batch": SERVE_B}),
              flush=True)

        # warm one full cycle (compile every interleaved shape off-measure)
        loop.run(steps)

        # phase A: idle chip, concurrent clients — the latency floor
        lat, stop = [], threading.Event()
        w0 = get(base + "/metrics")["lock_wait_ms_total"]
        threads = client_phase(base, body, N_CLIENTS, stop, lat)
        time.sleep(20)
        stop.set()
        for t in threads:
            t.join(timeout=60)
        wait_ms = get(base + "/metrics")["lock_wait_ms_total"] - w0
        print(json.dumps({"stage": "idle_chip", **pcts(lat),
                          "qps": round(len(lat) * SERVE_B / 20.0, 1),
                          "lock_wait_ms_per_req": round(wait_ms / len(lat),
                                                        1)}), flush=True)

        # phase B: clients across >= 1 FULL refresh cycle (boundary incl.)
        lat, stop = [], threading.Event()
        w0 = get(base + "/metrics")["lock_wait_ms_total"]
        threads = client_phase(base, body, N_CLIENTS, stop, lat)
        t0 = time.perf_counter()
        loop.run(steps)  # one whole cycle: slices, searches, finalize swap
        cycle_s = time.perf_counter() - t0
        stop.set()
        for t in threads:
            t.join(timeout=120)
        wait_ms = get(base + "/metrics")["lock_wait_ms_total"] - w0
        print(json.dumps({
            "stage": "during_refresh_cycle", **pcts(lat),
            "cycle_wall_s": round(cycle_s, 1),
            "served_qps": round(len(lat) * SERVE_B / cycle_s, 1),
            "lock_wait_ms_per_req": round(wait_ms / max(len(lat), 1), 1),
        }), flush=True)
        srv.shutdown()
        print(json.dumps({"done": True}), flush=True)
        for c in caches.values():
            c.close()


if __name__ == "__main__":
    main()
