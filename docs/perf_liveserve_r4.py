"""Round-4: train AND serve on one chip — the interference measurement.

`ance-loop --http` serves the live refreshing index while training
(serve.LoopRetriever). The CPU tests prove correctness; this measures the
COST on the real chip: how much does a serving thread hammering searches
slow the training loop, and what query rate does the live loop sustain?

Setup: real PipelinedAnce at 100k×768 (roberta-base geometry bf16 encoder,
bf16 HBM index, the tpu_demo corpus scale). Phase A: one FULL refresh
cycle of loop.run() alone. Phase B: one more full cycle with a thread
issuing back-to-back batch-64 LoopRetriever searches (tokenless, as an
HTTP client would after parse). Phases MUST be whole-cycle-aligned: the
interleaved work items differ wildly in cost (corpus encode slices vs
finalize), so any window that isn't a whole cycle compares different work
— a first draft with fixed 120-step windows "measured" serving making
training 54% FASTER for exactly that reason.
Report: train wall A vs B, searches served, serve qps during training.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_liveserve_r4.py > /tmp/liveserve_r4.log 2>&1 < /dev/null &
"""

import json
import tempfile
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache, TokenCacheWriter
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.serve import LoopRetriever
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

N_P, PLEN, QLEN = 100_000, 128, 32
N_TQ, N_DQ = 256, 64
SERVE_B = 64


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

        t0 = time.perf_counter()
        loop.bootstrap()
        # right after bootstrap the work queue holds exactly one freshly
        # seeded cycle; an item fires every train_steps_per_slice steps, so
        # this many steps = one whole cycle of interleaved refresh work
        steps = len(loop._work) * pcfg.train_steps_per_slice
        print(json.dumps({"stage": "bootstrap_s",
                          "value": round(time.perf_counter() - t0, 1),
                          "ntotal": int(loop.index.ntotal),
                          "steps_per_cycle": steps}), flush=True)

        # warmup: one full cycle compiles every shape the timed phases
        # touch (train step, encode slices, searches, finalize) — else
        # phase A eats the compile tax and the A/B comparison is garbage
        loop.run(steps)

        # phase A: one full refresh cycle of training alone
        r0 = loop.refresh_no
        t0 = time.perf_counter()
        loop.run(steps)
        alone_s = time.perf_counter() - t0
        print(json.dumps({"stage": "train_alone", "steps": steps,
                          "wall_s": round(alone_s, 2),
                          "refreshes": loop.refresh_no - r0,
                          "steps_per_s": round(steps / alone_s, 2)}),
              flush=True)

        # phase B: one more full cycle with a serving thread hammering
        r = LoopRetriever(loop, loop.qfn)
        ids = rs.randint(4, 50000, (SERVE_B, QLEN)).astype(np.int32)
        mask = np.ones_like(ids)
        r.search_tokens(ids, mask, 10)  # compile the serve shapes
        served = {"n": 0}
        stop = threading.Event()

        def hammer():
            while not stop.is_set():
                r.search_tokens(ids, mask, 10)
                served["n"] += 1

        th = threading.Thread(target=hammer, daemon=True)
        r0 = loop.refresh_no
        t0 = time.perf_counter()
        th.start()
        loop.run(steps)
        serving_s = time.perf_counter() - t0
        stop.set()
        th.join(timeout=30)
        print(json.dumps({
            "stage": "train_while_serving", "steps": steps,
            "wall_s": round(serving_s, 2),
            "refreshes": loop.refresh_no - r0,
            "steps_per_s": round(steps / serving_s, 2),
            "train_slowdown_pct": round(100 * (serving_s / alone_s - 1), 1),
            "search_batches_served": served["n"],
            "served_qps": round(served["n"] * SERVE_B / serving_s, 1),
        }), flush=True)

        for c in caches.values():
            c.close()


if __name__ == "__main__":
    main()
