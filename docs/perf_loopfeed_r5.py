"""Round-5: the prefetched feed inside the REAL pipelined loop, on-chip.

docs/perf_feed_r5.py measured `epoch_prefetched` in isolation (4x cold
throughput); the review pass then wired it in as `infinite_batches`'
default — this validates that wiring where it actually runs: a real
PipelinedAnce (roberta-base-geometry bf16 encoder, 100k x 768 bf16 HBM
index) driven through full refresh cycles with the prefetched feed vs
the serial one (workers=0), whole-cycle-aligned like perf_liveserve_r4.

What this proves (beyond the CPU identity tests): the 8 feed threads
coexist with the device lock, the refresh-boundary feed swap (pipelined
_finalize_refresh replaces the iterator mid-flight) leaks no threads and
drops no batches, and per-cycle wall time does not regress. On these
warm tiny caches the A/B should be a wash — the prefetcher's win is the
cold 18 GB case (DESIGN.md §5 feed table); a slowdown here would flag
contention.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_loopfeed_r5.py > /tmp/loopfeed_r5.log 2>&1 < /dev/null &
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
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

N_P, PLEN, QLEN = 100_000, 128, 32
N_TQ, N_DQ = 256, 64


def build_loop(caches, feed_workers):
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
        search_chunk_queries=256, feed_workers=feed_workers)
    return PipelinedAnce(
        pcfg, state=init_train_state(params, opt),
        train_step=make_train_step(triplet_loss_fn(model), opt),
        rng=jax.random.PRNGKey(1), params_of=lambda s: s.params,
        query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
        body_encode_fn=make_encode_fn(model, RobertaDot.body_emb),
        passage_cache=caches["passages"],
        train_query_cache=caches["train-query"],
        dev_query_cache=caches["dev-query"],
        train_qrels={q: {q % N_P: 1} for q in range(N_TQ)},
        dev_qrels={q: {q % N_P: 1} for q in range(N_DQ)}), pcfg


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

        results = {}
        for arm, workers in (("prefetched", 8), ("serial", 0)):
            loop, pcfg = build_loop(caches, workers)
            t0 = time.perf_counter()
            loop.bootstrap()
            steps = len(loop._work) * pcfg.train_steps_per_slice
            boot_s = time.perf_counter() - t0
            loop.run(steps)  # warmup cycle: compile every shape

            r0, s0 = loop.refresh_no, int(jax.device_get(loop.state.step))
            t0 = time.perf_counter()
            loop.run(2 * steps)  # two whole cycles, refresh-aligned
            wall = time.perf_counter() - t0
            count_feed = lambda: sum(
                1 for t in threading.enumerate()
                if t.name.startswith("ance-feed") and t.is_alive())
            # while the loop lives, ONE active iterator's pool (<= 8
            # threads) is legal; replaced iterators (one per refresh) must
            # not leak pools on top of it
            live_during = count_feed()
            refreshes = loop.refresh_no - r0
            steps_taken = int(jax.device_get(loop.state.step)) - s0
            del loop
            import gc
            gc.collect()
            time.sleep(0.5)
            results[arm] = wall
            print(json.dumps({
                "arm": arm, "bootstrap_s": round(boot_s, 1),
                "steps": 2 * steps, "wall_s": round(wall, 2),
                "s_per_cycle": round(wall / 2, 2),
                "refreshes": refreshes,
                "train_steps_taken": steps_taken,
                "feed_threads_live": live_during,
                "feed_threads_leaked": count_feed(),
            }), flush=True)

        print(json.dumps({
            "prefetched_vs_serial_pct":
                round(100 * (results["prefetched"] / results["serial"] - 1),
                      1),
            "done": True}), flush=True)
        for c in caches.values():
            c.close()


if __name__ == "__main__":
    main()
