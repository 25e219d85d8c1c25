"""Round-5: host feed throughput at production cache size.

The reference's host-side hot path is random-access triple gathers over a
~18-25 GB token cache (reference data/msmarco_data.py:337-362 →
utils/util.py:292-298); SURVEY §7.3 flags "mmap + prefetch workers" as a
hard part. TripletBatches' vectorized mmap gathers were only ever measured
on tiny test caches — this builds the production-geometry artifact
(8,841,823 passage records at seq 512 int32 = 18.1 GB + 502,939 query
records at seq 64) on disk, drops the kernel page cache (root), and
measures:

  1. COLD random-batch gathers (true disk faults) — per-batch p50/p99 and
     rows/s for b64 triples (192 random records/batch),
  2. WARM ditto (page-cache ceiling),
  3. the overlap test: a consumer simulating the measured 118 ms train
     step, with and without data.feed.prefetch_batches — reporting the
     stall time per step (what the feed actually costs training).

Pass/fail bar: stall ≤ a few ms per 118 ms step ⇒ feed keeps the chip fed.

Host-only (no jax). Usage:
  setsid env PYTHONPATH=/root/repo nohup python docs/perf_feed_r5.py \
    > /tmp/feed_r5.log 2>&1 < /dev/null &
"""

import json
import os
import time

import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import TripletBatches, prefetch_batches

ROOT = os.environ.get("ANCE_FEED_ROOT", "/tmp/feedcache")
N_PASSAGES = 8_841_823
N_QUERIES = 502_939
PLEN, QLEN = 512, 64
B = 64
N_BATCHES = 200
STEP_MS = 95.6  # b64 train step with the r5 hardware-RNG dropout stream


def build_cache(base: str, n: int, seqlen: int) -> None:
    """Write the fixed-record file in bulk (content is irrelevant to IO)."""
    if os.path.exists(base + "_meta"):
        return
    rec = 4 + 4 * seqlen
    chunk_rows = 65536
    rs = np.random.RandomState(0)
    block = np.empty((chunk_rows, rec), np.uint8)
    block[:, :4] = np.array([0, 0, seqlen // 256, seqlen % 256], np.uint8)
    tok = rs.randint(4, 50000, size=(chunk_rows, seqlen)).astype(np.int32)
    block[:, 4:] = tok.view(np.uint8).reshape(chunk_rows, 4 * seqlen)
    t0 = time.perf_counter()
    with open(base, "wb") as f:
        left = n
        while left > 0:
            take = min(chunk_rows, left)
            f.write(block[:take].tobytes())
            left -= take
    with open(base + "_meta", "w") as f:
        json.dump({"type": "int32", "total_number": n,
                   "embedding_size": seqlen}, f)
    print(json.dumps({"built": base, "gb": round(n * rec / 1e9, 1),
                      "sec": round(time.perf_counter() - t0, 1)}), flush=True)


def drop_page_cache() -> None:
    os.sync()
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3")


def batch_times(feed_iter, n: int):
    times = []
    t_prev = time.perf_counter()
    got = 0
    for _ in feed_iter:
        t = time.perf_counter()
        times.append((t - t_prev) * 1000.0)
        t_prev = t
        got += 1
        if got >= n:
            break
    a = np.asarray(times)
    return {"batches": got, "p50_ms": round(float(np.percentile(a, 50)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2),
            "mean_ms": round(float(a.mean()), 2),
            "rows_per_s": round(B * 1000.0 / a.mean(), 1)}


def simulated_train(feed_iter, n: int):
    """Consumer that 'computes' STEP_MS per batch; reports feed stall."""
    stalls = []
    got = 0
    while got < n:
        t0 = time.perf_counter()
        try:
            next(feed_iter)
        except StopIteration:
            break
        stalls.append((time.perf_counter() - t0) * 1000.0)
        got += 1
        time.sleep(STEP_MS / 1000.0)
    a = np.asarray(stalls)
    return {"batches": got, "stall_p50_ms": round(float(np.percentile(a, 50)), 2),
            "stall_p99_ms": round(float(np.percentile(a, 99)), 2),
            "stall_mean_ms": round(float(a.mean()), 2),
            "step_overhead_pct": round(100.0 * a.mean() / STEP_MS, 1)}


def run_phase(name, make_iter, measure, triples, cold):
    """Each phase opens FRESH TokenCache mmaps before dropping the page
    cache: drop_caches skips pages mapped into a live process (kernel
    invalidate_mapping_pages semantics), so reusing one long-lived mmap
    across phases silently measures WARM — the first version of this
    script did exactly that and reported 2 ms 'cold' stalls."""
    pbase = os.path.join(ROOT, "passages")
    qbase = os.path.join(ROOT, "queries")
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        if cold:
            drop_page_cache()
        feed = TripletBatches(qc, pc, triples, batch_size=B, seed=-1)
        print(json.dumps({name: measure(make_iter(feed), N_BATCHES)}),
              flush=True)


def main():
    os.makedirs(ROOT, exist_ok=True)
    build_cache(os.path.join(ROOT, "passages"), N_PASSAGES, PLEN)
    build_cache(os.path.join(ROOT, "queries"), N_QUERIES, QLEN)

    rs = np.random.RandomState(7)
    n_rows = B * (N_BATCHES + 8)
    triples = np.stack([rs.randint(0, N_QUERIES, n_rows),
                        rs.randint(0, N_PASSAGES, n_rows),
                        rs.randint(0, N_PASSAGES, n_rows)], axis=1)

    phases = [
        ("cold_random", lambda f: f.epoch(0), batch_times, True),
        ("warm_random", lambda f: f.epoch(0), batch_times, False),
        ("cold_random_workers8",
         lambda f: f.epoch_prefetched(0, workers=8, depth=16),
         batch_times, True),
        ("cold_sim_train_noprefetch",
         lambda f: f.epoch(0), simulated_train, True),
        ("cold_sim_train_prefetch_1thread",
         lambda f: prefetch_batches(f.epoch(0), depth=8),
         simulated_train, True),
        ("cold_sim_train_workers8",
         lambda f: f.epoch_prefetched(0, workers=8, depth=16),
         simulated_train, True),
        ("warm_sim_train_workers8",
         lambda f: f.epoch_prefetched(0, workers=8, depth=16),
         simulated_train, False),
    ]
    for name, make_iter, measure, cold in phases:
        run_phase(name, make_iter, measure, triples, cold)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
