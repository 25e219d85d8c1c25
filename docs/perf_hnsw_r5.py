"""Round-5: HNSW measured honestly — recall@10 / qps vs exact, host CPU.

The reference ships FAISS IndexHNSWFlat as its (driver-unused) serving
option (reference dpr_utils.py:164-228, OpenMP over 16 cores); ours is the
from-scratch single-threaded native/hnsw.cpp behind the same IP→L2
aux-dim wrapper. The r4 verdict asked for numbers or an explicit
disposition. This measures, at N×768 (N budget-bounded by measured build
rate — this host has ONE core, so a 1M build is minutes-to-an-hour):

  * build rate (inserts/s) probed on 20k, then the full build timed;
  * for each efSearch in (16, 64, 128, 256): qps over 512 queries and
    recall@10 against chunked-numpy exact inner-product ground truth.

Context numbers for the DESIGN.md table this feeds: exact FlatIPIndex on
the TPU does 54.9k qps bf16 at 1M×768 (BENCH_r04), and IVFIPIndex
(TPU-native approximate) has its curve in docs/perf_ivf_run.jsonl.
HNSW is pointer-chasing — serial dependent loads, unbatchable — which is
why it lives on the host as capability parity, not on the TPU.

Usage: env PYTHONPATH=/root/repo python docs/perf_hnsw_r5.py \
  > /tmp/hnsw_r5.log 2>&1
"""

import json
import os
import time

import numpy as np

from ance_tpu.index.hnsw import DenseHnswIndexer

N = int(os.environ.get("ANCE_HNSW_N", 1_000_000))
D = 768
Q = 512
K = 10
BUILD_BUDGET_S = float(os.environ.get("ANCE_HNSW_BUILD_BUDGET_S", 2700))
PROBE = int(os.environ.get("ANCE_HNSW_PROBE", 2_000))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def exact_topk(corpus, queries, k):
    """Chunked numpy exact IP ground truth (fits RAM at any N here)."""
    scores = np.full((queries.shape[0], 0), -np.inf, np.float32)
    ids = np.zeros((queries.shape[0], 0), np.int64)
    for s in range(0, corpus.shape[0], 131072):
        block = queries @ corpus[s:s + 131072].T
        bi = np.argpartition(block, -k, axis=1)[:, -k:]
        bs = np.take_along_axis(block, bi, axis=1)
        scores = np.concatenate([scores, bs], axis=1)
        ids = np.concatenate([ids, bi + s], axis=1)
        keep = np.argpartition(scores, -k, axis=1)[:, -k:]
        scores = np.take_along_axis(scores, keep, axis=1)
        ids = np.take_along_axis(ids, keep, axis=1)
    return ids


def main():
    global N
    rs = np.random.RandomState(0)
    queries = rs.randn(Q, D).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # probe build rate on 20k to budget N (one core: honesty > ambition)
    probe_vecs = rs.randn(PROBE, D).astype(np.float32)
    probe_vecs /= np.linalg.norm(probe_vecs, axis=1, keepdims=True)
    probe = DenseHnswIndexer(D)
    t0 = time.perf_counter()
    probe.index_data(np.arange(PROBE), probe_vecs)
    rate = PROBE / (time.perf_counter() - t0)
    del probe
    n_fit = int(rate * BUILD_BUDGET_S)
    if n_fit < N:
        emit(note="build budget caps N", inserts_per_s=round(rate, 1),
             requested_n=N, budget_s=BUILD_BUDGET_S, capped_n=n_fit)
        # round down to 10k granularity but never below the probe size —
        # the reference's store_n=512 graph builds at single-digit-thousands
        # of inserts/s on one core, so honesty means a small N, not a
        # budget-busting 100k floor
        N = max(PROBE, (n_fit // 10_000) * 10_000)
    emit(stage="probe", inserts_per_s=round(rate, 1), n=N)

    corpus = rs.randn(N, D).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

    t0 = time.perf_counter()
    gt = exact_topk(corpus, queries, K)
    emit(stage="exact_ground_truth_s", value=round(time.perf_counter() - t0, 1))

    indexer = DenseHnswIndexer(D)
    t0 = time.perf_counter()
    indexer.index_data(np.arange(N), corpus)
    build_s = time.perf_counter() - t0
    emit(stage="build", n=N, build_s=round(build_s, 1),
         inserts_per_s=round(N / build_s, 1))

    for ef in (16, 64, 128, 256):
        indexer.index.set_ef(max(ef, K))
        t0 = time.perf_counter()
        results = indexer.search_knn(queries, K)
        qps = Q / (time.perf_counter() - t0)
        hits = sum(len(set(db_ids) & set(gt_row.tolist()))
                   for (db_ids, _), gt_row in zip(results, gt))
        emit(stage="search", ef=ef, qps=round(qps, 1),
             recall_at_10=round(hits / (Q * K), 4))
    emit(done=True)


if __name__ == "__main__":
    main()
