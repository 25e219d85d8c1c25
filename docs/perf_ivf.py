"""IVF (union-probe) vs exact search on the real chip: QPS + recall@10.

Corpus: mixture of unit centers with per-dim noise scaled so the cluster
structure survives D=768 (||noise|| ≈ 0.5 — the geometry LayerNorm'd
encoder embeddings actually have; isotropic noise at unit scale destroys
clustering and makes any IVF look broken).  Queries are perturbed corpus
rows.  Batch sweep shows the honest physics: probing saves compute only
while the batch's probe UNION (≤ Q·nprobe) < nlist, so IVF wins at
small/medium batch (latency serving) and converges to exact at huge batch.
Within-run comparisons only (the tunneled chip is time-shared).

Run detached:
  setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
    python docs/perf_ivf.py > /tmp/ivf_bench.log 2>&1 < /dev/null &
"""

import json
import os
import time

import numpy as np

N = int(os.environ.get("IVF_N", 1_000_000))
D = int(os.environ.get("IVF_D", 768))
K = 10
TRUE_CLUSTERS = max(16, N // 256)
NLIST = int(os.environ.get("IVF_NLIST", 4096))
BATCHES = tuple(int(b) for b in
                os.environ.get("IVF_BATCHES", "16,64,256").split(","))
NPROBES = tuple(int(p) for p in
                os.environ.get("IVF_NPROBES", "4,8").split(","))


def materialize(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timed_qps(fn, q):
    s, _ = fn()
    materialize(s)  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        s, ids = fn()
    materialize(s)
    return q * reps / (time.perf_counter() - t0), np.asarray(ids)


def main():
    import jax.numpy as jnp

    from ance_tpu.index.flat import FlatIPIndex
    from ance_tpu.index.ivf import IVFIPIndex

    rs = np.random.RandomState(0)
    centers = rs.randn(TRUE_CLUSTERS, D).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rs.randint(0, TRUE_CLUSTERS, N)
    corpus = centers[assign] \
        + (0.5 / np.sqrt(D)) * rs.randn(N, D).astype(np.float32)
    qpick = rs.choice(N, max(BATCHES), replace=False)
    all_queries = corpus[qpick] \
        + (0.3 / np.sqrt(D)) * rs.randn(max(BATCHES), D).astype(np.float32)

    exact = FlatIPIndex(dim=D, dtype=jnp.bfloat16)
    exact.add(corpus)

    t0 = time.perf_counter()
    ivf = IVFIPIndex(dim=D, nlist=NLIST, dtype=jnp.bfloat16, seed=0)
    ivf.add(corpus)
    print(json.dumps({"index": "ivf", "nlist": NLIST,
                      "capacity": ivf.capacity,
                      "build_seconds": round(time.perf_counter() - t0, 1)}),
          flush=True)

    for Q in BATCHES:
        queries = all_queries[:Q]
        exact_qps, exact_ids = timed_qps(
            lambda: exact.search(queries, k=K), Q)
        print(json.dumps({"index": "flat_bf16", "batch": Q,
                          "qps": round(exact_qps, 1)}), flush=True)
        for nprobe in NPROBES:
            qps, ids = timed_qps(
                lambda: ivf.search(queries, k=K, nprobe=nprobe), Q)
            recall = np.mean([len(set(ids[i]) & set(exact_ids[i])) / K
                              for i in range(Q)])
            print(json.dumps({
                "index": "ivf", "batch": Q, "nprobe": nprobe,
                "union": min(Q * nprobe, NLIST), "qps": round(qps, 1),
                "recall_at_10": round(float(recall), 4),
                "speedup_vs_exact": round(qps / exact_qps, 2)}), flush=True)


if __name__ == "__main__":
    main()
