"""Round-3 search-kernel sweep: block_size / phase split at serving shape.

The blockmax kernel's phase 2 runs ``lax.top_k`` over the [Q, N/BS]
block-max matrix — at the bench shape (Q=2048, N=1M, BS=16) that is a
512 MB fp32 array and 128M-element top-k, suspected to dominate at small k
(the r2 sweep that fixed BS=16 ran at k=200, where phase-3 rescore cost
k·BS candidates and pushed BS down; at k=10 the trade-off flips).

Measures, per BS in {16, 32, 64, 128}:
  * phase-1-only time (blockmax_scores),
  * full search time (topk_blockmax),
  * agreement vs the scan-exact baseline.
JSONL to stdout; within-run comparisons only (time-shared chip).
"""

import json
import statistics
import time

import numpy as np

N, D, Q, K = 1_000_000, 768, 2048, 10
SAMPLES = 5


def bench(fn, *args, **kw):
    import jax.numpy as jnp

    def once():
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf[:1].astype(jnp.float32)))
        return time.perf_counter() - t0

    once()  # compile
    xs = [once() for _ in range(SAMPLES)]
    return statistics.median(xs), min(xs), max(xs)


def main():
    import jax.numpy as jnp
    from ance_tpu.index.flat import topk_inner_product
    from ance_tpu.ops.topk import blockmax_scores, topk_blockmax

    rs = np.random.RandomState(1)
    corpus = jnp.asarray(rs.randn(N, D), jnp.bfloat16)
    queries = jnp.asarray(rs.randn(Q, D), jnp.float32)
    padded_n = -(-N // 1024) * 1024  # phase-1-only calls need the padding
    corpus_p = jnp.pad(corpus, ((0, padded_n - N), (0, 0)))

    ref_s, ref_i = topk_inner_product(queries, corpus, k=K)
    ref_i = np.asarray(ref_i)

    t, lo, hi = bench(topk_inner_product, queries, corpus, k=K)
    print(json.dumps({"variant": "scan_exact", "sec": round(t, 4),
                      "qps": round(Q / t, 1)}), flush=True)

    for bs in (16, 32, 64, 128):
        t1, *_ = bench(blockmax_scores, queries.astype(jnp.bfloat16),
                       corpus_p, block_size=bs)
        t2, lo2, hi2 = bench(topk_blockmax, queries, corpus, k=K,
                             block_size=bs)
        _, ids = topk_blockmax(queries, corpus, k=K, block_size=bs)
        ids = np.asarray(ids)
        agree = float((ids == ref_i).mean())
        print(json.dumps({"variant": f"blockmax_bs{bs}",
                          "phase1_sec": round(t1, 4),
                          "full_sec": round(t2, 4),
                          "full_spread": [round(lo2, 4), round(hi2, 4)],
                          "phase23_sec": round(t2 - t1, 4),
                          "qps": round(Q / t2, 1),
                          "ids_agree_vs_scan": agree}), flush=True)

    # q_block x chunk_rows sweep at the winning BS: the [chunk, q_block]
    # fp32 score tile is the phase-1 VMEM high-water
    for qb in (256, 512, 1024):
        for cr in (1024, 2048, 4096):
            try:
                t1, lo1, hi1 = bench(
                    blockmax_scores, queries.astype(jnp.bfloat16),
                    corpus_p if padded_n % cr == 0 else
                    jnp.pad(corpus, ((0, -(-N // cr) * cr - N), (0, 0))),
                    block_size=16, chunk_rows=cr, q_block=qb)
            except Exception as e:
                print(json.dumps({"variant": f"p1_qb{qb}_cr{cr}",
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({"variant": f"p1_qb{qb}_cr{cr}",
                              "phase1_sec": round(t1, 4),
                              "spread": [round(lo1, 4), round(hi1, 4)]}),
                  flush=True)


if __name__ == "__main__":
    main()
