"""Round-5: the one untried phase-1 lever — grid dimension semantics.

ops/topk.py's phase-1 ceiling is recorded at ~36% of bf16 peak with every
reachable kernel-body lever measured flat (r3/r4 notes in the module
docstring). One knob was never swept: the pallas grid is declared
``dimension_semantics=("arbitrary", "arbitrary")``, which tells Mosaic the
iterations may depend on each other — forbidding cross-iteration
reordering. Every (chunk, q_tile) output block is independent here, so
("parallel", "parallel") is semantically valid and may unlock deeper
pipelining of the chunk DMA against the MXU.

A/B within one run at both production shapes (1M×768 bf16 corpus):
dev Q=2048 k=10 and mine Q=512 k=200, arbitrary vs parallel, plus the
phase-1-only kernel timing.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_topk_dimsem_r5.py > /tmp/topk_dimsem_r5.log 2>&1 < /dev/null &
"""

import json
import statistics
import time

import numpy as np

import jax
import jax.numpy as jnp

N, D = 1_000_000, 768
REPS, SAMPLES = 5, 5


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, *args):
    out = fn(*args)
    mat(out[0] if isinstance(out, tuple) else out)  # compile
    xs = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        mat(out[0] if isinstance(out, tuple) else out)
        xs.append((time.perf_counter() - t0) / REPS * 1000.0)
    return statistics.median(xs), min(xs), max(xs)


def main():
    import ance_tpu.ops.topk as topk

    kc, kq = jax.random.split(jax.random.PRNGKey(0))
    # raw blockmax_scores needs N % chunk_rows == 0 (topk_blockmax pads
    # internally): phase 1 runs on 1,000,448 rows (+0.04%), full on 1M
    n_pad = -(-N // 1024) * 1024
    corpus_pad = jax.random.normal(kc, (n_pad, D), jnp.bfloat16)
    corpus = corpus_pad[:N]
    mat(corpus_pad[:1])

    for sem in ("arbitrary", "parallel"):
        topk._DIMENSION_SEMANTICS = (sem, sem)
        jax.clear_caches()  # the global is read at trace time — without
        # this the second variant would silently reuse the first's binary
        for q, k in ((2048, 10), (512, 200)):
            queries = jax.random.normal(kq, (q, D), jnp.float32)
            mat(queries[:1])

            med, lo, hi = timed(
                lambda qq: topk.blockmax_scores(qq.astype(jnp.bfloat16),
                                                corpus_pad),
                queries)
            print(json.dumps({"phase1_ms": round(med, 2), "sem": sem,
                              "q": q, "spread": [round(lo, 2),
                                                 round(hi, 2)]}),
                  flush=True)

            med, lo, hi = timed(
                lambda qq: topk.topk_blockmax(qq, corpus, k=k), queries)
            print(json.dumps({"full_ms": round(med, 2), "sem": sem,
                              "q": q, "k": k,
                              "qps": round(q / med * 1000.0, 1),
                              "spread": [round(lo, 2), round(hi, 2)]}),
                  flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
