"""Round-4 follow-up: full-search sweep of the two levers the kernel-level
A/B (docs/perf_topk_int8_r4.py) showed to matter — block_size 16 vs 32 and
chunk_rows 1024 vs 2048 — for both the bf16 and the int8 (phase1 bf16)
corpus, at the dev shape (Q=2048, k=10). Round-3 fixed BS=16 from a sweep
at k=200; at k=10 the phase-3 candidate cost of BS=32 is 320 rows/query —
cheap — while the kernel itself runs ~8%% faster.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_topk_sweep_r4.py > /tmp/topk_sweep_r4.log 2>&1 < /dev/null &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.index.flat import quantize_dims_int8, topk_inner_product
from ance_tpu.ops.topk import topk_blockmax

N, D, Q, K = 1_000_000, 768, 2048, 10
REPS = 7


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "N": N, "Q": Q,
                      "k": K}), flush=True)
    kc, kq = jax.random.split(jax.random.PRNGKey(0))
    corpus_f = jax.random.normal(kc, (N, D), jnp.float32)
    corpus_f = corpus_f / jnp.linalg.norm(corpus_f, axis=1, keepdims=True)
    c8, scales = jax.jit(quantize_dims_int8)(corpus_f)
    c16 = corpus_f.astype(jnp.bfloat16)
    q = jax.random.normal(kq, (Q, D), jnp.float32)
    qs = q * scales[None, :]
    mat(c8[:1]); mat(c16[:1]); mat(qs[:1])

    _, ids_ref8 = topk_inner_product(qs, c8, k=K)
    ids_ref8 = np.sort(np.asarray(ids_ref8), 1)
    _, ids_ref16 = topk_inner_product(
        q.astype(jnp.float32), c16.astype(jnp.float32), k=K)
    ids_ref16 = np.sort(np.asarray(ids_ref16), 1)

    for corpus_tag, cc, qq, ref, p1 in (
            ("bf16", c16, q.astype(jnp.bfloat16), ids_ref16, None),
            ("int8", c8, qs, ids_ref8, jnp.bfloat16)):
        for bs in (16, 32):
            for chunk in (1024, 2048):
                def run():
                    return topk_blockmax(qq, cc, k=K, block_size=bs,
                                         chunk_rows=chunk, phase1_dtype=p1)
                s, i = run(); mat(s)
                times = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    s, i = run(); mat(s)
                    times.append(time.perf_counter() - t0)
                med = sorted(times)[len(times) // 2]
                agree = float((np.sort(np.asarray(i), 1) == ref).mean())
                print(json.dumps({
                    "corpus": corpus_tag, "block_size": bs,
                    "chunk_rows": chunk, "ms": round(med * 1e3, 1),
                    "qps": round(Q / med, 1), "agree": round(agree, 6),
                    "spread_ms": [round(min(times) * 1e3, 1),
                                  round(max(times) * 1e3, 1)]}), flush=True)


if __name__ == "__main__":
    main()
