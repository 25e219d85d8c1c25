"""Round-4: online serving LATENCY (per-request, not throughput).

perf_serve_r4 measured the serve path's throughput knee (902 qps @ b64 →
6,674 @ b2048); this measures what a single online request pays: encode
(roberta-base geometry, bf16, seq 64 query) + exact top-k over a 1M×768
device-resident corpus, per-call p50/p95 at request batch 1 / 8 / 64,
bf16 and int8 storage.

Caveat recorded with the numbers: this host reaches the chip through a
tunnel, so every call carries the wire round-trip; production serving runs
host-adjacent, making these UPPER bounds on device latency. Within-run
comparisons (bf16 vs int8, b1 vs b64) are unaffected.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_latency_r4.py > /tmp/latency_r4.log 2>&1 < /dev/null &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig

N, D, K, QLEN = 1_000_000, 768, 10, 64
REPS = 30


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def pcts(xs):
    xs = sorted(xs)
    return {"p50_ms": round(xs[len(xs) // 2] * 1000, 2),
            "p95_ms": round(xs[int(len(xs) * 0.95)] * 1000, 2),
            "min_ms": round(xs[0] * 1000, 2)}


def main():
    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=D)
    rs = np.random.RandomState(0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.query_emb)

    corpus = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    mat(corpus[:1])
    indexes = {}
    indexes["bf16"] = FlatIPIndex(dim=D, dtype=jnp.bfloat16)
    indexes["bf16"].add(corpus)
    indexes["int8"] = FlatIPIndex(dim=D, quantize="dims")
    indexes["int8"].add(corpus)

    for B in (1, 8, 64):
        ids = jnp.asarray(rs.randint(4, 50000, (B, QLEN)), jnp.int32)
        mask = jnp.ones((B, QLEN), jnp.int32)
        q = encode(params, ids, mask)
        mat(q)  # compile encode at this batch

        # encode-only per-call latency
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            mat(encode(params, ids, mask))
            samples.append(time.perf_counter() - t0)
        print(json.dumps({"stage": "encode", "batch": B, **pcts(samples)}),
              flush=True)

        for kind, index in indexes.items():
            s, _ = index.search(q, k=K)
            mat(s)  # compile search at this batch
            samples = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                s, _ = index.search(q, k=K)
                mat(s)
                samples.append(time.perf_counter() - t0)
            print(json.dumps({"stage": f"search_{kind}", "batch": B,
                              "corpus": N, "k": K, **pcts(samples)}),
                  flush=True)

        # end-to-end request: encode + search (bf16 index)
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            s, _ = indexes["bf16"].search(encode(params, ids, mask), k=K)
            mat(s)
            samples.append(time.perf_counter() - t0)
        print(json.dumps({"stage": "request_e2e_bf16", "batch": B,
                          **pcts(samples)}), flush=True)


if __name__ == "__main__":
    main()
