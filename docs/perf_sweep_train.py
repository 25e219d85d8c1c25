"""Train-step + search performance sweep on the real TPU chip.

Train: FirstP triplet step (3 towers fwd+bwd + clip + LAMB) across batch
sizes — looking for the MFU knee. Search: exact top-k QPS across corpus
dtype / query batch / k. One JSON line per variant; results recorded in
docs/DESIGN.md §5.

Run:  python docs/perf_sweep_train.py
"""

import json
import time

import numpy as np

QLEN, PLEN = 64, 128
# FLOPs per triplet step: fwd+bwd = 3x fwd FLOPs; towers: 1 query (len 64)
# + 2 passages (len 128). 169.9 MFLOP/token (DESIGN.md).
MFLOP_PER_TOKEN = 169.9


def bench_train(batch_size):
    import jax
    import jax.numpy as jnp
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    from ance_tpu.optim.schedules import warmup_linear
    from ance_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

    model = RobertaDot(EncoderConfig(dtype=jnp.bfloat16), out_dim=768)
    rs = np.random.RandomState(0)
    B = batch_size
    batch = {
        "query_ids": jnp.asarray(rs.randint(4, 50000, (B, QLEN)), jnp.int32),
        "query_mask": jnp.ones((B, QLEN), jnp.int32),
        "pos_ids": jnp.asarray(rs.randint(4, 50000, (B, PLEN)), jnp.int32),
        "pos_mask": jnp.ones((B, PLEN), jnp.int32),
        "neg_ids": jnp.asarray(rs.randint(4, 50000, (B, PLEN)), jnp.int32),
        "neg_mask": jnp.ones((B, PLEN), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-4, 10, 1000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(jnp.sum(m["loss"]))
    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    float(jnp.sum(m["loss"]))
    ms = (time.perf_counter() - t0) / reps * 1000.0
    tokens = B * (QLEN + 2 * PLEN)
    tflops = 3 * tokens * MFLOP_PER_TOKEN / 1e6 / (ms / 1000.0)
    return ms, tflops


def bench_search(dtype_name, q, k):
    import jax.numpy as jnp
    from ance_tpu.index.flat import FlatIPIndex

    n, d = 1_000_000, 768
    rs = np.random.RandomState(1)
    corpus = rs.randn(n, d).astype(np.float32)
    queries = rs.randn(q, d).astype(np.float32)
    dt = {"bf16": jnp.bfloat16, "fp32": jnp.float32, "int8": "int8"}[dtype_name]
    if dtype_name == "int8":
        index = FlatIPIndex(dim=d, dtype=jnp.bfloat16, quantize="dims")
    else:
        index = FlatIPIndex(dim=d, dtype=dt)
    index.add(corpus)
    s, _ = index.search(queries, k=k)
    float(np.asarray(s).sum())
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        s, _ = index.search(queries, k=k)
    float(np.asarray(s).sum())
    return q * reps / (time.perf_counter() - t0)


def main():
    import jax

    dev = jax.devices()[0]
    print(json.dumps({"device": getattr(dev, "device_kind", "?")}), flush=True)

    for b in (32, 64, 128, 256):
        try:
            ms, tf = bench_train(b)
            print(json.dumps({"train_batch": b, "step_ms": round(ms, 1),
                              "tflops": round(tf, 1),
                              "triplets_per_sec": round(b / ms * 1000, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"train_batch": b,
                              "error": str(e)[:160]}), flush=True)

    for dtype_name, q, k in [("bf16", 512, 10), ("bf16", 2048, 10),
                             ("bf16", 512, 100), ("int8", 512, 10),
                             ("fp32", 512, 10)]:
        try:
            qps = bench_search(dtype_name, q, k)
            print(json.dumps({"search": dtype_name, "q": q, "k": k,
                              "qps": round(qps, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"search": dtype_name, "q": q, "k": k,
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
