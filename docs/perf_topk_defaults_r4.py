"""Round-4: pick production defaults for the fused blockmax top-k.

The round-4 kernel-level sweep (docs/perf_topk_sweep_r4.py) found phase-1
wins for block_size=32 (bf16) and chunk_rows=2048 (int8 corpus, bf16
query), but phase-1 time alone cannot settle a default: phase 3 gathers
k·block_size candidate rows per query, so doubling block_size doubles
phase-3 work — at k=200 the r3 sweep showed bs32 LOSING end to end
(123 ms vs 87 ms). This script measures topk_blockmax END TO END on the
real chip at both production shapes:

  * dev/serve shape: Q=2048, k=10   (dev eval + serving)
  * mining shape:    Q=512,  k=200  (negative mining)

over a 1M x 768 corpus, for bf16 and int8 storage, across the
{block_size, chunk_rows, phase1_dtype} grid the sweeps flagged, with the
scan-merge index ids as the exactness reference. Winners become the
defaults in index/flat.py::FlatIPIndex._topk_fn.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_topk_defaults_r4.py > /tmp/topk_defaults.log 2>&1 &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.ops.topk import topk_blockmax

N, D = 1_000_000, 768
REPS = 5


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def run(tag, queries, corpus, k, ref_ids, **kw):
    try:
        s, i = topk_blockmax(queries, corpus, k=k, **kw)
        mat(s)  # compile
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            s, i = topk_blockmax(queries, corpus, k=k, **kw)
            mat(s)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        agree = float((np.asarray(i) == ref_ids).mean()) if ref_ids is not None \
            else None
        rec = {"cfg": tag, "ms": round(med * 1e3, 1),
               "qps": round(queries.shape[0] / med, 1),
               "spread_ms": [round(min(times) * 1e3, 1),
                             round(max(times) * 1e3, 1)]}
        if agree is not None:
            rec["agree"] = round(agree, 6)
        print(json.dumps(rec), flush=True)
        return med, np.asarray(i)
    except Exception as e:  # remote-compile crashes on some configs
        print(json.dumps({"cfg": tag, "error": str(e)[:160]}), flush=True)
        return None, None


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "N": N}), flush=True)
    kc, kq = jax.random.split(jax.random.PRNGKey(0))
    corpus_f = jax.random.normal(kc, (N, D), jnp.float32)
    corpus_bf = corpus_f.astype(jnp.bfloat16)
    # per-dim int8 quantization (what quantize='dims' stores)
    scales = jnp.maximum(jnp.max(jnp.abs(corpus_f), axis=0), 1e-12) / 127.0
    corpus_i8 = jnp.clip(jnp.round(corpus_f / scales), -127, 127
                         ).astype(jnp.int8)
    mat(corpus_bf[:1]); mat(corpus_i8[:1])

    for tag_shape, Q, k in (("dev", 2048, 10), ("mine", 512, 200)):
        q = jax.random.normal(jax.random.PRNGKey(Q), (Q, D), jnp.float32)
        # int8 path folds the scales into the query (flat.py::prep)
        q_folded = q * scales
        mat(q); mat(q_folded)
        ref = None

        grid = [(16, 1024), (32, 1024), (16, 2048), (32, 2048)]
        for bs, cr in grid:
            _, ids = run(f"{tag_shape}/bf16/bs{bs}/cr{cr}",
                         q, corpus_bf, k, ref,
                         block_size=bs, chunk_rows=cr)
            if ref is None and ids is not None:
                ref = ids  # bs16/cr1024 bf16 = the round-3 shipped default
        for bs, cr in grid:
            run(f"{tag_shape}/int8-bf16p1/bs{bs}/cr{cr}",
                q_folded, corpus_i8, k, ref,
                block_size=bs, chunk_rows=cr, phase1_dtype=jnp.bfloat16)
        run(f"{tag_shape}/int8-fp32p1/bs16/cr1024 (r3 default)",
            q_folded, corpus_i8, k, ref, block_size=16, chunk_rows=1024)


if __name__ == "__main__":
    main()
