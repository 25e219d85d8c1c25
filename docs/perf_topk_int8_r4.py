"""Round-4: int8 MXU path in the blockmax kernel (VERDICT r3 next #4).

Round-3 left two known inefficiencies in the quantized search path:
  * the kernel upcast the int8 corpus tile to the QUERY dtype, and the
    quantized index hands the kernel fp32 queries — so phase 1 ran at the
    fp32 MXU rate (ops/topk.py:57-58 @r3, ADVICE.md r3);
  * the int8 storage win measured only 1.18x over bf16.

This measures, on the real chip at the production shape (1M x 768,
dev shape Q=2048 k=10 and mining shape Q=512 k=200), four phase-1 variants
of the same fused blockmax search over the same per-dim-quantized corpus:

  fp32  — int8 corpus upcast to fp32 queries (the round-3 behavior)
  bf16  — queries cast to bf16, corpus upcast to bf16 (bf16 MXU rate)
  int8  — queries per-row-quantized to int8, native int8 x int8 → int32
          MXU multiply (2x bf16 peak on v5e)
  [baseline] bf16 corpus + bf16 queries (the unquantized index)

plus phase-1-only kernel times (blockmax_scores) and, for every variant,
agreement of the returned ids against the exact scan over the SAME int8
corpus (scales folded into the query) — the reduced-precision phase 1 only
selects candidate blocks; phase 3 rescores in fp32, so disagreement
measures true block-selection misses.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_topk_int8_r4.py > /tmp/topk_int8_r4.log 2>&1 < /dev/null &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.index.flat import quantize_dims_int8, topk_inner_product
from ance_tpu.ops.topk import blockmax_scores, topk_blockmax

N, D = 1_000_000, 768
REPS = 5


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, *args, **kw):
    out = fn(*args, **kw)
    jax.tree.map(lambda a: mat(a[:1]), out if isinstance(out, tuple)
                 else (out,))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.tree.map(lambda a: mat(a[:1]), out if isinstance(out, tuple)
                     else (out,))
        times.append(time.perf_counter() - t0)
    return out, sorted(times)[len(times) // 2], (min(times), max(times))


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "N": N, "D": D}),
          flush=True)
    kc, kq = jax.random.split(jax.random.PRNGKey(0))
    corpus_f = jax.random.normal(kc, (N, D), jnp.float32)
    corpus_f = corpus_f / jnp.linalg.norm(corpus_f, axis=1, keepdims=True)
    c8, scales = jax.jit(quantize_dims_int8)(corpus_f)
    mat(c8[:1])
    c16 = corpus_f.astype(jnp.bfloat16)
    mat(c16[:1])

    for tag, Q, k in (("dev", 2048, 10), ("mine", 512, 200)):
        q = jax.random.normal(jax.random.fold_in(kq, Q), (Q, D), jnp.float32)
        qs = q * scales[None, :]  # dim scales folded into the query
        mat(qs[:1])

        # ground truth over the SAME int8 corpus: exact streaming scan
        (_, ids_ref), t_scan, _ = timed(
            lambda: topk_inner_product(qs, c8, k=k))
        ids_ref = np.asarray(ids_ref)

        rows = {"shape": tag, "Q": Q, "k": k,
                "scan_int8_ms": round(t_scan * 1e3, 1)}

        # bf16-corpus baseline (the unquantized index path)
        (_, ids_b), t_b, sp_b = timed(
            lambda: topk_blockmax(q.astype(jnp.bfloat16), c16, k=k))
        rows["bf16_corpus_ms"] = round(t_b * 1e3, 1)
        rows["bf16_corpus_qps"] = round(Q / t_b, 1)

        for name, p1 in (("fp32", None), ("bf16", jnp.bfloat16),
                         ("int8", jnp.int8)):
            try:
                (_, ids_v), t_v, sp_v = timed(
                    lambda p=p1: topk_blockmax(qs, c8, k=k, phase1_dtype=p))
            except Exception as e:  # Mosaic may reject int8 dot on this gen
                rows[f"int8_{name}_error"] = str(e).splitlines()[0][:200]
                continue
            agree = float((np.sort(np.asarray(ids_v), 1) ==
                           np.sort(ids_ref, 1)).mean())
            rows[f"int8_{name}_ms"] = round(t_v * 1e3, 1)
            rows[f"int8_{name}_qps"] = round(Q / t_v, 1)
            rows[f"int8_{name}_agree"] = round(agree, 6)
        print(json.dumps(rows), flush=True)

        # phase-1-only kernel times at the dev shape (the 36%-of-peak story)
        if tag == "dev":
            NP = -(-N // 8192) * 8192  # blockmax_scores needs N % chunk == 0
            c16p = jnp.pad(c16, ((0, NP - N), (0, 0)))
            c8p = jnp.pad(c8, ((0, NP - N), (0, 0)))
            mat(c8p[-1:])
            p1_rows = {"phase1_shape": [Q, NP, D]}
            qb16 = qs.astype(jnp.bfloat16)
            qmax = jnp.maximum(jnp.max(jnp.abs(qs), axis=1, keepdims=True),
                               1e-12)
            q8 = jnp.clip(jnp.round(qs * (127.0 / qmax)),
                          -127, 127).astype(jnp.int8)
            mat(q8[:1])
            variants = [("bf16_bf16", qb16, c16p, {}),
                        ("fp32_int8", qs, c8p, {}),
                        ("bf16_int8", qb16, c8p, {}),
                        ("int8_int8", q8, c8p, {}),
                        # untried schedule levers on the best operands
                        ("bf16_int8_chunk2k", qb16, c8p,
                         dict(chunk_rows=2048)),
                        ("bf16_int8_chunk4k_qb512", qb16, c8p,
                         dict(chunk_rows=4096, q_block=512)),
                        ("bf16_bf16_chunk4k_qb512", qb16, c16p,
                         dict(chunk_rows=4096, q_block=512)),
                        ("bf16_bf16_bs32", qb16, c16p,
                         dict(block_size=32))]
            for name, qq, cc, kw in variants:
                try:
                    _, t, sp = timed(lambda a=qq, b=cc, w=kw:
                                     blockmax_scores(a, b, **w))
                except Exception as e:
                    msg = str(e).splitlines() or [type(e).__name__]
                    p1_rows[f"{name}_error"] = msg[0][:200]
                    continue
                tf = 2 * Q * NP * D / t / 1e12
                p1_rows[name] = {"ms": round(t * 1e3, 1),
                                 "tf_s": round(tf, 1),
                                 "spread_ms": [round(sp[0] * 1e3, 1),
                                               round(sp[1] * 1e3, 1)]}
                print(json.dumps({name: p1_rows[name]}), flush=True)
            print(json.dumps(p1_rows), flush=True)


if __name__ == "__main__":
    main()
