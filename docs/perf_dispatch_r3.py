"""Round-3 experiment: does per-call dispatch tax the corpus encode?

The corpus encode (the production hot path — 8.8M passages per refresh)
dispatches one jitted call per batch from Python, with up to 16 results in
flight (train/encode.py::encode_cache). On the tunneled chip, per-call
dispatch is a measured ~10-18 ms fixed cost for SEARCH calls (the q=512 vs
q=2048 knee, docs/DESIGN.md §5) — if encode dispatch is not fully hidden
behind the ~21 ms device step at b128, a single-dispatch lax.scan over many
batches recovers the difference, and the same fused-slice shape belongs in
the refresh path.

A/B within one run (the chip is time-shared; only within-run is valid):
  A  Python loop of N jitted encode calls (the encode_cache pattern)
  B  ONE jitted lax.scan over the same N stacked batches
  C  B but with jnp.stack'd inputs resident (excludes H2D of the stack)

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_dispatch_r3.py > /tmp/dispatch_r3.log 2>&1 < /dev/null &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH, SEQ, N = 128, 128, 40
REPS = 3


def materialize(x):
    return float(jnp.sum(x))


def main():
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=768)
    rs = np.random.RandomState(0)
    ids_all = rs.randint(4, 50000, (N, BATCH, SEQ)).astype(np.int32)
    mask_all = np.ones((N, BATCH, SEQ), np.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(ids_all[0, :2]),
                                 jnp.asarray(mask_all[0, :2]))["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.body_emb)

    @jax.jit
    def encode_scan(params, ids, mask):
        def body(_, im):
            return None, model.apply({"params": params}, im[0], im[1],
                                     method=model.body_emb)
        _, out = jax.lax.scan(body, None, (ids, mask))
        return out

    # compile both
    materialize(encode(params, jnp.asarray(ids_all[0]),
                       jnp.asarray(mask_all[0])))
    ids_dev = jnp.asarray(ids_all)
    mask_dev = jnp.asarray(mask_all)
    materialize(encode_scan(params, ids_dev, mask_dev))

    results = {}
    for rep in range(REPS):
        # A: per-batch dispatch from host arrays (encode_cache pattern)
        t0 = time.perf_counter()
        out = None
        for i in range(N):
            out = encode(params, jnp.asarray(ids_all[i]),
                         jnp.asarray(mask_all[i]))
        materialize(out)
        a = N * BATCH / (time.perf_counter() - t0)

        # B: one dispatch, H2D of the whole stack included
        t0 = time.perf_counter()
        out = encode_scan(params, jnp.asarray(ids_all), jnp.asarray(mask_all))
        materialize(out)
        b = N * BATCH / (time.perf_counter() - t0)

        # C: one dispatch, inputs already device-resident
        t0 = time.perf_counter()
        out = encode_scan(params, ids_dev, mask_dev)
        materialize(out)
        c = N * BATCH / (time.perf_counter() - t0)
        results[f"rep{rep}"] = {"loop_pps": round(a, 1),
                                "scan_h2d_pps": round(b, 1),
                                "scan_resident_pps": round(c, 1)}
        print(json.dumps(results[f"rep{rep}"]), flush=True)

    med = lambda k: sorted(r[k] for r in results.values())[REPS // 2]
    print(json.dumps({
        "summary": {k: med(k) for k in ("loop_pps", "scan_h2d_pps",
                                        "scan_resident_pps")},
        "batch": BATCH, "n_batches": N}), flush=True)


if __name__ == "__main__":
    main()
