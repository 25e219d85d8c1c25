"""Round-3 MFU experiment: ablate the elementwise/HBM suspects in the
FirstP encode path (VERDICT r2 #2 — attack the 46% → 90% gap).

Hypotheses at B=256, S=128, bf16 (GEMMs are ~31 ms of the ~62 ms step at
the measured 90% pure-GEMM ceiling — where do the other ~30 ms go?):
  H1 exact-gelu erf: [B·S, 4H] transcendental on the VPU, 12x per pass
  H2 fp32 LayerNorms: bf16→fp32→bf16 cast round-trips on the residual
     stream, 24x per pass
  H3 fp32 softmax logits: [B, h, S, S] fp32 = 201 MB HBM traffic/layer
  H4 unfused QKV: activations read 3x (measured -10% in r2; re-test
     combined with the others — interactions matter)
  H5 batch: bigger B amortizes fixed overhead

Each variant measures forward encode throughput (passages/s), median of 5
timed loops; embedding deviation vs the baseline config is reported so
accuracy cost is visible next to the speedup. JSONL to stdout.
"""

import itertools
import json
import statistics
import time

import numpy as np

SEQ = 128
STEPS = 10
SAMPLES = 5


def measure(jax, jnp, batch, *, attention, fp32_ln, gelu_approx, fused_qkv,
            base_emb=None):
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    cfg = EncoderConfig(dtype=jnp.bfloat16, attention_impl=attention,
                        fp32_layernorm=fp32_ln, gelu_approx=gelu_approx,
                        fused_qkv=fused_qkv)
    model = RobertaDot(cfg, out_dim=768)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 50000, (batch, SEQ)), jnp.int32)
    mask = jnp.ones((batch, SEQ), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2], mask[:2]
                                 )["params"]

    @jax.jit
    def encode(p, i, m):
        return model.apply({"params": p}, i, m, method=model.body_emb)

    out = encode(params, ids, mask)
    emb = np.asarray(out, np.float32)

    def once():
        t0 = time.perf_counter()
        o = None
        for _ in range(STEPS):
            o = encode(params, ids, mask)
        float(jnp.sum(o))  # force full execution (remote chip)
        return batch * STEPS / (time.perf_counter() - t0)

    once()  # warm
    xs = [once() for _ in range(SAMPLES)]
    rec = {"pps": round(statistics.median(xs), 1),
           "spread": [round(min(xs), 1), round(max(xs), 1)]}
    if base_emb is not None and base_emb.shape == emb.shape:
        # cosine similarity row-wise vs baseline embeddings
        a = base_emb / np.linalg.norm(base_emb, axis=1, keepdims=True)
        b = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        rec["min_cos_vs_base"] = round(float((a * b).sum(1).min()), 6)
    return rec, emb


def main():
    import jax
    import jax.numpy as jnp

    base_kw = dict(attention="xla", fp32_ln=True, gelu_approx=False,
                   fused_qkv=False)
    rec, base_emb = measure(jax, jnp, 256, **base_kw)
    print(json.dumps({"variant": "base", "batch": 256, **base_kw, **rec}),
          flush=True)

    variants = [
        ("gelu_tanh", dict(gelu_approx=True)),
        ("bf16_ln", dict(fp32_ln=False)),
        ("bf16_softmax", dict(attention="xla_bf16")),
        ("gelu+ln", dict(gelu_approx=True, fp32_ln=False)),
        ("gelu+ln+softmax", dict(gelu_approx=True, fp32_ln=False,
                                 attention="xla_bf16")),
        ("all+fused_qkv", dict(gelu_approx=True, fp32_ln=False,
                               attention="xla_bf16", fused_qkv=True)),
    ]
    results = {}
    for name, delta in variants:
        kw = dict(base_kw)
        kw.update(delta)
        rec, _ = measure(jax, jnp, 256, base_emb=base_emb, **kw)
        results[name] = rec
        print(json.dumps({"variant": name, "batch": 256, **kw, **rec}),
              flush=True)

    # best fixed-accuracy-cost variant → batch sweep
    best = max(results.items(), key=lambda kv: kv[1]["pps"])[0]
    kw = dict(base_kw)
    kw.update(dict(variants)[best])
    for b in (128, 512, 1024):
        rec, _ = measure(jax, jnp, b, **kw)
        print(json.dumps({"variant": f"{best}@b{b}", "batch": b, **kw,
                          **rec}), flush=True)


if __name__ == "__main__":
    main()
