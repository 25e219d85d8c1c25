"""Encode-path performance sweep on the real TPU chip.

Measures FirstP corpus-encode throughput (roberta-base geometry, bf16,
seq 128) across candidate optimizations, printing one JSON line per
variant. Used to choose defaults; results recorded in docs/DESIGN.md §5.

Run:  python docs/perf_sweep.py [--quick]
"""

import argparse
import json
import time

import numpy as np

SEQ = 128
STEPS = 10
GFLOP_PER_PASSAGE = 21.8


def measure(model, batch, steps=STEPS):
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 50000, (batch, SEQ)), np.int32)
    mask = jnp.ones((batch, SEQ), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2], mask[:2]
                                 )["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.body_emb)

    float(jnp.sum(encode(params, ids, mask)))  # compile + settle
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = encode(params, ids, mask)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    dev = jax.devices()[0]
    print(json.dumps({"device": getattr(dev, "device_kind", "?"),
                      "platform": dev.platform}))

    variants = [
        ("baseline b256", dict(), 256),
        ("b512", dict(), 512),
        ("b1024", dict(), 1024),
        ("bf16 layernorm b256", dict(fp32_layernorm=False), 256),
        ("fused qkv b256", dict(fused_qkv=True), 256),
        ("fused qkv + bf16 ln b256",
         dict(fused_qkv=True, fp32_layernorm=False), 256),
        ("fused qkv + bf16 ln b512",
         dict(fused_qkv=True, fp32_layernorm=False), 512),
        ("attention fused b256", dict(attention_impl="fused"), 256),
    ]
    if args.quick:
        variants = variants[:2]

    for name, overrides, batch in variants:
        try:
            cfg = EncoderConfig(dtype=jnp.bfloat16, **overrides)
            model = RobertaDot(cfg, out_dim=768)
            pps = measure(model, batch)
            tf = pps * GFLOP_PER_PASSAGE / 1000.0
            print(json.dumps({"variant": name, "passages_per_sec":
                              round(pps, 1), "tflops": round(tf, 1)}))
        except Exception as e:  # keep sweeping past unsupported variants
            print(json.dumps({"variant": name, "error":
                              f"{type(e).__name__}: {e}"[:200]}))


if __name__ == "__main__":
    main()
