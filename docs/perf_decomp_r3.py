"""Round-3: decompose the FirstP encode step into its cost centers.

The headline is 6.1k p/s = 67.6% MFU at b128/seq128 against a measured 90%
pure-GEMM ceiling. This script names where the other ~22% lives: each
constituent op is timed AT THE MODEL'S EXACT SHAPES, amortized inside a
jitted lax.fori_loop (per-op kernels are ~100 us — far below the tunnel's
per-call dispatch floor — so N iterations ride one dispatch), then the sum
of parts is checked against the measured full step.

Per-layer ops at [B=128, S=128, H=768, heads=12, I=3072], bf16:
  GEMMs: qkv+out 4x [BS,H]x[H,H], ffn [BS,H]x[H,I] + [BS,I]x[I,H]
  attention scores: [B,h,S,dh]x[B,h,dh,S] -> softmax(bf16) -> x [B,h,S,S]x[B,h,S,dh]
  elementwise: 2x LayerNorm fp32 on [BS,H], tanh-gelu on [BS,I]
  layout: [B,S,H] <-> [B,h,S,dh] transposes around the attention einsum
x12 layers + embeddings (gather + LN) + masked-mean pool + head Dense.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_decomp_r3.py > /tmp/decomp_r3.log 2>&1 < /dev/null &
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

B, S, H, HEADS, I = 128, 128, 768, 12, 3072
DH = H // HEADS
N = 300   # fori_loop iterations per op timing
REPS = 3


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed_loop(fn, *args, n=N):
    """One dispatch: scan fn n times with a data dependency to defeat CSE."""

    @jax.jit
    def run(*a):
        def body(i, carry):
            out = fn(*([carry] + list(a[1:])))
            # chain iterations through a FULL reduction of the output:
            # consuming a single element lets XLA slice-DCE the op (first
            # attempt measured gemm_hi at an impossible 592 TF/s), and a *0
            # coupling could be simplified away entirely. The sum fuses
            # into the producer's epilogue, so its overhead is small.
            return carry + (jnp.sum(out) * 1e-20).astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, a[0])

    mat(run(*args))  # compile
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        mat(run(*args))
        best.append((time.perf_counter() - t0) / n * 1000.0)  # ms/iter
    return min(best)


def main():
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rs.randn(B * S, H), bf)
    xi = jnp.asarray(rs.randn(B * S, I), bf)
    w_hh = jnp.asarray(rs.randn(H, H) * 0.02, bf)
    w_hi = jnp.asarray(rs.randn(H, I) * 0.02, bf)
    w_ih = jnp.asarray(rs.randn(I, H) * 0.02, bf)
    q4 = jnp.asarray(rs.randn(B, HEADS, S, DH), bf)
    scores = jnp.asarray(rs.randn(B, HEADS, S, S), bf)
    x3 = jnp.asarray(rs.randn(B, S, H), bf)
    ids = jnp.asarray(rs.randint(4, 50000, (B, S)), jnp.int32)
    emb_table = jnp.asarray(rs.randn(50265, H) * 0.02, bf)

    t = {}
    # --- GEMMs (the MXU work the MFU accounting counts) ---
    t["gemm_hh"] = timed_loop(lambda a, w: a @ w, x, w_hh)          # x4/layer
    t["gemm_hi"] = timed_loop(lambda a, w: a @ w, x, w_hi)
    t["gemm_ih"] = timed_loop(lambda a, w: a @ w, xi, w_ih)

    # --- attention non-projection path ---
    t["attn_scores"] = timed_loop(
        lambda q, k: jnp.einsum("bhqd,bhkd->bhqk", q, k), q4, q4)
    t["attn_pv"] = timed_loop(
        lambda s, v: jnp.einsum("bhqk,bhkd->bhqd", s, v), scores, q4)
    t["softmax_bf16"] = timed_loop(
        lambda s: jax.nn.softmax(s, axis=-1), scores)
    t["softmax_fp32"] = timed_loop(
        lambda s: jax.nn.softmax(s.astype(jnp.float32), axis=-1
                                 ).astype(bf), scores)
    # layout: split-heads + merge-heads round trip
    t["head_layout"] = timed_loop(
        lambda a: a.reshape(B, S, HEADS, DH).transpose(0, 2, 1, 3)
        .transpose(0, 2, 1, 3).reshape(B, S, H), x3)

    # --- elementwise ---
    t["layernorm_fp32"] = timed_loop(
        lambda a: (jax.nn.standardize(a.astype(jnp.float32), axis=-1,
                                      epsilon=1e-5)).astype(bf), x)
    t["layernorm_bf16"] = timed_loop(
        lambda a: jax.nn.standardize(a, axis=-1, epsilon=1e-5), x)
    t["gelu_tanh"] = timed_loop(partial(jax.nn.gelu, approximate=True), xi)
    t["gelu_erf"] = timed_loop(partial(jax.nn.gelu, approximate=False), xi)
    t["residual_add"] = timed_loop(lambda a, b: a + b, x, x)

    # --- embeddings + pool (once per pass) ---
    t["embed_gather"] = timed_loop(lambda i, e: e[i], ids, emb_table)
    t["masked_mean_pool"] = timed_loop(
        lambda a: jnp.mean(a, axis=1), x3)

    for k, v in t.items():
        print(json.dumps({k: round(v, 4)}), flush=True)

    # predicted per-layer and per-pass cost (isolated-op model — real fusion
    # can only do better, so predicted >= measured means fusion is working)
    layer = (4 * t["gemm_hh"] + t["gemm_hi"] + t["gemm_ih"]
             + t["attn_scores"] + t["attn_pv"] + t["softmax_bf16"]
             + t["head_layout"] + 2 * t["layernorm_fp32"] + t["gelu_tanh"]
             + 4 * t["residual_add"])
    gemm_only = 4 * t["gemm_hh"] + t["gemm_hi"] + t["gemm_ih"]
    pred = 12 * layer + t["embed_gather"] + t["layernorm_fp32"] \
        + t["masked_mean_pool"] + t["gemm_hh"]

    # measured full step for the same batch
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    model = RobertaDot(EncoderConfig(dtype=bf), out_dim=768)
    mask = jnp.ones((B, S), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2],
                                 mask[:2])["params"]

    @jax.jit
    def encode(p, i, m):
        return model.apply({"params": p}, i, m, method=model.body_emb)

    mat(encode(params, ids, mask))
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = None
        for _ in range(20):
            out = encode(params, ids, mask)
        mat(out)
        best.append((time.perf_counter() - t0) / 20 * 1000.0)
    full = min(best)

    print(json.dumps({
        "summary": {
            "full_step_ms": round(full, 3),
            "predicted_sum_of_parts_ms": round(pred, 3),
            "gemm_per_layer_ms": round(gemm_only, 4),
            "nongemm_per_layer_ms": round(layer - gemm_only, 4),
            "gemm_fraction_of_parts": round(12 * gemm_only / pred, 3),
            "passages_per_sec": round(B / full * 1000.0, 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
