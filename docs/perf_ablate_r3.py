"""Round-3: IN-CONTEXT marginal cost of each encode-step component.

perf_decomp_r3.py measured ISOLATED op costs (sum-of-parts 57.6 ms vs
21.6 ms full step — XLA fusion erases 62%), which bounds but does not
locate the remaining non-GEMM time. This script measures what each
component costs IN FUSED CONTEXT: a mirror of the 12-layer encoder built
from primitives (validated against the real model's speed first), then
variants with ONE component surgically removed. full − ablated = the
component's marginal cost after all the fusion XLA can find.

Variants (bf16, B=128, S=128, roberta-base geometry):
  mirror      - full mirror stack (must be ~ the real model's ms)
  no_softmax  - scores used raw (scaled), no max-sub/exp/sum/div
  no_mask     - softmax without the additive mask
  no_ln       - both residual LayerNorms removed (residual adds stay)
  no_gelu     - FFN activation = identity
  no_attn_mm  - scores/softmax/PV replaced by ctx = v (projections stay)
  gemm_only   - qkv+out+FFN GEMMs and residuals only
  fp32_ln     - mirror but fp32 LN (the production default) vs bf16 LN

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_ablate_r3.py > /tmp/ablate_r3.log 2>&1 < /dev/null &
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

B, S, H, HEADS, I, L = 128, 128, 768, 12, 3072, 12
DH = H // HEADS
REPS = 5
STEPS = 20


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def make_params(rs):
    def w(*shape):
        return jnp.asarray(rs.randn(*shape) * 0.02, jnp.bfloat16)
    layers = []
    for _ in range(L):
        layers.append({
            "q": w(H, H), "k": w(H, H), "v": w(H, H), "o": w(H, H),
            "up": w(H, I), "down": w(I, H),
            "ln1": (jnp.ones(H, jnp.float32), jnp.zeros(H, jnp.float32)),
            "ln2": (jnp.ones(H, jnp.float32), jnp.zeros(H, jnp.float32)),
        })
    return {"emb": w(50265, H), "pos": w(S + 2, H),
            "ln0": (jnp.ones(H, jnp.float32), jnp.zeros(H, jnp.float32)),
            "head": w(H, H), "layers": layers}


def layer_norm(x, scale_bias, fp32=False):
    s, b = scale_bias
    if fp32:
        x32 = x.astype(jnp.float32)
        y = jax.nn.standardize(x32, axis=-1, epsilon=1e-5)
        return (y * s + b).astype(jnp.bfloat16)
    y = jax.nn.standardize(x, axis=-1, epsilon=1e-5)
    return (y * s.astype(jnp.bfloat16) + b.astype(jnp.bfloat16))


def encoder(params, ids, mask, *, softmax=True, use_mask=True, ln=True,
            gelu=True, attn_mm=True, fp32_ln=False):
    x = params["emb"][ids] + params["pos"][:S][None, :, :]
    x = layer_norm(x, params["ln0"], fp32_ln)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9
                     ).astype(jnp.bfloat16)
    for lp in params["layers"]:
        q = (x.reshape(B * S, H) @ lp["q"]).reshape(B, S, HEADS, DH)
        k = (x.reshape(B * S, H) @ lp["k"]).reshape(B, S, HEADS, DH)
        v = (x.reshape(B * S, H) @ lp["v"]).reshape(B, S, HEADS, DH)
        if attn_mm:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(DH)
            if use_mask:
                scores = scores + bias
            if softmax:
                probs = jax.nn.softmax(scores, axis=-1)
            else:
                probs = scores / S
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            ctx = v
        ctx = ctx.reshape(B * S, H)
        attn = (ctx @ lp["o"]).reshape(B, S, H)
        x = x + attn
        if ln:
            x = layer_norm(x, lp["ln1"], fp32_ln)
        h = x.reshape(B * S, H) @ lp["up"]
        if gelu:
            h = jax.nn.gelu(h, approximate=True)
        h = (h @ lp["down"]).reshape(B, S, H)
        x = x + h
        if ln:
            x = layer_norm(x, lp["ln2"], fp32_ln)
    pooled = x[:, 0, :]                       # CLS
    return pooled @ params["head"]


def timed(fn, *args):
    f = jax.jit(fn)
    mat(f(*args))
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = None
        for _ in range(STEPS):
            out = f(*args)
        mat(out)
        best.append((time.perf_counter() - t0) / STEPS * 1000.0)
    return min(best)


def main():
    rs = np.random.RandomState(0)
    params = make_params(rs)
    ids = jnp.asarray(rs.randint(4, 50000, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    # the real model, for mirror validation
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    model = RobertaDot(EncoderConfig(dtype=jnp.bfloat16), out_dim=768)
    mparams = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2],
                                  mask[:2])["params"]
    real = timed(lambda p, i, m: model.apply(
        {"params": p}, i, m, method=model.body_emb), mparams, ids, mask)

    variants = {
        "mirror": {},
        "no_softmax": {"softmax": False},
        "no_mask": {"use_mask": False},
        "no_ln": {"ln": False},
        "no_gelu": {"gelu": False},
        "no_attn_mm": {"attn_mm": False},
        "gemm_only": {"attn_mm": False, "ln": False, "gelu": False},
        "fp32_ln": {"fp32_ln": True},
    }
    t = {"real_model": real}
    for name, kw in variants.items():
        t[name] = timed(partial(encoder, **kw), params, ids, mask)
        print(json.dumps({name: round(t[name], 3)}), flush=True)

    m = t["mirror"]
    print(json.dumps({"summary": {
        "real_model_ms": round(real, 3),
        "mirror_ms": round(m, 3),
        "marginal_softmax_ms": round(m - t["no_softmax"], 3),
        "marginal_mask_ms": round(m - t["no_mask"], 3),
        "marginal_ln_ms": round(m - t["no_ln"], 3),
        "marginal_gelu_ms": round(m - t["no_gelu"], 3),
        "marginal_attn_path_ms": round(m - t["no_attn_mm"], 3),
        "marginal_fp32_ln_ms": round(t["fp32_ln"] - m, 3),
        "gemm_only_ms": round(t["gemm_only"], 3),
        "passages_per_sec_mirror": round(B / m * 1000.0, 1),
    }}), flush=True)


if __name__ == "__main__":
    main()
