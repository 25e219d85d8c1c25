"""Round-3: seq-128-specialized fused attention — kill the 6.5 ms path.

perf_ablate_r3.py located the encode step's cost: the attention score path
(scores+softmax+PV+layout) is 6.5 ms of 21.2 ms (30%) while carrying 2.8%
of the FLOPs. The round-2 fused kernel LOSES 12% at seq 128; its layout
folds [B,S,H,D] -> transpose -> [B·heads,S,D] (3 input relayouts + 1 output
relayout through HBM) and its grid groups (batch·head) rows.

This kernel consumes the PROJECTION OUTPUT LAYOUT [B, S, H=768] directly —
no transpose anywhere — and loops the 12 heads inside the program over
static lane slices [*, h·64:(h+1)·64]. Grid over batch rows only.

A/B within one run, mirror encoder (validated ~= real model in
perf_ablate_r3.py): xla einsum path vs fold-layout fused kernel vs this.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_attn128_r3.py > /tmp/attn128_r3.log 2>&1 < /dev/null &
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, H, HEADS, I, L = 128, 128, 768, 12, 3072, 12
DH = H // HEADS
REPS = 5
STEPS = 20
NEG_INF = -1e9


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


# ---------------- the seq-128 kernel ----------------

def _kernel128(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    """q/k/v/o: [G, S, heads*D] in the projection's native layout;
    bias: [G, S] fp32 padding bias. Heads loop over static lane slices."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    bias = bias_ref[...][:, None, :]          # [G, 1, Sk]
    D = q.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh = q[..., sl], k[..., sl], v[..., sl]     # [G, S, D]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=2, keepdims=True)).astype(v.dtype)
        ctx = jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[..., sl] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group",))
def fused128(q, k, v, mask, group: int = 4):
    """q/k/v: [B, S, H] (projection layout), mask: [B, S] -> [B, S, H]."""
    bias = ((1.0 - mask.astype(jnp.float32)) * NEG_INF)
    spec = pl.BlockSpec((group, S, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((group, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel128, scale=1.0 / (DH ** 0.5), heads=HEADS),
        out_shape=jax.ShapeDtypeStruct((B, S, H), q.dtype),
        grid=(B // group,),
        in_specs=[bias_spec, spec, spec, spec],
        out_specs=spec,
    )(bias, q, k, v)


# ---------------- mirror encoder ----------------

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


def layer_norm(x, scale_bias):
    s, b = scale_bias
    x32 = x.astype(jnp.float32)
    y = jax.nn.standardize(x32, axis=-1, epsilon=1e-5)
    return (y * s + b).astype(jnp.bfloat16)


def encoder(params, ids, mask, *, attn: str, group: int = 4):
    x = params["emb"][ids] + params["pos"][:S][None, :, :]
    x = layer_norm(x, params["ln0"])
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF
                     ).astype(jnp.float32)
    for lp in params["layers"]:
        qf = (x.reshape(B * S, H) @ lp["q"]).reshape(B, S, H)
        kf = (x.reshape(B * S, H) @ lp["k"]).reshape(B, S, H)
        vf = (x.reshape(B * S, H) @ lp["v"]).reshape(B, S, H)
        if attn == "fused128":
            ctx = fused128(qf, kf, vf, mask, group=group)
        elif attn == "fold":
            from ance_tpu.ops.fused_attention import fused_attention
            r = lambda t: t.reshape(B, S, HEADS, DH)
            ctx = fused_attention(r(qf), r(kf), r(vf), mask
                                  ).reshape(B, S, H)
        else:  # xla, the production auto path at seq 128 (bf16 softmax)
            r = lambda t: t.reshape(B, S, HEADS, DH)
            q, k, v = r(qf), r(kf), r(vf)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(DH)
            s = s + bias.astype(s.dtype)
            p = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(p.dtype)
                             ).astype(jnp.bfloat16).reshape(B, S, H)
        attn_out = (ctx.reshape(B * S, H) @ lp["o"]).reshape(B, S, H)
        x = layer_norm(x + attn_out, lp["ln1"])
        h = x.reshape(B * S, H) @ lp["up"]
        h = jax.nn.gelu(h, approximate=True)
        h = (h @ lp["down"]).reshape(B, S, H)
        x = layer_norm(x + h, lp["ln2"])
    return x[:, 0, :] @ params["head"]


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
    mask = np.ones((B, S), np.int32)
    mask[:, 100:] = 0       # realistic padding tail
    mask = jnp.asarray(mask)

    # correctness first: one layer's worth of attention vs the xla math
    q = jnp.asarray(rs.randn(B, S, H) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, S, H) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, S, H) * 0.3, jnp.bfloat16)
    r = lambda t: t.reshape(B, S, HEADS, DH)
    s = jnp.einsum("bqhd,bkhd->bhqk", r(q).astype(jnp.float32),
                   r(k).astype(jnp.float32)) / np.sqrt(DH)
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, r(v).astype(jnp.float32)
                     ).reshape(B, S, H)
    got = fused128(q, k, v, mask).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(json.dumps({"max_abs_err_vs_fp32_ref": round(err, 5)}), flush=True)
    assert err < 0.05, "kernel math diverges"

    results = {}
    for name, kw in (("xla", {"attn": "xla"}),
                     ("fold", {"attn": "fold"}),
                     ("fused128_g2", {"attn": "fused128", "group": 2}),
                     ("fused128_g4", {"attn": "fused128", "group": 4}),
                     ("fused128_g8", {"attn": "fused128", "group": 8})):
        try:
            results[name] = round(timed(
                functools.partial(encoder, **kw), params, ids, mask), 3)
        except Exception as e:  # VMEM overflow etc — record and move on
            results[name] = f"failed: {type(e).__name__}"
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"summary": results, "batch": B}), flush=True)


if __name__ == "__main__":
    main()
