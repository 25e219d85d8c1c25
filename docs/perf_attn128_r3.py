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
    bias = bias_ref[...]                      # [G, 1, Sk] broadcasts over q
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
    # [B, 1, S]: the singleton middle dim keeps the block's trailing dims
    # legal for any group size (Mosaic requires last-two dims (8,128)-
    # divisible OR equal to the full array dims)
    bias = ((1.0 - mask.astype(jnp.float32)) * NEG_INF)[:, None, :]
    spec = pl.BlockSpec((group, S, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((group, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel128, scale=1.0 / (DH ** 0.5), heads=HEADS),
        out_shape=jax.ShapeDtypeStruct((B, S, H), q.dtype),
        grid=(B // group,),
        in_specs=[bias_spec, spec, spec, spec],
        out_specs=spec,
    )(bias, q, k, v)


# ---------------- fused attention BLOCK (projections + attention) --------

def _block_kernel(bias_ref, x_ref, wq_ref, wk_ref, wv_ref, wo_ref, o_ref,
                  *, scale, heads):
    """Whole attention sub-block in VMEM: q/k/v/ctx never touch HBM.
    x/o: [G, S, H]; weights [H, H] (constant blocks — fetched once);
    bias [G, 1, S]."""
    G, S_, H_ = x_ref.shape
    x2 = x_ref[...].reshape(G * S_, H_)
    dt = x_ref.dtype

    def dot32(a, b):      # Mosaic requires a 32-bit matmul accumulator
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32
                           ).astype(dt)

    q = dot32(x2, wq_ref[...]).reshape(G, S_, H_)
    k = dot32(x2, wk_ref[...]).reshape(G, S_, H_)
    v = dot32(x2, wv_ref[...]).reshape(G, S_, H_)
    bias = bias_ref[...]
    D = H_ // heads
    parts = []          # .at[].set lowers to scatter (unsupported on TPU)
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(q[..., sl], k[..., sl],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=2, keepdims=True)).astype(x_ref.dtype)
        c = jax.lax.dot_general(p, v[..., sl], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        parts.append(c.astype(x_ref.dtype))
    ctx = jnp.concatenate(parts, axis=-1)
    out = dot32(ctx.reshape(G * S_, H_), wo_ref[...])
    o_ref[...] = out.reshape(G, S_, H_).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group",))
def fused_block(x, wq, wk, wv, wo, mask, group: int = 2):
    bias = ((1.0 - mask.astype(jnp.float32)) * NEG_INF)[:, None, :]
    xspec = pl.BlockSpec((group, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((H, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((group, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, scale=1.0 / (DH ** 0.5),
                          heads=HEADS),
        out_shape=jax.ShapeDtypeStruct((B, S, H), x.dtype),
        grid=(B // group,),
        in_specs=[bias_spec, xspec, wspec, wspec, wspec, wspec],
        out_specs=xspec,
    )(bias, x, wq, wk, wv, wo)


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
        if attn == "block":
            attn_out = fused_block(x, lp["q"], lp["k"], lp["v"], lp["o"],
                                   mask, group=group)
            x = layer_norm(x + attn_out, lp["ln1"])
            h = x.reshape(B * S, H) @ lp["up"]
            h = jax.nn.gelu(h, approximate=True)
            h = (h @ lp["down"]).reshape(B, S, H)
            x = layer_norm(x + h, lp["ln2"])
            continue
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

    # correctness of the whole fused block vs the unfused bf16 math
    lp = params["layers"][0]
    xin = jnp.asarray(rs.randn(B, S, H) * 0.3, jnp.bfloat16)
    qf = (xin.reshape(B * S, H) @ lp["q"]).reshape(B, S, H)
    kf = (xin.reshape(B * S, H) @ lp["k"]).reshape(B, S, H)
    vf = (xin.reshape(B * S, H) @ lp["v"]).reshape(B, S, H)
    ctx = fused128(qf, kf, vf, mask)
    ref_blk = (ctx.reshape(B * S, H) @ lp["o"]).reshape(B, S, H
               ).astype(jnp.float32)
    got_blk = fused_block(xin, lp["q"], lp["k"], lp["v"], lp["o"], mask
                          ).astype(jnp.float32)
    berr = float(jnp.max(jnp.abs(got_blk - ref_blk)))
    print(json.dumps({"block_max_abs_err_vs_unfused": round(berr, 5)}),
          flush=True)

    results = {}
    for name, kw in (("xla", {"attn": "xla"}),
                     ("fold", {"attn": "fold"}),
                     ("fused128_g2", {"attn": "fused128", "group": 2}),
                     ("fused128_g4", {"attn": "fused128", "group": 4}),
                     ("fused128_g8", {"attn": "fused128", "group": 8}),
                     ("block_g1", {"attn": "block", "group": 1}),
                     ("block_g2", {"attn": "block", "group": 2}),
                     ("block_g4", {"attn": "block", "group": 4})):
        try:
            results[name] = round(timed(
                functools.partial(encoder, **kw), params, ids, mask), 3)
        except Exception as e:  # VMEM overflow etc — record and move on
            results[name] = f"failed: {type(e).__name__}"
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"summary": results, "batch": B}), flush=True)


if __name__ == "__main__":
    main()
