"""Fused whole-sequence attention for short sequences (Pallas, TPU).

The encoder's hot shapes (seq 128 passages, seq 512 MaxP chunks) fit entire
[S, S] score matrices in VMEM, so no online-softmax streaming is needed
(that is ``ops.flash_attention``'s job for long sequences). This kernel
computes QKᵀ → bias → softmax → PV for a GROUP of (batch·head) rows per
grid cell as batched MXU ops with vectorized VPU softmax — the [B, H, S, S]
fp32 logits never round-trip through HBM (the XLA path writes ~200 MB of
them per layer at B=256, S=128; measured encode 90.8 TF/s vs 176.6 TF/s
pure-GEMM ceiling on v5e).

Layout: heads fold into the leading dim ([B·H, S, D]) so every block's
trailing dims are the Mosaic-friendly (S, D); the padding bias is
precomputed per row OUTSIDE the kernel ([B·H, S], tiny) because Mosaic
cannot gather dynamic rows from values.

Backward: a second fused Pallas kernel (round 3): recompute scores +
softmax in VMEM, softmax-VJP, and the four gradient matmuls (dv = pᵀdo,
dp = do vᵀ, dq = ds k, dk = dsᵀq) batched per row group — the [S, S]
probability/gradient matrices never touch HBM either, and nothing is saved
from the forward but q/k/v/mask (flash-style memory profile). Set
``ANCE_FUSED_XLA_BWD=1`` to fall back to XLA-recompute backward.

Parity: identical math to ops.attention.xla_attention — bf16 QKᵀ with fp32
accumulation, fp32 softmax, bf16 probabilities into PV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ance_tpu.ops.attention import NEG_INF, mask_to_bias, xla_attention


def _fused_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One group of rows: batched [S, S] attention entirely in VMEM.
    Refs: bias (G, 1, S) fp32; q/k/v/o (G, S, D)."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    # bf16 inputs, fp32 accumulation — the xla_attention semantics
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [G, S, S]
    s = s * scale + bias_ref[...]  # [G, 1, S] broadcasts over queries
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    p = (p / l).astype(v.dtype)  # bf16 probabilities into PV, like XLA
    ctx = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[...] = ctx.astype(o_ref.dtype)


def _group_tile(rows: int, seq: int, head_dim: int) -> int:
    """Largest row-group fitting VMEM: 4 blocks [G, S, D] double-buffered by
    the pipeline (8×) plus ~3 [G, S, S] fp32 softmax temporaries."""
    budget = 10 * 1024 * 1024  # of the ~16 MB scoped VMEM
    for g in (32, 16, 8, 4, 2, 1):
        if rows % g:
            continue
        if 8 * g * seq * head_dim * 2 + 3 * g * seq * seq * 4 <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_forward(q, k, v, attention_mask, *, interpret: bool = False):
    B, S, H, D = q.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    qf, kf, vf = fold(q), fold(k), fold(v)
    # per-row additive padding bias, repeated across heads: [B·H, 1, S]
    # fp32 (the middle singleton keeps the block's trailing dims full-size
    # for ANY group tile, avoiding the sublane-divisibility rule)
    bias = jnp.repeat((1.0 - attention_mask.astype(jnp.float32)) * NEG_INF,
                      H, axis=0)[:, None, :]
    g = _group_tile(B * H, S, D)
    spec = pl.BlockSpec((g, S, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((g, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=1.0 / (D ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        grid=(B * H // g,),
        in_specs=[bias_spec, spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(bias, qf, kf, vf)
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def _fused_bwd_kernel(bias_ref, q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float):
    """Gradients for one row group, entirely in VMEM.

    Recomputes s → p (fp32, identical to the forward), then
      dv = pᵀ · do                         (bf16 p, like the forward's PV)
      dp = do · vᵀ
      ds = p ⊙ (dp − rowsum(dp ⊙ p))       (softmax VJP, fp32)
      dq = (ds·scale) · k,  dk = (ds·scale)ᵀ · q
    ds is cast to the input dtype for the MXU gradient matmuls (the only
    deviation from the XLA-recompute backward, within bf16 noise — guarded
    by test_fused_attention.py tolerances)."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[...]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)          # fp32 [G, Sq, Sk]
    pb = p.astype(v.dtype)
    dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
    dsb = (ds * scale).astype(q.dtype)
    dq = jax.lax.dot_general(dsb, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dsb, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _bwd_group_tile(rows: int, seq: int, head_dim: int) -> int:
    """Row group for the backward kernel: 8 [G, S, D] blocks (5 in + 3 out,
    double-buffered) plus ~4 live [G, S, S] fp32 temporaries."""
    budget = 10 * 1024 * 1024
    for g in (32, 16, 8, 4, 2, 1):
        if rows % g:
            continue
        if 16 * g * seq * head_dim * 2 + 4 * g * seq * seq * 4 <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_backward(q, k, v, attention_mask, do, *, interpret: bool = False):
    B, S, H, D = q.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    qf, kf, vf, dof = fold(q), fold(k), fold(v), fold(do)
    bias = jnp.repeat((1.0 - attention_mask.astype(jnp.float32)) * NEG_INF,
                      H, axis=0)[:, None, :]
    g = _bwd_group_tile(B * H, S, D)
    spec = pl.BlockSpec((g, S, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((g, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B * H, S, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, scale=1.0 / (D ** 0.5)),
        out_shape=(shape, shape, shape),
        grid=(B * H // g,),
        in_specs=[bias_spec, spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(bias, qf, kf, vf, dof)
    unfold = lambda x: x.reshape(B, H, S, D).transpose(0, 2, 1, 3)
    return unfold(dq), unfold(dk), unfold(dv)


def _fwd(q, k, v, attention_mask):
    return _fused_forward(q, k, v, attention_mask), (q, k, v, attention_mask)


def _bwd(res, g):
    q, k, v, attention_mask = res
    import os
    if os.environ.get("ANCE_FUSED_XLA_BWD"):
        # XLA-recompute fallback (the pre-round-3 behavior)
        bias = mask_to_bias(attention_mask)

        def ref(q, k, v):
            return xla_attention(q, k, v, bias)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _fused_backward(q, k, v, attention_mask, g)
    return dq, dk, dv, None


@jax.custom_vjp
def _fused_attention_vjp(q, k, v, attention_mask):
    return _fused_forward(q, k, v, attention_mask)


_fused_attention_vjp.defvjp(_fwd, _bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    attention_mask: jax.Array | None = None) -> jax.Array:
    """q/k/v: [B, S, H, D]; attention_mask: [B, S] or None → [B, S, H, D].

    Requires S² scoreboards to fit VMEM (S ≤ ~1024); use
    ops.flash_attention beyond that.
    """
    if attention_mask is None:
        attention_mask = jnp.ones(q.shape[:2], jnp.int32)
    return _fused_attention_vjp(q, k, v, attention_mask.astype(jnp.int32))
