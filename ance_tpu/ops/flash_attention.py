"""Blocked flash attention for TPU (Pallas).

Forward pass is a Pallas kernel: per (batch, head, q-block) grid cell it
streams K/V blocks through VMEM with an online-softmax accumulator, so the
[S, S] score matrix never touches HBM — the fusion the reference leaves to
cuBLAS+handwritten CUDA in HF attention (reference model cuBLAS path,
models.py:150-151; SURVEY.md §2.3 "Pallas flash-attention").

Backward uses recompute (rematerialized XLA attention): correct, memory-lean
(no stored probabilities), and fast enough while the encoder backward is
dominated by the MLP matmuls. A full Pallas backward is a later optimization.

Padding: ``attention_mask`` [B, S] ∈ {0,1}; masked keys get −1e9 before
softmax — matching ops.attention.xla_attention semantics exactly (fully
masked query rows produce uniform attention, and such rows are always
excluded by downstream pooling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ance_tpu.ops.attention import NEG_INF, mask_to_bias, xla_attention

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  scale: float, num_heads: int):
    """One (batch·head, q-block) cell: online softmax over K blocks.

    Layout: heads folded into the leading dim ([B·H, S, D]) so every block's
    trailing two dims are (S-block, D) — the shape TPU tiling accepts.
    q_ref: [BQ, D]; k_ref/v_ref: [S, D]; mask_ref: [B, S] (full array,
    batch row indexed in-kernel); o_ref: [BQ, D].
    """
    b = pl.program_id(0) // num_heads
    q = q_ref[...].astype(jnp.float32) * scale
    S = k_ref.shape[0]
    BQ, D = q_ref.shape
    n_kb = S // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask_blk = mask_ref[b, pl.ds(i * block_k, block_k)]
        s = s + (1.0 - mask_blk.astype(jnp.float32))[None, :] * NEG_INF

        m_cur = jnp.max(s, axis=1)                      # [BQ]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])                 # [BQ, BK]
        alpha = jnp.exp(m_prev - m_new)                 # [BQ]
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((BQ,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BQ,), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    o_ref[...] = (acc / l[:, None]).astype(o_ref.dtype)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                   attention_mask: jax.Array, *, block_q: int,
                   block_k: int) -> jax.Array:
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if S % block_q or S % block_k:
        raise ValueError(f"seq len {S} must divide blocks ({block_q},{block_k})")

    def fold(x):  # [B, S, H, D] → [B*H, S, D]
        return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    grid = (B * H, S // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale,
                               num_heads=H)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # mask [B, S] whole
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),          # q
            pl.BlockSpec((None, S, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),          # k
            pl.BlockSpec((None, S, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),          # v
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=(3 * B * S * H * D + B * S * H * D) * q.dtype.itemsize,
            transcendentals=B * H * S * S),
    )(attention_mask, fold(q), fold(k), fold(v))
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    attention_mask: jax.Array | None = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jax.Array:
    """q/k/v: [B, S, H, D]; attention_mask: [B, S] or None → [B, S, H, D]."""
    if attention_mask is None:
        attention_mask = jnp.ones(q.shape[:2], jnp.int32)
    return _flash_forward(q, k, v, attention_mask, block_q=block_q,
                          block_k=block_k)


def _fwd(q, k, v, attention_mask, block_q, block_k):
    if attention_mask is None:
        attention_mask = jnp.ones(q.shape[:2], jnp.int32)
    out = _flash_forward(q, k, v, attention_mask, block_q=block_q,
                         block_k=block_k)
    return out, (q, k, v, attention_mask)


def _bwd(block_q, block_k, residuals, g):
    q, k, v, attention_mask = residuals
    bias = mask_to_bias(attention_mask)

    def ref_attn(q, k, v):
        return xla_attention(q, k, v, bias)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
