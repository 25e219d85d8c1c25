"""Multi-head attention compute paths.

Two interchangeable implementations:

  * ``xla``    — einsum + fp32 softmax; XLA fuses this well on TPU and it is
                 the reference semantics (HF BERT/RoBERTa scaled dot-product
                 attention, reference model cuBLAS path models.py:150-151).
  * ``flash``  — Pallas blocked flash-attention kernel (ops/flash_attention.py)
                 for the TPU hot loop; numerically equivalent (online softmax).

Selection is a config knob so CPU test meshes use ``xla`` while TPU runs use
``flash``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive mask bias; large enough to zero out softmax weight


def mask_to_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} mask → [B, 1, 1, S] additive bias (0 keep / NEG_INF drop)."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
    return bias[:, None, None, :].astype(dtype)


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  bias: jax.Array | None = None,
                  softmax_dtype=jnp.float32,
                  dropout_rate: float = 0.0,
                  dropout_rng: jax.Array | None = None) -> jax.Array:
    """Scaled dot-product attention, softmax accumulated in ``softmax_dtype``.

    q/k/v: [B, S, H, D]; bias broadcastable to [B, H, S, S]. Returns [B, S, H, D].

    ``softmax_dtype=bf16`` halves the [B, H, S, S] logits' HBM traffic —
    the dominant attention cost at short seq where score FLOPs are ~1% of
    the model (perf knob; jax.nn.softmax max-subtracts, so bf16 is stable,
    but keep fp32 for strict reference parity).

    ``dropout_rate`` > 0 applies inverted dropout to the softmax WEIGHTS
    (the reference's attention_probs_dropout_prob — HF BertSelfAttention
    drops whole prob entries after softmax, before the PV matmul).
    """
    depth = q.shape[-1]
    scale = jnp.asarray(1.0 / jnp.sqrt(depth), softmax_dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=softmax_dtype) * scale
    if bias is not None:
        logits = logits + bias.astype(softmax_dtype)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("attention dropout needs a dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate),
                            jnp.zeros_like(weights))
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


@functools.lru_cache(maxsize=None)
def _flash_fn():
    from ance_tpu.ops.flash_attention import flash_attention
    return flash_attention


@functools.lru_cache(maxsize=None)
def _fused_fn():
    from ance_tpu.ops.fused_attention import fused_attention
    return fused_attention


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         attention_mask: jax.Array | None = None,
                         *, impl: str = "xla",
                         dropout_rate: float = 0.0,
                         dropout_rng: jax.Array | None = None) -> jax.Array:
    """Dispatch over attention implementations. q/k/v: [B, S, H, D].

    ``xla``   — einsum + fp32 softmax (reference semantics, CPU-safe)
    ``xla_bf16`` — einsum + bf16 softmax (halved logits HBM traffic; the
                short-seq perf knob — see xla_attention)
    ``fused`` — Pallas whole-sequence fused kernel (mid seq, TPU hot path)
    ``flash`` — Pallas blocked online-softmax kernel (long seq)
    ``auto``  — measured v5e crossovers: XLA below seq 256 (fused measured
                12% slower at seq 128 — kernel + layout overhead beats the
                logits-HBM saving there), fused for 256–1024 (15% faster
                fwd / 10% fwd+bwd at the MaxP 512-chunk shape), flash above
                (scoreboards no longer fit VMEM); CPU always XLA.

    ``dropout_rate`` > 0 (training-time attention-probs dropout, the
    reference's attention_probs_dropout_prob) is implemented by the XLA
    paths only — the Pallas kernels never materialize the prob matrix to
    drop from — so dropout forces the xla/xla_bf16 path regardless of
    ``impl``. Inference (rate 0) keeps the measured kernel crossovers.
    """
    if dropout_rate > 0.0 and impl in ("fused", "flash", "auto"):
        impl = "xla_bf16" if q.dtype == jnp.bfloat16 else "xla"
    if impl == "auto":
        S = q.shape[1]
        # Pallas kernels here are Mosaic/TPU-only — any other backend (cpu,
        # gpu) takes the XLA path, which is correct everywhere
        if jax.default_backend() != "tpu" or S < 256:
            # bf16 inputs → bf16 softmax: error below bf16 rounding, and
            # the halved logits traffic is a measured +3.4% encode
            # throughput at seq 128 (docs/perf_mfu_r3.py); fp32 inputs keep
            # the reference-parity fp32 softmax
            impl = "xla_bf16" if q.dtype == jnp.bfloat16 else "xla"
        else:
            impl = "fused" if S <= 1024 else "flash"
    if impl == "flash":
        return _flash_fn()(q, k, v, attention_mask)
    if impl == "fused":
        return _fused_fn()(q, k, v, attention_mask)
    bias = None if attention_mask is None else mask_to_bias(attention_mask)
    if impl == "xla_bf16":
        return xla_attention(q, k, v, bias, softmax_dtype=jnp.bfloat16,
                             dropout_rate=dropout_rate,
                             dropout_rng=dropout_rng)
    return xla_attention(q, k, v, bias, dropout_rate=dropout_rate,
                         dropout_rng=dropout_rng)
