"""Retrieval losses.

Exact-semantics rebuilds of the reference loss heads:
  * :func:`nll_triplet_loss`      — NLL.forward (reference model/models.py:58-81)
  * :func:`multichunk_scores` / :func:`nll_multichunk_loss`
                                  — NLL_MultiChunk (models.py:84-134), MaxP
                                    max-over-chunks with −9999 empty-chunk bias
  * :func:`dpr_inbatch_loss`      — DPR in-batch negatives over the globally
                                    gathered batch (reference
                                    drivers/run_ann_dpr.py:324-374)

All losses compute in fp32 regardless of encoder compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EMPTY_CHUNK_BIAS = -9999.0  # reference models.py:109

# Loss matmuls are tiny ([B, D] scale) — run them at full fp32 precision even
# where the platform's default matmul precision is bf16-grade.
_HIGHEST = jax.lax.Precision.HIGHEST


def nll_triplet_loss(q_embs: jax.Array, pos_embs: jax.Array,
                     neg_embs: jax.Array) -> jax.Array:
    """mean over batch of −log softmax([q·pos, q·neg])[0]."""
    q = q_embs.astype(jnp.float32)
    s_pos = jnp.sum(q * pos_embs.astype(jnp.float32), axis=-1)
    s_neg = jnp.sum(q * neg_embs.astype(jnp.float32), axis=-1)
    logits = jnp.stack([s_pos, s_neg], axis=1)          # [B, 2]
    lsm = jax.nn.log_softmax(logits, axis=1)
    return jnp.mean(-lsm[:, 0])


def multichunk_scores(q_embs: jax.Array, chunk_embs: jax.Array,
                      attention_mask: jax.Array) -> jax.Array:
    """MaxP score: max over chunk dot-products, empty chunks biased to −9999.

    ``chunk_embs``: [B, C, D]; ``attention_mask``: [B, C*L] token mask whose
    per-chunk first column marks chunk presence (reference models.py:106-128).
    """
    B, C, _ = chunk_embs.shape
    chunk_alive = attention_mask.reshape(B, C, -1)[:, :, 0]
    bias = (1.0 - chunk_alive.astype(jnp.float32)) * EMPTY_CHUNK_BIAS
    scores = jnp.einsum("bd,bcd->bc", q_embs.astype(jnp.float32),
                        chunk_embs.astype(jnp.float32), precision=_HIGHEST)
    return jnp.max(scores + bias, axis=-1)              # [B]


def nll_multichunk_loss(q_embs: jax.Array,
                        pos_chunk_embs: jax.Array, pos_mask: jax.Array,
                        neg_chunk_embs: jax.Array, neg_mask: jax.Array
                        ) -> jax.Array:
    logits_a = multichunk_scores(q_embs, pos_chunk_embs, pos_mask)
    logits_b = multichunk_scores(q_embs, neg_chunk_embs, neg_mask)
    logits = jnp.stack([logits_a, logits_b], axis=1)
    lsm = jax.nn.log_softmax(logits, axis=1)
    return jnp.mean(-lsm[:, 0])


def masked_lm_loss(logits: jax.Array, targets: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Mean CE over positions where ``mask``==1 (MLM / decoder LM).

    Used by SEED pretraining (reference modeling_seed_encoder.py:147-183:
    MLM head over masked positions + decoder LM over all targets; the
    train_ratio config weights the two terms)."""
    logits = logits.astype(jnp.float32)
    lsm = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lsm, targets[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def seed_pretrain_loss(mlm_logits: jax.Array, mlm_targets: jax.Array,
                       mlm_mask: jax.Array,
                       dec_logits: jax.Array, dec_targets: jax.Array,
                       dec_mask: jax.Array,
                       train_ratio: tuple[float, float] = (0.5, 0.5)
                       ) -> tuple[jax.Array, dict]:
    """Weighted MLM + CLS-bottleneck-decoder LM loss (SEED pretraining;
    ``train_ratio`` parity with configuration_seed_encoder.py:92 '0.5:0.5')."""
    mlm = masked_lm_loss(mlm_logits, mlm_targets, mlm_mask)
    dec = masked_lm_loss(dec_logits, dec_targets, dec_mask)
    total = train_ratio[0] * mlm + train_ratio[1] * dec
    return total, {"mlm_loss": mlm, "decoder_loss": dec}


def dpr_inbatch_loss(q_embs: jax.Array, ctx_embs: jax.Array,
                     positive_idx: jax.Array) -> tuple[jax.Array, jax.Array]:
    """In-batch softmax NLL over a q×ctx score matrix.

    ``q_embs``: [Q, D] (globally gathered), ``ctx_embs``: [C, D] with
    positives and hard negatives interleaved; ``positive_idx``: [Q] index of
    each query's positive row in ``ctx_embs`` (even indices 2i in the
    reference layout, run_ann_dpr.py:356-363). Returns (mean loss,
    correct-prediction count) matching the reference's softmax-argmax check.
    """
    scores = jnp.matmul(q_embs.astype(jnp.float32),
                        ctx_embs.astype(jnp.float32).T,
                        precision=_HIGHEST)  # [Q, C]
    lsm = jax.nn.log_softmax(scores, axis=1)
    loss = -jnp.take_along_axis(lsm, positive_idx[:, None], axis=1).mean()
    correct = jnp.sum(jnp.argmax(scores, axis=1) == positive_idx)
    return loss, correct


def dpr_inbatch_multichunk_loss(q_embs: jax.Array, ctx_chunk_embs: jax.Array,
                                ctx_mask: jax.Array, positive_idx: jax.Array
                                ) -> tuple[jax.Array, jax.Array]:
    """In-batch NLL over MaxP documents: score(q, doc) = max over the doc's
    chunk dot-products with the −9999 empty-chunk bias (the cross-matrix
    extension of :func:`multichunk_scores` — in-batch contrastive training
    for long-document encoders, a capability the reference lacks; its MaxP
    path trains on triplets only, models.py:84-134).

    ``ctx_chunk_embs``: [C, Cn, D]; ``ctx_mask``: [C, Cn·L] token mask whose
    per-chunk first column marks chunk presence.  Returns (mean loss,
    correct-prediction count) like :func:`dpr_inbatch_loss`.
    """
    C, Cn, _ = ctx_chunk_embs.shape
    chunk_alive = ctx_mask.reshape(C, Cn, -1)[:, :, 0]
    bias = (1.0 - chunk_alive.astype(jnp.float32)) * EMPTY_CHUNK_BIAS
    s = jnp.einsum("qd,jcd->qjc", q_embs.astype(jnp.float32),
                   ctx_chunk_embs.astype(jnp.float32),
                   precision=_HIGHEST) + bias[None]
    scores = jnp.max(s, axis=-1)                        # [Q, C]
    lsm = jax.nn.log_softmax(scores, axis=1)
    loss = -jnp.take_along_axis(lsm, positive_idx[:, None], axis=1).mean()
    correct = jnp.sum(jnp.argmax(scores, axis=1) == positive_idx)
    return loss, correct
