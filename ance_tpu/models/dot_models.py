"""Dual-encoder model family.

TPU-native equivalents of the reference model zoo (model/models.py):

  * :class:`RobertaDot`       — RobertaDot_NLL_LN (models.py:137-157): shared
    query/body RoBERTa tower, CLS (or masked-mean) pooling, Dense(768) head,
    LayerNorm.
  * MaxP multi-chunk encoding — RobertaDot_CLF_ANN_NLL_MultiChunk
    (models.py:160-199): [B, C*512] → [B*C, 512] batched chunk encode →
    [B, C, 768] per-chunk embeddings. A batched reshape, no special kernel.
  * :class:`BiEncoder`        — DPR two-tower BERT (models.py:247-271), CLS
    pooling, independent question/context parameters.

Losses live in :mod:`ance_tpu.models.losses`; here only embedding generation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder, pool


class RobertaDot(nn.Module):
    """Shared-tower dual encoder with 768-d projection head + LayerNorm.

    ``query_emb`` and ``body_emb`` are the same function (reference
    models.py:156-157: ``body_emb = query_emb``). ``base_len`` enables MaxP
    chunked body encoding when the body sequence is a multiple of it.
    """

    config: EncoderConfig
    use_mean: bool = False
    out_dim: int = 768
    base_len: int = 512  # MaxP chunk length (reference models.py:162)

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        self.encoder = TransformerEncoder(cfg, name="encoder")
        self.embedding_head = nn.Dense(self.out_dim, kernel_init=init,
                                       name="embedding_head")
        self.norm = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="norm")

    def _embed(self, input_ids, attention_mask, deterministic=True):
        hidden = self.encoder(input_ids, attention_mask,
                              deterministic=deterministic)
        pooled = pool(hidden, attention_mask, self.use_mean)
        return self.norm(self.embedding_head(pooled.astype(jnp.float32)))

    def query_emb(self, input_ids, attention_mask, deterministic=True):
        return self._embed(input_ids, attention_mask, deterministic)

    def body_emb(self, input_ids, attention_mask, deterministic=True):
        return self._embed(input_ids, attention_mask, deterministic)

    def body_emb_multichunk(self, input_ids, attention_mask,
                            deterministic=True):
        """MaxP: [B, C*base_len] → per-chunk embeddings [B, C, out_dim].

        Parity: reference models.py:165-199. Chunks are independent encoder
        passes folded into the batch dimension — embarrassingly parallel on
        the MXU.
        """
        B, full_len = input_ids.shape
        C = full_len // self.base_len
        ids = input_ids.reshape(B * C, self.base_len)
        mask = attention_mask.reshape(B * C, self.base_len)
        hidden = self.encoder(ids, mask, deterministic=deterministic)
        # reference MaxP always pools CLS of each chunk (models.py:191-193)
        emb = self.norm(self.embedding_head(hidden[:, 0].astype(jnp.float32)))
        return emb.reshape(B, C, self.out_dim)

    def __call__(self, input_ids, attention_mask, is_query=True,
                 multichunk=False, deterministic=True):
        if multichunk:
            return self.body_emb_multichunk(input_ids, attention_mask,
                                            deterministic)
        return self._embed(input_ids, attention_mask, deterministic)


class BertTower(nn.Module):
    """Single BERT tower with CLS pooling (reference HFBertEncoder
    models.py:223-244: pooled output is sequence_output[:, 0])."""

    config: EncoderConfig

    def setup(self):
        self.encoder = TransformerEncoder(self.config, name="encoder")

    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True):
        hidden = self.encoder(input_ids, attention_mask, token_type_ids,
                              deterministic=deterministic)
        return hidden[:, 0].astype(jnp.float32)


class BiEncoder(nn.Module):
    """DPR-style two-tower encoder with independent parameters
    (reference models.py:247-271)."""

    config: EncoderConfig

    def setup(self):
        self.question_model = BertTower(self.config, name="question_model")
        self.ctx_model = BertTower(self.config, name="ctx_model")

    def query_emb(self, input_ids, attention_mask, deterministic=True):
        return self.question_model(input_ids, attention_mask,
                                   deterministic=deterministic)

    def body_emb(self, input_ids, attention_mask, deterministic=True):
        return self.ctx_model(input_ids, attention_mask,
                              deterministic=deterministic)

    def __call__(self, query_ids, attention_mask_q, input_ids_a=None,
                 attention_mask_a=None, deterministic=True):
        """Returns (q_embs, ctx_embs) like reference BiEncoder.forward
        (models.py:260-264); ctx inputs default to the query inputs so that
        ``init`` traces both towers."""
        if input_ids_a is None:
            input_ids_a, attention_mask_a = query_ids, attention_mask_q
        q = self.query_emb(query_ids, attention_mask_q, deterministic)
        c = self.body_emb(input_ids_a, attention_mask_a, deterministic)
        return q, c
