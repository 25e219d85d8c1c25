"""SEED-Encoder model family.

Parity targets (reference model/SEED_Encoder/):
  * encoder — fairseq TransformerSentenceEncoder
    (transformer_sentence_encoder.py:695-925): post-LN layers, learned
    pad-offset positions, NO segment embeddings, embedding LayerNorm, padded
    positions zeroed after embedding. Structurally our
    :class:`TransformerEncoder` with ``use_type_embeddings=False`` +
    ``embed_zero_pad=True``.
  * retrieval model — SEEDEncoderDot_NLL_LN (models.py:201-221): CLS pooling
    + Dense(768) + LayerNorm head ⇒ exactly :class:`RobertaDot` with a SEED
    config (``seed_dot_config``).
  * pretraining — SEEDEncoderForMaskedLM (modeling_seed_encoder.py:147-183):
    encoder + CLS-bottleneck fed as a 1-token cross-attention memory to a
    weak decoder with a WINDOWED causal mask (span w, CLS column always
    visible; transformer_sentence_encoder.py:585-616) + tied-embedding LM
    head.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder
from ance_tpu.ops.attention import NEG_INF


@dataclasses.dataclass(frozen=True)
class SeedDecoderConfig:
    num_layers: int = 3            # config_decoder_3_attn_2 default
    attention_window: int = 2      # decoder_atten_window (2 or 8)
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 512
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5


def seed_encoder_config(vocab_size: int = 32769, **kw) -> EncoderConfig:
    """SEEDEncoderConfig defaults (configuration_seed_encoder.py:74-114)."""
    defaults = dict(vocab_size=vocab_size, hidden_size=768, num_layers=12,
                    num_heads=12, intermediate_size=3072,
                    max_position_embeddings=516,  # 512 + pad offset headroom
                    type_vocab_size=1, pad_token_id=1,
                    position_style="roberta", use_type_embeddings=False,
                    embed_zero_pad=True)
    defaults.update(kw)
    return EncoderConfig(**defaults)


def seed_dot_model(vocab_size: int = 32769, out_dim: int = 768,
                   config_overrides=None, **kw) -> RobertaDot:
    """The ``seeddot_nll`` retrieval model (reference models.py:201-221)."""
    kw.update(config_overrides or {})
    return RobertaDot(seed_encoder_config(vocab_size, **kw), use_mean=False,
                      out_dim=out_dim)


def windowed_causal_bias(seq_len: int, window: int) -> jax.Array:
    """Decoder self-attention bias [S, S]: position i sees positions
    (i-window, i] plus column 0 (the CLS bottleneck token).

    Reference buffered_future_mask (transformer_sentence_encoder.py:585-616):
    triu(+1) forbids the future; triu(window)ᵀ forbids the far past; column 0
    is re-opened.
    """
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    allowed = (j <= i) & (j > i - window)
    allowed = allowed | (j == 0)
    return jnp.where(allowed, 0.0, NEG_INF)


class SeedDecoderLayer(nn.Module):
    """Pre-LN decoder layer (decoder_normalize_before=True,
    configuration_seed_encoder.py:104): self-attn (windowed) → cross-attn →
    FFN, each with pre-LayerNorm and residual."""

    config: SeedDecoderConfig

    @nn.compact
    def __call__(self, x, memory, self_bias, deterministic=True):
        cfg = self.config
        H = cfg.num_heads
        D = cfg.hidden_size // H
        init = nn.initializers.normal(stddev=0.02)

        def mha(name, q_in, kv_in, bias=None):
            B, Sq, _ = q_in.shape
            Sk = kv_in.shape[1]
            q = nn.Dense(cfg.hidden_size, kernel_init=init,
                         name=f"{name}_q")(q_in).reshape(B, Sq, H, D)
            k = nn.Dense(cfg.hidden_size, kernel_init=init,
                         name=f"{name}_k")(kv_in).reshape(B, Sk, H, D)
            v = nn.Dense(cfg.hidden_size, kernel_init=init,
                         name=f"{name}_v")(kv_in).reshape(B, Sk, H, D)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(D).astype(jnp.float32)
            if bias is not None:
                logits = logits + bias
            w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Sq, -1)
            return nn.Dense(cfg.hidden_size, kernel_init=init,
                            name=f"{name}_out")(ctx)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         name="self_attn_layer_norm")(x)
        h = mha("self_attn", h, h, self_bias[None, None, :, :])
        x = x + nn.Dropout(cfg.dropout)(h, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         name="encoder_attn_layer_norm")(x)
        h = mha("encoder_attn", h, memory)
        x = x + nn.Dropout(cfg.dropout)(h, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         name="final_layer_norm")(x)
        h = nn.Dense(cfg.intermediate_size, kernel_init=init, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, kernel_init=init, name="fc2")(h)
        x = x + nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return x


class SeedForMaskedLM(nn.Module):
    """SEED pretraining model: MLM head over the encoder + autoregressive
    decoder conditioned ONLY on the CLS bottleneck (the information-flow
    restriction that makes the encoder absorb sentence semantics)."""

    encoder_config: EncoderConfig
    decoder_config: SeedDecoderConfig

    def setup(self):
        ecfg = self.encoder_config
        self.encoder = TransformerEncoder(ecfg, name="encoder")
        # decoder shares the input embedding table with the encoder via the
        # LM head below (share_all_embeddings, configuration:107)
        self.decoder_layers = [
            SeedDecoderLayer(self.decoder_config, name=f"decoder_layer_{i}")
            for i in range(self.decoder_config.num_layers)]
        self.decoder_pos = nn.Embed(
            self.decoder_config.max_positions + ecfg.pad_token_id + 1,
            ecfg.hidden_size, name="decoder_pos")
        # layernorm_embedding=True (configuration_seed_encoder.py:108):
        # fairseq decoder LayerNorms (then drops out) the embed+pos sum
        self.decoder_embed_norm = nn.LayerNorm(
            epsilon=self.decoder_config.layer_norm_eps,
            use_fast_variance=False, name="decoder_embed_norm")
        self.decoder_embed_dropout = nn.Dropout(self.decoder_config.dropout)
        self.decoder_final_norm = nn.LayerNorm(
            epsilon=self.decoder_config.layer_norm_eps,
            use_fast_variance=False, name="decoder_final_norm")
        self.lm_dense = nn.Dense(ecfg.hidden_size, name="lm_dense")
        self.lm_norm = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                                    name="lm_norm")
        self.lm_bias = self.param("lm_bias", nn.initializers.zeros,
                                  (ecfg.vocab_size,))

    def _embed_table(self):
        return self.encoder.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"]

    def lm_head(self, hidden):
        """RobertaLMHead: dense → gelu → LN → tied-embedding projection
        (reference modeling_seed_encoder.py:214-239)."""
        h = nn.gelu(self.lm_dense(hidden), approximate=False)
        h = self.lm_norm(h)
        table = self.encoder.get_variable("params", "embeddings")[
            "word_embeddings"]["embedding"]
        return h @ table.T + self.lm_bias

    def __call__(self, src_tokens, attention_mask, prev_tokens,
                 deterministic=True):
        """Returns (mlm_logits [B,S,V], decoder_logits [B,T,V])."""
        hidden = self.encoder(src_tokens, attention_mask,
                              deterministic=deterministic)
        mlm_logits = self.lm_head(hidden.astype(jnp.float32))

        # CLS bottleneck as the single cross-attention memory token
        memory = hidden[:, 0:1, :].astype(jnp.float32)

        table = self.encoder.get_variable("params", "embeddings")[
            "word_embeddings"]["embedding"]
        x = table[prev_tokens]
        pad = self.encoder_config.pad_token_id
        mask = (prev_tokens != pad).astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + pad
        x = x + self.decoder_pos(positions)
        x = self.decoder_embed_norm(x)
        x = self.decoder_embed_dropout(x, deterministic=deterministic)

        bias = windowed_causal_bias(prev_tokens.shape[1],
                                    self.decoder_config.attention_window)
        for layer in self.decoder_layers:
            x = layer(x, memory, bias, deterministic=deterministic)
        x = self.decoder_final_norm(x)
        # tied output projection is bias-free (share_decoder_input_output_
        # embed=True → output_projection = Linear(..., bias=False),
        # transformer_sentence_encoder.py:108-113); lm_bias belongs to the
        # MLM head only
        dec_logits = x @ table.T
        return mlm_logits, dec_logits
