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
    learned_pos: bool = True       # decoder_learned_pos (configuration:98);
                                   # False → fairseq sinusoidal table


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
    # overrides may carry vocab_size (e.g. CLI --encoder_overrides for a
    # tiny-vocab pretrain handoff) — it must not collide with the positional
    vocab_size = kw.pop("vocab_size", vocab_size)
    return RobertaDot(seed_encoder_config(vocab_size, **kw), use_mean=False,
                      out_dim=out_dim)


def sinusoidal_positions(num_embeddings: int, dim: int,
                         padding_idx: Optional[int] = None) -> jax.Array:
    """Fairseq sinusoidal positional table [num, dim] (reference
    modules.py:184-275 ``SinusoidalPositionalEmbedding.get_embedding``):
    geometric frequencies over the first half (sin) and second half (cos),
    odd dims zero-padded, the pad row zeroed. Dormant in shipped SEED
    configs (``decoder_learned_pos=True``) but part of the fairseq ops
    surface; exposed via ``SeedDecoderConfig(learned_pos=False)``."""
    half = dim // 2
    # max(half-1, 1) guards tiny debug dims (dim ≤ 3 → half ≤ 1): fairseq's
    # formula divides by half-1 and would emit inf/NaN frequencies there
    freq = jnp.exp(jnp.arange(half) * -(jnp.log(10000.0) / max(half - 1, 1)))
    ang = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None] * freq[None, :]
    table = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate(
            [table, jnp.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return table


class AdaptiveSoftmax(nn.Module):
    """Adaptive softmax (Grave et al. 2016; reference modules.py:1082-1247).

    Head = first ``cutoffs[0]`` frequent words + one logit per tail cluster;
    tail cluster i factorizes through a rank-``input_dim/factor^(i+1)``
    projection. The reference's ``index_select`` sparsity (only scoring the
    clusters that appear in the batch) is a dynamic-shape device XLA can't
    tile — the TPU-native adaptation keeps every shape static and takes the
    efficiency from the low-rank factorization instead: cluster FLOPs are
    ``N·d·(d/f) + N·(d/f)·V_i`` vs the flat ``N·d·V_i``.

    Dormant in shipped SEED configs (``adaptive_softmax_cutoff=None``).
    """

    vocab_size: int
    input_dim: int
    cutoffs: tuple   # ascending; final vocab_size appended if missing
    factor: float = 4.0

    def setup(self):
        cut = list(self.cutoffs)
        if self.vocab_size > cut[-1]:
            cut = cut + [self.vocab_size]
        assert cut[-1] == self.vocab_size, \
            "cutoff larger than vocab size"
        self.cut = tuple(cut)
        n_tail = len(self.cut) - 1
        init = nn.initializers.xavier_uniform()
        self.head = nn.Dense(self.cut[0] + n_tail, use_bias=False,
                             kernel_init=init, name="head")
        self.tail_proj = [
            nn.Dense(max(1, int(self.input_dim // self.factor ** (i + 1))),
                     use_bias=False, kernel_init=init, name=f"tail_proj_{i}")
            for i in range(n_tail)]
        self.tail_out = [
            nn.Dense(self.cut[i + 1] - self.cut[i], use_bias=False,
                     kernel_init=init, name=f"tail_out_{i}")
            for i in range(n_tail)]

    def log_prob(self, x: jax.Array) -> jax.Array:
        """[..., d] → normalized full-vocab log-probs [..., V]
        (reference ``get_log_prob`` with target=None)."""
        head_lp = jax.nn.log_softmax(self.head(x), axis=-1)
        parts = [head_lp[..., :self.cut[0]]]
        for i, (proj, out) in enumerate(zip(self.tail_proj, self.tail_out)):
            tail_lp = jax.nn.log_softmax(out(proj(x)), axis=-1)
            parts.append(tail_lp + head_lp[..., self.cut[0] + i, None])
        return jnp.concatenate(parts, axis=-1)

    def nll(self, x: jax.Array, target: jax.Array) -> jax.Array:
        """Mean NLL of ``target`` [..., ] ids under the adaptive factorization
        WITHOUT materializing [..., V]: head term + the target's own
        cluster's within-cluster term (the static-shape counterpart of the
        reference forward/adapt_target pair, modules.py:1186-1208)."""
        c0 = self.cut[0]
        bounds = jnp.asarray(self.cut)
        cluster = jnp.searchsorted(bounds, target, side="right") - 1
        cluster = jnp.maximum(cluster, 0)  # targets < c0 → "cluster" 0 unused
        in_head = target < c0
        head_lp = jax.nn.log_softmax(self.head(x), axis=-1)
        mapped = jnp.where(in_head, jnp.minimum(target, c0 - 1), c0 + cluster)
        lp = jnp.take_along_axis(head_lp, mapped[..., None], -1)[..., 0]
        for i, (proj, out) in enumerate(zip(self.tail_proj, self.tail_out)):
            tail_lp = jax.nn.log_softmax(out(proj(x)), axis=-1)
            size = self.cut[i + 1] - self.cut[i]
            within = jnp.clip(target - self.cut[i], 0, size - 1)
            t = jnp.take_along_axis(tail_lp, within[..., None], -1)[..., 0]
            lp = lp + jnp.where(~in_head & (cluster == i), t, 0.0)
        return -jnp.mean(lp)


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
    FFN, each with pre-LayerNorm and residual. ``setup``-style so the
    full-sequence ``__call__`` and the incremental ``step`` share params."""

    config: SeedDecoderConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        dense = lambda n, f=cfg.hidden_size: nn.Dense(
            f, kernel_init=init, name=n)
        ln = lambda n: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                    use_fast_variance=False, name=n)
        for attn in ("self_attn", "encoder_attn"):
            for part in ("q", "k", "v", "out"):
                setattr(self, f"{attn}_{part}", dense(f"{attn}_{part}"))
        self.self_attn_layer_norm = ln("self_attn_layer_norm")
        self.encoder_attn_layer_norm = ln("encoder_attn_layer_norm")
        self.final_layer_norm = ln("final_layer_norm")
        self.fc1 = dense("fc1", cfg.intermediate_size)
        self.fc2 = dense("fc2")
        self.dropout = nn.Dropout(cfg.dropout)

    def _heads(self, y, B, S):
        cfg = self.config
        return y.reshape(B, S, cfg.num_heads, cfg.hidden_size // cfg.num_heads)

    def _mha(self, attn: str, q_in, kv_in, bias=None):
        D = self.config.hidden_size // self.config.num_heads
        B, Sq, _ = q_in.shape
        Sk = kv_in.shape[1]
        q = self._heads(getattr(self, f"{attn}_q")(q_in), B, Sq)
        k = self._heads(getattr(self, f"{attn}_k")(kv_in), B, Sk)
        v = self._heads(getattr(self, f"{attn}_v")(kv_in), B, Sk)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(D).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Sq, -1)
        return getattr(self, f"{attn}_out")(ctx)

    def __call__(self, x, memory, self_bias, deterministic=True):
        h = self.self_attn_layer_norm(x)
        h = self._mha("self_attn", h, h, self_bias[None, None, :, :])
        x = x + self.dropout(h, deterministic=deterministic)

        h = self.encoder_attn_layer_norm(x)
        h = self._mha("encoder_attn", h, memory)
        x = x + self.dropout(h, deterministic=deterministic)

        h = self.final_layer_norm(x)
        h = self.fc2(nn.gelu(self.fc1(h), approximate=False))
        x = x + self.dropout(h, deterministic=deterministic)
        return x

    def step(self, x_t, memory, cache: dict, layer: int, pos):
        """One incremental token: x_t [B, 1, C] at position ``pos`` with this
        layer's K/V slots in ``cache`` (see :class:`DecodeCache`). Returns
        (y_t [B, 1, C], updated cache). Deterministic (inference) only —
        the reference's incremental path is likewise eval-only
        (fairseq MultiheadAttention incremental_state, modules.py:977-1045).
        """
        cfg = self.config
        H = cfg.num_heads
        D = cfg.hidden_size // H
        B = x_t.shape[0]

        h = self.self_attn_layer_norm(x_t)
        q = self._heads(self.self_attn_q(h), B, 1)[:, 0]        # [B, H, D]
        k_t = self._heads(self.self_attn_k(h), B, 1)[:, 0]
        v_t = self._heads(self.self_attn_v(h), B, 1)[:, 0]
        cache = DecodeCache.update(cache, layer, pos, k_t, v_t)
        k = cache["k"][layer]                                   # [B, W+1, H, D]
        v = cache["v"][layer]
        logits = jnp.einsum("bhd,bshd->bhs", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(D).astype(jnp.float32)
        logits = logits + DecodeCache.attend_bias(
            cache["k"].shape[2] - 1, pos)[None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bhs,bshd->bhd", w, v).reshape(B, 1, -1)
        x = x_t + self.self_attn_out(ctx)

        h = self.encoder_attn_layer_norm(x)
        x = x + self._mha("encoder_attn", h, memory)

        h = self.final_layer_norm(x)
        x = x + self.fc2(nn.gelu(self.fc1(h), approximate=False))
        return x, cache


class DecodeCache:
    """Fixed-size KV cache for incremental SEED decoding.

    The windowed causal mask (span W, position 0 always visible) means step
    t only attends to position 0 plus the last W positions — so the cache is
    O(W) per layer, NOT O(seq): slot 0 pins position 0's K/V, slots 1..W are
    a ring over positions ≥ 1 (position p lives in slot 1 + (p-1) % W).
    Replaces the reference's unbounded fairseq incremental-state dicts
    (modules.py:977-1045) with static shapes that `lax.scan` can carry.
    """

    @staticmethod
    def init(num_layers: int, batch: int, window: int, heads: int,
             head_dim: int, dtype=jnp.float32) -> dict:
        shape = (num_layers, batch, window + 1, heads, head_dim)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    @staticmethod
    def update(cache: dict, layer: int, pos, k_t: jax.Array,
               v_t: jax.Array) -> dict:
        """Insert step-``pos`` K/V ([B, H, D]) into layer ``layer``'s slots."""
        slot = jnp.where(pos == 0, 0, 1 + (pos - 1) % (cache["k"].shape[2] - 1))
        idx = (layer, slice(None), slot)
        return {"k": cache["k"].at[idx].set(k_t),
                "v": cache["v"].at[idx].set(v_t)}

    @staticmethod
    def attend_bias(window: int, pos) -> jax.Array:
        """[window+1] additive bias: which cache slots step ``pos`` may see.

        Slot 0 (position 0) is always visible; ring slot s holds position
        p_s = the largest p ≤ pos with 1 + (p-1) % window == s, which is in
        the allowed span (pos-window, pos] exactly when p_s exists (each of
        the last ``window`` positions occupies a distinct slot) — i.e. when
        s ≤ pos.
        """
        s = jnp.arange(window + 1)
        visible = (s == 0) | (s <= pos)
        return jnp.where(visible, 0.0, NEG_INF)


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
        n_pos = self.decoder_config.max_positions + ecfg.pad_token_id + 1
        if self.decoder_config.learned_pos:
            self.decoder_pos = nn.Embed(n_pos, ecfg.hidden_size,
                                        name="decoder_pos")
        else:
            table = sinusoidal_positions(n_pos, ecfg.hidden_size,
                                         padding_idx=ecfg.pad_token_id)
            self.decoder_pos = lambda ids: table[ids]
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

    def encode_memory(self, src_tokens, attention_mask):
        """Encoder pass → the CLS bottleneck memory token [B, 1, C]."""
        hidden = self.encoder(src_tokens, attention_mask, deterministic=True)
        return hidden[:, 0:1, :].astype(jnp.float32)

    def decode_step(self, token, pos, memory, cache):
        """Incremental decode of one token id [B] at 0-based position ``pos``
        (traced scalar). Returns (next-token logits [B, V], updated cache).
        Equivalent to column ``pos`` of the teacher-forced ``__call__``
        decoder logits; the fairseq counterpart is the incremental-state
        forward (reference modules.py:977-1045), here with an O(window)
        static-shape cache instead of growing tensors.

        ASSUMES the decoded prefix contains no pad tokens: positions here
        count ``pos + 1 + pad`` unconditionally, while the teacher-forced
        path excludes pad tokens from its cumsum position count — a pad id
        in the prefix would make incremental logits diverge from the full
        forward. Generation (greedy_decode) never emits pads mid-stream
        unless the model argmaxes one, in which case equivalence is void.
        """
        table = self.encoder.get_variable("params", "embeddings")[
            "word_embeddings"]["embedding"]
        x = table[token][:, None, :]                       # [B, 1, C]
        pad = self.encoder_config.pad_token_id
        positions = jnp.full((token.shape[0], 1), pos + 1 + pad)
        x = x + self.decoder_pos(positions)
        x = self.decoder_embed_norm(x)
        for i, layer in enumerate(self.decoder_layers):
            x, cache = layer.step(x, memory, cache, i, pos)
        x = self.decoder_final_norm(x)
        return x[:, 0] @ table.T, cache


def greedy_decode(model: SeedForMaskedLM, params, src_tokens, attention_mask,
                  steps: int, bos_token: int = 0) -> jax.Array:
    """Autoregressive greedy generation from the CLS bottleneck: [B, steps]
    token ids. One ``lax.scan`` over positions with the O(window) KV cache —
    static shapes, jittable end to end (the TPU-native replacement for
    fairseq's FairseqIncrementalDecoder generation loop)."""
    dcfg, ecfg = model.decoder_config, model.encoder_config
    memory = model.apply({"params": params}, src_tokens, attention_mask,
                         method=SeedForMaskedLM.encode_memory)
    B = src_tokens.shape[0]
    cache = DecodeCache.init(dcfg.num_layers, B, dcfg.attention_window,
                             dcfg.num_heads, dcfg.hidden_size // dcfg.num_heads)

    def body(carry, pos):
        tok, cache = carry
        logits, cache = model.apply({"params": params}, tok, pos, memory,
                                    cache, method=SeedForMaskedLM.decode_step)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    init_tok = jnp.full((B,), bos_token, jnp.int32)
    _, toks = jax.lax.scan(body, (init_tok, cache), jnp.arange(steps))
    return toks.T
