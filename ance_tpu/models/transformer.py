"""Post-LN transformer encoder (RoBERTa/BERT family) in flax.linen.

Covers both backbones the reference uses through one module:
  * RoBERTa-base for the ANCE dual encoder (reference model/models.py:137-157)
  * BERT-base towers for the DPR BiEncoder (reference model/models.py:223-271)

The differences are config-only: position-id scheme (RoBERTa offsets past the
pad id, BERT uses arange), type-vocab size, and pad id. Compute dtype is a
knob (bf16 on TPU); parameters and softmax/LayerNorm accumulation stay fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ance_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    position_style: str = "roberta"  # "roberta" | "bert"
    dtype: jnp.dtype = jnp.float32   # compute dtype (bf16 on TPU)
    attention_impl: str = "auto"     # auto | xla | fused | flash (see
                                     # ops.attention.multi_head_attention)
    use_type_embeddings: bool = True  # SEED/fairseq: num_segments=0 → False
    embed_zero_pad: bool = False      # SEED: zero embeddings at pad positions
                                      # (reference transformer_sentence_encoder
                                      # .py:898-900 ``x *= 1 - padding_mask``)
    remat: bool = False               # rematerialize each layer's activations
                                      # in backward (trade FLOPs for HBM; lets
                                      # batch sizes scale past activation
                                      # memory — the TPU counterpart of the
                                      # memory tricks apex provides on GPU)
    fp32_layernorm: bool = True       # residual LayerNorms accumulate in fp32
                                      # (torch parity); False keeps the
                                      # residual stream in compute dtype —
                                      # fewer HBM cast round-trips on TPU
    fused_qkv: bool = False           # compute Q/K/V as ONE [H, 3H] GEMM —
                                      # reads the activations once instead of
                                      # three times (HBM win); parameter tree
                                      # is unchanged (kernels concatenated at
                                      # apply time), so checkpoints interop
    layerdrop_rate: float = 0.0       # LayerDrop (fairseq modules.py:103-135):
                                      # each layer is skipped whole-batch with
                                      # this probability per training step; no
                                      # rescale of survivors, eval runs all
                                      # layers. Dormant in every shipped SEED
                                      # config, present for fairseq parity.
    quant_noise_p: float = 0.0        # Quant-Noise block DropConnect on the
    quant_noise_block: int = 8        # attention projection kernels during
                                      # training (reference modules.py:439-443,
                                      # 1631-1711); dormant (q_noise=0) in all
                                      # shipped configs. See ops/quant_noise.py.
    gelu_approx: Optional[bool] = None  # tanh-approximate gelu vs the exact
                                      # erf one HF uses. None = AUTO: tanh
                                      # iff compute dtype is bf16 — the
                                      # approximation's max |Δ| (~3e-4) is
                                      # below bf16 rounding (ulp ~8e-3 at
                                      # 1.0), while exact erf is a VPU
                                      # transcendental over the largest
                                      # elementwise tensor in the model
                                      # ([B·S, 4H]) costing a measured 23%
                                      # of encode throughput (v5e, seq 128,
                                      # docs/perf_mfu_r3.py). Set False for
                                      # strict HF parity in fp32 studies.

    @staticmethod
    def roberta_base(**kw) -> "EncoderConfig":
        return EncoderConfig(**kw)

    @staticmethod
    def bert_base(**kw) -> "EncoderConfig":
        defaults = dict(vocab_size=30522, max_position_embeddings=512,
                        type_vocab_size=2, pad_token_id=0,
                        layer_norm_eps=1e-12, position_style="bert")
        defaults.update(kw)
        return EncoderConfig(**defaults)

    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def roberta_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """RoBERTa position ids: cumulative count of non-pad tokens, offset by pad id.

    Matches HF ``create_position_ids_from_input_ids`` used by the reference's
    RoBERTa backbone.
    """
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


class Embeddings(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=init,
                        name="word_embeddings")(input_ids)
        if position_ids is None:
            if cfg.position_style == "roberta":
                position_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
            else:
                position_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=init, name="position_embeddings")(position_ids)
        x = word + pos
        if cfg.use_type_embeddings:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                             embedding_init=init,
                             name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False, name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        if cfg.embed_zero_pad:
            x = x * (input_ids != cfg.pad_token_id)[:, :, None].astype(x.dtype)
        return x.astype(cfg.dtype)


class ProjParams(nn.Module):
    """Kernel+bias holder with nn.Dense's exact parameter tree, for paths
    that consume the weights directly (fused QKV) instead of applying a
    Dense — keeps checkpoints interchangeable with the unfused layout."""

    features: int
    in_features: int
    kernel_init: nn.initializers.Initializer

    def setup(self):
        self.kernel = self.param("kernel", self.kernel_init,
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))


class SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        B, S, _ = x.shape
        H, D = cfg.num_heads, cfg.head_dim()
        # Quant-Noise perturbs kernels directly, so its training path reads
        # weights through ProjParams (same parameter tree as nn.Dense —
        # checkpoints interop; eval takes the plain Dense path untouched)
        noisy = cfg.quant_noise_p > 0.0 and not deterministic
        if noisy:
            from ance_tpu.ops.quant_noise import quant_noise
            qn_keys = jax.random.split(self.make_rng("dropout"), 4)

            def qn(i, kernel):
                return quant_noise(qn_keys[i], kernel, cfg.quant_noise_p,
                                   cfg.quant_noise_block)

        if cfg.fused_qkv or noisy:
            ps = [ProjParams(cfg.hidden_size, cfg.hidden_size, init, name=n)
                  for n in ("query", "key", "value")]
            kernels = [qn(i, p.kernel) for i, p in enumerate(ps)] if noisy \
                else [p.kernel for p in ps]
            w = jnp.concatenate(kernels, 1).astype(cfg.dtype)
            b = jnp.concatenate([p.bias for p in ps]).astype(cfg.dtype)
            qkv = x.astype(cfg.dtype) @ w + b          # ONE [H, 3H] GEMM
            q, k, v = [y.reshape(B, S, H, D)
                       for y in jnp.split(qkv, 3, axis=-1)]
        else:
            def proj(name):
                y = nn.Dense(cfg.hidden_size, kernel_init=init, name=name,
                             dtype=cfg.dtype)(x)
                return y.reshape(B, S, H, D)

            q, k, v = proj("query"), proj("key"), proj("value")
        # training-time attention-probs dropout (the reference's
        # attention_probs_dropout_prob, applied after softmax); rate 0 or
        # eval keeps the kernel crossovers dropout-free
        attn_rate = 0.0 if deterministic else cfg.attention_dropout
        ctx = multi_head_attention(
            q, k, v, attention_mask, impl=cfg.attention_impl,
            dropout_rate=attn_rate,
            dropout_rng=(self.make_rng("dropout") if attn_rate > 0.0
                         else None))
        ctx = ctx.reshape(B, S, cfg.hidden_size)
        if noisy:
            op = ProjParams(cfg.hidden_size, cfg.hidden_size, init, name="out")
            out = ctx @ qn(3, op.kernel).astype(cfg.dtype) \
                + op.bias.astype(cfg.dtype)
        else:
            out = nn.Dense(cfg.hidden_size, kernel_init=init, name="out",
                           dtype=cfg.dtype)(ctx)
        return nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)


class Mlp(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        h = nn.Dense(cfg.intermediate_size, kernel_init=init,
                     name="intermediate", dtype=cfg.dtype)(x)
        # HF BERT/RoBERTa use exact (erf) gelu; under bf16 the tanh approx
        # is below rounding noise and 23% faster (see config docstring)
        approx = (cfg.dtype == jnp.bfloat16) if cfg.gelu_approx is None \
            else cfg.gelu_approx
        h = nn.gelu(h, approximate=approx)
        h = nn.Dense(cfg.hidden_size, kernel_init=init, name="output",
                     dtype=cfg.dtype)(h)
        return nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)


class EncoderLayer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool = True):
        cfg = self.config

        def ln(name, y):
            # Post-LN residual structure (BERT); fp32 accumulation by default
            if cfg.fp32_layernorm:
                return nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                    name=name)(y.astype(jnp.float32)).astype(cfg.dtype)
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                use_fast_variance=False, dtype=cfg.dtype,
                                name=name)(y)

        attn = SelfAttention(cfg, name="attention")(
            x, attention_mask, deterministic)
        x = ln("attention_layer_norm", x + attn)
        mlp = Mlp(cfg, name="mlp")(x, deterministic)
        x = ln("output_layer_norm", x + mlp)
        return x


class TransformerEncoder(nn.Module):
    """Token ids → contextual hidden states [B, S, hidden]."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = Embeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        layer_cls = nn.remat(EncoderLayer, static_argnums=(3,)) if cfg.remat \
            else EncoderLayer
        drop_layers = cfg.layerdrop_rate > 0.0 and not deterministic
        for i in range(cfg.num_layers):
            y = layer_cls(cfg, name=f"layer_{i}")(
                x, attention_mask, deterministic)
            if drop_layers:
                # LayerDrop (fairseq modules.py:103-135): whole-batch scalar
                # drop per layer, no rescale. The skipped layer is still
                # computed — the static-shape TPU idiom; semantics match.
                drop = jax.random.bernoulli(self.make_rng("dropout"),
                                            cfg.layerdrop_rate)
                x = jnp.where(drop, x, y)
            else:
                x = y
        return x


def pool(hidden: jax.Array, attention_mask: jax.Array,
         use_mean: bool) -> jax.Array:
    """CLS-token or masked-mean pooling (reference model/models.py:38-49)."""
    if not use_mean:
        return hidden[:, 0]
    mask = attention_mask.astype(hidden.dtype)[:, :, None]
    s = jnp.sum(hidden * mask, axis=1)
    d = jnp.sum(attention_mask.astype(hidden.dtype), axis=1, keepdims=True)
    return s / d
