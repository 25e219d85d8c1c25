"""SEED-Encoder family: windowed decoder mask, MLM pretraining model wiring,
seeddot retrieval model, and the model registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.models.registry import REGISTRY, get_model_spec
from ance_tpu.models.seed import (
    SeedDecoderConfig, SeedForMaskedLM, seed_dot_model, seed_encoder_config,
    windowed_causal_bias)
from ance_tpu.models.transformer import TransformerEncoder


def test_windowed_causal_bias():
    """Span-2 window + always-visible CLS column
    (reference transformer_sentence_encoder.py:585-616)."""
    bias = np.asarray(windowed_causal_bias(5, window=2))
    allowed = bias == 0.0
    # row i: {0} ∪ {i-1, i} within bounds
    expect = np.zeros((5, 5), bool)
    for i in range(5):
        expect[i, 0] = True
        for j in range(5):
            if j <= i and j > i - 2:
                expect[i, j] = True
    np.testing.assert_array_equal(allowed, expect)
    # no future leakage ever
    assert not np.triu(allowed, 1).any()


def test_seed_encoder_zero_pad_and_no_type_embeddings():
    cfg = seed_encoder_config(vocab_size=100, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=40,
                              hidden_dropout=0.0, attention_dropout=0.0)
    enc = TransformerEncoder(cfg)
    ids = np.full((2, 10), 1, np.int32)  # pad id 1
    ids[:, :4] = [[0, 5, 6, 7], [0, 8, 9, 10]]
    mask = (ids != 1).astype(np.int32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.asarray(ids),
                               jnp.asarray(mask))["params"]
    assert "token_type_embeddings" not in params["embeddings"]
    out = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 10, 32)


def test_seeddot_model_embeds():
    model = seed_dot_model(vocab_size=100, hidden_size=32, num_layers=2,
                           num_heads=4, intermediate_size=64,
                           max_position_embeddings=40, out_dim=16,
                           hidden_dropout=0.0, attention_dropout=0.0)
    ids = np.full((3, 12), 1, np.int32)
    ids[:, :5] = 7
    ids[:, 0] = 0
    mask = (ids != 1).astype(np.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(ids),
                                 jnp.asarray(mask))["params"]
    emb = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                      method=model.query_emb)
    assert emb.shape == (3, 16)
    # query_emb == body_emb (reference models.py:220-221)
    emb2 = model.apply({"params": params}, jnp.asarray(ids),
                       jnp.asarray(mask), method=model.body_emb)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2))


def test_seed_mlm_forward_and_bottleneck():
    ecfg = seed_encoder_config(vocab_size=100, hidden_size=32, num_layers=2,
                               num_heads=4, intermediate_size=64,
                               max_position_embeddings=40,
                               hidden_dropout=0.0, attention_dropout=0.0)
    dcfg = SeedDecoderConfig(num_layers=2, attention_window=2,
                             hidden_size=32, num_heads=4,
                             intermediate_size=64, max_positions=40,
                             dropout=0.0)
    model = SeedForMaskedLM(ecfg, dcfg)
    rs = np.random.RandomState(0)
    B, S, T = 2, 12, 10
    src = rs.randint(4, 100, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    prev = rs.randint(4, 100, (B, T)).astype(np.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(src),
                                 jnp.asarray(mask), jnp.asarray(prev)
                                 )["params"]
    run = jax.jit(model.apply)
    mlm, dec = run({"params": params}, jnp.asarray(src), jnp.asarray(mask),
                   jnp.asarray(prev))
    assert mlm.shape == (B, S, 100)
    assert dec.shape == (B, T, 100)

    # decoder causality: perturbing a future decoder token must not change
    # earlier positions' logits
    prev2 = prev.copy()
    prev2[:, -1] = (prev2[:, -1] + 1) % 96 + 4
    _, dec2 = run({"params": params}, jnp.asarray(src), jnp.asarray(mask),
                  jnp.asarray(prev2))
    np.testing.assert_allclose(np.asarray(dec[:, :-1]),
                               np.asarray(dec2[:, :-1]), rtol=1e-5,
                               atol=1e-5)
    # ...and the encoder bottleneck matters: perturbing src changes decoder
    src2 = src.copy()
    src2[:, 1] = (src2[:, 1] + 1) % 96 + 4
    _, dec3 = run({"params": params}, jnp.asarray(src2), jnp.asarray(mask),
                  jnp.asarray(prev))
    assert np.abs(np.asarray(dec3) - np.asarray(dec)).max() > 1e-6


def test_registry_covers_reference_model_zoo():
    """All four reference MSMarcoConfigDict entries exist
    (reference models.py:299-322)."""
    assert set(REGISTRY) == {"rdot_nll", "rdot_nll_multi_chunk", "dpr",
                             "seeddot_nll"}
    spec = get_model_spec("rdot_nll_multi_chunk")
    assert spec.multichunk and spec.loss == "nll_multichunk"
    assert get_model_spec("dpr").two_tower
    with pytest.raises(KeyError):
        get_model_spec("nope")
    # every entry builds a module that initializes
    spec = get_model_spec("rdot_nll")
    model = spec.build()
    ids = jnp.ones((1, 8), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, ids)["params"]
    assert "encoder" in params


def test_seed_pretrain_loss():
    from ance_tpu.models.losses import masked_lm_loss, seed_pretrain_loss
    rs = np.random.RandomState(0)
    B, S, V = 2, 6, 20
    logits = jnp.asarray(rs.randn(B, S, V).astype(np.float32))
    targets = jnp.asarray(rs.randint(0, V, (B, S)))
    mask = jnp.asarray(rs.randint(0, 2, (B, S)))
    got = float(masked_lm_loss(logits, targets, mask))
    # reference CE: mean over masked positions
    lsm = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    m = np.asarray(mask).astype(bool)
    ref = float(np.mean([-lsm[b, s, int(targets[b, s])]
                         for b in range(B) for s in range(S) if m[b, s]]))
    assert abs(got - ref) < 1e-5

    total, parts = seed_pretrain_loss(logits, targets, mask,
                                      logits, targets, jnp.ones((B, S)),
                                      train_ratio=(0.3, 0.7))
    expect = 0.3 * float(parts["mlm_loss"]) + 0.7 * float(parts["decoder_loss"])
    assert abs(float(total) - expect) < 1e-6

    # fully-unmasked edge: no NaN
    z = masked_lm_loss(logits, targets, jnp.zeros((B, S)))
    assert float(z) == 0.0
