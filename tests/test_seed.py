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


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
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


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
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


@pytest.mark.parametrize("window", [2, 8])
@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_incremental_decode_matches_full_forward(window):
    """Step-by-step KV-cache decoding reproduces the teacher-forced
    full-sequence decoder logits exactly (the parity the reference's
    fairseq incremental_state path guarantees, modules.py:977-1045) —
    including ring-buffer wraparound (T > window)."""
    from ance_tpu.models.seed import DecodeCache

    ecfg = seed_encoder_config(vocab_size=80, hidden_size=32, num_layers=2,
                               num_heads=4, intermediate_size=64,
                               max_position_embeddings=40,
                               hidden_dropout=0.0, attention_dropout=0.0)
    dcfg = SeedDecoderConfig(num_layers=2, attention_window=window,
                             hidden_size=32, num_heads=4,
                             intermediate_size=64, max_positions=40,
                             dropout=0.0)
    model = SeedForMaskedLM(ecfg, dcfg)
    rs = np.random.RandomState(1)
    B, S, T = 2, 8, 12  # T > window for both spans: exercises slot reuse
    src = jnp.asarray(rs.randint(4, 80, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    prev = jnp.asarray(rs.randint(4, 80, (B, T)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, mask, prev)["params"]
    _, full = model.apply({"params": params}, src, mask, prev)

    memory = model.apply({"params": params}, src, mask,
                         method=SeedForMaskedLM.encode_memory)
    cache = DecodeCache.init(dcfg.num_layers, B, window, dcfg.num_heads,
                             dcfg.hidden_size // dcfg.num_heads)
    step = jax.jit(lambda tok, pos, cache: model.apply(
        {"params": params}, tok, pos, memory, cache,
        method=SeedForMaskedLM.decode_step))
    for t in range(T):
        logits, cache = step(prev[:, t], t, cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_greedy_decode_jits_and_is_deterministic():
    from ance_tpu.models.seed import greedy_decode

    ecfg = seed_encoder_config(vocab_size=60, hidden_size=32, num_layers=1,
                               num_heads=4, intermediate_size=64,
                               max_position_embeddings=40,
                               hidden_dropout=0.0, attention_dropout=0.0)
    dcfg = SeedDecoderConfig(num_layers=1, attention_window=2,
                             hidden_size=32, num_heads=4,
                             intermediate_size=64, max_positions=40,
                             dropout=0.0)
    model = SeedForMaskedLM(ecfg, dcfg)
    rs = np.random.RandomState(2)
    src = jnp.asarray(rs.randint(4, 60, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, mask,
                        src[:, :4])["params"]
    fn = jax.jit(lambda s, m: greedy_decode(model, params, s, m, steps=6))
    toks = fn(src, mask)
    assert toks.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(fn(src, mask)))
    # the bottleneck conditions generation: different src → different
    # first-step LOGITS (argmax can coincide at random init, so compare the
    # continuous quantity)
    from ance_tpu.models.seed import DecodeCache
    src2 = jnp.asarray(rs.randint(4, 60, (2, 8)), jnp.int32)
    cache = DecodeCache.init(1, 2, 2, 4, 8)
    def first_logits(s):
        mem = model.apply({"params": params}, s, mask,
                          method=SeedForMaskedLM.encode_memory)
        lg, _ = model.apply({"params": params}, jnp.zeros((2,), jnp.int32),
                            0, mem, cache,
                            method=SeedForMaskedLM.decode_step)
        return np.asarray(lg)
    assert np.abs(first_logits(src2) - first_logits(src)).max() > 1e-6


def test_sinusoidal_positions_matches_fairseq_formula():
    """Exact parity with the reference get_embedding math executed in torch
    (reference modules.py:220-236)."""
    import torch
    from ance_tpu.models.seed import sinusoidal_positions

    num, dim, pad = 12, 10, 1
    half = dim // 2
    emb = float(np.log(10000.0)) / (half - 1)
    emb = torch.exp(torch.arange(half, dtype=torch.float) * -emb)
    emb = torch.arange(num, dtype=torch.float).unsqueeze(1) * emb.unsqueeze(0)
    ref = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1).view(num, -1)
    ref[pad, :] = 0
    got = np.asarray(sinusoidal_positions(num, dim, padding_idx=pad))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-6, atol=1e-6)

    # odd dim gets a zero column appended (reference modules.py:231-233)
    odd = np.asarray(sinusoidal_positions(6, 7))
    assert odd.shape == (6, 7) and np.all(odd[:, -1] == 0)


def test_seed_decoder_sinusoidal_option():
    """learned_pos=False swaps the learned table for the sinusoidal one; the
    model still runs and the position signal reaches the logits."""
    ecfg = seed_encoder_config(vocab_size=50, hidden_size=32, num_layers=1,
                               num_heads=4, intermediate_size=64,
                               max_position_embeddings=40,
                               hidden_dropout=0.0, attention_dropout=0.0)
    dcfg = SeedDecoderConfig(num_layers=1, attention_window=2,
                             hidden_size=32, num_heads=4,
                             intermediate_size=64, max_positions=30,
                             dropout=0.0, learned_pos=False)
    model = SeedForMaskedLM(ecfg, dcfg)
    rs = np.random.RandomState(3)
    src = jnp.asarray(rs.randint(4, 50, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    prev = jnp.asarray(rs.randint(4, 50, (2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, mask, prev)["params"]
    assert "decoder_pos" not in params  # no learned table
    _, dec = model.apply({"params": params}, src, mask, prev)
    assert dec.shape == (2, 5, 50)
    assert np.all(np.isfinite(np.asarray(dec)))


def test_adaptive_softmax_normalized_and_nll_consistent():
    from ance_tpu.models.seed import AdaptiveSoftmax

    V, d = 50, 16
    m = AdaptiveSoftmax(vocab_size=V, input_dim=d, cutoffs=(10, 30))
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(7, d).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, method=AdaptiveSoftmax.log_prob)
    lp = m.apply(params, x, method=AdaptiveSoftmax.log_prob)
    assert lp.shape == (7, V)
    # a proper distribution over the FULL vocab
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(lp, axis=-1)), 0.0, atol=1e-5)

    # nll (static-shape path) == gathering from the dense log_prob,
    # across head / both tail clusters incl. boundaries
    tgt = jnp.asarray([0, 9, 10, 29, 30, 49, 17])
    nll = float(m.apply(params, x, tgt, method=AdaptiveSoftmax.nll))
    ref = float(-np.mean(np.asarray(lp)[np.arange(7), np.asarray(tgt)]))
    assert abs(nll - ref) < 1e-5

    # the tail factorization is genuinely low-rank
    k = params["params"]["tail_proj_0"]["kernel"]
    assert k.shape == (d, d // 4)


def test_sinusoidal_tiny_dim_is_finite():
    """dim <= 3 (debug sizes) must not divide by zero in the frequency
    schedule."""
    from ance_tpu.models.seed import sinusoidal_positions
    for dim in (1, 2, 3):
        t = np.asarray(sinusoidal_positions(5, dim))
        assert t.shape == (5, dim) and np.all(np.isfinite(t))
