"""SEED checkpoint import: golden-vector parity against fairseq semantics.

The torch forwards below are independent functional implementations of the
reference SEED-Encoder math (encoder: transformer_sentence_encoder.py:865-925;
decoder: :475-570; heads: modeling_seed_encoder.py:147-239), reading
parameters from a fairseq-named state dict. The same random state dict is
imported through hf_loader.seed*_params_from_torch into the flax models; the
outputs must match to fp32 tolerance. This pins BOTH the key mapping and the
flax modules' numerics to fairseq behavior.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ance_tpu.models.hf_loader import (
    graft, seed_encoder_params_from_torch, seed_mlm_params_from_torch,
    seeddot_params_from_torch)

VOCAB, HID, LAYERS, HEADS, FFN, PAD = 30, 16, 2, 2, 32, 1
MAXP = 12  # fairseq table rows = MAXP + PAD + 1 = 14
DEC_LAYERS, WINDOW = 2, 2


def _t(rs, *shape):
    return torch.tensor(rs.randn(*shape).astype(np.float32) * 0.08)


def _make_sd(rs, with_head=False, with_decoder=False, prefix=""):
    """Random fairseq-style SEED state dict (HF-saved naming)."""
    e = prefix + "seed_encoder.encoder.sentence_encoder."
    sd = {
        e + "embed_tokens.weight": _t(rs, VOCAB, HID),
        e + "embed_positions.weight": _t(rs, MAXP + PAD + 1, HID),
        e + "emb_layer_norm.weight": 1.0 + 0.1 * _t(rs, HID),
        e + "emb_layer_norm.bias": _t(rs, HID),
    }
    def linear(name, dout, din):
        sd[name + ".weight"] = _t(rs, dout, din)
        sd[name + ".bias"] = _t(rs, dout)
    def ln(name, d=HID):
        sd[name + ".weight"] = 1.0 + 0.1 * _t(rs, d)
        sd[name + ".bias"] = _t(rs, d)
    for i in range(LAYERS):
        lp = f"{e}layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            linear(lp + "self_attn." + proj, HID, HID)
        ln(lp + "self_attn_layer_norm")
        linear(lp + "fc1", FFN, HID)
        linear(lp + "fc2", HID, FFN)
        ln(lp + "final_layer_norm")
    if with_head:
        linear(prefix + "embeddingHead", 8, HID)
        ln(prefix + "norm", 8)
    if with_decoder:
        d = prefix + "decoder."
        sd[d + "embed_positions.weight"] = _t(rs, MAXP + PAD + 1, HID)
        ln(d + "layernorm_embedding")
        ln(d + "layer_norm")
        for i in range(DEC_LAYERS):
            lp = f"{d}layers.{i}."
            for att in ("self_attn", "encoder_attn"):
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    linear(f"{lp}{att}.{proj}", HID, HID)
                ln(lp + att + "_layer_norm")
            linear(lp + "fc1", FFN, HID)
            linear(lp + "fc2", HID, FFN)
            ln(lp + "final_layer_norm")
        linear(prefix + "lm_head.dense", HID, HID)
        ln(prefix + "lm_head.layer_norm")
        sd[prefix + "lm_head.bias"] = _t(rs, VOCAB)
    return sd


# ---- functional torch forwards (fairseq semantics) -------------------------

def _torch_ln(x, sd, p, eps=1e-5):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), sd[p + ".weight"], sd[p + ".bias"], eps)


def _torch_linear(x, sd, p):
    return x @ sd[p + ".weight"].T + sd[p + ".bias"]


def _torch_mha(x_q, x_kv, sd, p, key_pad=None, attn_bias=None):
    """fairseq MultiheadAttention (modules.py:394-620): q scaled by
    head_dim**-0.5, optional key padding mask and additive attn mask."""
    B, Sq, _ = x_q.shape
    Sk = x_kv.shape[1]
    Dh = HID // HEADS
    q = _torch_linear(x_q, sd, p + ".q_proj").view(B, Sq, HEADS, Dh)
    k = _torch_linear(x_kv, sd, p + ".k_proj").view(B, Sk, HEADS, Dh)
    v = _torch_linear(x_kv, sd, p + ".v_proj").view(B, Sk, HEADS, Dh)
    logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
    if key_pad is not None:
        logits = logits.masked_fill(key_pad[:, None, None, :], -1e9)
    if attn_bias is not None:
        logits = logits + attn_bias
    w = torch.softmax(logits, dim=-1)
    ctx = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Sq, HID)
    return _torch_linear(ctx, sd, p + ".out_proj")


def torch_seed_encoder(sd, tokens, prefix=""):
    """TransformerSentenceEncoder forward, eval mode
    (transformer_sentence_encoder.py:865-925): embed + pad-offset positions,
    emb LayerNorm, zero pad rows, post-LN layers with exact gelu."""
    e = prefix + "seed_encoder.encoder.sentence_encoder."
    pad_mask = tokens.eq(PAD)
    x = sd[e + "embed_tokens.weight"][tokens]
    nonpad = (~pad_mask).long()
    positions = torch.cumsum(nonpad, dim=1) * nonpad + PAD
    x = x + sd[e + "embed_positions.weight"][positions]
    x = _torch_ln(x, sd, e + "emb_layer_norm")
    x = x * (~pad_mask).unsqueeze(-1)
    for i in range(LAYERS):
        lp = f"{e}layers.{i}."
        h = _torch_mha(x, x, sd, lp + "self_attn", key_pad=pad_mask)
        x = _torch_ln(x + h, sd, lp + "self_attn_layer_norm")
        h = torch.nn.functional.gelu(_torch_linear(x, sd, lp + "fc1"))
        h = _torch_linear(h, sd, lp + "fc2")
        x = _torch_ln(x + h, sd, lp + "final_layer_norm")
    return x


def torch_seed_dot_query_emb(sd, tokens):
    """SEEDEncoderDot_NLL_LN.query_emb (reference models.py:212-218):
    CLS → embeddingHead → LayerNorm."""
    x = torch_seed_encoder(sd, tokens)[:, 0]
    return _torch_ln(_torch_linear(x, sd, "embeddingHead"), sd, "norm")


def torch_seed_mlm(sd, src_tokens, prev_tokens):
    """SEEDEncoderForMaskedLM forward (modeling_seed_encoder.py:147-183):
    MLM head over encoder states + windowed decoder on the CLS bottleneck."""
    enc = torch_seed_encoder(sd, src_tokens)
    h = torch.nn.functional.gelu(_torch_linear(enc, sd, "lm_head.dense"))
    h = _torch_ln(h, sd, "lm_head.layer_norm")
    table = sd["seed_encoder.encoder.sentence_encoder.embed_tokens.weight"]
    mlm_logits = h @ table.T + sd["lm_head.bias"]

    memory = enc[:, 0:1, :]
    d = "decoder."
    pad_mask = prev_tokens.eq(PAD)
    nonpad = (~pad_mask).long()
    positions = torch.cumsum(nonpad, dim=1) * nonpad + PAD
    x = table[prev_tokens] + sd[d + "embed_positions.weight"][positions]
    x = _torch_ln(x, sd, d + "layernorm_embedding")

    S = prev_tokens.shape[1]
    i = torch.arange(S)[:, None]
    j = torch.arange(S)[None, :]
    allowed = (j <= i) & (j > i - WINDOW) | (j == 0)
    bias = torch.where(allowed, 0.0, -1e9)[None, None]
    for li in range(DEC_LAYERS):
        lp = f"{d}layers.{li}."
        h = _torch_ln(x, sd, lp + "self_attn_layer_norm")
        x = x + _torch_mha(h, h, sd, lp + "self_attn", attn_bias=bias)
        h = _torch_ln(x, sd, lp + "encoder_attn_layer_norm")
        x = x + _torch_mha(h, memory, sd, lp + "encoder_attn")
        h = _torch_ln(x, sd, lp + "final_layer_norm")
        h = torch.nn.functional.gelu(_torch_linear(h, sd, lp + "fc1"))
        x = x + _torch_linear(h, sd, lp + "fc2")
    x = _torch_ln(x, sd, d + "layer_norm")
    dec_logits = x @ table.T  # tied, bias-free output projection
    return mlm_logits, dec_logits


# ---- the parity tests -------------------------------------------------------

def _tiny_cfg():
    from ance_tpu.models.seed import seed_encoder_config
    return seed_encoder_config(
        vocab_size=VOCAB, hidden_size=HID, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=FFN,
        max_position_embeddings=MAXP + PAD + 1 + 2,  # headroom on purpose
        hidden_dropout=0.0, attention_dropout=0.0)


def _tokens(rs, b, s):
    t = rs.randint(PAD + 1, VOCAB, (b, s))
    t[:, 0] = 0            # CLS
    t[0, -2:] = PAD        # ragged padding in row 0
    return t


def test_seeddot_import_golden_parity():
    from ance_tpu.models.dot_models import RobertaDot
    rs = np.random.RandomState(0)
    sd = _make_sd(rs, with_head=True)
    tokens = _tokens(rs, 3, 9)

    want = torch_seed_dot_query_emb(sd, torch.tensor(tokens)).numpy()

    cfg = _tiny_cfg()
    model = RobertaDot(cfg, out_dim=8)
    ids = jnp.asarray(tokens, jnp.int32)
    mask = jnp.asarray(tokens != PAD, jnp.int32)
    init = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    loaded = seeddot_params_from_torch(
        sd, num_layers=LAYERS,
        max_position_embeddings=cfg.max_position_embeddings)
    params = graft(init, loaded)
    got = np.asarray(model.apply({"params": params}, ids, mask,
                                 method=model.query_emb))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_seed_mlm_import_golden_parity():
    from ance_tpu.models.seed import SeedDecoderConfig, SeedForMaskedLM
    rs = np.random.RandomState(1)
    sd = _make_sd(rs, with_decoder=True)
    src = _tokens(rs, 2, 9)
    prev = _tokens(rs, 2, 7)

    want_mlm, want_dec = torch_seed_mlm(sd, torch.tensor(src),
                                        torch.tensor(prev))

    cfg = _tiny_cfg()
    dcfg = SeedDecoderConfig(
        num_layers=DEC_LAYERS, attention_window=WINDOW, hidden_size=HID,
        num_heads=HEADS, intermediate_size=FFN, max_positions=MAXP,
        dropout=0.0)
    model = SeedForMaskedLM(cfg, dcfg)
    ids = jnp.asarray(src, jnp.int32)
    mask = jnp.asarray(src != PAD, jnp.int32)
    prev_ids = jnp.asarray(prev, jnp.int32)
    init = model.init(jax.random.PRNGKey(0), ids, mask, prev_ids)["params"]
    loaded = seed_mlm_params_from_torch(
        sd, num_enc_layers=LAYERS, num_dec_layers=DEC_LAYERS,
        max_position_embeddings=cfg.max_position_embeddings)
    params = graft(init, loaded)
    got_mlm, got_dec = model.apply({"params": params}, ids, mask, prev_ids)
    np.testing.assert_allclose(np.asarray(got_mlm), want_mlm.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dec), want_dec.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_seed_import_accepts_raw_fairseq_prefix():
    """Raw fairseq checkpoints name the tree encoder.sentence_encoder.*."""
    rs = np.random.RandomState(2)
    hf = _make_sd(rs)
    raw = {k.replace("seed_encoder.encoder.", "encoder."): v
           for k, v in hf.items()}
    a = seed_encoder_params_from_torch(hf, num_layers=LAYERS,
                                       max_position_embeddings=16)
    b = seed_encoder_params_from_torch(raw, num_layers=LAYERS,
                                       max_position_embeddings=16)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(x, y)


def test_graft_rejects_orphan_keys():
    """ADVICE r1 (low): a structurally alien checkpoint must raise, not
    silently no-op the warm start."""
    init = {"encoder": {"kernel": np.zeros((2, 2))}}
    with pytest.raises(KeyError):
        graft(init, {"nonexistent_tower": {"kernel": np.ones((2, 2))}})
    with pytest.raises(ValueError):
        graft(init, {"encoder": {"kernel": np.ones((3, 3))}})
