"""Encoder forward + loss parity vs the HF/torch reference semantics.

The torch models here play the role of the reference implementation
(reference model/models.py builds on HF RobertaModel/BertModel); we check our
flax encoder reproduces their outputs through the HF weight importer.

NOTE: every apply/init is wrapped in jax.jit — on this environment each XLA
compile (even eager per-op dispatch) round-trips a remote compile service, so
one-compile-per-graph keeps the suite fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder
from ance_tpu.models.dot_models import BiEncoder, RobertaDot
from ance_tpu.models.hf_loader import (
    encoder_params_from_torch, graft, robertadot_params_from_torch)
from ance_tpu.models import losses

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _small_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()
    ours = EncoderConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64,
                         max_position_embeddings=40, type_vocab_size=1,
                         pad_token_id=1, position_style="roberta",
                         hidden_dropout=0.0, attention_dropout=0.0)
    return model, ours


def _batch(pad_id, vocab, B=3, S=12, seed=1):
    rs = np.random.RandomState(seed)
    ids = rs.randint(4, vocab, size=(B, S)).astype(np.int32)
    lengths = rs.randint(3, S + 1, size=B)
    mask = (np.arange(S)[None, :] < lengths[:, None]).astype(np.int32)
    ids = np.where(mask == 1, ids, pad_id)
    return ids, mask


def _np_head(params, cls):
    """numpy replica of Dense(768)+LayerNorm head (reference models.py:145-146)."""
    proj = cls @ np.asarray(params["embedding_head"]["kernel"]) + \
        np.asarray(params["embedding_head"]["bias"])
    mu, var = proj.mean(-1, keepdims=True), proj.var(-1, keepdims=True)
    return (proj - mu) / np.sqrt(var + 1e-5) * \
        np.asarray(params["norm"]["scale"]) + np.asarray(params["norm"]["bias"])


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_roberta_forward_parity():
    hf, cfg = _small_roberta()
    ids, mask = _batch(pad_id=1, vocab=100)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()

    enc = TransformerEncoder(cfg)
    params = encoder_params_from_torch(hf.state_dict(), cfg.num_layers)
    out = jax.jit(enc.apply)({"params": params}, jnp.asarray(ids),
                             jnp.asarray(mask))
    # valid (non-pad) positions must match; padded positions are masked out of
    # every downstream pooling so parity there is irrelevant
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid],
                               rtol=2e-3, atol=5e-4)


def test_bert_forward_parity():
    cfg_t = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0,
        attn_implementation="eager")
    torch.manual_seed(1)
    hf = transformers.BertModel(cfg_t, add_pooling_layer=False).eval()
    ids, mask = _batch(pad_id=0, vocab=120, seed=2)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()

    cfg = EncoderConfig.bert_base(vocab_size=120, hidden_size=32, num_layers=2,
                                  num_heads=4, intermediate_size=64,
                                  max_position_embeddings=40,
                                  hidden_dropout=0.0, attention_dropout=0.0)
    enc = TransformerEncoder(cfg)
    params = encoder_params_from_torch(hf.state_dict(), cfg.num_layers)
    out = jax.jit(enc.apply)({"params": params}, jnp.asarray(ids),
                             jnp.asarray(mask))
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid],
                               rtol=2e-3, atol=5e-4)


def test_robertadot_graft_embed_and_multichunk():
    """RobertaDot: backbone import + fresh head graft; MaxP chunked body
    encode equals per-chunk independent encodes (reference models.py:165-199)."""
    hf, cfg = _small_roberta()
    model = RobertaDot(cfg, use_mean=False, out_dim=16, base_len=8)
    B, C, L = 2, 3, 8
    ids, mask = _batch(pad_id=1, vocab=100, B=B, S=C * L, seed=5)

    init = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(ids),
                               jnp.asarray(mask))["params"]
    sd = {("roberta." + k): v for k, v in hf.state_dict().items()}
    params = graft(init, robertadot_params_from_torch(sd, cfg.num_layers))

    @jax.jit
    def run(ids, mask):
        hidden_full = TransformerEncoder(cfg).apply(
            {"params": params["encoder"]}, ids, mask)
        q = model.apply({"params": params}, ids, mask,
                        method=RobertaDot.query_emb)
        chunked = model.apply({"params": params}, ids, mask,
                              method=RobertaDot.body_emb_multichunk)
        flat_ids = ids.reshape(B * C, L)
        flat_mask = mask.reshape(B * C, L)
        hidden_chunks = TransformerEncoder(cfg).apply(
            {"params": params["encoder"]}, flat_ids, flat_mask)
        return hidden_full, q, chunked, hidden_chunks

    hidden_full, q, chunked, hidden_chunks = map(
        np.asarray, run(jnp.asarray(ids), jnp.asarray(mask)))

    assert q.shape == (B, 16)
    np.testing.assert_allclose(q, _np_head(params, hidden_full[:, 0]),
                               rtol=1e-4, atol=1e-5)

    assert chunked.shape == (B, C, 16)
    expect = _np_head(params, hidden_chunks[:, 0]).reshape(B, C, 16)
    np.testing.assert_allclose(chunked, expect, rtol=1e-4, atol=1e-5)


def test_dpr_inbatch_multichunk_loss():
    """Cross-matrix MaxP in-batch loss == dpr_inbatch_loss computed on the
    manually max-reduced score matrix (incl. −9999 empty-chunk bias)."""
    rs = np.random.RandomState(1)
    Q, C, Cn, D, L = 3, 6, 4, 8, 5
    q = rs.randn(Q, D).astype(np.float32)
    ctx = rs.randn(C, Cn, D).astype(np.float32)
    mask = rs.randint(0, 2, size=(C, Cn * L)).astype(np.float32)
    pos_idx = np.arange(Q) * 2

    loss, correct = losses.dpr_inbatch_multichunk_loss(
        jnp.asarray(q), jnp.asarray(ctx), jnp.asarray(mask),
        jnp.asarray(pos_idx))

    alive = mask.reshape(C, Cn, L)[:, :, 0]
    bias = (1.0 - alive) * -9999.0
    scores = np.einsum("qd,jcd->qjc", q, ctx) + bias[None]
    ref = scores.max(axis=-1)                       # [Q, C]
    lsm = ref - np.log(np.exp(ref - ref.max(1, keepdims=True)).sum(
        1, keepdims=True)) - ref.max(1, keepdims=True)
    ref_loss = float(np.mean([-lsm[i, pos_idx[i]] for i in range(Q)]))
    assert abs(float(loss) - ref_loss) < 1e-4
    assert int(correct) == int(np.sum(ref.argmax(1) == pos_idx))

    # a doc whose only live chunk holds the best embedding must win over a
    # doc whose best embedding sits in a DEAD chunk
    ctx2 = np.zeros((2, 2, D), np.float32)
    ctx2[0, 0] = q[0]                               # doc 0: live chunk match
    ctx2[1, 1] = q[0] * 2                           # doc 1: dead chunk only
    m2 = np.zeros((2, 2 * L), np.float32)
    m2[0, 0] = 1.0                                  # doc0 chunk0 alive
    m2[1, 0] = 1.0                                  # doc1 chunk0 alive (zero emb)
    _, correct2 = losses.dpr_inbatch_multichunk_loss(
        jnp.asarray(q[:1]), jnp.asarray(ctx2), jnp.asarray(m2),
        jnp.asarray(np.array([0])))
    assert int(correct2) == 1


def test_losses_vs_torch_reference_math():
    """All three loss heads against reference formulas in one jit.

    NLL (models.py:77-81), NLL_MultiChunk with −9999 bias (models.py:103-134),
    DPR in-batch (run_ann_dpr.py:356-366).
    """
    rs = np.random.RandomState(0)
    B, C, D, L = 4, 3, 8, 5
    q, a, b = (rs.randn(B, D).astype(np.float32) for _ in range(3))
    ca = rs.randn(B, C, D).astype(np.float32)
    cb = rs.randn(B, C, D).astype(np.float32)
    mask_a = rs.randint(0, 2, size=(B, C * L)).astype(np.float32)
    mask_b = rs.randint(0, 2, size=(B, C * L)).astype(np.float32)
    Q = 6
    qd = rs.randn(Q, D).astype(np.float32)
    ctx = rs.randn(2 * Q, D).astype(np.float32)
    pos_idx = np.arange(Q) * 2

    @jax.jit
    def all_losses():
        l1 = losses.nll_triplet_loss(jnp.asarray(q), jnp.asarray(a),
                                     jnp.asarray(b))
        l2 = losses.nll_multichunk_loss(
            jnp.asarray(q), jnp.asarray(ca), jnp.asarray(mask_a),
            jnp.asarray(cb), jnp.asarray(mask_b))
        l3, correct = losses.dpr_inbatch_loss(
            jnp.asarray(qd), jnp.asarray(ctx), jnp.asarray(pos_idx))
        return l1, l2, l3, correct

    l1, l2, l3, correct = all_losses()

    # torch reference: NLL triplet
    logit = torch.cat([(torch.tensor(q) * torch.tensor(a)).sum(-1).unsqueeze(1),
                       (torch.tensor(q) * torch.tensor(b)).sum(-1).unsqueeze(1)],
                      dim=1)
    ref1 = (-torch.nn.functional.log_softmax(logit, dim=1)[:, 0]).mean().item()
    assert abs(float(l1) - ref1) < 2e-5

    # torch reference: MultiChunk
    def torch_side(qv, emb, mask):
        att = torch.tensor(mask).reshape(B, C, -1)[:, :, 0]
        inverted = ((1 - att) * (-9999)).float()
        a12 = torch.matmul(torch.tensor(qv).unsqueeze(1),
                           torch.tensor(emb).transpose(1, 2))
        return (a12[:, 0, :] + inverted).max(dim=-1).values

    la, lb = torch_side(q, ca, mask_a), torch_side(q, cb, mask_b)
    logit2 = torch.cat([la.unsqueeze(1), lb.unsqueeze(1)], dim=1)
    ref2 = (-torch.nn.functional.log_softmax(logit2, dim=1)[:, 0]).mean().item()
    assert abs(float(l2) - ref2) < 2e-5

    # torch reference: DPR in-batch
    scores = torch.tensor(qd) @ torch.tensor(ctx).T
    ref3 = torch.nn.functional.nll_loss(
        torch.nn.functional.log_softmax(scores, dim=1),
        torch.tensor(pos_idx), reduction="mean").item()
    ref_correct = (torch.nn.functional.softmax(scores, dim=1).max(1)[1] ==
                   torch.tensor(pos_idx)).sum().item()
    assert abs(float(l3) - ref3) < 2e-5
    assert int(correct) == ref_correct


def test_biencoder_towers_independent():
    cfg = EncoderConfig.bert_base(vocab_size=120, hidden_size=32, num_layers=2,
                                  num_heads=4, intermediate_size=64,
                                  max_position_embeddings=40,
                                  hidden_dropout=0.0, attention_dropout=0.0)
    ids, mask = _batch(pad_id=0, vocab=120, seed=7)
    model = BiEncoder(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(ids),
                                 jnp.asarray(mask))["params"]
    assert set(params) == {"question_model", "ctx_model"}
    qe, be = jax.jit(model.apply)({"params": params}, jnp.asarray(ids),
                                  jnp.asarray(mask))
    assert qe.shape == be.shape == (3, 32)
    assert not np.allclose(np.asarray(qe), np.asarray(be))


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_remat_encoder_matches_and_trains():
    """remat=True must be numerically identical in fwd and produce matching
    gradients (activation recompute, not a different model)."""
    import dataclasses
    from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder
    cfg = EncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=24, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    cfg_r = dataclasses.replace(cfg, remat=True)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 64, (2, 10)).astype(np.int32))
    mask = jnp.ones((2, 10), jnp.int32)
    enc, enc_r = TransformerEncoder(cfg), TransformerEncoder(cfg_r)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), ids, mask)["params"]
    out = jax.jit(enc.apply)({"params": params}, ids, mask)
    out_r = jax.jit(enc_r.apply)({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)

    def loss(p, module):
        return jnp.sum(module.apply({"params": p}, ids, mask) ** 2)

    g = jax.jit(jax.grad(lambda p: loss(p, enc)))(params)
    g_r = jax.jit(jax.grad(lambda p: loss(p, enc_r)))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_qkv_identical_tree_and_outputs():
    """fused_qkv=True computes Q/K/V as one [H, 3H] GEMM but keeps nn.Dense's
    exact parameter tree, so checkpoints interop and outputs match the
    unfused path bit-for-bit at fp32."""
    kw = dict(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
              intermediate_size=64, max_position_embeddings=20,
              hidden_dropout=0.0, attention_dropout=0.0)
    m1 = TransformerEncoder(EncoderConfig(**kw))
    m2 = TransformerEncoder(EncoderConfig(fused_qkv=True, **kw))
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(2, 90, (3, 10)), jnp.int32)
    mask = jnp.ones((3, 10), jnp.int32)
    p1 = m1.init(jax.random.PRNGKey(0), ids, mask)["params"]
    p2 = m2.init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    o1 = m1.apply({"params": p1}, ids, mask)
    o2 = m2.apply({"params": p1}, ids, mask)  # same params, fused compute
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_bf16_fast_path_within_bf16_noise():
    """The bf16 auto defaults (tanh gelu + bf16 softmax, measured +28%
    encode on v5e) must stay within the noise band bf16 itself introduces:
    embeddings from the fast bf16 path and the STRICT bf16 path (exact erf
    gelu + fp32 softmax) must be as close to the fp32 reference as they are
    to each other."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    kw = dict(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
              intermediate_size=64, max_position_embeddings=40,
              hidden_dropout=0.0, attention_dropout=0.0)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 120, (4, 24)), jnp.int32)
    mask = jnp.ones((4, 24), jnp.int32)

    def emb(cfg):
        model = RobertaDot(cfg, out_dim=16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, mask
                                     )["params"]
        return np.asarray(
            model.apply({"params": params}, ids, mask,
                        method=model.body_emb), np.float32)

    ref = emb(EncoderConfig(dtype=jnp.float32, **kw))  # fp32 exact
    fast = emb(EncoderConfig(dtype=jnp.bfloat16, **kw))  # bf16 auto (fast)
    strict = emb(EncoderConfig(dtype=jnp.bfloat16, gelu_approx=False,
                               attention_impl="xla", **kw))  # bf16 strict

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        return (a * b).sum(1).min()

    assert not np.array_equal(fast, strict)  # the knobs actually engage
    # fast-vs-ref no worse than ~the strict-vs-ref bf16 floor
    assert cos(fast, ref) > 0.995
    assert cos(fast, ref) > cos(strict, ref) - 0.005
    # fp32 keeps exact HF parity semantics: auto resolves to exact gelu +
    # fp32 softmax, so an explicit strict config is bit-identical
    strict_fp32 = emb(EncoderConfig(dtype=jnp.float32, gelu_approx=False,
                                    attention_impl="xla", **kw))
    np.testing.assert_array_equal(ref, strict_fp32)


def test_attention_probs_dropout_applies_in_training():
    """attention_dropout is the reference's attention_probs_dropout_prob
    (HF BertSelfAttention drops softmax probs after softmax): it must
    engage in training mode, stay off at eval, and keep the inverted-
    dropout scaling unbiased."""
    kw = dict(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
              intermediate_size=32, max_position_embeddings=24,
              hidden_dropout=0.0)
    ids = jnp.asarray(np.random.RandomState(0).randint(4, 64, (4, 12)),
                      jnp.int32)
    mask = jnp.ones_like(ids)

    def run(cfg, det, seed=0):
        enc = TransformerEncoder(cfg)
        params = jax.jit(enc.init)(jax.random.PRNGKey(1), ids, mask)["params"]
        return np.asarray(enc.apply(
            {"params": params}, ids, mask, deterministic=det,
            rngs={} if det else {"dropout": jax.random.PRNGKey(seed)}))

    drop = EncoderConfig(attention_dropout=0.5, **kw)
    nodrop = EncoderConfig(attention_dropout=0.0, **kw)

    # eval identical with and without the knob; training differs run to run
    np.testing.assert_array_equal(run(drop, True), run(nodrop, True))
    assert not np.array_equal(run(drop, False, 2), run(drop, False, 3))
    # rate 0 training == eval (no other stochastic op in this config)
    np.testing.assert_array_equal(run(nodrop, False), run(nodrop, True))
