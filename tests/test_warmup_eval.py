"""Warmup trainer over raw triples + in-train MRR eval parity pieces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.evaluation.mrr_eval import (
    combined_eval, compute_mrr, get_topk_restricted, load_msmarco_reference,
    parse_top_dev, ranking_to_candidates)
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)
from ance_tpu.train.warmup import WarmupConfig, run_warmup


class FakeTokenizer:
    pad_token_id = 0
    sep_token = "[SEP]"

    def encode(self, text, add_special_tokens=True, max_length=None):
        import zlib
        ids = [2] + [4 + (zlib.crc32(w.encode()) % 60)
                     for w in text.split()] + [3]
        return ids[:max_length] if max_length else ids


def test_parse_top_dev(tmp_path):
    p = tmp_path / "top1000.dev"
    p.write_text("1\t10\tq text\tp text\n1\t11\tq\tp\n2\t20\tq\tp\n")
    top = parse_top_dev(str(p), 0, 1)
    assert top == {1: [10, 11], 2: [20]}


def test_load_msmarco_reference(tmp_path):
    p = tmp_path / "qrels.tsv"
    p.write_text("1\t0\t7\t1\n1\t0\t8\t1\n3\t0\t9\t1\n")
    assert load_msmarco_reference(str(p)) == {1: [7, 8], 3: [9]}


def test_get_topk_restricted_sentinels():
    psg_embs = np.eye(4, dtype=np.float32)
    psg_ids = np.array([100, 101, 102, 103])
    pid_dict = {int(p): i for i, p in enumerate(psg_ids)}
    q = np.ones((1, 4), np.float32)
    # empty subset → sentinel row (reference eval_mrr.py:97-100)
    D, I = get_topk_restricted(q, psg_embs, pid_dict, psg_ids, [-1, 999], 5)
    assert (D == -128.0).all() and (I == -1).all()
    # subset smaller than k → padded tail
    q2 = np.array([[0.0, 1.0, 0.0, 0.5]], np.float32)
    D2, I2 = get_topk_restricted(q2, psg_embs, pid_dict, psg_ids,
                                 [101, 103], 4)
    assert I2[:2].tolist() == [101, 103]
    assert (I2[2:] == -1).all() and (D2[2:] == -128.0).all()


def test_ranking_to_candidates_dedup_and_padding():
    D = np.array([[0.9, 0.8, 0.7]])
    I = np.array([[5, 5, -1]])
    cand = ranking_to_candidates(D, I, np.array([42]))
    assert cand[42][0] == 5 and cand[42][1] == 0  # dedup; empty slots pid 0
    assert len(cand[42]) == 1000


def test_compute_mrr_scores():
    # query 1: relevant pid 7 ranked 2nd → 1/2
    D = np.array([[0.9, 0.8], [0.9, 0.8]])
    I = np.array([[5, 7], [3, 4]])
    mrr = compute_mrr(D, I, np.array([1, 2]), {1: [7], 2: [99]})
    assert mrr == pytest.approx(0.5 / 2)


def test_combined_eval_full_and_rerank():
    # orthogonal passages; queries point exactly at their relevant passage
    # (inner product unambiguously maximal at the matching row)
    psg_embs = np.eye(6, dtype=np.float32)
    psg_ids = np.array([10, 11, 12, 13, 14, 15])
    query_embs = psg_embs[[1, 4]].copy()
    query_ids = np.array([100, 200])
    ref = {100: [11], 200: [14]}
    top1k = {100: [11, 12], 200: [10, 13]}  # rerank candidates: 200 misses 14
    rerank, full = combined_eval(query_embs, query_ids, psg_embs, psg_ids,
                                 top1k, ref, full_depth=6)
    assert full == pytest.approx(1.0)        # both hit at rank 1
    assert rerank == pytest.approx(0.5)      # only qid 100 can hit


@pytest.mark.slow
def test_run_warmup_trains_and_checkpoints(tmp_path):
    tok = FakeTokenizer()
    lines = []
    rs = np.random.RandomState(0)
    words = [f"w{i}" for i in range(40)]
    for i in range(64):
        q = " ".join(rs.choice(words[:20], 3))
        pos = q + " " + words[20 + i % 10]
        neg = " ".join(rs.choice(words[25:], 4))
        lines.append(f"{q}\t{pos}\t{neg}")
    triples = tmp_path / "triples.small.tsv"
    triples.write_text("\n".join(lines) + "\n")

    cfg_enc = EncoderConfig(vocab_size=80, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64,
                            max_position_embeddings=24, pad_token_id=0,
                            hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg_enc, out_dim=16)
    L = 12
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(5e-3, 5, 5000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)

    evals = []

    def eval_fn(params):
        evals.append(1)
        return 0.1 * len(evals), 0.2 * len(evals)

    cfg = WarmupConfig(num_epochs=3, batch_size=16, max_seq_length=L,
                       save_steps=4, eval_every=6,
                       checkpoint_dir=str(tmp_path / "ckpt"))
    state, history = run_warmup(cfg, state=state, train_step=step,
                                tokenizer=tok, triples_path=str(triples),
                                rng=jax.random.PRNGKey(1), eval_fn=eval_fn)
    # 64 lines → 4 batches/epoch × 3 epochs = 12 steps
    losses = [h["loss"] for h in history if "loss" in h]
    assert len(losses) == 12
    assert int(state.step) == 12
    assert len(evals) == 2  # steps 6 and 12
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    from ance_tpu.train.checkpoint import get_latest_checkpoint
    _, step_no = get_latest_checkpoint(str(tmp_path / "ckpt"))
    assert step_no == 12

    # resume path: start_step skips already-trained batches within the epoch
    state2, history2 = run_warmup(
        WarmupConfig(num_epochs=1, batch_size=16, max_seq_length=L),
        state=state, train_step=step, tokenizer=tok,
        triples_path=str(triples), rng=jax.random.PRNGKey(2), start_step=3)
    assert len(history2) == 1  # only the 4th batch of the epoch runs
    assert history2[0]["step"] == 4


def test_passage_dist_eval_end_to_end(tmp_path):
    """Raw-text in-train eval pipeline (reference passage_dist_eval flow)."""
    from ance_tpu.evaluation.mrr_eval import passage_dist_eval
    from ance_tpu.train.encode import make_encode_fn

    tok = FakeTokenizer()
    # collection: 8 passages; queries reuse passage text → perfect full mrr
    texts = [f"unique words p{i} alpha{i} beta{i}" for i in range(8)]
    (tmp_path / "collection.tsv").write_text(
        "\n".join(f"{i}\t{t}" for i, t in enumerate(texts)) + "\n")
    (tmp_path / "queries.dev.small.tsv").write_text(
        f"100\t{texts[3]}\n101\t{texts[5]}\n")
    (tmp_path / "qrels.dev.small.tsv").write_text(
        "100\t0\t3\t1\n101\t0\t5\t1\n")
    # rerank candidates: qid 100 includes its positive, 101 does not
    (tmp_path / "top1000.dev").write_text(
        "100\t3\tq\tp\n100\t1\tq\tp\n101\t0\tq\tp\n101\t2\tq\tp\n")

    cfg = EncoderConfig(vocab_size=80, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=24, pad_token_id=0,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=16)
    L = 12
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    qfn = make_encode_fn(model, RobertaDot.query_emb)
    bfn = make_encode_fn(model, RobertaDot.body_emb)
    rerank, full = passage_dist_eval(
        query_encode_fn=qfn, body_encode_fn=bfn, params=params,
        tokenizer=tok, queries_path=str(tmp_path / "queries.dev.small.tsv"),
        collection_path=str(tmp_path / "collection.tsv"),
        top1000_path=str(tmp_path / "top1000.dev"),
        qrels_path=str(tmp_path / "qrels.dev.small.tsv"),
        max_query_length=L, max_seq_length=L, batch_size=4)
    # identical query/passage text → full ranking finds positives at rank 1
    assert full == pytest.approx(1.0)
    # rerank: only qid 100's candidates contain its positive
    assert rerank == pytest.approx(0.5)


def test_run_warmup_resume_at_max_steps_is_noop(tmp_path):
    """Resuming a checkpoint written exactly at max_steps must not train an
    extra step (the post-step max_steps check alone would run one batch
    before firing, mutating the finished model)."""
    cfg = WarmupConfig(max_steps=7, checkpoint_dir=str(tmp_path))
    sentinel = object()
    state, history = run_warmup(
        cfg, state=sentinel, train_step=None, tokenizer=None,
        triples_path=str(tmp_path / "missing.tsv"), rng=None, start_step=7)
    assert state is sentinel and history == []
    # and no final checkpoint overwrote the existing one
    assert not list(tmp_path.iterdir())
