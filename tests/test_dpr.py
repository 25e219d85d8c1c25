"""DPR path: preprocessing, in-batch trainer, answer-filtered generation."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.dpr import (
    DprPreprocessConfig, load_answers, load_mapping, load_positive_ids,
    normalize_question, preprocess_dpr)
from ance_tpu.models.dot_models import BiEncoder
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.dpr_gen import (
    mine_negatives_dpr, validate, write_dpr_ann_data)
from ance_tpu.train.dpr_trainer import (
    biencoder_loss_fn, dpr_dev_batches, evaluate_dev, make_dpr_train_step)
from ance_tpu.train.trainer import init_train_state, make_optimizer


class FakeBertTokenizer:
    pad_token_id = 0
    sep_token_id = 3
    sep_token = "[SEP]"

    def encode(self, text, text_pair=None, add_special_tokens=True,
               max_length=None):
        import zlib

        def toks(t):
            return [4 + (zlib.crc32(w.encode()) % 500) for w in t.split()]

        ids = [2] + toks(text) + [3]
        if text_pair is not None:
            ids += toks(text_pair) + [3]
        if max_length is not None:
            ids = ids[:max_length]
        return ids


def make_fake_bert_tokenizer():
    return FakeBertTokenizer()


def _write_dpr_raw(tmp_path):
    wiki = tmp_path / "wiki"
    qd = tmp_path / "questions"
    ad = tmp_path / "answers"
    for d in (wiki, qd, ad):
        d.mkdir()
    (wiki / "psgs_w100.tsv").write_text(
        "id\ttext\ttitle\n"
        "1\tparis is the capital of france\tFrance\n"
        "2\tberlin is in germany\tGermany\n"
        "3\tthe moon orbits the earth\tMoon\n"
        "4\tunrelated filler text\tFiller\n")

    def sample(q, answers, pos, negs, id_key="passage_id"):
        return {"question": q, "answers": answers,
                "positive_ctxs": [{id_key: str(pos)}],
                "hard_negative_ctxs": [{id_key: str(n)} for n in negs]}

    nq_train = [
        sample("what is the capital of france?", ["paris"], 1, [2, 4]),
        sample("what orbits the earth?", ["the moon"], 3, [4]),
        {"question": "dropped (no positives)?", "answers": ["x"],
         "positive_ctxs": [], "hard_negative_ctxs": [{"passage_id": "2"}]},
    ]
    (qd / "nq-train.json").write_text(json.dumps(nq_train))
    (qd / "nq-dev.json").write_text(json.dumps([
        sample("capital of france?", ["paris"], 1, [4])]))
    (qd / "trivia-dev.json").write_text(json.dumps([
        sample("where is berlin?", ["germany"], 2, [4], id_key="psg_id")]))
    (ad / "nq-test.csv").write_text("what is the capital of france?\t['paris']\n")
    (ad / "trivia-test.csv").write_text("where is berlin?\t['germany']\n")
    return DprPreprocessConfig(
        wiki_dir=str(wiki), question_dir=str(qd), answer_dir=str(ad),
        out_data_dir=str(tmp_path / "out"), data_type=0,
        max_seq_length=24, num_processes=1)


def test_normalize_question():
    assert normalize_question("why?") == "why"
    assert normalize_question("why") == "why"


def test_preprocess_dpr(tmp_path):
    cfg = _write_dpr_raw(tmp_path)
    counts = preprocess_dpr(cfg, make_fake_bert_tokenizer)
    assert counts["train"] == 2          # third sample dropped (no positives)
    assert counts["dev"] == 1 and counts["test"] == 1
    out = cfg.out_data_dir

    pid2offset, offset2pid = load_mapping(out, "pid2offset")
    assert set(pid2offset) == {1, 2, 3, 4}
    with TokenCache(out + "/passages") as cache:
        assert len(cache) == 4
        length, toks = cache[pid2offset[1]]
        tok = FakeBertTokenizer()
        expect = tok.encode("France", text_pair="paris is the capital of france")
        assert toks[:length].tolist() == expect

    answers = load_answers(out + "/train-ann")
    assert answers == {0: ["paris"], 1: ["the moon"]}
    positives = load_positive_ids(out + "/train-data")
    assert positives == {0: pid2offset[1], 1: pid2offset[3]}
    # training lines carry offsets of the hard negatives
    line0 = open(out + "/train-data").read().splitlines()[0].split("\t")
    assert [int(x) for x in line0[2].split(",")] == \
        [pid2offset[2], pid2offset[4]]
    with TokenCache(out + "/train-query") as cache:
        assert len(cache) == 2
    with TokenCache(out + "/test-query") as cache:
        assert len(cache) == 1


def test_validate_top_k_hits():
    texts = {0: ("paris is nice", "t"), 1: ("berlin here", "t"),
             2: ("nothing", "t")}
    answers = {10: ["paris"], 11: ["tokyo"]}
    closest = np.array([[2, 0, 1], [0, 1, 2]])
    hits = validate(texts, answers, closest, np.array([10, 11]),
                    np.array([0, 1, 2]))
    # qid 10 hits at rank 2 → counts toward k>=2; qid 11 never hits
    assert hits == [0.0, 0.5, 0.5]


def test_mine_negatives_dpr_answer_filter():
    texts = {0: ("paris is the capital", "t"), 1: ("berlin", "t"),
             2: ("rome", "t"), 3: ("madrid", "t")}
    answers = {7: ["paris"]}
    positives = {7: 3}
    closest = np.array([[3, 0, 1, 2]])  # pos first, then answer-bearing 0
    negs = mine_negatives_dpr(texts, answers, np.array([7]),
                              np.array([0, 1, 2, 3]), closest, positives,
                              negative_sample=2)
    # pos skipped; passage 0 contains the answer → rejected but consumes
    # budget (reference quirk); passage 1 accepted; budget exhausted
    assert negs == {7: [1]}


def test_write_dpr_ann_data(tmp_path):
    data_path, ndcg_path = write_dpr_ann_data(
        str(tmp_path), 2, np.array([0, 1]), {0: 5, 1: 6},
        {0: [9], 1: []}, {"top20": 0.5, "top100": 0.75}, "ckpt-1")
    lines = open(data_path).read().splitlines()
    assert lines == ["0\t5\t9"]  # qid 1 has no negatives → dropped
    side = json.load(open(ndcg_path))
    assert side == {"top20": 0.5, "top100": 0.75, "checkpoint": "ckpt-1"}


def _tiny_biencoder():
    cfg = EncoderConfig.bert_base(vocab_size=520, hidden_size=32, num_layers=2,
                                  num_heads=4, intermediate_size=64,
                                  max_position_embeddings=32,
                                  hidden_dropout=0.0, attention_dropout=0.0)
    return BiEncoder(cfg)


@pytest.mark.slow
def test_dpr_inbatch_training_learns(tmp_path):
    cfg = _write_dpr_raw(tmp_path)
    preprocess_dpr(cfg, make_fake_bert_tokenizer)
    out = cfg.out_data_dir
    model = _tiny_biencoder()
    L = 24
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    opt = make_optimizer("adamw", warmup_linear(5e-4, 5, 5000))
    state = init_train_state(params, opt)
    step = make_dpr_train_step(biencoder_loss_fn(model), opt)

    from ance_tpu.train.dpr_trainer import dpr_dev_batches
    with TokenCache(out + "/train-query") as qc, \
            TokenCache(out + "/passages") as pc:
        batches = list(dpr_dev_batches(qc, pc, out + "/train-data",
                                       batch_size=2))
        assert len(batches) == 1
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(30):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batches[0], sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5
        assert 0.0 <= float(m["correct_ratio"]) <= 1.0

        # dev evaluation runs end-to-end
        nll, ratio = evaluate_dev(model, state.params, qc, pc,
                                  out + "/train-data", batch_size=2)
        assert nll >= 0.0 and 0.0 <= ratio <= 1.0


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_evaluate_dev_is_deterministic(tmp_path):
    """ADVICE r1 (medium): dev eval ran with dropout ON. With dropout in the
    config, repeated evals must now agree exactly, and differ from the
    dropout-on loss path."""
    cfg = _write_dpr_raw(tmp_path)
    preprocess_dpr(cfg, make_fake_bert_tokenizer)
    out = cfg.out_data_dir
    enc_cfg = EncoderConfig.bert_base(
        vocab_size=520, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.3, attention_dropout=0.3)  # dropout ACTIVE
    model = BiEncoder(enc_cfg)
    L = 24
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    with TokenCache(out + "/train-query") as qc, \
            TokenCache(out + "/passages") as pc:
        a = evaluate_dev(model, params, qc, pc, out + "/train-data",
                         batch_size=2)
        b = evaluate_dev(model, params, qc, pc, out + "/train-data",
                         batch_size=2)
        assert a == b
        # the training loss path (deterministic=False) draws dropout: two
        # different rngs give different losses on the same batch
        loss_fn = biencoder_loss_fn(model)
        batch = next(iter(dpr_dev_batches(qc, pc, out + "/train-data", 2)))
        l1, _ = loss_fn(params, batch, jax.random.PRNGKey(1))
        l2, _ = loss_fn(params, batch, jax.random.PRNGKey(2))
        assert float(l1) != float(l2)


@pytest.mark.slow
def test_dpr_fixed_epoch_mode(tmp_path):
    """--num_epoch path (reference run_ann_dpr.py:179-211): fixed data
    epochs, per-epoch dev eval, per-epoch checkpoints."""
    from ance_tpu.train.dpr_trainer import run_dpr_epochs
    from ance_tpu.train import checkpoint as ckpt

    cfg = _write_dpr_raw(tmp_path)
    preprocess_dpr(cfg, make_fake_bert_tokenizer)
    out = cfg.out_data_dir
    model = _tiny_biencoder()
    L = 24
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    opt = make_optimizer("adamw", warmup_linear(5e-4, 5, 5000))
    state = init_train_state(params, opt)
    step = make_dpr_train_step(biencoder_loss_fn(model), opt)
    ckpt_dir = str(tmp_path / "ckpts")

    with TokenCache(out + "/train-query") as qc, \
            TokenCache(out + "/passages") as pc:
        def dev_eval_fn(p):
            return evaluate_dev(model, p, qc, pc, out + "/train-data",
                                batch_size=2)
        state, history = run_dpr_epochs(
            state=state, train_step=step, rng=jax.random.PRNGKey(1),
            params_of=lambda s: s.params, query_cache=qc, passage_cache=pc,
            train_data_path=out + "/train-data", num_epochs=3, batch_size=2,
            dev_eval_fn=dev_eval_fn, checkpoint_dir=ckpt_dir)
    assert [h["epoch"] for h in history] == [0, 1, 2]
    assert all("dev_nll" in h and "dev_correct_ratio" in h for h in history)
    assert all(np.isfinite(h["loss"]) for h in history)
    assert int(jax.device_get(state.step)) == history[-1]["step"] > 0
    # per-epoch checkpoints exist and are complete
    path, step_no = ckpt.get_latest_checkpoint(ckpt_dir)
    assert path is not None and ckpt.is_complete(path)
    assert step_no == history[-1]["step"]


def _rand_dpr_batch(rs, B, L):
    def tok():
        return rs.randint(4, 500, (B, L)).astype(np.int32)
    ones = np.ones((B, L), np.int32)
    return {"query_ids": tok(), "query_mask": ones,
            "pos_ids": tok(), "pos_mask": ones,
            "neg_ids": tok(), "neg_mask": ones}


@pytest.mark.slow
def test_dpr_accum_equals_full_batch():
    """Two-phase gradient accumulation (VERDICT r2 #3): accum=4 must equal
    the unaccumulated full-batch step — same loss AND same updated params —
    because the softmax stays GLOBAL (the naive per-microbatch-softmax
    accumulation the reference uses shrinks negatives-per-softmax and would
    NOT match). Deterministic mode, per the done criterion.

    Memory headroom: phase 1/3 scans keep only ONE microbatch's encoder
    activations live (plus [B, D] embeddings), so effective batch scales
    ~accum_steps x at fixed activation memory.

    Optimizer is SGD so updated params are a direct proxy for the raw
    gradients: normalized optimizers (LAMB/Adam) turn the ~1e-8-relative
    fp-reduction noise between the two paths into ±sign flips on leaves
    whose true gradient is ~0, which would test noise, not semantics."""
    import optax
    from ance_tpu.train.dpr_trainer import make_dpr_accum_train_step

    model = _tiny_biencoder()
    L = 16
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    opt = optax.sgd(1e-2)
    # independent buffers: both steps donate their state, so sharing params
    # between the two states would delete the other's arrays
    state_full = init_train_state(jax.tree.map(jnp.copy, params), opt)
    state_acc = init_train_state(jax.tree.map(jnp.copy, params), opt)
    step_full = make_dpr_train_step(
        biencoder_loss_fn(model, deterministic=True), opt)
    step_acc = make_dpr_accum_train_step(model, opt, accum_steps=4,
                                         deterministic=True)
    rs = np.random.RandomState(0)
    for i in range(3):
        batch = _rand_dpr_batch(rs, 8, L)
        rng = jax.random.PRNGKey(100 + i)
        state_full, m_full = step_full(state_full, dict(batch), rng)
        state_acc, m_acc = step_acc(state_acc, dict(batch), rng)
        np.testing.assert_allclose(float(m_acc["loss"]),
                                   float(m_full["loss"]), rtol=1e-6)
        assert int(m_acc["correct"]) == int(m_full["correct"])
    for (path_a, a), (path_b, b) in zip(
            jax.tree_util.tree_flatten_with_path(state_acc.params)[0],
            jax.tree_util.tree_flatten_with_path(state_full.params)[0]):
        scale = max(float(np.abs(np.asarray(b)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5 * scale,
            err_msg=jax.tree_util.keystr(path_a))


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_dpr_accum_differs_from_per_microbatch_softmax():
    """The thing the two-phase step must NOT do: averaging per-microbatch
    in-batch losses (each softmax over 2b contexts instead of 2B) gives a
    DIFFERENT loss — proving the accum step's global softmax is load-bearing,
    not a no-op refactor."""
    from ance_tpu.train.dpr_trainer import (
        encode_towers, inbatch_loss_from_embs)

    model = _tiny_biencoder()
    L = 16
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    rs = np.random.RandomState(1)
    batch = _rand_dpr_batch(rs, 8, L)
    rng = jax.random.PRNGKey(0)
    q, ctx, mask = encode_towers(model, params, batch, rng,
                                 deterministic=True)
    full_loss, _ = inbatch_loss_from_embs(q, ctx, mask)
    micro_losses = []
    for s in range(0, 8, 2):
        mb = {k: v[s:s + 2] for k, v in batch.items()}
        qm, cm, mm = encode_towers(model, params, mb, rng,
                                   deterministic=True)
        ml, _ = inbatch_loss_from_embs(qm, cm, mm)
        micro_losses.append(float(ml))
    assert abs(float(full_loss) - np.mean(micro_losses)) > 1e-3
