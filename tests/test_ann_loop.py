"""ANN generation + the miniature end-to-end ANCE loop (SURVEY.md §4's
implied test: tiny corpus, multiple refresh cycles, well-formed triple files,
retrieval improves)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache, TokenCacheWriter
from ance_tpu.data.feed import parse_triple_line
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train import checkpoint as ckpt
from ance_tpu.train.ance_loop import (
    AnceCycleConfig, load_offset_qrels, positives_from_qrels, run_ance_cycles)
from ance_tpu.train.ann_gen import (
    AnnGenConfig, get_latest_ann_data, mine_negatives, query_chunk_range,
    write_ann_data)
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

VOCAB, QLEN, PLEN = 150, 8, 12
N_CLASSES, N_PASSAGES, N_TRAIN_Q, N_DEV_Q = 16, 64, 64, 16
SHIFT = 70  # passage tokens = query tokens + SHIFT (disjoint vocab ranges)


def test_query_chunk_range_rotation():
    # 10 queries, 3 chunks: sizes 3,3,4; rotation by output_num
    assert query_chunk_range(10, 3, 0) == (0, 3)
    assert query_chunk_range(10, 3, 1) == (3, 6)
    assert query_chunk_range(10, 3, 2) == (6, 10)   # last chunk takes tail
    assert query_chunk_range(10, 3, 3) == (0, 3)    # rotation wraps
    assert query_chunk_range(10, 0, 5) == (0, 10)   # chunk_factor<=0 → all
    # fewer queries than chunks: factor clamps to num_queries — every
    # rotation yields a NON-EMPTY chunk (an empty range would crash the
    # refresh encode with np.concatenate of zero batches)
    assert query_chunk_range(3, 5, 0) == (0, 1)
    assert query_chunk_range(3, 5, 1) == (1, 2)
    assert query_chunk_range(3, 5, 2) == (2, 3)
    assert query_chunk_range(3, 5, 3) == (0, 1)     # wraps at the clamp
    assert query_chunk_range(1, 5, 4) == (0, 1)


def test_mine_negatives_semantics():
    """Positive skipped (w/ MRR probe), duplicates deduped, count capped
    (reference run_ann_data_gen.py:339-396)."""
    query2id = np.array([100, 200])
    passage2id = np.array([7, 7, 8, 9, 10])  # rows 0,1 → same pid (MaxP)
    positives = {100: 8, 200: 99}
    neighbors = np.array([[2, 0, 1, 3, 4],   # pid seq: 8(pos),7,7(dup),9,10
                          [0, 1, 2, 3, 4]])  # pid seq: 7,7,8,9,10
    negs, mrr = mine_negatives(query2id, passage2id, positives, neighbors,
                               negative_sample=2, select_topk=True)
    # select_topk considers only the first negative_sample+1 rows
    # (reference run_ann_data_gen.py:364-365), so skips/dups shrink the list:
    # qid 100 sees pids [8(pos), 7, 7(dup)] → just [7]
    assert negs[100] == [7]
    assert negs[200] == [7, 8]
    assert mrr == pytest.approx(0.5)  # qid 100 pos at rank 1 → 1/1 over 2 q


def test_write_and_discover_ann_data(tmp_path):
    out = str(tmp_path)
    q2id = np.array([5, 6, 7])
    positives = {5: 50, 7: 70}
    negs = {5: [1, 2], 7: [3]}
    data_path, ndcg_path = write_ann_data(out, 0, q2id, positives, negs,
                                          dev_ndcg=0.25, checkpoint_path="c0")
    assert get_latest_ann_data(out)[0] == 0
    lines = open(data_path).read().splitlines()
    assert len(lines) == 2  # qid 6 has no positive → dropped
    parsed = sorted(parse_triple_line(l) for l in lines)
    assert parsed == [(5, 50, [1, 2]), (7, 70, [3])]
    assert json.load(open(ndcg_path)) == {"ndcg": 0.25, "checkpoint": "c0"}

    write_ann_data(out, 3, q2id, positives, negs, 0.5, "c3")
    n, path, meta = get_latest_ann_data(out)
    assert n == 3 and path.endswith("ann_training_data_3")
    assert meta["ndcg"] == 0.5


def test_checkpoint_roundtrip_and_latest(tmp_path):
    d = str(tmp_path / "ckpts")
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "nested": {"b": jnp.ones(4)}}
    path = ckpt.save_checkpoint(d, 100, params, extra={"note": "x"})
    assert ckpt.is_complete(path)
    template = jax.tree.map(jnp.zeros_like, params)
    loaded, _, meta = ckpt.load_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(loaded["w"]),
                                  np.asarray(params["w"]))
    assert meta == {"step": 100, "note": "x"}

    ckpt.save_checkpoint(d, 250, params)
    # incomplete dir (no DONE) must be ignored
    os.makedirs(os.path.join(d, "checkpoint-999"))
    latest, step = ckpt.get_latest_checkpoint(d)
    assert step == 250 and latest.endswith("checkpoint-250")


# --------------------------------------------------------------------------
# miniature end-to-end ANCE loop

def _query_signature(c):
    return 4 + (c * 4 + np.arange(4)) % (SHIFT - 4)


def _build_corpus(tmp_path):
    """Learnable-by-construction task: query class c uses tokens from a
    query-only vocab range; its single relevant passage uses the same pattern
    shifted by SHIFT into a passage-only range. A random encoder scores at
    chance; learning the token correspondence solves it. Passages beyond the
    first N_CLASSES are pure distractors."""
    rs = np.random.RandomState(7)
    paths = {n: str(tmp_path / n) for n in
             ("passages", "train-query", "dev-query")}
    with TokenCacheWriter(paths["passages"], PLEN) as w:
        for i in range(N_PASSAGES):
            toks = np.zeros(PLEN, np.int32)
            if i < N_CLASSES:
                toks[1:5] = _query_signature(i) + SHIFT
                toks[5:9] = SHIFT + rs.randint(4, SHIFT - 4, 4)
            else:
                toks[1:9] = SHIFT + rs.randint(4, SHIFT - 4, 8)
            w.write(9, toks)
    for name, n_q in (("train-query", N_TRAIN_Q), ("dev-query", N_DEV_Q)):
        with TokenCacheWriter(paths[name], QLEN) as w:
            for i in range(n_q):
                toks = np.zeros(QLEN, np.int32)
                toks[1:5] = _query_signature(i % N_CLASSES)
                toks[5:7] = rs.randint(4, SHIFT - 4, 2)  # per-query noise
                w.write(7, toks)
    # offset-space qrels: query i ↔ its aligned passage (one per class)
    train_qrels = {i: {i % N_CLASSES: 1} for i in range(N_TRAIN_Q)}
    dev_qrels = {i: {i % N_CLASSES: 1} for i in range(N_DEV_Q)}
    return paths, train_qrels, dev_qrels


def test_load_offset_qrels(tmp_path):
    p = tmp_path / "qrel.tsv"
    p.write_text("0\t10\t1\n0\t11\t2\n3\t12\t1\n")
    qrels = load_offset_qrels(str(p))
    assert qrels == {0: {10: 1, 11: 2}, 3: {12: 1}}
    assert positives_from_qrels(qrels) == {0: 10, 3: 12}


@pytest.mark.slow
def test_end_to_end_ance_cycles(tmp_path):
    paths, train_qrels, dev_qrels = _build_corpus(tmp_path)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(5e-3, 10, 20000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)

    qfn = make_encode_fn(model, RobertaDot.query_emb)
    bfn = make_encode_fn(model, RobertaDot.body_emb)

    gen_cfg = AnnGenConfig(topk_training=32, negative_sample=8,
                           ann_chunk_factor=1, ann_measure_topk_mrr=True,
                           dev_search_depth=32, encode_batch_size=32)
    cycle_cfg = AnceCycleConfig(steps_per_cycle=150, batch_size=32,
                                num_cycles=3,
                                checkpoint_dir=str(tmp_path / "ckpt"))
    with TokenCache(paths["dev-query"]) as dev_c, \
            TokenCache(paths["passages"]) as pass_c, \
            TokenCache(paths["train-query"]) as train_c:
        state, history = run_ance_cycles(
            cycle_cfg, gen_cfg, state=state, train_step=step,
            rng=jax.random.PRNGKey(3), params_of=lambda s: s.params,
            query_encode_fn=qfn, body_encode_fn=bfn,
            dev_query_cache=dev_c, passage_cache=pass_c,
            train_query_cache=train_c, train_qrels=train_qrels,
            dev_qrels=dev_qrels, output_dir=str(tmp_path / "ann_data"))

    assert len(history) == 3
    # triple files well-formed; negatives never equal the positive
    for h in history:
        for line in open(h["data_path"]).read().splitlines():
            qid, pos, negs = parse_triple_line(line)
            assert 0 <= qid < N_TRAIN_Q and 0 <= pos < N_PASSAGES
            assert pos not in negs and len(negs) <= 8
    # learning signal: retrieval improves clearly (chance NDCG@10 over 64
    # passages is ~0.1; the shifted-vocab task is fully learnable).
    # NOTE: per-cycle mean loss is NOT monotone in ANCE — later cycles train
    # on freshly mined HARDER negatives, so only dev retrieval is asserted.
    assert history[-1]["dev_ndcg"] > history[0]["dev_ndcg"] + 0.08, history
    assert history[-1]["ann_mrr"] > history[0]["ann_mrr"], history
    # checkpoints complete and discoverable
    latest, step_no = ckpt.get_latest_checkpoint(str(tmp_path / "ckpt"))
    assert step_no == 450


def test_async_checkpointer(tmp_path):
    import jax.numpy as jnp
    from ance_tpu.train.checkpoint import AsyncCheckpointer, get_latest_checkpoint
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    ck = AsyncCheckpointer(str(tmp_path / "ck"))
    ck.save(10, params, extra={"cycle": 1})
    ck.wait()
    latest, step = get_latest_checkpoint(str(tmp_path / "ck"))
    assert step == 10
    restored = ck.restore(latest, jax.tree.map(jnp.zeros_like, params))
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_generate_new_ann_multichunk(tmp_path):
    """MaxP generation: multi-vector rows flatten with repeated ids; mining
    and dev eval dedup by passage id (reference run_ann_data_gen.py:182-189,
    409-423)."""
    from ance_tpu.train.ann_gen import generate_new_ann
    paths, train_qrels, dev_qrels = _build_corpus(tmp_path)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=16, base_len=4)   # PLEN=12 → 3 chunks
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    qfn = make_encode_fn(model, RobertaDot.query_emb)
    bfn = make_encode_fn(model, RobertaDot.body_emb_multichunk)
    gen_cfg = AnnGenConfig(topk_training=48, negative_sample=4,
                           ann_chunk_factor=1, dev_search_depth=48,
                           encode_batch_size=32, multichunk=True)
    with TokenCache(paths["dev-query"]) as dev_c, \
            TokenCache(paths["passages"]) as pass_c, \
            TokenCache(paths["train-query"]) as train_c:
        result = generate_new_ann(
            gen_cfg, output_num=0, checkpoint_path="init", params=params,
            query_encode_fn=qfn, body_encode_fn=bfn,
            dev_query_cache=dev_c, passage_cache=pass_c,
            train_query_cache=train_c,
            training_query_positive_id=positives_from_qrels(train_qrels),
            dev_query_positive_id=dev_qrels,
            output_dir=str(tmp_path / "ann"))
    # 64 passages × 3 chunks = 192 embedding rows, ids repeat per chunk
    e2id = result["passage_embedding2id"]
    assert len(e2id) == 192
    np.testing.assert_array_equal(e2id[:6], [0, 0, 0, 1, 1, 1])
    for line in open(result["data_path"]).read().splitlines():
        qid, pos, negs = parse_triple_line(line)
        assert pos not in negs
        assert len(negs) == len(set(negs))  # pid-level dedup held


def test_incomplete_ann_data_is_invisible(tmp_path):
    """A training-data file WITHOUT its ndcg sidecar must not be discovered —
    the sidecar is the completeness signal (reference util.py:229-243,
    SURVEY.md §5.2 race-by-construction)."""
    out = str(tmp_path)
    with open(os.path.join(out, "ann_training_data_0"), "w") as f:
        f.write("1\t2\t3\n")
    assert get_latest_ann_data(out)[0] == -1
    with open(os.path.join(out, "ann_ndcg_0"), "w") as f:
        json.dump({"ndcg": 0.1, "checkpoint": "c"}, f)
    assert get_latest_ann_data(out)[0] == 0


def test_generate_inference_only_returns_embeddings(tmp_path):
    """--inference mode parity: stop after encode+index, expose embeddings
    (reference run_ann_data_gen.py:256-257)."""
    from ance_tpu.train.ann_gen import generate_new_ann
    paths, train_qrels, dev_qrels = _build_corpus(tmp_path)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    with TokenCache(paths["dev-query"]) as dev_c, \
            TokenCache(paths["passages"]) as pass_c, \
            TokenCache(paths["train-query"]) as train_c:
        result = generate_new_ann(
            AnnGenConfig(encode_batch_size=32), output_num=0,
            checkpoint_path="init", params=params,
            query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
            body_encode_fn=make_encode_fn(model, RobertaDot.body_emb),
            dev_query_cache=dev_c, passage_cache=pass_c,
            train_query_cache=train_c,
            training_query_positive_id={}, dev_query_positive_id=dev_qrels,
            output_dir=str(tmp_path / "ann"), inference_only=True)
    assert result["index"].ntotal == N_PASSAGES
    assert result["dev_query_embedding"].shape == (N_DEV_Q, 16)
    assert result["passage_embedding2id"].shape == (N_PASSAGES,)
    assert result["dev_query_embedding2id"].shape == (N_DEV_Q,)
    # no training data files written in inference mode
    assert not (tmp_path / "ann").exists() or \
        not list((tmp_path / "ann").iterdir())
