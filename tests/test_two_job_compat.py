"""Two-job filesystem-polling compatibility mode: generator and trainer
communicating only via checkpoint dirs and ann data files (the reference's
process architecture, commands/run_train.sh:2-21)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import parse_triple_line, sample_one_neg_triples
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train import checkpoint as ckpt
from ance_tpu.train.ance_loop import (
    AnceCycleConfig, run_generator_job, run_trainer_job)
from ance_tpu.train.ann_gen import AnnGenConfig, get_latest_ann_data
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

from test_ann_loop import QLEN, VOCAB, _build_corpus


def test_sample_one_neg_triples():
    lines = ["1\t10\t5,6,7", "2\t20\t9"]
    t = sample_one_neg_triples(lines, seed=0)
    assert t.shape == (2, 3)
    assert t[0, 2] in (5, 6, 7) and t[1].tolist() == [2, 20, 9]


@pytest.mark.slow
def test_two_job_handoff(tmp_path):
    paths, train_qrels, dev_qrels = _build_corpus(tmp_path)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(5e-3, 5, 2000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    qfn = make_encode_fn(model, RobertaDot.query_emb)
    bfn = make_encode_fn(model, RobertaDot.body_emb)

    ann_dir = str(tmp_path / "ann_data")
    training_dir = str(tmp_path / "training")
    gen_cfg = AnnGenConfig(topk_training=16, negative_sample=4,
                           ann_chunk_factor=1, dev_search_depth=16,
                           encode_batch_size=32)

    def load_params(ckpt_dir):
        loaded, _, _ = ckpt.load_checkpoint(ckpt_dir, params)
        return loaded

    caches = {n: TokenCache(paths[n]).open()
              for n in ("passages", "train-query", "dev-query")}

    # generator pass 1: no checkpoint yet → generates from init params
    history = run_generator_job(
        gen_cfg, training_dir=training_dir, init_params=params,
        load_params=load_params, query_encode_fn=qfn, body_encode_fn=bfn,
        dev_query_cache=caches["dev-query"], passage_cache=caches["passages"],
        train_query_cache=caches["train-query"], train_qrels=train_qrels,
        dev_qrels=dev_qrels, output_dir=ann_dir, max_iterations=1,
        poll_interval=0.0)
    assert len(history) == 1
    data_no, data_path, meta = get_latest_ann_data(ann_dir)
    assert data_no == 0 and "ndcg" in meta
    for line in open(data_path).read().splitlines():
        parse_triple_line(line)  # well-formed

    # trainer: discovers data 0, trains to step 6, checkpoints every 3
    state = run_trainer_job(
        AnceCycleConfig(batch_size=16, shuffle_seed=1),
        state=state, train_step=step, rng=jax.random.PRNGKey(2),
        params_of=lambda s: s.params,
        query_cache=caches["train-query"], passage_cache=caches["passages"],
        ann_dir=ann_dir, training_dir=training_dir, max_steps=6,
        poll_every=2, save_every=3, poll_interval=0.0)
    assert int(jax.device_get(state.step)) == 6
    latest, step_no = ckpt.get_latest_checkpoint(training_dir)
    assert step_no == 6

    # generator pass 2: sees checkpoint-6, produces ann data 1 citing it
    history = run_generator_job(
        gen_cfg, training_dir=training_dir, init_params=params,
        load_params=load_params, query_encode_fn=qfn, body_encode_fn=bfn,
        dev_query_cache=caches["dev-query"], passage_cache=caches["passages"],
        train_query_cache=caches["train-query"], train_qrels=train_qrels,
        dev_qrels=dev_qrels, output_dir=ann_dir, max_iterations=1,
        poll_interval=0.0)
    assert history[0]["checkpoint"].endswith("checkpoint-6")
    data_no, _, meta = get_latest_ann_data(ann_dir)
    assert data_no == 1
    assert meta["checkpoint"].endswith("checkpoint-6")


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_resume_train_state_restores_optimizer(tmp_path):
    from ance_tpu.train.ance_loop import resume_train_state
    from ance_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, triplet_loss_fn)
    from ance_tpu.optim.schedules import warmup_linear
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    cfg = EncoderConfig(vocab_size=50, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=16, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=8)
    ids = jnp.ones((2, 6), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, ids)["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-3, 2, 100))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    batch = {k: np.ones((4, 6), np.int32) for k in
             ("query_ids", "query_mask", "pos_ids", "pos_mask",
              "neg_ids", "neg_mask")}
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    ckpt.save_checkpoint(str(tmp_path / "t"), 1, state.params,
                         opt_state=state.opt_state)

    fresh = init_train_state(params, opt)
    resumed, step_no = resume_train_state(str(tmp_path / "t"), fresh)
    assert step_no == 1 and int(resumed.step) == 1
    # LAMB first moments restored (nonzero after one step)
    mu_leaves = jax.tree.leaves(resumed.opt_state)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in mu_leaves
               if hasattr(l, "shape") and np.asarray(l).size > 1)
    # no checkpoint → unchanged
    same, step0 = resume_train_state(str(tmp_path / "none"), fresh)
    assert step0 == 0


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_trainer_job_rewarmup_resets_on_swap(tmp_path):
    """--rewarmup_per_dataset parity (reference run_ann.py:210-215): the LR
    schedule re-anchors at every ann-data swap with the new file's line
    count as decay horizon; without the flag one global schedule persists
    (reference --single_warmup, run_ann.py:174-178)."""
    from ance_tpu.optim.schedules import (
        find_rewarmup_state, rewarmup_current_lr)
    from ance_tpu.train.ann_gen import write_ann_data

    paths, train_qrels, _ = _build_corpus(tmp_path)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=32, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    base, warmup = 1e-3, 8
    opt = make_optimizer("lamb", base, rewarmup=(warmup, 1000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    positives = {q: next(iter(r)) for q, r in train_qrels.items()}
    ann_dir, training_dir = str(tmp_path / "ann"), str(tmp_path / "train")
    caches = {n: TokenCache(paths[n]).open()
              for n in ("passages", "train-query")}

    def run(max_steps, st):
        return run_trainer_job(
            AnceCycleConfig(batch_size=8, shuffle_seed=1), state=st,
            train_step=step, rng=jax.random.PRNGKey(2),
            params_of=lambda s: s.params,
            query_cache=caches["train-query"],
            passage_cache=caches["passages"], ann_dir=ann_dir,
            training_dir=training_dir, max_steps=max_steps, poll_every=2,
            save_every=100, poll_interval=0.0, rewarmup_per_dataset=True)

    # dataset 0: 10 queries x 2 negatives → 10 lines
    negs0 = {q: [int(q + 16) % 64, int(q + 17) % 64] for q in range(10)}
    data0, _ = write_ann_data(ann_dir, 0, np.arange(10), positives, negs0,
                              0.1, "ck0")
    lines0 = len(open(data0).read().splitlines())
    state = run(5, state)
    rw = find_rewarmup_state(state.opt_state)
    assert int(rw.count) == 5 and int(rw.anchor) == 0
    assert float(rw.horizon) == lines0
    np.testing.assert_allclose(
        rewarmup_current_lr(state.opt_state, base, warmup),
        base * 5 / warmup, rtol=1e-6)  # mid-warmup of dataset 0

    # dataset 1 lands: swap at step 5 re-anchors and re-warms from zero
    negs1 = {q: [int(q + 20) % 64] for q in range(24)}
    data1, _ = write_ann_data(ann_dir, 1, np.arange(24), positives, negs1,
                              0.2, "ck1")
    lines1 = len(open(data1).read().splitlines())
    state = run(9, state)
    rw = find_rewarmup_state(state.opt_state)
    assert int(rw.count) == 9 and int(rw.anchor) == 5
    assert float(rw.horizon) == lines1
    np.testing.assert_allclose(
        rewarmup_current_lr(state.opt_state, base, warmup),
        base * (9 - 5) / warmup, rtol=1e-6)  # re-warming on dataset 1
