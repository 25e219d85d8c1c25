"""Pipelined refresh loop: interleaved schedule, refresh staleness semantics,
and learning on the miniature corpus (mirrors test_ann_loop's task)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

from test_ann_loop import QLEN, VOCAB, _build_corpus


def _setup(tmp_path, cfg_pipeline):
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
    caches = {name: TokenCache(paths[name]).open()
              for name in ("passages", "train-query", "dev-query")}
    loop = PipelinedAnce(
        cfg_pipeline, state=state, train_step=step,
        rng=jax.random.PRNGKey(3), params_of=lambda s: s.params,
        query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
        body_encode_fn=make_encode_fn(model, RobertaDot.body_emb),
        passage_cache=caches["passages"],
        train_query_cache=caches["train-query"],
        dev_query_cache=caches["dev-query"],
        train_qrels=train_qrels, dev_qrels=dev_qrels)
    return loop


def test_schedule_interleaves_encode_with_training(tmp_path):
    cfg = PipelineConfig(train_steps_per_slice=4, encode_slice_size=16,
                         encode_batch_size=16, batch_size=16,
                         topk_training=32, negative_sample=8,
                         ann_chunk_factor=1, dev_search_depth=32)
    loop = _setup(tmp_path, cfg)
    loop.bootstrap()
    assert loop.refresh_no == 1
    n_bootstrap_slices = 64 // 16
    assert loop.schedule_trace == ["E"] * n_bootstrap_slices

    loop.run(32)
    trace = "".join(loop.schedule_trace[n_bootstrap_slices:])
    # exactly one encode slice after every 4 train steps
    assert trace == ("TTTTE" * 8)
    # 32 steps → 8 slices → corpus (4 slices) refreshed twice more
    assert loop.refresh_no == 3
    assert int(loop.state.step) == 32
    # negatives in use always come from the previous completed refresh:
    # snapshot param step lags the live step
    assert loop.history[-1]["step"] == 32


def test_pipelined_learns_like_cyclic_loop(tmp_path):
    # refresh cadence ≈ the cyclic test's 150 steps/cycle: 4 slices ×
    # 35 steps → refresh every 140 steps
    cfg = PipelineConfig(train_steps_per_slice=35, encode_slice_size=16,
                         encode_batch_size=32, batch_size=32,
                         topk_training=32, negative_sample=8,
                         ann_chunk_factor=1, ann_measure_topk_mrr=True,
                         dev_search_depth=32)
    loop = _setup(tmp_path, cfg)
    loop.run(460)
    assert len(loop.history) >= 4
    first, last = loop.history[0], loop.history[-1]
    assert last["dev_ndcg"] > first["dev_ndcg"] + 0.08, loop.history
    # triple files are never empty and negatives exclude positives implicitly
    assert all(h["num_triples"] > 0 for h in loop.history)


def test_pipelined_on_mesh(tmp_path):
    """Full pipelined loop with every stage sharded over an 8-device mesh:
    DP train step, data-sharded encode, shard_map index search."""
    from ance_tpu.core.mesh import make_mesh, shard_batch

    mesh = make_mesh(8)
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
    base_step = make_train_step(triplet_loss_fn(model), opt, mesh=mesh)

    def sharded_step(state, batch, rng):
        return base_step(state, shard_batch(batch, mesh), rng)

    caches = {n: TokenCache(paths[n]).open()
              for n in ("passages", "train-query", "dev-query")}
    cfg_p = PipelineConfig(train_steps_per_slice=8, encode_slice_size=32,
                           encode_batch_size=16, batch_size=16,
                           topk_training=32, negative_sample=8,
                           ann_chunk_factor=1, dev_search_depth=32)
    with mesh:
        loop = PipelinedAnce(
            cfg_p, state=state, train_step=sharded_step,
            rng=jax.random.PRNGKey(3), params_of=lambda s: s.params,
            query_encode_fn=make_encode_fn(model, RobertaDot.query_emb,
                                           mesh=mesh),
            body_encode_fn=make_encode_fn(model, RobertaDot.body_emb,
                                          mesh=mesh),
            passage_cache=caches["passages"],
            train_query_cache=caches["train-query"],
            dev_query_cache=caches["dev-query"],
            train_qrels=train_qrels, dev_qrels=dev_qrels, mesh=mesh)
        loop.run(32)
    assert loop.index.mesh is mesh          # sharded index in use
    assert loop.refresh_no >= 2
    assert int(loop.state.step) == 32
    assert all(np.isfinite(h["dev_ndcg"]) for h in loop.history)


def test_pipelined_multichunk_mode(tmp_path):
    """MaxP document mode through the pipelined loop: multi-vector rows in
    the index, id-level dedup in mining, chunked body encode in slices."""
    paths, train_qrels, dev_qrels = _build_corpus(tmp_path)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=16, base_len=4)  # PLEN=12 → 3 chunks
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(5e-3, 10, 20000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model, multichunk=True), opt)
    caches = {n: TokenCache(paths[n]).open()
              for n in ("passages", "train-query", "dev-query")}
    cfg_p = PipelineConfig(train_steps_per_slice=8, encode_slice_size=32,
                           encode_batch_size=16, batch_size=16,
                           topk_training=32, negative_sample=4,
                           ann_chunk_factor=1, dev_search_depth=32,
                           multichunk=True)
    loop = PipelinedAnce(
        cfg_p, state=state, train_step=step,
        rng=jax.random.PRNGKey(3), params_of=lambda s: s.params,
        query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
        body_encode_fn=make_encode_fn(model, RobertaDot.body_emb_multichunk),
        passage_cache=caches["passages"],
        train_query_cache=caches["train-query"],
        dev_query_cache=caches["dev-query"],
        train_qrels=train_qrels, dev_qrels=dev_qrels)
    loop.run(16)
    assert loop.refresh_no >= 1
    # multi-vector index: 64 passages × 3 chunks
    assert loop.index.ntotal == 64 * 3
    h = loop.history[-1]
    assert np.isfinite(h["dev_ndcg"]) and h["num_triples"] > 0
    assert int(loop.state.step) == 16
