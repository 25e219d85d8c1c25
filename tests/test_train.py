"""Training step + data feed + encode pipeline integration tests
(8-virtual-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.core.mesh import make_mesh, shard_batch
from ance_tpu.data.cache import TokenCache, TokenCacheWriter
from ance_tpu.data.feed import TripletBatches, expand_triples, parse_triple_line
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.encode import encode_cache, make_encode_fn
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

VOCAB = 64
QLEN, PLEN = 8, 12


def _write_caches(tmp_path, n_queries=16, n_passages=64, seed=0):
    """Synthetic retrieval task: passage i shares its token prefix with query
    i%n_queries, so matching pairs are learnable."""
    rs = np.random.RandomState(seed)
    qbase = str(tmp_path / "train-query")
    pbase = str(tmp_path / "passages")
    with TokenCacheWriter(qbase, QLEN) as w:
        for i in range(n_queries):
            toks = np.zeros(QLEN, np.int32)
            toks[0] = 0  # CLS
            toks[1:5] = 4 + (i * 4 + np.arange(4)) % (VOCAB - 4)
            w.write(5, toks)
    with TokenCacheWriter(pbase, PLEN) as w:
        for i in range(n_passages):
            q = i % n_queries
            toks = np.zeros(PLEN, np.int32)
            toks[0] = 0
            toks[1:5] = 4 + (q * 4 + np.arange(4)) % (VOCAB - 4)
            toks[5:9] = rs.randint(4, VOCAB, 4)
            w.write(9, toks)
    return qbase, pbase


def _tiny_model(dropout=0.0):
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout=dropout,
                        attention_dropout=dropout)
    return RobertaDot(cfg, out_dim=16, base_len=4)


def test_parse_and_expand_triples():
    assert parse_triple_line("3\t17\t5,9,11\n") == (3, 17, [5, 9, 11])
    t = expand_triples(["1\t2\t3,4", "", "5\t6\t7"])
    np.testing.assert_array_equal(t, [[1, 2, 3], [1, 2, 4], [5, 6, 7]])


def test_triplet_batches_shapes(tmp_path):
    qbase, pbase = _write_caches(tmp_path)
    lines = [f"{i}\t{i}\t{(i + 1) % 16},{(i + 3) % 16}" for i in range(16)]
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        feed = TripletBatches(qc, pc, expand_triples(lines), batch_size=8,
                              seed=0)
        assert len(feed) == 4
        batches = list(feed.epoch(0))
        assert len(batches) == 4
        b = batches[0]
        assert b["query_ids"].shape == (8, QLEN)
        assert b["pos_ids"].shape == (8, PLEN)
        assert b["neg_mask"].shape == (8, PLEN)
        assert b["query_mask"].sum(axis=1).tolist() == [5] * 8


def test_host_striping(tmp_path):
    qbase, pbase = _write_caches(tmp_path)
    triples = expand_triples([f"{i}\t{i}\t{(i+1) % 16}" for i in range(16)])
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        a = TripletBatches(qc, pc, triples, 4, host_id=0, num_hosts=2)
        b = TripletBatches(qc, pc, triples, 4, host_id=1, num_hosts=2)
        assert len(a) == len(b) == 2
        qa = np.concatenate([x["query_ids"] for x in a.epoch(0)])
        qb = np.concatenate([x["query_ids"] for x in b.epoch(0)])
        assert not np.array_equal(qa, qb)


def _train_setup(tmp_path, accum=1, mesh=None, dropout=0.0, lr=2e-2):
    qbase, pbase = _write_caches(tmp_path)
    model = _tiny_model(dropout)
    qc, pc = TokenCache(qbase).open(), TokenCache(pbase).open()
    lines = [f"{i}\t{i}\t{(i + 7) % 64},{(i + 21) % 64}" for i in range(16)]
    feed = TripletBatches(qc, pc, expand_triples(lines), batch_size=16, seed=3)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((2, QLEN), jnp.int32), jnp.ones((2, QLEN), jnp.int32)
    )["params"]
    opt = make_optimizer("lamb", warmup_linear(lr, 2, 500), max_grad_norm=1.0)
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt, accum_steps=accum,
                           mesh=mesh)
    return model, feed, state, step


@pytest.mark.slow
def test_training_loss_decreases(tmp_path):
    _, feed, state, step = _train_setup(tmp_path)
    rng = jax.random.PRNGKey(1)
    history = []
    for epoch in range(30):
        for batch in feed.epoch(epoch):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            history.append(float(metrics["loss"]))
    assert int(state.step) == len(history)
    assert np.mean(history[-4:]) < np.mean(history[:4]) * 0.7, history


@pytest.mark.slow
def test_grad_accum_matches_full_batch(tmp_path):
    """accum=2 over a batch equals one full-batch step when dropout is off."""
    _, feed, state1, step1 = _train_setup(tmp_path, accum=1)
    _, _, state2, step2 = _train_setup(tmp_path, accum=2)
    batch = next(feed.epoch(0))
    rng = jax.random.PRNGKey(2)
    s1, m1 = step1(state1, batch, rng)
    s2, m2 = step2(state2, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_fused_body_matches_three_pass(tmp_path):
    """fused pos+neg body pass (one [2B, S] encode) equals the reference's
    separate passes exactly when dropout is off — every encoder op is
    row-independent. Covers FirstP and MaxP multichunk."""
    qbase, pbase = _write_caches(tmp_path)
    model = _tiny_model(dropout=0.0)
    qc, pc = TokenCache(qbase).open(), TokenCache(pbase).open()
    lines = [f"{i}\t{i}\t{(i + 7) % 64}" for i in range(8)]
    batch = next(TripletBatches(qc, pc, expand_triples(lines), batch_size=8,
                                seed=3).epoch(0))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((2, QLEN), jnp.int32), jnp.ones((2, QLEN), jnp.int32)
    )["params"]
    rng = jax.random.PRNGKey(5)
    for multichunk in (False, True):
        sep = triplet_loss_fn(model, multichunk=multichunk)
        fus = triplet_loss_fn(model, multichunk=multichunk, fused_body=True)
        l1, g1 = jax.value_and_grad(sep)(params, batch, rng)
        l2, g2 = jax.value_and_grad(fus)(params, batch, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        # grads agree to fp32 summation order (XLA tiles the [2B, S] GEMMs
        # differently than the [B, S] ones)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
    qc.close(), pc.close()


@pytest.mark.slow
def test_mesh_sharded_step_matches_single(tmp_path):
    mesh = make_mesh(8)
    _, feed, state_m, step_m = _train_setup(tmp_path, mesh=mesh)
    _, _, state_s, step_s = _train_setup(tmp_path)
    batch = next(feed.epoch(0))
    rng = jax.random.PRNGKey(4)
    with mesh:
        sm, mm = step_m(state_m, shard_batch(batch, mesh), rng)
    ss, ms = step_s(state_s, batch, rng)
    np.testing.assert_allclose(float(mm["loss"]), float(ms["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(sm.params), jax.tree.leaves(ss.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_encode_cache_and_multichunk(tmp_path):
    qbase, pbase = _write_caches(tmp_path, n_passages=37)
    model = _tiny_model()
    with TokenCache(pbase) as pc:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((2, PLEN), jnp.int32),
            jnp.ones((2, PLEN), jnp.int32))["params"]
        fn = make_encode_fn(model, RobertaDot.body_emb)
        emb, ids = encode_cache(fn, params, pc, batch_size=16)
        assert emb.shape == (37, 16) and ids.shape == (37,)
        np.testing.assert_array_equal(ids, np.arange(37))

        # multichunk: PLEN=12, base_len=4 → C=3 chunks per record
        fn_mc = make_encode_fn(model, RobertaDot.body_emb_multichunk)
        emb_mc, ids_mc = encode_cache(fn_mc, params, pc, batch_size=16,
                                      multichunk=True)
        assert emb_mc.shape == (37 * 3, 16)
        np.testing.assert_array_equal(ids_mc[:6], [0, 0, 0, 1, 1, 1])

        # range encode (generator query chunking uses start/stop)
        emb_r, ids_r = encode_cache(fn, params, pc, batch_size=8,
                                    start=10, stop=20)
        np.testing.assert_array_equal(ids_r, np.arange(10, 20))
        np.testing.assert_allclose(emb_r, emb[10:20], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_maxp_multichunk_training_step(tmp_path):
    """MaxP: body encoded as chunks, NLL_MultiChunk loss, one train step
    (reference rdot_nll_multi_chunk path, models.py:160-199 + 84-134)."""
    qbase, pbase = _write_caches(tmp_path)
    model = _tiny_model()  # base_len=4 → PLEN=12 gives 3 chunks
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        lines = [f"{i}\t{i}\t{(i + 5) % 64}" for i in range(16)]
        feed = TripletBatches(qc, pc, expand_triples(lines), batch_size=16)
        batch = next(feed.epoch(0))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, QLEN), jnp.int32),
        jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(5e-3, 2, 1000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model, multichunk=True), opt)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(10):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # same batch repeated → must improve


def test_fast_dropout_key_properties():
    """trainer.py::fast_dropout_key (the TPU-default hardware-RNG dropout
    stream): derivation is deterministic per input key, distinct across
    keys, splittable (per-tower / per-microbatch), and bernoulli draws from
    the derived rbg key hit the requested rate."""
    from ance_tpu.train.trainer import fast_dropout_key

    k7 = fast_dropout_key(jax.random.PRNGKey(7))
    k7b = fast_dropout_key(jax.random.PRNGKey(7))
    k8 = fast_dropout_key(jax.random.PRNGKey(8))
    assert np.array_equal(jax.random.key_data(k7), jax.random.key_data(k7b))
    assert not np.array_equal(jax.random.key_data(k7),
                              jax.random.key_data(k8))
    keep = jax.random.bernoulli(k7, 0.9, (8192,))
    assert 0.86 < float(jnp.mean(keep)) < 0.94
    # split (used per-tower and per-microbatch in the step) works on rbg
    subs = jax.random.split(k7, 3)
    assert len({tuple(np.asarray(jax.random.key_data(s)).ravel())
                for s in subs}) == 3


@pytest.mark.slow  # compiles a dropout>0 accum step — parity/e2e tier
def test_fast_dropout_rng_step(tmp_path):
    """A dropout>0 train step on the fast-RNG path (fast_dropout_rng=True)
    runs with finite loss and step-to-step variation (fresh masks each
    step, incl. through the accum lax.scan's per-microbatch split)."""
    qbase, pbase = _write_caches(tmp_path)
    model = _tiny_model(dropout=0.3)
    lines = [f"{i}\t{i}\t{(i + 7) % 64}" for i in range(16)]
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        feed = TripletBatches(qc, pc, expand_triples(lines), batch_size=16,
                              seed=3)
        batch = next(feed.epoch(0))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((2, QLEN), jnp.int32), jnp.ones((2, QLEN), jnp.int32)
    )["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-2, 2, 500))
    step = make_train_step(triplet_loss_fn(model), opt, accum_steps=2,
                           fast_dropout_rng=True)
    state = init_train_state(params, opt)
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m1["loss"]) != float(m2["loss"])  # fresh masks per step


def test_prefetch_batches_identity_and_errors(tmp_path):
    """prefetch_batches yields exactly the wrapped iterator's batches in
    order, re-raises worker exceptions at the consumer, and shuts the
    worker down when the consumer stops early."""
    import threading
    import time as _time

    from ance_tpu.data.feed import TokenCache, prefetch_batches

    qbase, pbase = _write_caches(tmp_path)
    lines = [f"{i}\t{i}\t{(i + 1) % 16},{(i + 3) % 16}" for i in range(16)]
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        feed = TripletBatches(qc, pc, expand_triples(lines), batch_size=8,
                              seed=0)
        direct = list(feed.epoch(0))
        staged = list(prefetch_batches(feed.epoch(0), depth=2))
        assert len(staged) == len(direct)
        for a, b in zip(direct, staged):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def boom():
        yield {"ok": 1}
        raise RuntimeError("worker failure")

    it = prefetch_batches(boom(), depth=2)
    assert next(it) == {"ok": 1}
    with pytest.raises(RuntimeError, match="worker failure"):
        next(it)

    # early close: the worker thread must exit even with batches staged
    before = threading.active_count()
    it = prefetch_batches(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert not any(t.name == "ance-feed-prefetch" and t.is_alive()
                   for t in threading.enumerate())


def test_epoch_prefetched_identity_and_early_close(tmp_path):
    """epoch_prefetched(workers=k) yields exactly epoch()'s batches in
    order (including the shuffled-seed path), and closing the generator
    early releases its worker threads."""
    import threading
    import time as _time

    qbase, pbase = _write_caches(tmp_path)
    lines = [f"{i}\t{i}\t{(i + 1) % 16},{(i + 3) % 16}" for i in range(16)]
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        for seed in (-1, 7):
            feed = TripletBatches(qc, pc, expand_triples(lines),
                                  batch_size=8, seed=seed)
            direct = list(feed.epoch(2))
            staged = list(feed.epoch_prefetched(2, workers=3, depth=2))
            assert len(staged) == len(direct) > 0
            for a, b in zip(direct, staged):
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k])

        # early close: take one batch, drop the generator, threads exit
        feed = TripletBatches(qc, pc, expand_triples(lines), batch_size=2)
        it = feed.epoch_prefetched(0, workers=2, depth=2)
        next(it)
        it.close()
        deadline = _time.time() + 5
        while _time.time() < deadline and any(
                t.name.startswith("ance-feed") and t.is_alive()
                for t in threading.enumerate()):
            _time.sleep(0.05)
        assert not any(t.name.startswith("ance-feed") and t.is_alive()
                       for t in threading.enumerate())


def test_infinite_batches_prefetched_identity(tmp_path):
    """The production loop path (infinite_batches, now prefetched by
    default) yields exactly the serial stream, across an epoch boundary
    where the shuffle reseeds."""
    from ance_tpu.data.feed import infinite_batches
    import itertools

    qbase, pbase = _write_caches(tmp_path)
    lines = [f"{i}\t{i}\t{(i + 1) % 16},{(i + 3) % 16}" for i in range(16)]
    with TokenCache(qbase) as qc, TokenCache(pbase) as pc:
        feed = TripletBatches(qc, pc, expand_triples(lines),
                              batch_size=8, seed=5)
        n = 3 * len(feed)  # three full epochs of the infinite stream
        serial = list(itertools.islice(
            infinite_batches(feed, workers=0), n))
        staged = list(itertools.islice(
            infinite_batches(feed), n))  # production default: prefetched
        assert len(serial) == len(staged) == n
        for a, b in zip(serial, staged):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
