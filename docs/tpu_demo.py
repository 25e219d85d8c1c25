"""Real-TPU demonstration of the pipelined ANCE loop at realistic scale.

Synthetic-but-learnable retrieval task (disjoint query/passage vocab ranges
with a token-shift correspondence — a random encoder scores at chance), sized
to exercise the real system: 100k-passage corpus, roberta-base-geometry
encoder in bf16, slice-pipelined refresh on one TPU core.

Run:  PYTHONPATH=. python docs/tpu_demo.py
Logs: docs/tpu_demo_run.jsonl (one line per refresh + timing summary)
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache, TokenCacheWriter
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

VOCAB = 30522
QLEN, PLEN = 32, 128
N_CLASSES = 1024
N_PASSAGES = int(os.environ.get("DEMO_PASSAGES", 100_000))
N_TRAIN_Q, N_DEV_Q = 8192, 512
SHIFT = 15000
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   os.environ.get("DEMO_LOG", "tpu_demo_run.jsonl"))


def log(rec):
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def signature(c, rs=None):
    return 100 + (c * 7 + np.arange(8)) % (SHIFT - 200)


def build_corpus(root):
    rs = np.random.RandomState(7)
    paths = {n: os.path.join(root, n)
             for n in ("passages", "train-query", "dev-query")}
    with TokenCacheWriter(paths["passages"], PLEN) as w:
        for i in range(N_PASSAGES):
            toks = np.zeros(PLEN, np.int32)
            if i < N_CLASSES:
                toks[1:9] = signature(i) + SHIFT
                toks[9:60] = SHIFT + 200 + rs.randint(
                    0, VOCAB - SHIFT - 300, 51)
            else:
                toks[1:60] = SHIFT + 200 + rs.randint(
                    0, VOCAB - SHIFT - 300, 59)
            w.write(60, toks)
    for name, n_q in (("train-query", N_TRAIN_Q), ("dev-query", N_DEV_Q)):
        with TokenCacheWriter(paths[name], QLEN) as w:
            for i in range(n_q):
                toks = np.zeros(QLEN, np.int32)
                toks[1:9] = signature(i % N_CLASSES)
                toks[9:12] = 100 + rs.randint(0, SHIFT - 200, 3)
                w.write(12, toks)
    train_qrels = {i: {i % N_CLASSES: 1} for i in range(N_TRAIN_Q)}
    dev_qrels = {i: {i % N_CLASSES: 1} for i in range(N_DEV_Q)}
    return paths, train_qrels, dev_qrels


def main():
    t_start = time.time()
    root = tempfile.mkdtemp(prefix="ance_demo_")
    log({"event": "start", "devices": str(jax.devices()),
         "corpus": N_PASSAGES, "train_q": N_TRAIN_Q})
    paths, train_qrels, dev_qrels = build_corpus(root)
    log({"event": "corpus_built", "sec": round(time.time() - t_start, 1)})

    # from-scratch-trainable geometry: the reference never trains from random
    # init (it always starts from pretrained roberta-base, README.md:61-87);
    # with no pretrained weights available offline, a 4-layer/256-wide encoder
    # demonstrates the full-system quality dynamics at 100k-corpus scale.
    # DEMO_MODEL=seeddot swaps in the SEED-encoder retrieval model
    # (seeddot_nll registry family: pad-offset positions, zero-padded
    # embeddings, no type embeddings) on the same task.
    shape = dict(hidden_size=256, num_layers=4, num_heads=8,
                 intermediate_size=1024, dtype=jnp.bfloat16)
    if os.environ.get("DEMO_MODEL") == "seeddot":
        from ance_tpu.models.seed import seed_dot_model
        model = seed_dot_model(vocab_size=VOCAB, out_dim=256,
                               config_overrides=shape)
    else:
        model = RobertaDot(EncoderConfig(vocab_size=VOCAB, **shape),
                           out_dim=256)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    log({"event": "model", "params_m": round(float(n_params) / 1e6, 1)})

    opt = make_optimizer("lamb", warmup_linear(1e-3, 100, 100000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    qfn = make_encode_fn(model, RobertaDot.query_emb)
    bfn = make_encode_fn(model, RobertaDot.body_emb)

    # warmup phase: random-negative triples (the role BM25 warmup plays in
    # the reference pipeline, README.md:61-87 — ANCE from a random encoder
    # with shallow mining is a whack-a-mole; warmup puts positives within
    # mining depth first)
    from ance_tpu.data.feed import TripletBatches, infinite_batches
    rs = np.random.RandomState(3)
    warm_triples = np.stack([
        np.arange(N_TRAIN_Q),
        np.arange(N_TRAIN_Q) % N_CLASSES,
        rs.randint(N_CLASSES, N_PASSAGES, N_TRAIN_Q)], axis=1)
    feed = TripletBatches(TokenCache(paths["train-query"]).open(),
                          TokenCache(paths["passages"]).open(),
                          warm_triples, batch_size=128, seed=5)
    it = infinite_batches(feed)
    # in-batch contrastive warmup: each query scores against 2*B-1 other
    # passages in the batch (the strong-signal regime the reference gets
    # from a pretrained LM + BM25 warmup; from random init, plain triplets
    # let a 110M-param model memorize instead of aligning)
    from ance_tpu.train.dpr_trainer import biencoder_loss_fn, make_dpr_train_step
    warm_step = make_dpr_train_step(biencoder_loss_fn(model), opt)
    rng = jax.random.PRNGKey(9)
    t0 = time.time()
    WARM = 1000
    losses = []
    for i in range(WARM):
        rng, sub = jax.random.split(rng)
        state, m = warm_step(state, next(it), sub)
        losses.append(m["loss"])
        if (i + 1) % 100 == 0:
            log({"event": "warmup", "step": i + 1,
                 "loss": round(float(np.mean(jax.device_get(losses[-50:]))), 4),
                 "correct_ratio": round(float(m["correct_ratio"]), 3)})
    log({"event": "warmup_done", "steps": WARM,
         "sec": round(time.time() - t0, 1)})

    pcfg = PipelineConfig(train_steps_per_slice=8, encode_slice_size=8192,
                          encode_batch_size=256, batch_size=128,
                          topk_training=1000, negative_sample=8,
                          ann_chunk_factor=2, dev_search_depth=100)
    caches = {n: TokenCache(paths[n]).open() for n in paths}
    loop = PipelinedAnce(
        pcfg, state=state, train_step=warm_step, rng=jax.random.PRNGKey(1),
        params_of=lambda s: s.params, query_encode_fn=qfn,
        body_encode_fn=bfn, passage_cache=caches["passages"],
        train_query_cache=caches["train-query"],
        dev_query_cache=caches["dev-query"],
        train_qrels=train_qrels, dev_qrels=dev_qrels)

    t0 = time.time()
    loop.bootstrap()
    log({"event": "bootstrap_refresh", "sec": round(time.time() - t0, 1),
         **{k: round(v, 4) if isinstance(v, float) else v
            for k, v in loop.history[-1].items()}})

    TOTAL = int(os.environ.get("DEMO_STEPS", 3640))  # ~19 work items/refresh (13 E + dev/mine/finalize items)
                  # × 8 steps → ~24 full refreshes
    done = 0
    while done < TOTAL:
        t0 = time.time()
        chunk = min(104, TOTAL - done)
        n_hist = len(loop.history)
        loop.run(chunk)
        done += chunk
        dt = time.time() - t0
        rec = {"event": "progress", "steps": done,
               "steps_per_sec": round(chunk / dt, 2)}
        for h in loop.history[n_hist:]:
            log({"event": "refresh",
                 **{k: round(v, 4) if isinstance(v, float) else v
                    for k, v in h.items()}})
        log(rec)
    log({"event": "done", "total_sec": round(time.time() - t_start, 1),
         "refreshes": loop.refresh_no,
         "final_dev_ndcg": loop.history[-1]["dev_ndcg"]})


if __name__ == "__main__":
    main()
