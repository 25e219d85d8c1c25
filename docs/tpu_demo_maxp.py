"""Real-TPU demonstration of the MaxP long-document ANCE loop.

MaxP's distinguishing machinery — [B, C·L] docs reshaped through [B·C, L]
encoder passes (reference models.py:160-199), multi-vector rows in the
index with id-level dedup in mining, and the NLL_MultiChunk max-over-chunks
loss with the −9999 empty-chunk bias (models.py:84-134) — end-to-end on the
chip.  The task places each class signature in a RANDOM chunk of the
document (chunk 0 only 1/4 of the time), so FirstP-style first-chunk
scoring cannot solve it: the max over per-chunk scores has to find the
signal wherever it lives.

Recipe mirrors the reference pipeline: contrastive warmup on chunk-sized
passages (the role of the FirstP/BM25 warmup checkpoint, README.md:61-87),
then the pipelined ANCE loop training in-batch over MaxP chunk-max scores
(losses.dpr_inbatch_multichunk_loss) on mined negatives.  A first attempt
with the parity triplet loss from the shallow warm start collapsed
(dev NDCG ~0.002 after 12 refreshes) — archived in docs/TPU_DEMO.md.

Run:  setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
        python docs/tpu_demo_maxp.py > /tmp/maxp_demo.log 2>&1 < /dev/null &
Logs: docs/tpu_demo_maxp_run.jsonl
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
from ance_tpu.data.feed import TripletBatches, infinite_batches
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.dpr_trainer import biencoder_loss_fn, make_dpr_train_step
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
from ance_tpu.train.trainer import init_train_state, make_optimizer

VOCAB = 30522
QLEN, CHUNK_LEN, N_CHUNKS = 32, 128, 4
PLEN = CHUNK_LEN * N_CHUNKS                       # 512-token documents
N_DOCS = int(os.environ.get("DEMO_DOCS", 25_000))
N_CLASSES = int(os.environ.get("DEMO_CLASSES", min(1024, N_DOCS // 8)))
N_TRAIN_Q = int(os.environ.get("DEMO_TRAIN_Q", 8192))
N_DEV_Q = int(os.environ.get("DEMO_DEV_Q", 512))
SHIFT = 15000
WARM_STEPS = int(os.environ.get("DEMO_WARM", 800))
TOTAL_STEPS = int(os.environ.get("DEMO_STEPS", 1200))
BATCH = int(os.environ.get("DEMO_BATCH", 64))
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_demo_maxp_run.jsonl")


def log(rec):
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def signature(c):
    return 100 + (c * 7 + np.arange(8)) % (SHIFT - 200)


def filler(rs, n):
    return SHIFT + 200 + rs.randint(0, VOCAB - SHIFT - 300, n)


def build_task(root):
    rs = np.random.RandomState(7)
    paths = {n: os.path.join(root, n) for n in
             ("docs", "warm-passages", "train-query", "dev-query")}
    sig_chunks = rs.randint(0, N_CHUNKS, N_CLASSES)   # where the signal hides
    with TokenCacheWriter(paths["docs"], PLEN) as w:
        for i in range(N_DOCS):
            toks = np.zeros(PLEN, np.int32)
            for c in range(N_CHUNKS):                 # every chunk non-empty
                base = c * CHUNK_LEN
                toks[base + 1:base + 60] = filler(rs, 59)
            if i < N_CLASSES:
                base = sig_chunks[i] * CHUNK_LEN
                toks[base + 1:base + 9] = signature(i) + SHIFT
            w.write(PLEN, toks)
    with TokenCacheWriter(paths["warm-passages"], CHUNK_LEN) as w:
        for i in range(N_DOCS):                       # chunk-sized warmup rows
            toks = np.zeros(CHUNK_LEN, np.int32)
            if i < N_CLASSES:
                toks[1:9] = signature(i) + SHIFT
                toks[9:60] = filler(rs, 51)
            else:
                toks[1:60] = filler(rs, 59)
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
    return paths, train_qrels, dev_qrels, sig_chunks


def main():
    t_start = time.time()
    root = tempfile.mkdtemp(prefix="maxp_demo_")
    log({"event": "start", "devices": str(jax.devices()), "docs": N_DOCS,
         "chunks": N_CHUNKS, "doc_len": PLEN, "train_q": N_TRAIN_Q})
    paths, train_qrels, dev_qrels, sig_chunks = build_task(root)
    frac0 = float(np.mean(sig_chunks == 0))
    log({"event": "task_built", "sec": round(time.time() - t_start, 1),
         "signature_in_chunk0_frac": round(frac0, 3)})

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=256, num_layers=4,
                        num_heads=8, intermediate_size=1024,
                        dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = RobertaDot(cfg, out_dim=256, base_len=CHUNK_LEN)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-3, 100, 100000))
    state = init_train_state(params, opt)

    # contrastive warmup on chunk-sized passages (FirstP geometry)
    warm_step = make_dpr_train_step(biencoder_loss_fn(model), opt)
    rs = np.random.RandomState(3)
    warm_triples = np.stack([
        np.arange(N_TRAIN_Q), np.arange(N_TRAIN_Q) % N_CLASSES,
        rs.randint(N_CLASSES, N_DOCS, N_TRAIN_Q)], axis=1)
    wq, wp = TokenCache(paths["train-query"]).open(), \
        TokenCache(paths["warm-passages"]).open()
    it = infinite_batches(TripletBatches(wq, wp, warm_triples,
                                         batch_size=min(128, N_TRAIN_Q),
                                         seed=5))
    rng = jax.random.PRNGKey(9)
    t0 = time.time()
    for i in range(WARM_STEPS):
        rng, sub = jax.random.split(rng)
        state, m = warm_step(state, next(it), sub)
        if (i + 1) % 200 == 0:
            log({"event": "warmup", "step": i + 1,
                 "loss": round(float(m["loss"]), 4),
                 "correct_ratio": round(float(m["correct_ratio"]), 3)})
    log({"event": "warmup_done", "steps": WARM_STEPS,
         "sec": round(time.time() - t0, 1)})

    # MaxP ANCE loop: in-batch contrastive over MaxP chunk-max scores on
    # mined negatives (losses.dpr_inbatch_multichunk_loss — same reasoning
    # as the FirstP demo: from a shallow warm start, plain triplets let the
    # model collapse; a first attempt with the parity triplet loss is
    # archived as a negative result in docs/TPU_DEMO.md). Multi-vector
    # index with id-dedup mining throughout.
    step = make_dpr_train_step(
        biencoder_loss_fn(model, multichunk=True), opt)
    caches = {"docs": TokenCache(paths["docs"]).open(),
              "train-query": wq,
              "dev-query": TokenCache(paths["dev-query"]).open()}
    pcfg = PipelineConfig(train_steps_per_slice=8, encode_slice_size=4096,
                          encode_batch_size=64, batch_size=BATCH,
                          topk_training=500, negative_sample=8,
                          ann_chunk_factor=2, dev_search_depth=100,
                          multichunk=True)
    loop = PipelinedAnce(
        pcfg, state=state, train_step=step, rng=jax.random.PRNGKey(1),
        params_of=lambda s: s.params,
        query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
        body_encode_fn=make_encode_fn(model, RobertaDot.body_emb_multichunk),
        passage_cache=caches["docs"],
        train_query_cache=caches["train-query"],
        dev_query_cache=caches["dev-query"],
        train_qrels=train_qrels, dev_qrels=dev_qrels)
    t0 = time.time()
    loop.bootstrap()
    log({"event": "bootstrap_refresh", "sec": round(time.time() - t0, 1),
         "index_rows": loop.index.ntotal,
         **{k: round(v, 4) if isinstance(v, float) else v
            for k, v in loop.history[-1].items()}})

    done = 0
    while done < TOTAL_STEPS:
        t0 = time.time()
        chunk = min(104, TOTAL_STEPS - done)
        n_hist = len(loop.history)
        loop.run(chunk)
        done += chunk
        for h in loop.history[n_hist:]:
            log({"event": "refresh",
                 **{k: round(v, 4) if isinstance(v, float) else v
                    for k, v in h.items()}})
        log({"event": "progress", "steps": done,
             "steps_per_sec": round(chunk / (time.time() - t0), 2)})
    log({"event": "done", "total_sec": round(time.time() - t_start, 1),
         "refreshes": loop.refresh_no,
         "final_dev_ndcg": loop.history[-1]["dev_ndcg"]})


if __name__ == "__main__":
    main()
