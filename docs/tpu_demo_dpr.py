"""Real-TPU demonstration of the DPR open-QA ANCE loop at 100k scale.

The DPR variant's distinguishing machinery — two independent towers
(BiEncoder), answer-string validation (top-k hit curve), and
answer-FILTERED negative mining (reference run_ann_data_gen_dpr.py:281-340)
— driven end-to-end on the real chip:

  synthetic open-QA task: passage K carries the literal answer string
  "ansK" in its raw text and a token signature; query i asks for class
  i % N_CLASSES (disjoint vocab ranges with a shift correspondence, same
  learnable geometry as docs/tpu_demo.py).  A random encoder retrieves the
  answer in its top-20 with probability ~20/100k; the loop should drive
  top-20 hit rate to ~1 through alternating mine→train cycles.

Run:  setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
        python docs/tpu_demo_dpr.py > /tmp/dpr_demo.log 2>&1 < /dev/null &
Logs: docs/tpu_demo_dpr_run.jsonl
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
from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.models.dot_models import BiEncoder
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.dpr_gen import generate_new_ann_dpr
from ance_tpu.train.dpr_trainer import biencoder_loss_fn, make_dpr_train_step
from ance_tpu.train.encode import make_encode_fn
from ance_tpu.train.trainer import init_train_state, make_optimizer

VOCAB = 30522
QLEN, PLEN = 32, 128
N_PASSAGES = int(os.environ.get("DEMO_PASSAGES", 100_000))
N_CLASSES = int(os.environ.get("DEMO_CLASSES",
                               min(1024, N_PASSAGES // 8)))
N_TRAIN_Q = int(os.environ.get("DEMO_TRAIN_Q", 8192))
N_TEST_Q = int(os.environ.get("DEMO_TEST_Q", 1024))
N_TRIVIA_Q = int(os.environ.get("DEMO_TRIVIA_Q", 512))
SHIFT = 15000
CYCLES = int(os.environ.get("DEMO_CYCLES", 8))
STEPS_PER_CYCLE = int(os.environ.get("DEMO_STEPS", 300))
BATCH = int(os.environ.get("DEMO_BATCH", 128))
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_demo_dpr_run.jsonl")


def log(rec):
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def signature(c):
    return 100 + (c * 7 + np.arange(8)) % (SHIFT - 200)


def build_task(root):
    rs = np.random.RandomState(7)
    paths = {n: os.path.join(root, n) for n in
             ("passages", "train-query", "test-query", "trivia-test-query")}
    passage_texts = {}
    with TokenCacheWriter(paths["passages"], PLEN) as w:
        for i in range(N_PASSAGES):
            toks = np.zeros(PLEN, np.int32)
            if i < N_CLASSES:
                toks[1:9] = signature(i) + SHIFT
                toks[9:60] = SHIFT + 200 + rs.randint(
                    0, VOCAB - SHIFT - 300, 51)
                passage_texts[i] = (f"the answer here is ans{i} indeed",
                                    f"title{i}")
            else:
                toks[1:60] = SHIFT + 200 + rs.randint(
                    0, VOCAB - SHIFT - 300, 59)
                passage_texts[i] = ("filler passage with no answers",
                                    f"title{i}")
            w.write(60, toks)
    for name, n_q in (("train-query", N_TRAIN_Q), ("test-query", N_TEST_Q),
                      ("trivia-test-query", N_TRIVIA_Q)):
        with TokenCacheWriter(paths[name], QLEN) as w:
            for i in range(n_q):
                toks = np.zeros(QLEN, np.int32)
                toks[1:9] = signature(i % N_CLASSES)
                toks[9:12] = 100 + rs.randint(0, SHIFT - 200, 3)
                w.write(12, toks)
    answers = lambda n: {i: [f"ans{i % N_CLASSES}"] for i in range(n)}
    positives = {i: i % N_CLASSES for i in range(N_TRAIN_Q)}
    return paths, passage_texts, answers, positives


def parse_triples(path, rs):
    rows = []
    for line in open(path):
        qid, pos, negs = line.rstrip("\n").split("\t")
        negs = negs.split(",")
        rows.append((int(qid), int(pos), int(negs[rs.randint(len(negs))])))
    return np.asarray(rows, np.int64)


def main():
    t_start = time.time()
    root = tempfile.mkdtemp(prefix="dpr_demo_")
    log({"event": "start", "devices": str(jax.devices()),
         "corpus": N_PASSAGES, "train_q": N_TRAIN_Q})
    paths, passage_texts, answers, positives = build_task(root)
    log({"event": "task_built", "sec": round(time.time() - t_start, 1)})

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = EncoderConfig(vocab_size=VOCAB, hidden_size=256, num_layers=4,
                        num_heads=8, intermediate_size=1024,
                        dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = BiEncoder(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    log({"event": "model", "towers": 2,
         "params_m": round(float(n_params) / 1e6, 1)})

    opt = make_optimizer("lamb", warmup_linear(1e-3, 100, 100000))
    state = init_train_state(params, opt)
    step = make_dpr_train_step(biencoder_loss_fn(model), opt)
    qfn = make_encode_fn(model, BiEncoder.query_emb)
    bfn = make_encode_fn(model, BiEncoder.body_emb)

    caches = {n: TokenCache(p).open() for n, p in paths.items()}
    rs = np.random.RandomState(3)
    rng = jax.random.PRNGKey(9)
    # cycle 0 trains on random negatives (the warmup role); later cycles on
    # the generator's answer-filtered hard negatives
    triples = np.stack([np.arange(N_TRAIN_Q), np.arange(N_TRAIN_Q) % N_CLASSES,
                        rs.randint(N_CLASSES, N_PASSAGES, N_TRAIN_Q)], axis=1)

    for cycle in range(CYCLES):
        feed = TripletBatches(caches["train-query"], caches["passages"],
                              triples, batch_size=BATCH, seed=5 + cycle)
        it = infinite_batches(feed)
        t0 = time.time()
        losses = []
        for _ in range(STEPS_PER_CYCLE):
            rng, sub = jax.random.split(rng)
            state, m = step(state, next(it), sub)
            losses.append(m["loss"])
        # materialize before reading the clock — dispatch is async (and on
        # the tunneled chip block_until_ready alone returns early)
        loss_val = float(np.mean(jax.device_get(losses[-50:])))
        correct = float(m["correct_ratio"])
        train_sec = time.time() - t0
        t0 = time.time()
        result = generate_new_ann_dpr(
            output_num=cycle, checkpoint_path=f"cycle{cycle}",
            params=state.params, query_encode_fn=qfn, body_encode_fn=bfn,
            train_query_cache=caches["train-query"],
            test_query_cache=caches["test-query"],
            trivia_test_query_cache=caches["trivia-test-query"],
            passage_cache=caches["passages"], passage_texts=passage_texts,
            train_answers=answers(N_TRAIN_Q),
            test_answers=answers(N_TEST_Q),
            trivia_test_answers=answers(N_TRIVIA_Q),
            training_query_positive_id=positives,
            output_dir=os.path.join(root, "ann"),
            topk_training=200, negative_sample=8, dev_search_depth=100,
            encode_batch_size=512,
            index=FlatIPIndex(
                dim=256,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32), seed=cycle)
        triples = parse_triples(result["data_path"], rs)
        log({"event": "cycle", "cycle": cycle,
             "loss": round(loss_val, 4),
             "correct_ratio": round(correct, 3),
             "top20": round(result["top20"], 4),
             "top100": round(result["top100"], 4),
             "top20_trivia": round(result["top20_trivia"], 4),
             "train_sec": round(train_sec, 1),
             "gen_sec": round(time.time() - t0, 1)})

    log({"event": "done", "total_sec": round(time.time() - t_start, 1),
         "final_top20": round(result["top20"], 4),
         "final_top100": round(result["top100"], 4)})


if __name__ == "__main__":
    main()
