"""Round-5: the NORTH-STAR metric, measured end to end — a full pipelined
refresh cycle at true MS MARCO scale (8,841,823 passages) on one v5e core.

BASELINE.json tracks "corpus re-encode + index-refresh minutes" because the
ANCE paper names the encoding update as the bottleneck (reference
README.md:21-24); the reference pays it as a separate inferencer job over
4xV100 (run_ann_data_gen.py:663-702, ~10 h per refresh per README). Round 4
measured every PART at scale (encode p/s, 8.8M int8 slice writes, dev qps on
the 8.8M index) but never ONE refresh as one number. This runs the real
PipelinedAnce — roberta-base-geometry bf16 encoder, int8 'dims' HBM index,
LAMB, real mining over the full corpus — and reports:

  * bootstrap (initial full refresh, all items back to back) wall-minutes;
  * cycle 1: one full interleaved refresh cycle (production train step)
    → refresh wall-minutes at 8.8M, train steps included;
  * cycle 2: the same cycle with a gap-instrumented train step (each step
    materializes its loss → true device-completion timestamps)
    → train-step-gap p50/p99/max during refresh;
  * no-refresh train throughput (same feed, no work items)
    → the refresh's train-throughput cost;
  * per-item-tag time totals (E/D/S/V/Q/M/F) for the measured cycle.

Corpus tokens are synthetic (uniform vocab ids) — the chip does not care
what it encodes; geometry, scale, and every data path are the production
ones. Config notes: encode_slice_size 32768 → 270 E items/cycle, gap
p99 ≈ one slice encode; train_steps_per_slice 4 → ~1.1k train steps per
cycle (≥ the 200 the r4 verdict asked for).

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_refresh8m8_r5.py > /tmp/refresh8m8_r5.log 2>&1 < /dev/null &
"""

import json
import os
import time

import numpy as np

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

ROOT = os.environ.get("ANCE_REFRESH_ROOT", "/tmp/refresh8m8")
N_P = 8_841_823             # the real MS MARCO passage count
N_TQ, N_DQ = 4096, 512
PLEN, QLEN = 128, 32
B_TRAIN = int(os.environ.get("ANCE_REFRESH_B", "64"))


def build_cache(base: str, n: int, seqlen: int) -> None:
    """Bulk-write the byte-identical TokenCache format (vs one-record-at-a-
    time TokenCacheWriter, which would take ~10 min for 8.8M rows)."""
    if os.path.exists(base + "_meta"):
        return
    rec = 4 + 4 * seqlen
    chunk_rows = 65536
    rs = np.random.RandomState(0)
    block = np.empty((chunk_rows, rec), np.uint8)
    block[:, :4] = np.array([0, 0, seqlen // 256, seqlen % 256], np.uint8)
    tok = rs.randint(4, 50000, size=(chunk_rows, seqlen)).astype(np.int32)
    block[:, 4:] = tok.view(np.uint8).reshape(chunk_rows, 4 * seqlen)
    t0 = time.perf_counter()
    with open(base, "wb") as f:
        left = n
        while left > 0:
            take = min(chunk_rows, left)
            f.write(block[:take].tobytes())
            left -= take
    with open(base + "_meta", "w") as f:
        json.dump({"type": "int32", "total_number": n,
                   "embedding_size": seqlen}, f)
    print(json.dumps({"built": base, "gb": round(n * rec / 1e9, 2),
                      "sec": round(time.perf_counter() - t0, 1)}), flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def gap_pcts(gaps):
    a = np.asarray(gaps)
    return {"n": len(gaps),
            "p50_s": round(float(np.percentile(a, 50)), 3),
            "p90_s": round(float(np.percentile(a, 90)), 3),
            "p99_s": round(float(np.percentile(a, 99)), 3),
            "max_s": round(float(a.max()), 3)}


def hbm_preflight():
    """Fail in ~2 min, not after a 26-min bootstrap: allocate the index's
    int8 capacity (8.85M rows padded to slice multiples) and compile+run
    one b64 train step beside it — the peak-concurrency HBM shape."""
    cap = ((N_P + 32768 - 1) // 32768) * 32768
    dummy = jnp.zeros((cap, 768), jnp.int8)
    float(jnp.sum(dummy[:2].astype(jnp.float32)))
    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=768)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-5, 1000, 1_000_000))
    step = make_train_step(triplet_loss_fn(model), opt)
    rs = np.random.RandomState(0)
    batch = {"query_ids": jnp.asarray(rs.randint(4, 50000, (B_TRAIN, QLEN)),
                                      jnp.int32),
             "query_mask": jnp.ones((B_TRAIN, QLEN), jnp.int32),
             "pos_ids": jnp.asarray(rs.randint(4, 50000, (B_TRAIN, PLEN)),
                                    jnp.int32),
             "pos_mask": jnp.ones((B_TRAIN, PLEN), jnp.int32),
             "neg_ids": jnp.asarray(rs.randint(4, 50000, (B_TRAIN, PLEN)),
                                    jnp.int32),
             "neg_mask": jnp.ones((B_TRAIN, PLEN), jnp.int32)}
    state = init_train_state(params, opt)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(jnp.sum(m["loss"]))
    emit(stage="hbm_preflight_ok", index_capacity_rows=cap, batch=B_TRAIN)


def main():
    hbm_preflight()
    os.makedirs(ROOT, exist_ok=True)
    build_cache(os.path.join(ROOT, "passages"), N_P, PLEN)
    build_cache(os.path.join(ROOT, "train-query"), N_TQ, QLEN)
    build_cache(os.path.join(ROOT, "dev-query"), N_DQ, QLEN)
    caches = {n: TokenCache(os.path.join(ROOT, n)).open()
              for n in ("passages", "train-query", "dev-query")}

    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=768)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-5, 1000, 1_000_000))
    base_step = make_train_step(triplet_loss_fn(model), opt)

    # gap instrumentation: materializing the loss pins each step's true
    # device completion (block_until_ready is a no-op on the axon tunnel)
    gaps, last = [], [0.0]

    def timed_step(state, batch, rng):
        state, metrics = base_step(state, batch, rng)
        float(jnp.sum(metrics["loss"]))
        t = time.perf_counter()
        if last[0]:
            gaps.append(t - last[0])
        last[0] = t
        return state, metrics

    pcfg = PipelineConfig(
        train_steps_per_slice=4, encode_slice_size=32768,
        encode_batch_size=128, batch_size=B_TRAIN,
        topk_training=200, negative_sample=2, ann_chunk_factor=4,
        dev_search_depth=10, search_chunk_queries=512,
        index_quantize="dims")
    loop = PipelinedAnce(
        pcfg, state=init_train_state(params, opt), train_step=base_step,
        rng=jax.random.PRNGKey(1), params_of=lambda s: s.params,
        query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
        body_encode_fn=make_encode_fn(model, RobertaDot.body_emb),
        passage_cache=caches["passages"],
        train_query_cache=caches["train-query"],
        dev_query_cache=caches["dev-query"],
        train_qrels={q: {q % N_P: 1} for q in range(N_TQ)},
        dev_qrels={q: {q % N_P: 1} for q in range(N_DQ)})

    t0 = time.perf_counter()
    boot = loop.bootstrap()
    boot_s = time.perf_counter() - t0
    steps = len(loop._work) * pcfg.train_steps_per_slice
    emit(stage="bootstrap", wall_min=round(boot_s / 60.0, 2),
         ntotal=int(loop.index.ntotal), steps_per_cycle=steps,
         num_triples=boot["num_triples"], work_items=len(loop._work))

    # compile the train step OFF the timed cycles (one real step)
    b0 = next(loop._batches)
    loop.state, m = base_step(loop.state, b0, jax.random.PRNGKey(9))
    float(jnp.sum(m["loss"]))
    emit(stage="train_step_compiled", batch=B_TRAIN)

    # cycle 1: production configuration, whole-cycle wall time
    r0, t0 = loop.refresh_no, time.perf_counter()
    loop.run(steps)
    c1 = time.perf_counter() - t0
    e1 = loop.history[-1]
    emit(stage="cycle1_production", wall_min=round(c1 / 60.0, 2),
         refreshes=loop.refresh_no - r0, steps=steps,
         steps_per_s=round(steps / c1, 2),
         dev_ndcg=e1.get("dev_ndcg"), clip_frac=e1.get("int8_clip_frac"),
         num_triples=e1.get("num_triples"))

    # cycle 2: gap-instrumented train step
    loop.train_step = timed_step
    gaps.clear()
    last[0] = 0.0
    r0, t0 = loop.refresh_no, time.perf_counter()
    loop.run(steps)
    c2 = time.perf_counter() - t0
    emit(stage="cycle2_instrumented", wall_min=round(c2 / 60.0, 2),
         refreshes=loop.refresh_no - r0, steps=steps,
         step_gap=gap_pcts(gaps))
    emit(stage="item_times", **{
        tag: {"n": len(ts), "total_s": round(sum(ts), 1),
              "p50_s": round(float(np.median(ts)), 3)}
        for tag, ts in loop.item_times.items()})

    # no-refresh train throughput: same feed/state, zero work items
    gaps.clear()
    last[0] = 0.0
    t0 = time.perf_counter()
    n_pure = 100
    for _ in range(n_pure):
        loop.rng, sub = jax.random.split(loop.rng)
        loop.state, m = timed_step(loop.state, next(loop._batches), sub)
    pure_s = time.perf_counter() - t0
    pure_sps = n_pure / pure_s
    emit(stage="train_no_refresh", steps=n_pure,
         steps_per_s=round(pure_sps, 2), step_gap=gap_pcts(gaps),
         refresh_throughput_cost_pct=round(
             100.0 * (1.0 - (steps / c1) / pure_sps), 1))
    emit(done=True)
    for c in caches.values():
        c.close()


if __name__ == "__main__":
    main()
