"""Round-3 scale-proof: drive the pipelined refresh at the REAL MS MARCO
geometry — 8.8M passages x 768 dims, bf16, seq 128 — on one v5e chip
(VERDICT r2 #4: replace the §4.1 extrapolations with measured-at-shape
numbers).

What runs:
  1. allocate the in-HBM index buffer at 8.8M x 768 bf16 (~13.5 GB),
     falling back to smaller N on OOM so the run reports the real HBM
     ceiling of this chip;
  2. full bootstrap refresh through PipelinedAnce — every corpus slice
     encoded with the live FirstP encoder (roberta-base geometry) and
     written in place, dev search, mining — timed end to end
     (= the reference generator's whole-corpus pass,
     run_ann_data_gen.py:231-336, which it does between training jobs);
  3. interleaved cycle-2 blocks (8 train steps + 1 work item each) to
     measure the train-step-gap distribution the schedule actually
     delivers at shape;
  4. HBM high-water from device memory_stats when the runtime exposes it.

The corpus is synthetic (deterministic keyed token rows — no 25 GB cache
on disk) but every device-side shape, dtype, and op is the production one.
JSONL to stdout.
"""

import json
import os
import statistics
import time

import numpy as np

SEQ = 128
QLEN = 32
N_TRAIN_Q = int(os.environ.get("SCALE_TRAIN_Q", 10_000))
N_DEV_Q = int(os.environ.get("SCALE_DEV_Q", 1_000))
ENCODE_SLICE = int(os.environ.get("SCALE_SLICE", 65_536))
ENCODE_BATCH = int(os.environ.get("SCALE_ENC_BATCH", 256))
TRAIN_BATCH = int(os.environ.get("SCALE_TRAIN_BATCH", 64))
STEPS_PER_SLICE = 8
INTERLEAVED_BLOCKS = int(os.environ.get("SCALE_BLOCKS", 150))
CORPUS_SIZES = tuple(int(x) for x in os.environ.get(
    "SCALE_N", "8841823,8000000,6400000,4000000").split(","))


class SyntheticCache:
    """TokenCache duck-type: deterministic rows keyed by offset, no disk.
    Row tokens = hash(key) stream; lengths all max (worst-case encode)."""

    def __init__(self, n, seq, vocab=50_000):
        self.total_number = n
        self.embedding_size = seq
        self.vocab = vocab

    def __len__(self):
        return self.total_number

    def batch(self, keys):
        keys = np.asarray(keys, np.int64)
        toks = ((keys[:, None] * 2654435761 + 97 +
                 np.arange(self.embedding_size)[None, :] * 7919)
                % (self.vocab - 4) + 4).astype(np.int32)
        return np.full(len(keys), self.embedding_size, np.int32), toks


def build(n_corpus):
    import jax
    import jax.numpy as jnp
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    from ance_tpu.optim.schedules import warmup_linear
    from ance_tpu.train.encode import make_encode_fn
    from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
    from ance_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

    if os.environ.get("SCALE_TINY"):  # CPU smoke-test geometry
        cfg = EncoderConfig(dtype=jnp.float32, vocab_size=50_000,
                            hidden_size=32, num_layers=2, num_heads=4,
                            intermediate_size=64)
        model = RobertaDot(cfg, out_dim=16)
    else:
        cfg = EncoderConfig(dtype=jnp.bfloat16)
        model = RobertaDot(cfg, out_dim=768)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-4, 100, 100_000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    pcfg = PipelineConfig(
        train_steps_per_slice=STEPS_PER_SLICE,
        encode_slice_size=ENCODE_SLICE, encode_batch_size=ENCODE_BATCH,
        batch_size=TRAIN_BATCH, topk_training=200, negative_sample=5,
        ann_chunk_factor=5, dev_search_depth=100,
        search_chunk_queries=4096)
    loop = PipelinedAnce(
        pcfg, state=state, train_step=step, rng=jax.random.PRNGKey(1),
        params_of=lambda s: s.params,
        query_encode_fn=make_encode_fn(model, RobertaDot.query_emb),
        body_encode_fn=make_encode_fn(model, RobertaDot.body_emb),
        passage_cache=SyntheticCache(n_corpus, SEQ),
        train_query_cache=SyntheticCache(N_TRAIN_Q, QLEN),
        dev_query_cache=SyntheticCache(N_DEV_Q, QLEN),
        train_qrels={q: {q % n_corpus: 1} for q in range(N_TRAIN_Q)},
        dev_qrels={q: {(q * 13) % n_corpus: 1} for q in range(N_DEV_Q)})
    return loop


def sync(loop):
    """Force full execution of the train chain AND the index buffer — on
    the tunneled chip block_until_ready returns early, and encode slices
    don't otherwise sync until the next search reads them."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree.leaves(loop.params_of(loop.state))[0]
    float(jnp.sum(leaf))
    if loop.index is not None and loop.index._emb is not None:
        float(jnp.sum(loop.index._emb[0].astype(jnp.float32)))


def hbm_stats():
    import jax
    try:
        s = jax.devices()[0].memory_stats()
        return {"hbm_in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 2),
                "hbm_peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30,
                                     2),
                "hbm_limit_gb": round(s.get("bytes_limit", 0) / 2**30, 2)}
    except Exception as e:  # axon runtime may not expose stats
        return {"hbm_stats_error": str(e)[:80]}


def main():
    import jax

    for n_corpus in CORPUS_SIZES:
        try:
            loop = build(n_corpus)
            # allocate the big buffer FIRST (encode one slice) so OOM fails
            # fast instead of after a 30-min encode
            t0 = time.perf_counter()
            loop._run_item()  # first E slice → allocate + update_slice
            sync(loop)
            first_item = time.perf_counter() - t0
            print(json.dumps({"event": "allocated", "n_corpus": n_corpus,
                              "index_gb": round(
                                  loop.index._emb.shape[0] * 768 * 2 / 2**30,
                                  2),
                              "first_slice_sec": round(first_item, 1),
                              **hbm_stats()}), flush=True)
            break
        except Exception as e:
            print(json.dumps({"event": "alloc_failed", "n_corpus": n_corpus,
                              "error": str(e)[:200]}), flush=True)
    else:
        raise SystemExit("no corpus size fit")

    # ---- bootstrap refresh, timed end to end --------------------------------
    t0 = time.perf_counter()
    boot = loop.bootstrap()
    sync(loop)
    boot_sec = time.perf_counter() - t0 + first_item
    items = {t: [round(x, 3) for x in v] for t, v in loop.item_times.items()}
    summary = {t: {"n": len(v), "total_sec": round(sum(v), 1),
                   "median_sec": round(statistics.median(v), 3),
                   "max_sec": round(max(v), 3)}
               for t, v in loop.item_times.items()}
    print(json.dumps({"event": "bootstrap_refresh", "n_corpus": loop.index.ntotal,
                      "refresh_min": round(boot_sec / 60, 2),
                      "num_triples": boot["num_triples"],
                      "item_summary": summary, **hbm_stats()}), flush=True)

    # ---- interleaved blocks: 8 train steps + 1 work item each ---------------
    for t in loop.item_times.values():
        t.clear()
    block_times = []
    for b in range(INTERLEAVED_BLOCKS):
        t0 = time.perf_counter()
        loop.run(STEPS_PER_SLICE)
        sync(loop)
        block_times.append(time.perf_counter() - t0)
        if (b + 1) % 25 == 0:
            print(json.dumps({"event": "progress", "blocks": b + 1,
                              "median_block_sec": round(
                                  statistics.median(block_times), 2)}),
                  flush=True)
    step_equiv = [t / STEPS_PER_SLICE for t in block_times]
    item_summary = {t: {"n": len(v),
                        "median_sec": round(statistics.median(v), 3),
                        "p90_sec": round(sorted(v)[int(0.9 * len(v))], 3),
                        "max_sec": round(max(v), 3)}
                    for t, v in loop.item_times.items() if v}
    # full-cycle projection from measured medians: every slice + aux items
    n_slices = -(-loop.index.ntotal // ENCODE_SLICE)
    e_med = statistics.median(loop.item_times["E"]) \
        if loop.item_times.get("E") else 0.0
    step_med = statistics.median(step_equiv)
    proj_cycle_min = (n_slices * (e_med + STEPS_PER_SLICE * step_med)) / 60
    print(json.dumps({
        "event": "interleaved",
        "blocks": INTERLEAVED_BLOCKS,
        "train_step_ms_median": round(step_med * 1000, 1),
        "block_sec_median": round(statistics.median(block_times), 2),
        "block_sec_p90": round(sorted(block_times)[
            int(0.9 * len(block_times))], 2),
        "block_sec_max": round(max(block_times), 2),
        "item_summary": item_summary,
        "projected_full_cycle_min_encode_part": round(proj_cycle_min, 1),
        **hbm_stats()}), flush=True)


if __name__ == "__main__":
    main()
