"""Headline benchmark: corpus-encoding throughput on the real TPU chip,
with measured MFU, search QPS (bf16 + int8), and train-step latency.

ANCE's stated efficiency bottleneck is the encoding update, not ANN search
(reference README.md:21-24), so the headline metric is passages encoded per
second with the flagship FirstP encoder (roberta-base geometry, bf16,
seq 128 — the reference's passage config, commands/run_train.sh:30-36).

FLOP accounting (matches docs/DESIGN.md): the encoder's MXU work is
12 layers x 24·H² matmul FLOPs per token (QKV+out = 8H², FFN = 16H²)
= 169.9 MFLOP/token x 128 tokens = 21.8 GFLOP/passage. Attention score
matmuls (QK^T + weights-times-V = 4·S·H = 0.393 MFLOP/token/layer, ~2.8%
of the per-layer 24·H²) are EXCLUDED from the numerator although the chip
performs them, so the reported MFU is conservative by ~2.8%. MFU =
achieved matmul FLOP/s over the chip's bf16 peak.

Baseline for ``vs_baseline``: the reference runs 4xV100 fp16
(commands/run_train.sh:25-40) on HF transformers 2.3.0 + apex O1 — vanilla
torch inference, no TensorRT/fusion, which sustains roughly 18-22 TF/s
effective on a 112 TF/s V100 (~18% MFU; consistent with commonly reported
~1000 seq/s for BERT-base at seq 128). That gives ~1000 passages/s per GPU,
~4000 passages/s for the 4-GPU job. ``vs_baseline = ours / 4000``.

Contention control: the benched chip is time-shared, so every metric is
sampled N_SAMPLES times and reported as the MEDIAN with a [min, max]
spread — a single unlucky sample must not masquerade as a regression
(round-2 lesson: one-shot search QPS varied 2.9x between runs).

OUTPUT PROTOCOL (round-4 redesign; BENCH_r03 was zeroed by a driver
timeout against the old all-or-nothing watchdog): every metric prints its
OWN complete JSON line the moment it is measured, streamed through the
watchdog as it arrives, and the FINAL line is the combined headline record.
A timeout at any point therefore still leaves the last finished metric as
the tail's last parseable line. The watchdog has a HARD overall deadline
(DEADLINE_S, ~13 min worst case) well inside the driver's capture window —
it never retries its way past the budget like the round-3 version did
(6 x 1800 s ≈ 3.2 h worst case, bench.py@b106c98).
"""

import json
import statistics
import time

import numpy as np

BASELINE_PASSAGES_PER_SEC = 4000.0  # 4xV100 fp16 estimate, see docstring
GFLOP_PER_PASSAGE = 21.8
SEQ = 128
# measured batch sweep at the round-3 config (docs/perf_mfu_r3.py, v5e):
# b128 5646 p/s > b256 5300 > b1024 5190 > b512 5065 — 128 wins
BATCH = 128
STEPS = 20
N_SAMPLES = 5

# watchdog budget: attempts fit inside a hard overall deadline
DEADLINE_S = 960            # 16 min — inside the driver window; the extra
                            # 2 min over round 4 funds the refresh leg,
                            # which runs LAST and self-skips when tight
INNER_TIMEOUT_S = 780       # one full run ~7-11 min incl. tunnel compiles
RETRY_SLEEP_S = 20

# bf16 peak matmul throughput by device kind (TF/s)
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def _materialize(x):
    """Force full execution — on the remote-attached TPU, block_until_ready
    alone returns before execution finishes."""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def _emit(record: dict) -> None:
    """One self-contained JSON line per measured metric, flushed
    immediately so a later timeout cannot erase it."""
    print(json.dumps(record), flush=True)


def sample(timed_once, n=N_SAMPLES):
    """Run ``timed_once`` (returns one scalar sample) n times →
    (median, min, max). The first call outside this fn should have
    warmed/compiled already."""
    xs = [timed_once() for _ in range(n)]
    return statistics.median(xs), min(xs), max(xs)


def bench_encode(jax, jnp, on_tpu):
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    batch = BATCH if on_tpu else 8  # CPU path is a smoke test only
    cfg = EncoderConfig(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = RobertaDot(cfg, out_dim=768)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 50000, (batch, SEQ)), jnp.int32)
    mask = jnp.ones((batch, SEQ), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2], mask[:2]
                                 )["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.body_emb)

    _materialize(encode(params, ids, mask))  # compile

    def once():
        t0 = time.perf_counter()
        out = None
        for _ in range(STEPS):
            out = encode(params, ids, mask)
        _materialize(out)
        return batch * STEPS / (time.perf_counter() - t0)  # passages/s

    return sample(once, N_SAMPLES if on_tpu else 2), (encode, params, ids,
                                                      mask)


def bench_maxp_encode(jax, jnp, on_tpu):
    """MaxP body encode: [B, 4·512] docs → 4 chunks/doc through the seq-512
    Pallas fused-attention path (the reference MaxP geometry,
    models.py:160-199). Returns docs/sec samples."""
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    B, C, S = (16, 4, 512) if on_tpu else (2, 2, 64)
    cfg = EncoderConfig(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = RobertaDot(cfg, out_dim=768, base_len=S)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 50000, (B, C * S)), jnp.int32)
    mask = jnp.ones((B, C * S), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:1, :S],
                                 mask[:1, :S])["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.body_emb_multichunk)

    _materialize(encode(params, ids, mask))
    reps = 10

    def once():
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = encode(params, ids, mask)
        _materialize(out)
        return B * reps / (time.perf_counter() - t0)

    return sample(once, N_SAMPLES if on_tpu else 2)


def bench_train_step(jax, jnp, on_tpu):
    """FirstP triplet step (3 encoder passes fwd+bwd, LAMB, clip)."""
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    from ance_tpu.optim.schedules import warmup_linear
    from ance_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

    B, QLEN, PLEN = (64, 64, 128) if on_tpu else (8, 16, 32)
    cfg = EncoderConfig(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = RobertaDot(cfg, out_dim=768)
    rs = np.random.RandomState(0)
    batch = {
        "query_ids": jnp.asarray(rs.randint(4, 50000, (B, QLEN)), jnp.int32),
        "query_mask": jnp.ones((B, QLEN), jnp.int32),
        "pos_ids": jnp.asarray(rs.randint(4, 50000, (B, PLEN)), jnp.int32),
        "pos_mask": jnp.ones((B, PLEN), jnp.int32),
        "neg_ids": jnp.asarray(rs.randint(4, 50000, (B, PLEN)), jnp.int32),
        "neg_mask": jnp.ones((B, PLEN), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-4, 10, 1000))
    state = init_train_state(params, opt)
    step = make_train_step(triplet_loss_fn(model), opt)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    _materialize(m["loss"])  # compile
    reps = 10
    it = iter(range(10_000))

    def once():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(reps):
            state_, m = step(state, batch, jax.random.PRNGKey(next(it)))
            state = state_
        _materialize(m["loss"])
        return (time.perf_counter() - t0) / reps * 1000.0  # ms/step

    med, lo, hi = sample(once, N_SAMPLES if on_tpu else 2)
    return (med, lo, hi), B


def bench_search(jax, jnp, on_tpu):
    """Exact top-k over the corpus (fused blockmax kernel on TPU).

    Query batch 2048: per-call dispatch (tunneled on the remote chip) is a
    fixed cost, so larger batches measure the device, not the wire — the
    measured knee (docs/perf_sweep_train.py): q=512 → 8.0k qps,
    q=2048 → 24.7k qps on v5e.

    The int8 variant is the production at-scale STORAGE format (per-dim
    quantize='dims'; the full 8.8M MS MARCO corpus only fits one v5e core
    as int8, DESIGN.md §4.1). On TPU it takes the same fused blockmax path
    with the per-dim scales folded into the query; the compute rate depends
    on the kernel's int8 handling (ops/topk.py), so this measures the
    storage format's end-to-end search cost, not a claimed bandwidth win."""
    from ance_tpu.index.flat import FlatIPIndex

    n, d, q, k = (1_000_000, 768, 2048, 10) if on_tpu else (20_000, 128, 64, 10)
    # generate the corpus ON DEVICE: shipping a 3 GB host array through the
    # remote-chip tunnel (twice — once per index) is what blew the round-3
    # budget, and the production refresh path never leaves HBM anyway
    kc, kq = jax.random.split(jax.random.PRNGKey(1))
    corpus = jax.random.normal(kc, (n, d), jnp.float32)
    queries = jax.random.normal(kq, (q, d), jnp.float32)
    _materialize(corpus[:1])
    _materialize(queries[:1])
    index = FlatIPIndex(dim=d, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    index.add(corpus)
    s, _ = index.search(queries, k=k)
    _materialize(s)  # compile
    reps = 5

    def once():
        t0 = time.perf_counter()
        s = None
        for _ in range(reps):
            s, _ = index.search(queries, k=k)
        _materialize(s)
        return q * reps / (time.perf_counter() - t0)  # qps

    med, lo, hi = sample(once, N_SAMPLES if on_tpu else 2)
    _emit({"metric": "search_qps", "value": round(med, 1), "unit": "qps",
           "spread": _spread(lo, hi), "corpus": n, "k": k})

    # int8 storage variant on the same corpus/queries (storage dtype is
    # forced to int8 by quantize='dims'; no dtype arg — it would be dead)
    del index
    index8 = FlatIPIndex(dim=d, quantize="dims")
    index8.add(corpus)
    s, _ = index8.search(queries, k=k)
    _materialize(s)  # compile

    def once8():
        t0 = time.perf_counter()
        s = None
        for _ in range(reps):
            s, _ = index8.search(queries, k=k)
        _materialize(s)
        return q * reps / (time.perf_counter() - t0)

    med8, lo8, hi8 = sample(once8, N_SAMPLES if on_tpu else 2)
    _emit({"metric": "search_qps_int8", "value": round(med8, 1),
           "unit": "qps", "spread": _spread(lo8, hi8), "corpus": n, "k": k})
    return (med, lo, hi), (med8, lo8, hi8), n


def bench_refresh(jax, jnp, on_tpu, encode, params, ids, mask, train_ms):
    """Budget-bounded estimate of the north-star metric: corpus re-encode +
    index-refresh MINUTES at the true MS MARCO scale (8,841,823 passages,
    BASELINE.json "re-encode+index refresh min"; reference pays this as a
    separate 4xV100 inferencer job, run_ann_data_gen.py:663-702).

    A full on-chip cycle takes ~25 min (measured once:
    docs/perf_refresh8m8_r5.py → DESIGN.md §5), far past this benchmark's
    deadline, so this measures the UNITS on the real 8.8M-geometry index
    and composes them exactly the way the pipelined loop schedules a cycle
    (train/pipelined.py::_seed_cycle): 270 x [32768-passage encode + int8
    slice write] + dev encode/search + 2 mining chunks + the interleaved
    train steps. The encode jit is REUSED from bench_encode (same program,
    no extra compile); regressions in any component move this number.
    """
    from ance_tpu.index.flat import FlatIPIndex

    if not on_tpu:  # CPU smoke: tiny geometry, same code path
        ntotal, slice_rows, enc_batches = 2048, 512, 2
    else:
        ntotal, slice_rows, enc_batches = 8_841_823, 32_768, 32_768 // BATCH
    n_slices = (ntotal + slice_rows - 1) // slice_rows

    emb0 = encode(params, ids, mask)
    scales = jnp.maximum(jnp.max(jnp.abs(emb0.astype(jnp.float32)), axis=0)
                         * 1.5 / 127.0, 1e-8)
    index = FlatIPIndex(dim=emb0.shape[1], quantize="dims")
    index.allocate(ntotal, emb0.shape[1], slice_rows=slice_rows,
                   scales=scales)

    def write_slice(start):
        parts = [encode(params, ids, mask) for _ in range(enc_batches)]
        index.update_slice(start, jnp.concatenate(parts)[:slice_rows])

    write_slice(0)  # compile concat + quantized writer
    _materialize(index._emb[:2].astype(jnp.float32))

    def slice_once():
        t0 = time.perf_counter()
        write_slice(slice_rows)
        _materialize(index._emb[:2].astype(jnp.float32))
        return time.perf_counter() - t0

    slice_s, s_lo, s_hi = sample(slice_once, 3)

    # fixed per-cycle tail at full-index geometry: dev encode (reusing the
    # passage encode jit — conservative: production dev queries are seq 32),
    # dev search, and the 2 mining chunks (k=200)
    kq = jax.random.PRNGKey(3)
    dev_q = jax.random.normal(kq, (512, emb0.shape[1]), jnp.float32)
    for k in (10, 200):
        _materialize(index.search(dev_q, k=k)[0])  # compile both shapes

    def tail_once():
        t0 = time.perf_counter()
        for _ in range(4):  # 512 dev queries / b128 encode
            encode(params, ids, mask)
        s, _ = index.search(dev_q, k=10)
        _materialize(s)
        for _ in range(2):  # mining chunks
            s, _ = index.search(dev_q, k=200)
        _materialize(s)
        return time.perf_counter() - t0

    tail_s = sample(tail_once, 3)[0]

    # compose the cycle as _seed_cycle schedules it (+6 non-E items), with
    # train_steps_per_slice=4 interleaved steps per work item
    n_items = n_slices + 6
    steps = n_items * 4
    refresh_min = (n_slices * slice_s + tail_s
                   + steps * train_ms / 1000.0) / 60.0
    return (refresh_min, slice_s, (s_lo, s_hi), tail_s, ntotal, steps)


def _spread(lo, hi, nd=1):
    return [round(lo, nd), round(hi, nd)]


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    kind = getattr(dev, "device_kind", "unknown")
    _emit({"metric": "device", "value": kind, "unit": "device_kind"})

    t_main = time.monotonic()
    # ordered so the most important metrics land first: a mid-run timeout
    # still certifies the headline + search before the heavier train compile
    (pps, pps_lo, pps_hi), enc_ctx = bench_encode(jax, jnp, on_tpu)
    peak = PEAK_TFLOPS.get(kind)
    tflops = pps * GFLOP_PER_PASSAGE / 1000.0
    _emit({"metric": "firstp_encode_throughput", "value": round(pps, 1),
           "unit": "passages/sec",
           "vs_baseline": round(pps / BASELINE_PASSAGES_PER_SEC, 3),
           "spread": _spread(pps_lo, pps_hi),
           "encode_tflops": round(tflops, 1),
           "encode_mfu": round(tflops / peak, 3) if peak else None})

    (search_qps, s_lo, s_hi), (q8, q8_lo, q8_hi), corpus_n = bench_search(
        jax, jnp, on_tpu)

    maxp_dps, maxp_lo, maxp_hi = bench_maxp_encode(jax, jnp, on_tpu)
    _emit({"metric": "maxp_docs_per_sec", "value": round(maxp_dps, 1),
           "unit": "docs/sec", "spread": _spread(maxp_lo, maxp_hi)})

    (train_ms, tr_lo, tr_hi), train_b = bench_train_step(jax, jnp, on_tpu)
    _emit({"metric": "train_step_ms", "value": round(train_ms, 1),
           "unit": "ms/step", "spread": _spread(tr_lo, tr_hi),
           "batch": train_b})

    # north-star estimate, last: the five certified metrics above must land
    # before this leg's extra compiles can risk the watchdog budget
    refresh_min = None
    if time.monotonic() - t_main < DEADLINE_S - 300:
        refresh_min, slice_s, (rs_lo, rs_hi), tail_s, rf_n, rf_steps = \
            bench_refresh(jax, jnp, on_tpu, *enc_ctx, train_ms)
        _emit({"metric": "refresh_min_8m8", "value": round(refresh_min, 1),
               "unit": "min/refresh", "corpus": rf_n,
               "slice_s": round(slice_s, 2),
               "slice_spread": _spread(rs_lo, rs_hi, 2),
               "tail_s": round(tail_s, 2), "train_steps": rf_steps,
               "note": "composed from on-chip units; full-cycle cert in "
                       "DESIGN.md §5 (docs/perf_refresh8m8_r5.py)"})
    else:
        _emit({"metric": "refresh_min_8m8", "value": None,
               "unit": "min/refresh",
               "note": "skipped: watchdog budget too tight this run"})

    out = {
        "metric": "firstp_encode_throughput",
        "value": round(pps, 1),
        "unit": "passages/sec",
        "vs_baseline": round(pps / BASELINE_PASSAGES_PER_SEC, 3),
        "spread": _spread(pps_lo, pps_hi),
        "samples": N_SAMPLES,
        "device": kind,
        "encode_tflops": round(tflops, 1),
        "encode_mfu": round(tflops / peak, 3) if peak else None,
        "maxp_docs_per_sec": round(maxp_dps, 1),
        "maxp_docs_per_sec_spread": _spread(maxp_lo, maxp_hi),
        "train_step_ms": round(train_ms, 1),
        "train_step_ms_spread": _spread(tr_lo, tr_hi),
        "train_batch": train_b,
        "search_qps": round(search_qps, 1),
        "search_qps_spread": _spread(s_lo, s_hi),
        "search_qps_int8": round(q8, 1),
        "search_qps_int8_spread": _spread(q8_lo, q8_hi),
        "search_corpus": corpus_n,
        "refresh_min_8m8": round(refresh_min, 1) if refresh_min else None,
    }
    print(json.dumps(out), flush=True)


def _run_with_retries():
    """Watchdog with a HARD overall deadline. The tunneled TPU backend
    sometimes hangs or throws UNAVAILABLE at init when another session
    holds the chip; the benchmark can't recover once jax binds a dead
    backend, so the inner run lives in a subprocess with a timeout. Unlike
    the round-3 version (which retried for up to 3.2 h and captured output
    only after a COMPLETE run — BENCH_r03 died empty at the driver's
    timeout), this one (a) streams every inner line through as it is
    printed, so partial runs still certify their finished metrics, and
    (b) never starts an attempt that couldn't finish by DEADLINE_S."""
    import os
    import subprocess
    import sys

    import threading

    t_start = time.monotonic()
    env = dict(os.environ, ANCE_BENCH_INNER="1")
    attempt = 0
    while True:
        attempt += 1
        remaining = DEADLINE_S - (time.monotonic() - t_start)
        if remaining < 60:
            raise SystemExit(
                f"bench: overall deadline ({DEADLINE_S}s) exhausted after "
                f"{attempt - 1} attempts")
        budget = min(INNER_TIMEOUT_S, remaining)
        proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                bufsize=1)
        # the budget must fire even while the inner process is SILENT
        # (minutes-long tunnel compiles) — a timer thread, not a check
        # inside the readline loop, which blocks until a line arrives
        killer = threading.Timer(budget, proc.kill)
        killer.start()
        t_attempt = time.monotonic()
        emitted = False
        try:
            for line in proc.stdout:
                line = line.rstrip("\n")
                if line.startswith("{"):
                    print(line, flush=True)  # stream metrics as they land
                    emitted = True
            rc = proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            rc = -9
        finally:
            killer.cancel()
        if rc == 0:
            return
        print(f"bench attempt {attempt}: rc={rc} after "
              f"{time.monotonic() - t_attempt:.0f}s"
              + (" (partial metrics already emitted)" if emitted else ""),
              file=sys.stderr)
        if emitted:
            # partial metrics are on stdout; retrying from scratch would
            # burn the remaining budget re-measuring what already printed
            raise SystemExit("bench: partial run emitted; not retrying")
        time.sleep(RETRY_SLEEP_S)


if __name__ == "__main__":
    import os
    if os.environ.get("ANCE_BENCH_INNER") == "1":
        main()
    else:
        _run_with_retries()
