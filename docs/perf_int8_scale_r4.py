"""Round-4: the FULL MS MARCO corpus (8,841,823 passages x 768) on ONE
v5e core, as an int8 HBM-resident exact index — measured, not staged.

Supersedes docs/perf_int8_scale_r3.py, whose host-side slice generation
shipped ~200 MB of fp32 through the remote-chip tunnel PER SLICE (27 GB
total — it timed out after an hour still writing). That transfer does not
exist in production: refresh slices come from the on-device encoder
(pipelined.py::_encode_corpus_slice writes encoder output that never
leaves HBM). So this version generates each slice ON DEVICE with jax PRNG
(unit-normalized gaussian rows, the LayerNorm'd-encoder stand-in) and
measures exactly what the refresh pays: the quantize+dynamic_update_slice
write per 64k-row slice, at true reference scale
(reference: FAISS fp32 on a fat-RAM host, run_ann_data_gen.py:265-272 —
27 GB + a full host rebuild per refresh; ours: 6.33 GB int8, in-place).

Measures, all on the real chip:
  * full-corpus slice-write time (135 slices of 64k rows) — the index
    half of a refresh at 8.8M scale — split into gen vs write+fence;
  * exact-search qps at the dev-eval shape (Q=2048, k=10) and the mining
    shape (Q=512, k=200), median of N;
  * planted-row retrieval: queries taken from known corpus rows must
    return those rows top-1 through the int8 path (exactness-at-scale
    smoke: no aliasing from sliced writes / padding / quantization).

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_int8_scale_r4.py > /tmp/int8_scale_r4.log 2>&1 < /dev/null &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.index.flat import FlatIPIndex

NTOTAL = 8_841_823          # the real MS MARCO passage count
D = 768
SLICE = 65_536
K_DEV, Q_DEV = 10, 2048
K_MINE, Q_MINE = 200, 512
REPS = 5


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


@jax.jit
def gen_slice(key) -> jax.Array:
    """Device-resident stand-in for one encoder slice: unit-normalized
    gaussian rows [SLICE, D] fp32 (short final slices are handled by
    update_slice's zero-padding of rows >= ntotal)."""
    x = jax.random.normal(key, (SLICE, D), jnp.float32)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    # unit rows → per-dim amplitude ~ N(0, 1/sqrt(D)); 6 sigma covers the max
    scales = np.full(D, 6.0 / np.sqrt(D) / 127.0, np.float32)
    idx = FlatIPIndex(dim=D, quantize="dims")
    t0 = time.perf_counter()
    idx.allocate(NTOTAL, D, slice_rows=SLICE, scales=scales)
    mat(idx._emb[:1])
    print(json.dumps({"alloc_s": round(time.perf_counter() - t0, 2),
                      "hbm_gb": round(NTOTAL * D / 2**30, 2)}), flush=True)

    # planted queries: remember 4 rows from scattered slices (device_get of
    # single rows — tiny)
    planted = {}  # global row id -> vector
    n_slices = -(-NTOTAL // SLICE)
    probe_slices = [0, n_slices // 3, 2 * n_slices // 3, n_slices - 1]

    keys = jax.random.split(jax.random.PRNGKey(7), n_slices)
    gen_slice(keys[0]).block_until_ready()  # compile outside the timer

    t0 = time.perf_counter()
    gen_s = 0.0
    for s in range(n_slices):
        start = s * SLICE
        rows = min(SLICE, NTOTAL - start)
        tg = time.perf_counter()
        sl = gen_slice(keys[s])
        if rows < SLICE:
            sl = sl[:rows]
        if s in probe_slices:
            planted[start + rows // 2] = np.asarray(
                jax.device_get(sl[rows // 2]))
        gen_s += time.perf_counter() - tg
        idx.update_slice(start, sl)
        if (s + 1) % 27 == 0:
            mat(idx._emb[start:start + 1])  # periodic fence: bound the queue
            print(json.dumps({"slices_done": s + 1,
                              "elapsed_s": round(time.perf_counter() - t0,
                                                 1)}), flush=True)
    mat(idx._emb[-1:])  # fence the async writes
    total = time.perf_counter() - t0
    print(json.dumps({"write_total_s": round(total, 1),
                      "gen_dispatch_s": round(gen_s, 1),
                      "slices": n_slices,
                      "rows_per_s": round(NTOTAL / total, 0)}), flush=True)

    # planted-row exactness through the full int8 stack
    pq = np.stack([planted[g] for g in sorted(planted)])
    _, ids = idx.search(pq, k=5)
    got = np.asarray(ids)[:, 0].tolist()
    want = sorted(planted)
    print(json.dumps({"planted_top1": got, "want": want,
                      "exact": got == want}), flush=True)
    assert got == want, "planted rows not retrieved top-1"

    rng = np.random.default_rng(999)
    for tag, Q, k in (("dev", Q_DEV, K_DEV), ("mine", Q_MINE, K_MINE)):
        q = rng.standard_normal((Q, D)).astype(np.float32)
        s, i = idx.search(q, k=k)
        mat(s)  # compile + warm
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            s, i = idx.search(q, k=k)
            mat(s)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(json.dumps({
            f"search_{tag}": {"Q": Q, "k": k,
                              "qps": round(Q / med, 1),
                              "ms_median": round(med * 1e3, 2),
                              "ms_spread": [round(min(times) * 1e3, 2),
                                            round(max(times) * 1e3, 2)]}}),
            flush=True)


if __name__ == "__main__":
    main()
