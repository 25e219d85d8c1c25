"""8.8M-at-shape mechanics on the 8-device virtual mesh (CPU).

The real chip is time-shared and could not hold the full 13.6 GB index
(measured ceiling the day of the run: between 4.4 and 5.9 GB free —
docs/perf_scale_r3.py ladder), so the full MS MARCO geometry is proven on
the virtual mesh instead: allocate the sharded 8,841,823 x 768 bf16 buffer,
drive in-place slice refreshes into interior AND cross-shard-boundary
positions, and verify a sharded search over the written rows against numpy
exactly. This is the same code path the v5p-32 plan runs (DESIGN.md §4.1);
only the device count and the wall-clock change.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python docs/perf_scale_mesh.py
"""

import json
import time

import numpy as np

N = 8_841_823
D = 768
SLICE = 65_536


def main():
    import jax
    import jax.numpy as jnp
    from ance_tpu.core.mesh import make_mesh
    from ance_tpu.index.flat import FlatIPIndex

    assert jax.device_count() == 8, jax.devices()
    mesh = make_mesh(8)
    index = FlatIPIndex(dim=D, mesh=mesh, dtype=jnp.bfloat16, method="scan")
    t0 = time.perf_counter()
    index.allocate(N, D, slice_rows=SLICE)
    rows_total = index._emb.shape[0]
    print(json.dumps({"event": "allocated", "n": N,
                      "padded_rows": rows_total,
                      "gb": round(rows_total * D * 2 / 2**30, 2),
                      "rows_per_shard": rows_total // 8,
                      "alloc_sec": round(time.perf_counter() - t0, 1)}),
          flush=True)

    rs = np.random.RandomState(0)
    rows_per_shard = rows_total // 8
    # slice starts: corpus head, a shard-interior slice, the last slice of
    # shard 3, the first slice of shard 4, and the ragged corpus tail
    starts = [0, 5 * SLICE,
              rows_per_shard - SLICE, rows_per_shard,
              (N // SLICE) * SLICE]
    written = {}
    for s in starts:
        n_rows = min(SLICE, N - s)
        sl = rs.randn(n_rows, D).astype(np.float32)
        t0 = time.perf_counter()
        index.update_slice(s, jnp.asarray(sl, jnp.bfloat16))
        dt = time.perf_counter() - t0
        written[s] = sl
        print(json.dumps({"event": "update_slice", "start": s,
                          "rows": n_rows, "sec": round(dt, 2)}), flush=True)

    # queries aimed at known written rows; search must find them exactly
    probe_rows = [s + i for s in starts for i in (0, SLICE // 2)]
    probe_rows = [r for r in probe_rows if r < N]
    queries = np.stack([written[s][r - s] for s in starts
                        for r in (s, s + SLICE // 2) if r < N])
    t0 = time.perf_counter()
    scores, ids = index.search(jnp.asarray(queries, jnp.float32), k=10)
    ids = np.asarray(ids)
    search_sec = time.perf_counter() - t0
    hits = [int(ids[i, 0]) == probe_rows[i] for i in range(len(probe_rows))]
    print(json.dumps({"event": "search", "q": len(probe_rows),
                      "self_top1_hits": sum(hits), "sec":
                      round(search_sec, 1)}), flush=True)
    assert all(hits), list(zip(probe_rows, ids[:, 0].tolist()))

    # numpy cross-check over ALL written rows for one query (everything
    # unwritten is zero → scores 0; the bf16 round-trip bounds the error)
    q = queries[2]
    best = -1e9
    best_row = -1
    for s, sl in written.items():
        sc = sl @ q
        j = int(np.argmax(sc))
        if sc[j] > best:
            best, best_row = float(sc[j]), s + j
    assert best_row == probe_rows[2], (best_row, probe_rows[2])
    print(json.dumps({"event": "ok", "note": "sharded 8.8M refresh+search "
                      "mechanics exact at full MS MARCO shape"}), flush=True)


if __name__ == "__main__":
    main()
