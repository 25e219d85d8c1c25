"""8.8M-at-shape mechanics for the INT8 index on the 8-device virtual mesh.

Companion to perf_scale_mesh.py (bf16): allocate the sharded
8,841,823 x 768 quantize='dims' buffer (6.33 GB vs 12.65 bf16), re-snapshot
scales via set_scales (the per-refresh-cycle entry point), drive in-place
slice writes — each quantized ON DEVICE — into interior and
cross-shard-boundary positions, and verify planted-row self-retrieval
through the full int8 search stack. This is the exact code path the
single-chip 8.8M run uses (--index_quantize dims, MSMARCO_RUNBOOK §3);
only the device count and wall-clock differ.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python docs/perf_scale_mesh_int8.py
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
    index = FlatIPIndex(dim=D, mesh=mesh, method="scan", quantize="dims")
    # unit-row gaussian stand-in → per-dim amplitude ~N(0, 1/sqrt(D))
    scales = np.full(D, 6.0 / np.sqrt(D) / 127.0, np.float32)
    t0 = time.perf_counter()
    index.allocate(N, D, slice_rows=SLICE, scales=scales)
    rows_total = index._emb.shape[0]
    print(json.dumps({"event": "allocated", "n": N,
                      "padded_rows": rows_total, "dtype": "int8",
                      "gb": round(rows_total * D / 2**30, 2),
                      "alloc_sec": round(time.perf_counter() - t0, 1)}),
          flush=True)
    index.set_scales(scales * 1.02)  # the per-cycle re-snapshot entry point

    rs = np.random.RandomState(0)
    rows_per_shard = rows_total // 8
    starts = [0, 5 * SLICE,
              rows_per_shard - SLICE, rows_per_shard,
              (N // SLICE) * SLICE]
    written = {}
    for s in starts:
        n_rows = min(SLICE, N - s)
        sl = rs.randn(n_rows, D).astype(np.float32)
        sl /= np.linalg.norm(sl, axis=1, keepdims=True)
        t0 = time.perf_counter()
        index.update_slice(s, sl)  # quantized on device against the scales
        dt = time.perf_counter() - t0
        written[s] = sl
        print(json.dumps({"event": "update_slice", "start": s,
                          "rows": n_rows, "sec": round(dt, 2)}), flush=True)

    probe_rows = [s + i for s in starts for i in (0, SLICE // 2)]
    probe_rows = [r for r in probe_rows if r < N]
    queries = np.stack([written[s][r - s] for s in starts
                        for r in (s, s + SLICE // 2) if r < N])
    t0 = time.perf_counter()
    _, ids = index.search(jnp.asarray(queries, jnp.float32), k=10)
    ids = np.asarray(ids)
    search_sec = time.perf_counter() - t0
    hits = [int(ids[i, 0]) == probe_rows[i] for i in range(len(probe_rows))]
    print(json.dumps({"event": "search", "q": len(probe_rows),
                      "self_top1_hits": sum(hits),
                      "sec": round(search_sec, 1)}), flush=True)
    assert all(hits), list(zip(probe_rows, ids[:, 0].tolist()))
    print(json.dumps({"event": "ok", "note": "int8 sharded 8.8M "
                      "refresh+search mechanics exact at full MS MARCO "
                      "shape (6.33 GB index)"}), flush=True)


if __name__ == "__main__":
    main()
