"""Exact (brute-force) inner-product top-k index.

TPU-native replacement for FAISS ``IndexFlatIP`` (reference
run_ann_data_gen.py:265-272, 303) and the index-free
``faiss.knn_inner_product`` entry point (reference utils/eval_mrr.py:62-91).

Design (SURVEY.md §7.1 "index/"):
  * corpus embeddings live in device memory, [N, D];
  * queries stream against the corpus in row-chunks under ``lax.scan`` with a
    running top-k merge — the full [Q, N] score matrix never materializes;
  * multi-chip: corpus row-sharded over a mesh axis via ``shard_map``; each
    shard computes a local top-k against its rows (ids offset to global),
    then an ``all_gather`` of the tiny [Q, k] candidate sets + final merge.
    Collectives move k·Q scores, never the corpus.

Exactness: identical result set to FAISS FlatIP at equal dtype (it is the
same exhaustive computation; only tie order may differ).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = jnp.finfo(jnp.float32).min


def _pad_rows(x: np.ndarray | jax.Array, multiple: int):
    n = x.shape[0]
    padded = (n + multiple - 1) // multiple * multiple
    if padded == n:
        return x, n
    pad = jnp.zeros((padded - n,) + x.shape[1:], x.dtype)
    return jnp.concatenate([jnp.asarray(x), pad], axis=0), n


@functools.partial(jax.jit, static_argnames=("k", "chunk_rows"))
def topk_inner_product(queries: jax.Array, corpus: jax.Array, *, k: int,
                       chunk_rows: int = 16384,
                       valid_rows: Optional[jax.Array] = None,
                       row_scales: Optional[jax.Array] = None):
    """Exact top-k by inner product. Returns (scores [Q,k], ids [Q,k] int32).

    ``corpus`` rows beyond ``valid_rows`` (used for padding) score −inf.
    Streaming scan over corpus chunks keeps peak memory at
    Q·(chunk_rows + 2k) floats. With ``row_scales`` [N] the corpus holds
    per-row-quantized values (e.g. int8) and scores multiply by the scale.
    """
    Q = queries.shape[0]
    N = corpus.shape[0]
    if valid_rows is None:
        valid_rows = jnp.asarray(N, jnp.int32)
    chunk_rows = min(chunk_rows, N)
    n_chunks = -(-N // chunk_rows)
    padded_n = n_chunks * chunk_rows
    pad = padded_n - N
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    chunks = corpus_p.reshape(n_chunks, chunk_rows, corpus.shape[1])
    if row_scales is not None:
        scales_p = jnp.pad(row_scales, (0, pad)) if pad else row_scales
        scale_chunks = scales_p.reshape(n_chunks, chunk_rows)
    else:
        scale_chunks = jnp.zeros((n_chunks, 0), jnp.float32)  # unused

    qf = queries.astype(jnp.float32)

    def body(carry, chunk_data):
        best_s, best_i = carry
        chunk, scales, chunk_idx = chunk_data
        base = chunk_idx * chunk_rows
        # [Q, chunk_rows] — the MXU hot op; fp32 accumulation
        s = jax.lax.dot_general(
            qf, chunk.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if row_scales is not None:
            s = s * scales[None, :]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ids < valid_rows, s, NEG_INF)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    init = (jnp.full((Q, k), NEG_INF, jnp.float32),
            jnp.full((Q, k), -1, jnp.int32))
    (scores, ids), _ = jax.lax.scan(
        body, init,
        (chunks, scale_chunks, jnp.arange(n_chunks, dtype=jnp.int32)))
    return scores, ids


def _quantize_int8(x: jax.Array, scales_bcast: jax.Array) -> jax.Array:
    """The one int8 quantization convention (symmetric, round-to-nearest,
    clamp ±127). Every builder — add() via quantize_*_int8, update_slice via
    _build_update — must share it or their indexes silently diverge."""
    return jnp.clip(jnp.round(x / scales_bcast), -127, 127).astype(jnp.int8)


def quantize_rows_int8(emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: returns (values int8 [N, D],
    scales fp32 [N]) with value·scale ≈ original. Halves the HBM footprint
    of the reference's fp32 FAISS index (beyond-parity capacity option)."""
    emb = jnp.asarray(emb, jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(emb), axis=1), 1e-12) / 127.0
    return _quantize_int8(emb, scales[:, None]), scales


def quantize_dims_int8(emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-DIMENSION symmetric int8 quantization: (values int8 [N, D],
    dim_scales fp32 [D]). Because scores are linear in each dimension, the
    scales fold into the QUERY (q'_d = q_d·scale_d) — so every downstream
    search path, including the fused blockmax kernel, works unchanged on the
    int8 corpus. LayerNorm'd embeddings have near-uniform per-dim ranges, so
    accuracy is close to per-row quantization."""
    emb = jnp.asarray(emb, jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(emb), axis=0), 1e-12) / 127.0
    return _quantize_int8(emb, scales[None, :]), scales


def merge_topk(scores: jax.Array, ids: jax.Array, k: int):
    """Merge candidate sets: [..., S, Q, k] → final [Q, k] (top-k of union)."""
    s = jnp.moveaxis(scores, -3, -2).reshape(scores.shape[-2], -1)
    i = jnp.moveaxis(ids, -3, -2).reshape(ids.shape[-2], -1)
    top_s, pos = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, pos, axis=1)


class FlatIPIndex:
    """Exact IP index over device-resident embeddings.

    Single-device by default; pass a ``mesh`` + ``axis`` to shard corpus rows
    across devices (the refresh loop keeps these shards resident in HBM and
    swaps segments in place, SURVEY.md §5.8).
    """

    def __init__(self, dim: int, mesh: Optional[Mesh] = None,
                 axis: str = "data", dtype=jnp.float32,
                 chunk_rows: int = 16384, method: str = "auto",
                 quantize: bool = False):
        """``method``: 'scan' (streaming lax.scan merge), 'blockmax' (fused
        Pallas matmul+block-max kernel, ~5× faster on TPU — see
        ops/topk.py), or 'auto' (blockmax on TPU, scan elsewhere).
        ``quantize``: int8 storage (half the HBM of bf16, ~1/4 of the
        reference's fp32 FAISS index; near-exact ranking). "rows"/True =
        per-row scales (scan path only); "dims" = per-dimension scales, which
        fold into the query so the fused blockmax kernel applies unchanged."""
        self.dim = dim
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        self.chunk_rows = chunk_rows
        self.method = method
        self.quantize = "rows" if quantize is True else (quantize or None)
        if self.quantize not in (None, "rows", "dims"):
            raise ValueError(f"quantize must be False/'rows'/'dims', got "
                             f"{quantize!r}")
        self._emb: Optional[jax.Array] = None
        self._scales: Optional[jax.Array] = None
        self._ntotal = 0
        self._search = None
        self._update = None
        self._slice_rows: Optional[int] = None

    def _use_blockmax(self) -> bool:
        if self.quantize == "rows":
            return False  # row scales can't fold into the query; scan only
        if self.method == "blockmax":
            return True
        if self.method == "scan":
            return False
        return jax.default_backend() not in ("cpu",)

    @property
    def ntotal(self) -> int:
        return self._ntotal

    def _n_shards(self) -> int:
        return self.mesh.shape[self.axis] if self.mesh is not None else 1

    def add(self, embeddings) -> None:
        """(Re)build the index contents. Rows are padded to a multiple of the
        shard count; padded rows never surface (scored −inf)."""
        if self.quantize == "rows":
            emb, scales = quantize_rows_int8(jnp.asarray(embeddings))
        elif self.quantize == "dims":
            emb, scales = quantize_dims_int8(jnp.asarray(embeddings))
        else:
            emb = jnp.asarray(embeddings, self.dtype)
            scales = None
        n_shards = self._n_shards()
        emb, self._ntotal = _pad_rows(emb, n_shards)
        if self.quantize == "rows":
            scales, _ = _pad_rows(scales, n_shards)
        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P(self.axis, None))
            emb = jax.device_put(emb, sharding)
            if self.quantize == "rows":
                scales = jax.device_put(
                    scales, NamedSharding(self.mesh, P(self.axis)))
            elif self.quantize == "dims":
                scales = jax.device_put(
                    scales, NamedSharding(self.mesh, P()))
        self._emb = emb
        self._scales = scales
        self._search = None
        self._update = None
        self._slice_rows = None  # add() layouts are not slice-aligned

    def add_chunked(self, emb, slice_rows: int = 65_536) -> None:
        """Build from a host array (mmap-friendly) WITHOUT staging the full
        fp corpus in HBM: allocate() + streamed update_slice() writes, each
        chunk cast/quantized on device. Results are identical to add() —
        for quantize='dims' the scales come from an exact per-dim max pass
        over the host array (same formula as quantize_dims_int8). This is
        the serving-scale path: an 8.8M x 768 fp32 dump is 27 GB, which
        add() would otherwise round-trip through device memory whole."""
        if self.quantize == "rows":
            raise ValueError("add_chunked supports unquantized or "
                             "quantize='dims' indexes")
        n, dim = emb.shape
        # small corpora must not pay for 65k-row padding (allocate pads to a
        # whole number of slices, and padded rows are scored then masked)
        slice_rows = min(slice_rows, n)
        scales = None
        if self.quantize == "dims":
            amax = np.zeros(dim, np.float32)
            for s in range(0, n, slice_rows):
                np.maximum(amax,
                           np.abs(np.asarray(emb[s:s + slice_rows],
                                             np.float32)).max(axis=0),
                           out=amax)
            scales = np.maximum(amax, 1e-12) / 127.0
        self.allocate(n, dim, slice_rows=slice_rows, scales=scales)
        for s in range(0, n, slice_rows):
            self.update_slice(s, np.asarray(emb[s:s + slice_rows],
                                            np.float32))

    def save(self, path: str) -> None:
        """Persist the index contents (FAISS ``write_index`` analogue —
        dpr_utils.py:214-218 ``serialize``): values at their storage dtype
        (int8 stays int8: a saved 8.8M x 768 dims index is 6.3 GB, and
        loading skips the quantization pass entirely), scales, and row
        count. Padding rows are stripped; load() re-pads for its own mesh."""
        if self._emb is None:
            raise ValueError("index is empty; nothing to save")
        emb = np.asarray(jax.device_get(self._emb))[:self._ntotal]
        dtype_name = emb.dtype.name
        if dtype_name == "bfloat16":  # np.savez can't round-trip ml_dtypes
            emb = emb.view(np.uint16)
        scales = (np.asarray(jax.device_get(self._scales))
                  if self._scales is not None else np.zeros(0))
        if self.quantize == "rows":
            # per-ROW scales are padded like emb; strip them the same way or
            # load() on a different shard count re-pads emb to a different
            # length than scales and search crashes on the mismatch
            scales = scales[:self._ntotal]
        np.savez(path, emb=emb, dtype_name=np.asarray(dtype_name),
                 scales=scales,
                 quantize=np.asarray(self.quantize or ""),
                 ntotal=np.asarray(self._ntotal))

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None,
             axis: str = "data", method: str = "auto") -> "FlatIPIndex":
        """Rebuild a saved index, re-sharding for ``mesh`` (the shard count
        may differ from the saving process's — padding rows are recut).
        The loaded index is search-ready; call allocate() to start a fresh
        refresh cycle (slice alignment is not preserved across save)."""
        with np.load(path if str(path).endswith(".npz") else f"{path}.npz",
                     allow_pickle=False) as z:
            emb, scales = z["emb"], z["scales"]
            quantize = str(z["quantize"]) or False
            ntotal = int(z["ntotal"])
            if str(z["dtype_name"]) == "bfloat16":
                emb = emb.view(jnp.bfloat16)
        idx = cls(dim=emb.shape[1], mesh=mesh, axis=axis, method=method,
                  dtype=emb.dtype if emb.dtype != np.int8 else jnp.float32,
                  quantize=quantize)
        padded, _ = _pad_rows(jnp.asarray(emb), idx._n_shards())
        if mesh is not None:
            padded = jax.device_put(
                padded, NamedSharding(mesh, P(axis, None)))
        idx._emb = padded
        idx._ntotal = ntotal
        if quantize:
            s = jnp.asarray(scales, jnp.float32)
            if quantize == "rows":
                s, _ = _pad_rows(s, idx._n_shards())
                if mesh is not None:
                    s = jax.device_put(s, NamedSharding(mesh, P(axis)))
            elif mesh is not None:
                s = jax.device_put(s, NamedSharding(mesh, P()))
            idx._scales = s
        return idx

    def reset(self) -> None:
        self._emb, self._ntotal, self._search = None, 0, None
        self._update = None
        self._slice_rows = None

    # -- in-place slice refresh (the pipelined loop's in-HBM segment swap) --
    def allocate(self, ntotal: int, dim: int, slice_rows: int,
                 scales=None) -> None:
        """Allocate a zeroed device-resident buffer that accepts in-place
        ``update_slice`` writes (replaces the reference's host-side
        rebuild-and-re-add, run_ann_data_gen.py:265-272).

        Rows are padded so every ``slice_rows``-aligned slice lies entirely
        within one shard (``rows_per_shard % slice_rows == 0``); padding rows
        never surface (scored −inf via ``ntotal`` masking).

        ``quantize='dims'`` indexes allocate an int8 buffer — half the HBM of
        bf16, which is what fits the full 8.8M-passage MS MARCO corpus on ONE
        v5e core — and require corpus-global per-dim ``scales`` [dim] up
        front; each ``update_slice`` quantizes its slice on device against
        the current scales, and ``set_scales`` re-snapshots them per refresh
        cycle (training drifts embedding magnitudes)."""
        if self.quantize == "rows":
            raise ValueError("update_slice supports quantize='dims' only "
                             "(per-row scales can't fold into the query, and "
                             "the scan path reads them corpus-global)")
        if self.quantize == "dims":
            if scales is None:
                raise ValueError("quantize='dims' allocate() needs per-dim "
                                 "scales [dim] (corpus-global)")
            scales = jnp.asarray(scales, jnp.float32).reshape(dim)
        elif scales is not None:
            raise ValueError("scales only apply to a quantize='dims' index")
        n_shards = self._n_shards()
        per_shard = -(-ntotal // (n_shards * slice_rows)) * slice_rows
        padded = per_shard * n_shards
        self.dim = dim
        self._slice_rows = slice_rows
        buf = jnp.zeros((padded, dim),
                        jnp.int8 if self.quantize == "dims" else self.dtype)
        if self.mesh is not None:
            buf = jax.device_put(
                buf, NamedSharding(self.mesh, P(self.axis, None)))
            if scales is not None:
                scales = jax.device_put(scales, NamedSharding(self.mesh, P()))
        self._emb = buf
        self._scales = scales
        self._ntotal = ntotal
        self._search = None
        self._update = None

    def set_scales(self, scales) -> None:
        """Replace the corpus-global per-dim scales of a quantize='dims'
        index (the refresh loop re-snapshots per cycle: rows written before
        the change keep their int8 codes and decode against the NEW scales
        until their slice is rewritten — a bounded one-cycle mis-scaling,
        strictly milder than the stale-embedding semantics ANCE already
        builds on). No recompile: scales enter search/update jits as args."""
        if self.quantize != "dims":
            raise ValueError("set_scales applies to quantize='dims' only")
        scales = jnp.asarray(scales, jnp.float32).reshape(self.dim)
        if self.mesh is not None:
            scales = jax.device_put(scales, NamedSharding(self.mesh, P()))
        self._scales = scales

    def _build_update(self):
        """Jitted in-place writer: (buf, slice [slice_rows, D], scales, start)
        → buf. The buffer is donated, so XLA updates the HBM segment in place
        — no host round-trip, no full-buffer copy. A quantize='dims' buffer
        quantizes the incoming slice on device against the stored scales."""
        quantized = self.quantize == "dims"

        def cast(sl, scales, dtype):
            if quantized:
                return _quantize_int8(sl, scales[None, :])
            return sl.astype(dtype)

        if self.mesh is None:
            def upd(buf, sl, scales, start):
                return jax.lax.dynamic_update_slice(
                    buf, cast(sl, scales, buf.dtype), (start, 0))
            return jax.jit(upd, donate_argnums=(0,))

        mesh, axis = self.mesh, self.axis
        rows_per_shard = self._emb.shape[0] // mesh.shape[axis]

        def upd_shard(buf_shard, sl, scales, start):
            # the slice is aligned to lie inside exactly one shard; only the
            # owner writes, everyone else passes its shard through untouched
            shard = jax.lax.axis_index(axis)
            owner = start // rows_per_shard
            local = (start - owner * rows_per_shard).astype(jnp.int32)
            return jax.lax.cond(
                owner == shard,
                lambda b: jax.lax.dynamic_update_slice(
                    b, cast(sl, scales, b.dtype), (local, 0)),
                lambda b: b, buf_shard)

        fn = jax.shard_map(upd_shard, mesh=mesh,
                           in_specs=(P(axis, None), P(), P(), P()),
                           out_specs=P(axis, None), check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    def update_slice(self, start: int, emb) -> None:
        """Overwrite rows [start, start + len(emb)) in HBM. ``start`` must be
        ``slice_rows``-aligned; a short final slice is zero-padded (the pad
        lands in rows ≥ ntotal, which never surface)."""
        if getattr(self, "_slice_rows", None) is None:
            raise ValueError("call allocate() before update_slice()")
        sr = self._slice_rows
        if start % sr:
            raise ValueError(f"start {start} not aligned to slice_rows {sr}")
        if not 0 <= start < self._emb.shape[0]:
            # out of range would silently clamp (single-device) or no-op
            # (mesh: no shard owns it) — fail loudly instead
            raise ValueError(f"start {start} outside buffer rows "
                             f"[0, {self._emb.shape[0]})")
        emb = jnp.asarray(emb)
        if emb.shape[0] > sr:
            raise ValueError(f"slice has {emb.shape[0]} rows > {sr}")
        if emb.shape[0] < sr:
            emb = jnp.concatenate(
                [emb, jnp.zeros((sr - emb.shape[0], emb.shape[1]), emb.dtype)])
        if self._update is None:
            self._update = self._build_update()
        scales = self._scales if self._scales is not None \
            else jnp.zeros((emb.shape[1],), jnp.float32)
        self._emb = self._update(self._emb, emb, scales,
                                 jnp.asarray(start, jnp.int32))

    def _topk_fn(self, k: int, max_rows: int):
        """Per-device exact top-k: fused blockmax kernel or scan merge."""
        chunk_rows = min(self.chunk_rows, max_rows)
        if self._use_blockmax():
            from ance_tpu.ops.topk import topk_blockmax

            def fn(queries, emb, scales, valid):
                return topk_blockmax(queries, emb, k=k, valid_rows=valid)
            return fn

        def fn(queries, emb, scales, valid):
            return topk_inner_product(queries, emb, k=k,
                                      chunk_rows=chunk_rows,
                                      valid_rows=valid, row_scales=scales)
        return fn

    def _build_search(self, k: int):
        ntotal = self._ntotal
        mode = self.quantize

        def prep(queries, scales):
            """Per-dim scales fold into the query (score-linear)."""
            if mode == "dims":
                return queries * scales, None
            return queries, scales if mode == "rows" else None

        if self.mesh is None:
            topk = self._topk_fn(k, self._emb.shape[0])

            def search_fn(queries, emb, scales):
                q, row_scales = prep(queries, scales)
                return topk(q, emb, row_scales,
                            jnp.asarray(ntotal, jnp.int32))
            return jax.jit(search_fn)

        mesh, axis = self.mesh, self.axis
        n_shards = mesh.shape[axis]
        rows_per_shard = self._emb.shape[0] // n_shards
        topk = self._topk_fn(k, rows_per_shard)

        def shard_search(queries, emb_shard, scales_shard):
            q, row_scales = prep(queries, scales_shard)
            shard_id = jax.lax.axis_index(axis)
            base = (shard_id * rows_per_shard).astype(jnp.int32)
            # clamp to the shard's own row count: internal chunk/blockmax
            # padding rows in NON-last shards must score −inf too, else they
            # surface as phantom score-0 hits whose offset ids alias other
            # shards' real rows
            valid = jnp.clip(jnp.asarray(ntotal, jnp.int32) - base,
                             0, rows_per_shard)
            s, i = topk(q, emb_shard, row_scales, valid)
            i = jnp.where(i >= 0, i + base, i)
            # gather tiny [Q, k] candidates from every shard, merge locally
            all_s = jax.lax.all_gather(s, axis)           # [S, Q, k]
            all_i = jax.lax.all_gather(i, axis)
            return merge_topk(all_s, all_i, k)

        scales_spec = P(axis) if mode == "rows" else P()
        fn = jax.shard_map(
            shard_search, mesh=mesh,
            in_specs=(P(), P(axis, None), scales_spec),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)

    def search(self, queries, k: int):
        """Top-k IP search. Returns (scores [Q, k] fp32, ids [Q, k] int32);
        ids are −1 only when k exceeds ntotal (parity: FAISS returns −1)."""
        if self._emb is None:
            raise ValueError("index is empty; call add() first")
        if self._search is None:
            self._search = {}
        if k not in self._search:  # cache per k: dev/mining depths alternate
            self._search[k] = self._build_search(k)
        queries = jnp.asarray(queries, jnp.float32 if self.quantize
                              else self.dtype)
        scores, ids = self._search[k](queries, self._emb, self._scales)
        return scores, ids


def knn_inner_product(queries, corpus, k: int, chunk_rows: int = 16384):
    """Index-free exact KNN (reference eval_mrr.py:62-91 ``search_knn``)."""
    q = jnp.asarray(queries, jnp.float32)
    c = jnp.asarray(corpus, jnp.float32)
    return topk_inner_product(q, c, k=k, chunk_rows=min(chunk_rows, c.shape[0]))
