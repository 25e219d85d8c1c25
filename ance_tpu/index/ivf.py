"""IVF (inverted-file) approximate inner-product index — TPU-native.

The reference ships an (unused-by-drivers) approximate index for
serving-style ANN: FAISS ``IndexHNSWFlat`` behind ``DenseHNSWFlatIndexer``
(reference utils/dpr_utils.py:164-228).  HNSW is a pointer-chasing graph —
the worst possible shape for a TPU (serial dependent loads, no batching, no
MXU).  The TPU-native answer to the same capability is IVF: cluster the
corpus once, then answer a query by scoring it against the centroids and
exhaustively searching only the ``nprobe`` nearest clusters.  Every stage is
a batched matmul or a bounded gather, so it runs entirely on device:

  * **train** — spherical k-means (Lloyd) on device: assignment is one
    [N, nlist] matmul per iteration, the update a ``segment_sum``.
  * **layout** — clusters are packed into a static ``[nlist, capacity, D]``
    tensor (ids ``[nlist, capacity]``, −1-padded).  Assignment is
    capacity-constrained (host-side greedy spill to the next-nearest
    centroid with space), so memory is ``slack × N`` rows regardless of how
    unbalanced k-means came out, and no row is ever dropped.
  * **search** — union-probe: [Q, nlist] centroid scores → the UNION of all
    queries' top-``nprobe`` clusters (one static-size set for the batch) →
    those bins stream through dense [Q, chunk·capacity] matmuls with a
    running top-k.  Queries share every gathered byte and the score step is
    MXU-shaped.  The honest physics of batched IVF on dense hardware:
    probing saves compute only while ``union ≤ Q·nprobe < nlist``, so the
    selectivity win is largest for small/medium or correlated query batches
    (per-query-gather IVF measured SLOWER than exact blockmax at 1M×768 —
    see ``_ivf_core``).

Approximation contract: recall depends on the corpus actually clustering
(LayerNorm'd encoder embeddings do; isotropic random vectors do not — see
tests).  The exact index (``flat.FlatIPIndex``) remains the parity surface
for mining/eval; IVF is the beyond-parity serving option, selected in the
CLI with ``serve --index ivf``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ance_tpu.index.flat import NEG_INF, merge_topk


@functools.partial(jax.jit, static_argnames=("nlist", "iters"))
def _kmeans(sample: jax.Array, init: jax.Array, *, nlist: int, iters: int):
    """Spherical k-means: unit centroids, assignment by inner product.
    Returns centroids [nlist, D] fp32 (unit rows)."""
    x = sample.astype(jnp.float32)

    def normalize(c):
        return c / jnp.maximum(jnp.linalg.norm(c, axis=1, keepdims=True),
                               1e-12)

    def step(c, _):
        assign = jnp.argmax(x @ c.T, axis=1)                 # [N]
        sums = jax.ops.segment_sum(x, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32),
                                     assign, num_segments=nlist)
        # empty clusters keep their previous centroid instead of collapsing
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), c)
        return normalize(new), None

    c, _ = jax.lax.scan(step, normalize(init), None, length=iters)
    return c


def _pack_bins_from(best: np.ndarray, best_score: np.ndarray,
                    capacity: int, nlist: int, spill_order_fn
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Capacity-constrained assignment: every row goes to its best-scoring
    centroid with space; rows that overflow a full cluster spill to their
    next-nearest.  Returns (bin_ids [nlist, capacity] row indices, −1-padded;
    counts [nlist]).  No row is dropped (total capacity ≥ N is the caller's
    ``slack`` guarantee).

    Only ``best``/``best_score`` [N] are needed up front — O(N·nlist) score
    material is computed lazily by ``spill_order_fn(rows) → [S, nlist]
    preference order`` for the (usually few) overflow rows."""
    n = len(best)
    # rows grouped by cluster, strongest first within each cluster
    by_cluster = np.lexsort((-best_score, best))
    counts = np.bincount(best, minlength=nlist)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    bins = np.full((nlist, capacity), -1, np.int64)
    spilled = []
    for c in np.nonzero(counts)[0]:
        members = by_cluster[starts[c]:starts[c] + counts[c]]
        keep = members[:capacity]
        bins[c, :len(keep)] = keep
        spilled.extend(members[capacity:])
    counts = np.minimum(counts, capacity)
    if spilled:
        spilled = np.asarray(spilled)
        order = spill_order_fn(spilled)
        for i in np.argsort(-best_score[spilled]):
            for c in order[i]:
                if counts[c] < capacity:
                    bins[c, counts[c]] = spilled[i]
                    counts[c] += 1
                    break
            else:  # pragma: no cover - caller guarantees capacity ≥ N
                raise RuntimeError("total bin capacity exhausted")
    return bins, counts


@jax.jit
def _assign_reduce(emb, centroids):
    s = emb @ centroids.T
    return jnp.argmax(s, axis=1), jnp.max(s, axis=1)


@jax.jit
def _argsort_desc(emb, centroids):
    return jnp.argsort(-(emb @ centroids.T), axis=1)


def _pack_bins(assign_scores: np.ndarray, capacity: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Small-N convenience wrapper over ``_pack_bins_from`` taking the full
    [N, nlist] score matrix (tests / tiny corpora)."""
    best = np.argmax(assign_scores, axis=1)
    best_score = assign_scores[np.arange(len(best)), best]
    return _pack_bins_from(
        best, best_score, capacity, assign_scores.shape[1],
        lambda rows: np.argsort(assign_scores[rows], axis=1)[:, ::-1])


def _ivf_core(queries, centroids, bins_emb, bins_ids, valid_clusters, *,
              k: int, nprobe: int, union: int, cluster_chunk: int = 64):
    """queries [Q, D] → (scores [Q, k] fp32, ids [Q, k] int32 global, −1 pad).

    Union-probe batch IVF — the MXU-shaped formulation.  Per-query bin
    gathers (one [cap, D] DMA per query per probe) are bandwidth-bound and
    degrade the score step to batched matvecs, which measured SLOWER than
    exact blockmax search at 1M×768.  Instead the whole batch shares one
    probe set: the union of every query's top-``nprobe`` clusters (padded
    with next-best clusters to the static size ``union``), gathered once
    and streamed through dense [Q, cluster_chunk·cap] matmuls with a
    running top-k.  Every query scores every unioned cluster, so per-query
    recall is ≥ classic per-query IVF at equal nprobe; the honest physics
    is that selectivity trades against batch amortization — probing saves
    compute only while ``union`` (≤ Q·nprobe) < nlist.

    Cluster rows at index ≥ ``valid_clusters`` (shard padding) are never
    selected.  Pure traced logic: callable directly under ``shard_map``.
    """
    Q, D = queries.shape
    nlist, cap = bins_ids.shape
    qf = queries.astype(jnp.float32)
    # score at storage precision with fp32 accumulation; int8 bins (dim
    # scales folded into the query by the caller) upcast in-register — the
    # gather DMA, IVF's bottleneck, stays at half the bytes
    int8_bins = bins_emb.dtype == jnp.int8
    qdtype = jnp.float32 if int8_bins else bins_emb.dtype
    cluster_ok = jnp.arange(nlist, dtype=jnp.int32) < valid_clusters

    cscores = qf @ centroids.T.astype(jnp.float32)           # [Q, nlist]
    cscores = jnp.where(cluster_ok[None, :], cscores, NEG_INF)
    _, probe = jax.lax.top_k(cscores, min(nprobe, nlist))    # [Q, nprobe]
    probed = jnp.zeros((nlist,), jnp.float32).at[probe.reshape(-1)].add(1.0)
    # every probed cluster first (counts ≤ Q·nprobe ≤ union by the caller),
    # then the globally strongest unprobed ones fill the static size
    priority = jnp.where(probed > 0, 1e9, 0.0) + jnp.max(cscores, axis=0)
    priority = jnp.where(cluster_ok, priority, NEG_INF)
    _, sel = jax.lax.top_k(priority, union)                  # [union]

    n_chunks = -(-union // cluster_chunk)
    pad = n_chunks * cluster_chunk - union
    # padding repeats already-selected clusters; their scores are masked so
    # duplicate candidates cannot surface
    sel_p = jnp.concatenate([sel, jnp.zeros((pad,), sel.dtype)]) if pad \
        else sel
    col_valid = jnp.arange(n_chunks * cluster_chunk) < union
    sel_chunks = sel_p.reshape(n_chunks, cluster_chunk)
    valid_chunks = col_valid.reshape(n_chunks, cluster_chunk)
    qe = qf.astype(qdtype)

    def body(carry, chunk):
        best_s, best_i = carry
        sel_c, ok_c = chunk
        emb = bins_emb[sel_c].reshape(cluster_chunk * cap, D)
        if int8_bins:
            emb = emb.astype(qdtype)
        ids = bins_ids[sel_c]                                # [cc, cap]
        ids = jnp.where(ok_c[:, None], ids, -1).reshape(-1)
        s = jax.lax.dot_general(                             # [Q, cc·cap]
            qe, emb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = jnp.where(ids[None, :] >= 0, s, NEG_INF)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(ids[None, :],
                                                          s.shape)], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        return (new_s, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (jnp.full((Q, k), NEG_INF, jnp.float32),
            jnp.full((Q, k), -1, jnp.int32))
    (scores, ids), _ = jax.lax.scan(body, init, (sel_chunks, valid_chunks))
    ids = jnp.where(scores > NEG_INF / 2, ids, -1)
    return scores, ids


_ivf_search = jax.jit(_ivf_core,
                      static_argnames=("k", "nprobe", "union",
                                       "cluster_chunk"))


class IVFIPIndex:
    """Approximate inner-product index: k-means clusters + probed search.

    Drop-in for ``FlatIPIndex`` where approximation is acceptable (serving);
    same ``search(queries, k) → (scores, ids)`` contract, −1-padded ids.

    ``nlist``: number of clusters (√N is a good default, set by ``add`` when
    None).  ``nprobe``: clusters searched per query — the recall/speed knob.
    ``slack``: total bin capacity as a multiple of N; rows that overflow a
    full cluster spill to their next-nearest centroid, so higher slack means
    fewer displaced rows (better recall at equal nprobe), more HBM.

    Pass ``mesh`` (+ ``axis``) to shard CLUSTERS across devices: each shard
    keeps 1/S of the bins in HBM, probes the top ``ceil(nprobe/S)`` of its
    own clusters, and only [Q, k] candidate sets cross the ICI
    (``all_gather`` + merge) — memory and probe compute both scale with the
    mesh.
    """

    def __init__(self, dim: int, nlist: Optional[int] = None,
                 nprobe: int = 8, dtype=jnp.bfloat16, *,
                 mesh: Optional[Mesh] = None, axis: str = "data",
                 quantize=False, slack: float = 1.3, kmeans_iters: int = 10,
                 train_sample: int = 262_144, seed: int = 0):
        """``quantize="dims"`` stores bins int8 with per-DIMENSION scales:
        the scales fold into the query (q′ = q·s) and out of the search
        centroids (c′ = c/s), so scoring is unchanged while the bin gather
        — IVF's bandwidth bottleneck — moves half the bytes."""
        self.dim = dim
        self.nlist = nlist
        self.nprobe = nprobe
        self.dtype = dtype
        self.mesh = mesh
        self.axis = axis
        self.quantize = "dims" if quantize is True else (quantize or None)
        if self.quantize not in (None, "dims"):
            raise ValueError(f"quantize must be False/'dims' (per-row scales "
                             f"cannot fold into the query), got {quantize!r}")
        self.slack = slack
        self.kmeans_iters = kmeans_iters
        self.train_sample = train_sample
        self.seed = seed
        self.centroids: Optional[jax.Array] = None
        self._dim_scales: Optional[np.ndarray] = None
        self._bins_emb: Optional[jax.Array] = None
        self._bins_ids: Optional[jax.Array] = None
        self._ntotal = 0
        self._pinned = False  # True after an explicit train() call
        self._search_cache: dict = {}

    def _n_shards(self) -> int:
        return self.mesh.shape[self.axis] if self.mesh is not None else 1

    @property
    def ntotal(self) -> int:
        return self._ntotal

    @property
    def capacity(self) -> Optional[int]:
        return None if self._bins_ids is None else self._bins_ids.shape[1]

    def train(self, sample) -> None:
        """Fit centroids with spherical k-means on (a subsample of) the
        corpus, and PIN them: subsequent ``add`` calls reuse these centroids
        (for an explicitly shared clustering across rebuilds).  Without an
        explicit ``train``, every ``add`` refits on the data it is given, so
        refreshed embeddings are never clustered by a stale distribution."""
        self._fit(sample)
        self._pinned = True

    def _fit(self, sample) -> None:
        sample = np.asarray(sample, np.float32)
        if self.nlist is None:
            self.nlist = max(1, int(round(np.sqrt(len(sample)))))
        if len(sample) > self.train_sample:
            rs = np.random.RandomState(self.seed)
            sample = sample[rs.choice(len(sample), self.train_sample,
                                      replace=False)]
        if len(sample) < self.nlist:
            raise ValueError(f"training sample ({len(sample)} rows) smaller "
                             f"than nlist={self.nlist}")
        rs = np.random.RandomState(self.seed + 1)
        init = sample[rs.choice(len(sample), self.nlist, replace=False)]
        self.centroids = _kmeans(jnp.asarray(sample), jnp.asarray(init),
                                 nlist=self.nlist, iters=self.kmeans_iters)

    _ASSIGN_CHUNK = 65_536  # [chunk, nlist] score material per dispatch

    def _assign_chunk(self, emb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(argmax, max) over centroids for a row chunk — reduced ON DEVICE
        so only [chunk]-sized vectors cross the (slow, tunneled) host link,
        never the [chunk, nlist] score matrix."""
        best, score = _assign_reduce(jnp.asarray(emb), self.centroids)
        return np.asarray(best), np.asarray(score)

    def _spill_order_chunk(self, emb: np.ndarray) -> np.ndarray:
        return np.asarray(
            _argsort_desc(jnp.asarray(emb), self.centroids))

    def add(self, embeddings) -> None:
        """(Re)build the packed bins from the full corpus.  Refits centroids
        unless they were pinned by an explicit ``train``.  Device memory is
        bounded: assignment streams the corpus in ``_ASSIGN_CHUNK``-row
        chunks, so the [N, nlist] score matrix is never materialized (host
        peak is the packed fp32 bins, ≈ slack·N·D·4 bytes)."""
        emb = np.asarray(embeddings, np.float32)
        if self.centroids is None or not self._pinned:
            self._fit(emb)
        n = len(emb)
        cap = max(1, int(np.ceil(self.slack * n / self.nlist)))
        best = np.empty(n, np.int64)
        best_score = np.empty(n, np.float32)
        for s in range(0, n, self._ASSIGN_CHUNK):
            b, sc = self._assign_chunk(emb[s:s + self._ASSIGN_CHUNK])
            best[s:s + len(b)] = b
            best_score[s:s + len(b)] = sc

        def spill_order(rows):
            parts = [self._spill_order_chunk(emb[rows[s:s + self._ASSIGN_CHUNK]])
                     for s in range(0, len(rows), self._ASSIGN_CHUNK)]
            return np.concatenate(parts, axis=0)

        bins, _ = _pack_bins_from(best, best_score, cap, self.nlist,
                                  spill_order)
        valid = bins >= 0
        if self.quantize == "dims":
            # quantize the corpus once, pack int8 rows directly — the
            # packed buffer is then slack·N·D bytes, not 4× that in fp32.
            # Host-chunked (not flat.quantize_dims_int8, which is jnp and
            # would put the full fp32 corpus on device): same max-abs/127
            # per-dim scales, semantics covered by the exhaustive-probe
            # parity test.
            scales = np.zeros(self.dim, np.float32)
            for s in range(0, n, self._ASSIGN_CHUNK):
                chunk = emb[s:s + self._ASSIGN_CHUNK]
                np.maximum(scales, np.abs(chunk).max(axis=0), out=scales)
            scales = np.maximum(scales, 1e-12) / 127.0
            q_emb = np.empty((n, self.dim), np.int8)
            for s in range(0, n, self._ASSIGN_CHUNK):
                chunk = emb[s:s + self._ASSIGN_CHUNK]
                q_emb[s:s + len(chunk)] = np.clip(
                    np.round(chunk / scales[None, :]), -127, 127)
            packed = np.zeros((self.nlist, cap, self.dim), np.int8)
            packed[valid] = q_emb[bins[valid]]
            self._dim_scales = scales.astype(np.float32)
            # centroid scoring must see the same folded query space:
            # c′ = c/s so that c′·(q·s) = c·q
            centroids = self.centroids / jnp.asarray(scales)
        else:
            packed = np.zeros((self.nlist, cap, self.dim), np.float32)
            packed[valid] = emb[bins[valid]]
            self._dim_scales = None
            centroids = self.centroids

        self._publish(packed, bins, centroids, n)

    def _publish(self, packed: np.ndarray, bins: np.ndarray, centroids,
                 n: int) -> None:
        """Pad clusters to the shard count, move bins/ids/centroids to
        device(s), and make them searchable (shared by add() and load())."""
        cap = packed.shape[1]
        n_shards = self._n_shards()
        pad_clusters = (-self.nlist) % n_shards
        if pad_clusters:  # empty clusters on the last shard, never probed
            packed = np.concatenate(
                [packed, np.zeros((pad_clusters, cap, self.dim),
                                  packed.dtype)])
            bins = np.concatenate(
                [bins, np.full((pad_clusters, cap), -1, np.int64)])
            centroids = jnp.concatenate(
                [centroids, jnp.zeros((pad_clusters, centroids.shape[1]),
                                      centroids.dtype)])
        bins_emb = jnp.asarray(packed) if self.quantize \
            else jnp.asarray(packed, self.dtype)
        bins_ids = jnp.asarray(bins, jnp.int32)
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(self.axis, None, None))
            bins_emb = jax.device_put(bins_emb, shard)
            bins_ids = jax.device_put(
                bins_ids, NamedSharding(self.mesh, P(self.axis, None)))
            centroids = jax.device_put(
                centroids, NamedSharding(self.mesh, P(self.axis, None)))
        self._bins_emb = bins_emb
        self._bins_ids = bins_ids
        self._search_centroids = centroids
        self._ntotal = n
        self._search_cache = {}

    def save(self, path: str) -> None:
        """Persist bins + centroids + scales (the k-means fit and the packed
        layout are the expensive parts of an IVF build — a reload skips
        both). Cluster padding is stripped; load() re-pads for its mesh."""
        if self._bins_emb is None:
            raise ValueError("index is empty; nothing to save")
        nl = self.nlist
        bins_emb = np.asarray(jax.device_get(self._bins_emb))[:nl]
        dtype_name = bins_emb.dtype.name
        if dtype_name == "bfloat16":  # np.savez can't round-trip ml_dtypes
            bins_emb = bins_emb.view(np.uint16)
        np.savez(path, bins_emb=bins_emb,
                 dtype_name=np.asarray(dtype_name),
                 bins_ids=np.asarray(jax.device_get(self._bins_ids))[:nl],
                 centroids=np.asarray(jax.device_get(self.centroids)),
                 dim_scales=(self._dim_scales if self._dim_scales is not None
                             else np.zeros(0)),
                 ntotal=np.asarray(self._ntotal),
                 nprobe=np.asarray(self.nprobe))

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None,
             axis: str = "data", nprobe: Optional[int] = None
             ) -> "IVFIPIndex":
        """Rebuild a saved IVF index, re-sharding clusters for ``mesh``.
        Centroids load pinned (add() after load reuses the clustering)."""
        with np.load(path if str(path).endswith(".npz") else f"{path}.npz",
                     allow_pickle=False) as z:
            bins_emb, bins_ids = z["bins_emb"], z["bins_ids"]
            centroids, scales = z["centroids"], z["dim_scales"]
            ntotal, saved_nprobe = int(z["ntotal"]), int(z["nprobe"])
            if str(z["dtype_name"]) == "bfloat16":
                bins_emb = bins_emb.view(jnp.bfloat16)
        quantize = "dims" if bins_emb.dtype == np.int8 else False
        idx = cls(dim=bins_emb.shape[2], nlist=bins_emb.shape[0],
                  nprobe=nprobe if nprobe is not None else saved_nprobe,
                  dtype=(jnp.float32 if quantize else bins_emb.dtype),
                  mesh=mesh, axis=axis, quantize=quantize)
        idx.centroids = jnp.asarray(centroids)
        idx._pinned = True
        if quantize:
            idx._dim_scales = scales.astype(np.float32)
            folded = idx.centroids / jnp.asarray(idx._dim_scales)
        else:
            folded = idx.centroids
        idx._publish(bins_emb, bins_ids.astype(np.int64), folded, ntotal)
        return idx

    def reset(self) -> None:
        self._bins_emb = self._bins_ids = None
        self._ntotal = 0
        self._search_cache = {}

    def _cluster_chunk_for(self, union: int) -> int:
        """Stream width: ~16k score columns per scan step (the flat
        index's chunk_rows target)."""
        return min(max(1, 16384 // self._bins_ids.shape[1]), union)

    def _build_sharded_search(self, k: int, nprobe: int, n_queries: int,
                              union: Optional[int]):
        """Cluster-sharded probe: each shard union-probes the top
        ``ceil(nprobe / n_shards)`` of ITS OWN clusters and the tiny [Q, k]
        candidate sets merge via all_gather — the standard distributed-IVF
        approximation (per-shard probing covers ≥ the global top clusters
        when cluster→shard placement is uncorrelated with query load).
        Memory AND probe compute scale with the mesh."""
        mesh, axis = self.mesh, self.axis
        n_shards = mesh.shape[axis]
        per_shard = self._bins_ids.shape[0] // n_shards
        nprobe_local = min(-(-nprobe // n_shards), per_shard)
        union_local = min(per_shard,
                          union or n_queries * nprobe_local)
        nlist = self.nlist
        cluster_chunk = self._cluster_chunk_for(union_local)

        def shard_fn(queries, cents, bins_emb, bins_ids):
            shard = jax.lax.axis_index(axis)
            # clusters beyond nlist are shard padding — never probe them
            valid = jnp.clip(nlist - shard * per_shard, 0, per_shard)
            s, i = _ivf_core(queries, cents, bins_emb, bins_ids, valid,
                             k=k, nprobe=nprobe_local, union=union_local,
                             cluster_chunk=cluster_chunk)
            all_s = jax.lax.all_gather(s, axis)              # [S, Q, k]
            all_i = jax.lax.all_gather(i, axis)
            return merge_topk(all_s, all_i, k)

        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis, None, None),
                      P(axis, None)),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)

    def search(self, queries, k: int, nprobe: Optional[int] = None,
               union: Optional[int] = None):
        """``union`` (default ``min(nlist, Q·nprobe)``, per shard on a
        mesh) caps the shared probe set; smaller values trade recall for
        compute on large batches (see ``_ivf_core``).  Result slots beyond
        the probed candidates come back as (−inf, −1), the FAISS
        convention."""
        if self._bins_emb is None:
            raise ValueError("index is empty; call add() first")
        nprobe = min(nprobe or self.nprobe, self.nlist)
        q = jnp.asarray(queries, jnp.float32)
        if self._dim_scales is not None:  # fold int8 dim scales in
            q = q * jnp.asarray(self._dim_scales)
        if self.mesh is not None:
            key = (k, nprobe, q.shape[0], union)
            if key not in self._search_cache:
                self._search_cache[key] = self._build_sharded_search(*key)
            return self._search_cache[key](
                q, self._search_centroids, self._bins_emb, self._bins_ids)
        union = min(union or q.shape[0] * nprobe, self.nlist)
        return _ivf_search(
            q, self._search_centroids, self._bins_emb, self._bins_ids,
            jnp.asarray(self.nlist, jnp.int32),
            k=k, nprobe=nprobe, union=union,
            cluster_chunk=self._cluster_chunk_for(union))

    def recall_against_exact(self, queries, k: int,
                             exact_ids: np.ndarray) -> float:
        """Fraction of the exact top-k retrieved (diagnostic). −1 padding
        rows (present in both IVF results and short exact rows) are excluded
        from both sets and from the denominator."""
        _, ids = self.search(queries, k)
        ids = np.asarray(ids)
        hits = denom = 0
        for i in range(len(ids)):
            exact = set(x for x in exact_ids[i].tolist() if x >= 0)
            got = set(x for x in ids[i].tolist() if x >= 0)
            hits += len(got & exact)
            denom += len(exact)
        return hits / float(denom) if denom else 0.0
