"""Online retrieval: encoder + HBM-resident index behind one call.

The serving-style capability implied by the reference's ~100× cascade-speedup
claim (reference README.md:16-17) and its (unused) HNSW indexer: embed a
query batch with the frozen encoder and return top-k passage ids from the
device-resident exact index — no host round-trip between the two stages.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ance_tpu.index.flat import FlatIPIndex


def dedup_first_hit(scores: np.ndarray, rows: np.ndarray,
                    embedding2id: np.ndarray, k: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Multi-vector rows → unique passage ids, first (highest-scoring) hit
    per passage, padded with −1 / −inf. Fully vectorized: the previous
    per-row Python loop was O(B·depth) interpreted work per call — fine at
    batch 64, a real tax on the serving hot path at the index's qps.

    ``rows`` is [B, depth] descending by score within each row (the
    index's output order); duplicates of a passage id keep the earliest
    column. Same contract as the reference's rank-time dedup
    (run_ann_data_gen.py:416-423 dedup-by-docid)."""
    B, depth = rows.shape
    pids = np.where(rows >= 0, embedding2id[np.maximum(rows, 0)], -1)
    # stable sort by pid per row: equal pids keep column order, so the
    # first element of each equal-pid run is the best-scoring hit
    order = np.argsort(pids, axis=1, kind="stable")
    sorted_pids = np.take_along_axis(pids, order, axis=1)
    first = np.ones_like(sorted_pids, dtype=bool)
    first[:, 1:] = sorted_pids[:, 1:] != sorted_pids[:, :-1]
    keep_sorted = first & (sorted_pids >= 0)
    keep = np.zeros_like(keep_sorted)
    np.put_along_axis(keep, order, keep_sorted, axis=1)   # back in col order
    rank = np.cumsum(keep, axis=1) - 1                    # 0-based per row
    sel = keep & (rank < k)
    b_idx, _ = np.nonzero(sel)
    out_ids = np.full((B, k), -1, np.int64)
    out_scores = np.full((B, k), -np.inf, np.float32)
    out_ids[b_idx, rank[sel]] = pids[sel]
    out_scores[b_idx, rank[sel]] = scores[sel]
    return out_scores, out_ids


def bucket_pow2(n: int, cap: int) -> int:
    """Next power of two ≥ n, capped — bounds the set of distinct shapes
    (and therefore XLA compiles) a client can force. Every novel static
    dimension costs a multi-second compile under the serving device lock
    and lives forever in the jit cache; bucketing turns an unbounded,
    client-controllable compile surface into ≤ log2(cap) programs."""
    b = 1 << (max(int(n), 1) - 1).bit_length()
    return min(b, cap)


class Retriever:
    """query texts/tokens → (scores, passage ids).

    ``encode_fn(params, ids, mask) → [B, D]`` is the jitted query tower;
    the index holds corpus embeddings (built by the refresh loop or loaded
    from a dump). ``embedding2id`` maps embedding rows → passage ids
    (identity when single-vector; repeated ids under MaxP).
    """

    def __init__(self, encode_fn, params, index: FlatIPIndex,
                 embedding2id: Optional[np.ndarray] = None,
                 tokenizer=None, max_query_length: int = 64):
        self.encode_fn = encode_fn
        self.params = params
        self.index = index
        self.embedding2id = embedding2id
        self.tokenizer = tokenizer
        self.max_query_length = max_query_length

    def _tokenize(self, texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured; pass token arrays")
        from ance_tpu.data.process_fn import encode_padded
        ids, masks = zip(*(encode_padded(self.tokenizer, t,
                                         self.max_query_length)
                           for t in texts))
        return np.stack(ids), np.stack(masks)

    def tokenize_queries(self, texts: Sequence[str]
                         ) -> tuple[np.ndarray, np.ndarray]:
        """Public tokenize step — lets callers (e.g. the HTTP layer) run
        host-side tokenization outside their device serialization."""
        return self._tokenize(texts)

    def embed_queries(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        return self.encode_fn(self.params, jnp.asarray(ids),
                              jnp.asarray(mask))

    def search_tokens(self, ids: np.ndarray, mask: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Token batch → (scores [B, k], passage ids [B, k]). Multi-vector
        rows dedup to unique passage ids (first hit wins), padded with −1.

        The search depth is bucketed to the next power of two: the index
        jit-compiles one program per distinct depth, so raw client ks
        (1..max_k) would let traffic force an unbounded number of
        multi-second compiles under the serving lock. Results are exact
        either way — a deeper exact top-k sliced to k is the top-k."""
        q = self.embed_queries(ids, mask)
        depth = k if self.embedding2id is None else min(
            self.index.ntotal, 4 * k)  # overfetch for multi-vector dedup
        depth = bucket_pow2(depth, self.index.ntotal)
        scores, rows = self.index.search(q, depth)
        scores, rows = np.asarray(scores), np.asarray(rows)
        if self.embedding2id is None:
            return scores[:, :k], rows[:, :k]
        return dedup_first_hit(scores, rows, self.embedding2id, k)

    def search(self, queries: Sequence[str], k: int = 10
               ) -> tuple[np.ndarray, np.ndarray]:
        ids, mask = self._tokenize(queries)
        return self.search_tokens(ids, mask, k)


class LoopRetriever(Retriever):
    """Retriever over a RUNNING :class:`~ance_tpu.train.pipelined.
    PipelinedAnce` — train and serve in ONE program, the index always as
    fresh as the loop's last refresh.

    Queries encode with the loop's CURRENT refresh snapshot (the same
    frozen params the index's slices were encoded with — the encoder/corpus
    consistency ANCE's own dev-eval and mining rely on), searching the live
    HBM-resident index in place. Mid-cycle the index mixes slices from two
    consecutive snapshots; that is exactly the staleness contract ANCE
    training itself accepts (reference README.md:21-24), now exposed to
    serving.

    Concurrency: the loop's ``update_slice`` DONATES the previous index
    buffer, so searches must not overlap a slice write — both sides take
    ``loop.index_lock`` (writes are brief; reads between writes run fully
    concurrent with training via JAX's thread-safe dispatch). When the loop
    runs on a mesh, the query encode is jitted with the batch dim sharded,
    so client batches are padded here to a multiple of the mesh size and
    the padding rows stripped from the results. SINGLE-HOST only: on a
    multi-host mesh a search dispatched from one host's server thread
    would issue collectives the other hosts never join (the CLI refuses
    --http there).
    """

    def __init__(self, loop, query_encode_fn, **kw):
        self._loop = loop
        super().__init__(query_encode_fn, params=None, index=None, **kw)

    def search_tokens(self, ids: np.ndarray, mask: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray]:
        mesh = getattr(self._loop, "mesh", None)
        div = int(mesh.size) if mesh is not None else 1
        B = ids.shape[0]
        pad = (-B) % div
        if pad:
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, 0)], axis=0)
            mask = np.concatenate([mask, np.repeat(mask[:1], pad, 0)],
                                  axis=0)
        with self._loop.index_lock:
            scores, pids = super().search_tokens(ids, mask, k)
        return scores[:B], pids[:B]

    @property
    def params(self):
        return self._loop.snapshot

    @params.setter
    def params(self, value):
        if value is not None:
            raise AttributeError("LoopRetriever params follow the loop "
                                 "snapshot; they cannot be set")

    @property
    def index(self):
        if self._loop.index is None:
            raise RuntimeError("loop index not built yet — bootstrap() "
                               "(or resume past it) before serving")
        return self._loop.index

    @index.setter
    def index(self, value):
        if value is not None:
            raise AttributeError("LoopRetriever serves the loop's live "
                                 "index; it cannot be swapped")
