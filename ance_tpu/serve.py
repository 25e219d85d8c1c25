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

    def embed_queries(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        return self.encode_fn(self.params, jnp.asarray(ids),
                              jnp.asarray(mask))

    def search_tokens(self, ids: np.ndarray, mask: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Token batch → (scores [B, k], passage ids [B, k]). Multi-vector
        rows dedup to unique passage ids (first hit wins), padded with −1."""
        q = self.embed_queries(ids, mask)
        depth = k if self.embedding2id is None else min(
            self.index.ntotal, 4 * k)  # overfetch for multi-vector dedup
        scores, rows = self.index.search(q, depth)
        scores, rows = np.asarray(scores), np.asarray(rows)
        if self.embedding2id is None:
            return scores[:, :k], rows[:, :k]
        out_ids = np.full((rows.shape[0], k), -1, np.int64)
        out_scores = np.full((rows.shape[0], k), -np.inf, np.float32)
        for b in range(rows.shape[0]):
            seen: set[int] = set()
            j = 0
            for col, r in enumerate(rows[b]):
                if r < 0:
                    continue
                pid = int(self.embedding2id[r])
                if pid in seen:
                    continue
                seen.add(pid)
                out_ids[b, j] = pid
                out_scores[b, j] = scores[b, col]
                j += 1
                if j >= k:
                    break
        return out_scores, out_ids

    def search(self, queries: Sequence[str], k: int = 10
               ) -> tuple[np.ndarray, np.ndarray]:
        ids, mask = self._tokenize(queries)
        return self.search_tokens(ids, mask, k)
