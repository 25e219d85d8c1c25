"""Online Retriever: tokenize → embed → search, multi-vector dedup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.serve import Retriever


class IdentityEncoder:
    """Test double: 'embedding' = one-hot of the first real token id."""

    def __call__(self, params, ids, mask):
        return jax.nn.one_hot(ids[:, 1], 8)


def test_search_tokens_single_vector():
    corpus = np.eye(8, dtype=np.float32)
    index = FlatIPIndex(dim=8, method="scan")
    index.add(corpus)
    r = Retriever(IdentityEncoder(), params=None, index=index)
    ids = np.zeros((2, 4), np.int32)
    ids[0, 1], ids[1, 1] = 3, 5
    mask = np.ones_like(ids)
    scores, pids = r.search_tokens(ids, mask, k=2)
    assert pids[0, 0] == 3 and pids[1, 0] == 5
    assert scores[0, 0] == pytest.approx(1.0)


def test_search_tokens_multivector_dedup():
    # rows 0,1 → pid 100; rows 2..7 → pids 200..
    corpus = np.eye(8, dtype=np.float32)
    emb2id = np.array([100, 100, 200, 201, 202, 203, 204, 205])
    index = FlatIPIndex(dim=8, method="scan")
    index.add(corpus)
    r = Retriever(IdentityEncoder(), None, index, embedding2id=emb2id)
    ids = np.zeros((1, 4), np.int32)
    ids[0, 1] = 0  # best rows 0 then others
    mask = np.ones_like(ids)
    scores, pids = r.search_tokens(ids, mask, k=3)
    assert pids[0, 0] == 100
    assert len(set(pids[0].tolist())) == 3  # deduped


def test_search_with_tokenizer():
    class Tok:
        pad_token_id = 0

        def encode(self, text, add_special_tokens=True, max_length=None):
            return [2, 3 if "cat" in text else 5][:max_length]

    corpus = np.eye(8, dtype=np.float32)
    index = FlatIPIndex(dim=8, method="scan")
    index.add(corpus)
    r = Retriever(IdentityEncoder(), None, index, tokenizer=Tok(),
                  max_query_length=4)
    _, pids = r.search(["a cat", "a dog"], k=1)
    assert pids[0, 0] == 3 and pids[1, 0] == 5


def test_dedup_first_hit_matches_reference_loop():
    """The vectorized dedup must equal a straightforward per-row loop
    (the pre-round-4 implementation) on adversarial input: duplicates,
    -1 padding rows, rows with fewer than k unique pids."""
    from ance_tpu.serve import dedup_first_hit

    rs = np.random.RandomState(11)
    B, depth, k, n_emb = 17, 40, 10, 30
    embedding2id = rs.randint(0, 8, n_emb).astype(np.int64)  # heavy dups
    rows = rs.randint(-1, n_emb, (B, depth)).astype(np.int32)
    rows[3] = -1                      # all-padding row
    rows[5, ::2] = rows[5, 1]         # extra duplication
    scores = -np.sort(-rs.randn(B, depth).astype(np.float32), axis=1)

    def loop_reference(scores, rows, e2id, k):
        out_ids = np.full((rows.shape[0], k), -1, np.int64)
        out_scores = np.full((rows.shape[0], k), -np.inf, np.float32)
        for b in range(rows.shape[0]):
            seen, j = set(), 0
            for col, r in enumerate(rows[b]):
                if r < 0:
                    continue
                pid = int(e2id[r])
                if pid in seen:
                    continue
                seen.add(pid)
                out_ids[b, j] = pid
                out_scores[b, j] = scores[b, col]
                j += 1
                if j >= k:
                    break
        return out_scores, out_ids

    want_s, want_i = loop_reference(scores, rows, embedding2id, k)
    got_s, got_i = dedup_first_hit(scores, rows, embedding2id, k)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_s, want_s)
