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
