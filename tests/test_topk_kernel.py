"""Fused block-max top-k: exactness vs numpy exhaustive search
(interpret mode on CPU; TPU path exercised by the index benchmark)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ance_tpu.ops.topk import blockmax_scores, topk_blockmax


def _np_topk(queries, corpus, k):
    scores = queries @ corpus.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_blockmax_scores_kernel():
    rs = np.random.RandomState(0)
    Q, N, D, BS, CHUNK = 8, 256, 16, 8, 64
    q = rs.randn(Q, D).astype(np.float32)
    c = rs.randn(N, D).astype(np.float32)
    bm = blockmax_scores(jnp.asarray(q), jnp.asarray(c), block_size=BS,
                         chunk_rows=CHUNK, interpret=True)
    ref = (q @ c.T).reshape(Q, N // BS, BS).max(-1)
    np.testing.assert_allclose(np.asarray(bm), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,k", [(256, 10), (250, 25), (300, 7)])
def test_topk_blockmax_exact(n, k):
    rs = np.random.RandomState(1)
    Q, D = 13, 16
    q = rs.randn(Q, D).astype(np.float32)
    c = rs.randn(n, D).astype(np.float32)
    s, i = topk_blockmax(jnp.asarray(q), jnp.asarray(c), k=k, block_size=8,
                         chunk_rows=64, q_tile=8, interpret=True,
                         valid_rows=jnp.asarray(n, jnp.int32))
    ref_s, ref_i = _np_topk(q, c, k)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)


def test_topk_blockmax_all_negative_scores_with_padding():
    """Padded rows score 0 which would beat all-negative real scores unless
    masked — the guard under test."""
    rs = np.random.RandomState(2)
    Q, D, N = 4, 8, 100  # pads to 128 with chunk 64
    q = rs.rand(Q, D).astype(np.float32)
    c = (-rs.rand(N, D)).astype(np.float32)  # all IPs negative
    s, i = topk_blockmax(jnp.asarray(q), jnp.asarray(c), k=5, block_size=8,
                         chunk_rows=64, q_tile=8, interpret=True,
                         valid_rows=jnp.asarray(N, jnp.int32))
    ref_s, ref_i = _np_topk(q, c, 5)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    assert (np.asarray(s) < 0).all()


def test_topk_blockmax_k_exceeds_candidates():
    rs = np.random.RandomState(3)
    q = rs.randn(3, 8).astype(np.float32)
    c = rs.randn(16, 8).astype(np.float32)
    # k=12 but only 2 blocks exist (16/8) → k_blocks=2, candidates=16 ≥ k ✓
    s, i = topk_blockmax(jnp.asarray(q), jnp.asarray(c), k=12, block_size=8,
                         chunk_rows=16, q_tile=8, interpret=True)
    ref_s, ref_i = _np_topk(q, c, 12)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
