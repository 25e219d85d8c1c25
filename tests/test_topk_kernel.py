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


@pytest.mark.parametrize("p1", [None, "bf16", "int8"])
def test_topk_blockmax_int8_corpus_phase1_variants(p1):
    """int8-quantized corpus through every phase-1 dtype variant (the MXU
    rate lever, VERDICT r3 #4): candidate blocks may be selected at reduced
    precision, but phase 3 rescores in fp32 — on well-separated data all
    variants return the exact top-k of the dequantized int8 corpus."""
    from ance_tpu.index.flat import quantize_dims_int8

    rs = np.random.RandomState(4)
    Q, N, D, k = 13, 256, 16, 10
    q = rs.randn(Q, D).astype(np.float32)
    c = rs.randn(N, D).astype(np.float32)
    c8, scales = quantize_dims_int8(jnp.asarray(c))
    qs = q * np.asarray(scales)[None, :]  # dim scales fold into the query
    dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, None: None}[p1]
    s, i = topk_blockmax(jnp.asarray(qs), c8, k=k, block_size=8,
                         chunk_rows=64, q_tile=8, phase1_dtype=dtype,
                         interpret=True,
                         valid_rows=jnp.asarray(N, jnp.int32))
    # ground truth: exact search over the DEQUANTIZED int8 corpus
    ref_s, ref_i = _np_topk(qs, np.asarray(c8, np.float32), k)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-4, atol=1e-4)


def test_blockmax_scores_int8_native():
    """int8 x int8 operands → int32 block maxima (the native MXU path);
    values must equal the integer matmul exactly."""
    rs = np.random.RandomState(5)
    Q, N, D, BS, CHUNK = 8, 256, 16, 8, 64
    q = rs.randint(-127, 128, (Q, D)).astype(np.int8)
    c = rs.randint(-127, 128, (N, D)).astype(np.int8)
    bm = blockmax_scores(jnp.asarray(q), jnp.asarray(c), block_size=BS,
                         chunk_rows=CHUNK, interpret=True)
    assert bm.dtype == jnp.int32
    ref = (q.astype(np.int32) @ c.astype(np.int32).T
           ).reshape(Q, N // BS, BS).max(-1)
    np.testing.assert_array_equal(np.asarray(bm), ref)
