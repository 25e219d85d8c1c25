"""Native HNSW: recall vs exact search, IP→L2 wrapper semantics."""

import numpy as np
import pytest

try:
    from ance_tpu.index.hnsw import DenseHnswIndexer, HnswIndex
    HAVE_NATIVE = True
except ImportError:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def test_hnsw_l2_recall():
    rs = np.random.RandomState(0)
    base = rs.randn(3000, 24).astype(np.float32)
    queries = rs.randn(40, 24).astype(np.float32)
    index = HnswIndex(dim=24, m=16, ef_construction=100, seed=1)
    index.add(base)
    assert index.ntotal == 3000
    index.set_ef(128)
    k = 10
    _, ids = index.search(queries, k)
    # exact L2 ground truth
    d2 = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(d2, axis=1)[:, :k]
    recall = np.mean([len(set(ids[i]) & set(exact[i])) / k
                      for i in range(len(queries))])
    assert recall >= 0.9, recall


def test_hnsw_returns_sorted_distances():
    rs = np.random.RandomState(1)
    base = rs.randn(500, 8).astype(np.float32)
    index = HnswIndex(dim=8, m=8, ef_construction=64)
    index.add(base)
    dists, ids = index.search(base[:5], 7)
    assert (np.diff(dists, axis=1) >= 0).all()
    # the query point itself must be found at distance ~0
    np.testing.assert_array_equal(ids[:, 0], np.arange(5))


def test_dense_hnsw_indexer_ip_search():
    """IP→L2 conversion: top result by inner product, not by L2."""
    rs = np.random.RandomState(2)
    vecs = rs.randn(2000, 16).astype(np.float32)
    # give some vectors big norms — IP favorites that L2-NN would miss
    vecs[:50] *= 3.0
    db_ids = [f"doc{i}" for i in range(len(vecs))]
    indexer = DenseHnswIndexer(vector_sz=16, ef_search=256,
                               ef_construction=200)
    indexer.index_data(db_ids, vecs)
    queries = rs.randn(20, 16).astype(np.float32)
    results = indexer.search_knn(queries, top_docs=10)
    exact = np.argsort(-(queries @ vecs.T), axis=1)[:, :10]
    hits = 0
    for qi, (got_ids, _) in enumerate(results):
        want = {f"doc{j}" for j in exact[qi]}
        hits += len(set(got_ids) & want)
    assert hits / (20 * 10) >= 0.85

    with pytest.raises(RuntimeError):
        indexer.index_data(db_ids, vecs)  # one-shot indexing enforced
