"""IVF approximate index: packing invariants, recall on clustered data,
search contract parity with the exact index (−1 padding, id mapping)."""

import numpy as np
import pytest

from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.index.ivf import IVFIPIndex, _pack_bins


def _clustered_corpus(rs, n_clusters=32, per_cluster=64, dim=32, spread=0.15):
    centers = rs.randn(n_clusters, dim).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = np.repeat(centers, per_cluster, axis=0)
    rows += spread * rs.randn(*rows.shape).astype(np.float32)
    return rows


def test_pack_bins_keeps_every_row():
    rs = np.random.RandomState(0)
    scores = rs.randn(200, 8).astype(np.float32)
    bins, counts = _pack_bins(scores, capacity=40)  # 8*40=320 ≥ 200
    flat = bins[bins >= 0]
    assert len(flat) == 200 and len(set(flat.tolist())) == 200
    assert counts.sum() == 200 and counts.max() <= 40


def test_pack_bins_spills_strongest_stay():
    # every row prefers cluster 0; capacity forces all but 3 to spill to
    # their second choice, and the 3 that stay are the highest scoring
    scores = np.zeros((6, 2), np.float32)
    scores[:, 0] = [5, 4, 3, 2, 1, 0]
    scores[:, 1] = -1
    bins, counts = _pack_bins(scores, capacity=3)
    assert sorted(bins[0].tolist()) == [0, 1, 2]
    assert sorted(b for b in bins[1].tolist() if b >= 0) == [3, 4, 5]


def test_ivf_recall_on_clustered_corpus():
    rs = np.random.RandomState(1)
    corpus = _clustered_corpus(rs)
    queries = corpus[rs.choice(len(corpus), 64, replace=False)] \
        + 0.05 * rs.randn(64, corpus.shape[1]).astype(np.float32)

    exact = FlatIPIndex(dim=corpus.shape[1])
    exact.add(corpus)
    _, exact_ids = exact.search(queries, k=10)

    import jax.numpy as jnp
    ivf = IVFIPIndex(dim=corpus.shape[1], nlist=32, nprobe=8,
                     kmeans_iters=15, seed=0, dtype=jnp.float32)
    ivf.add(corpus)
    recall = ivf.recall_against_exact(queries, 10, np.asarray(exact_ids))
    assert recall >= 0.9, f"recall@10 {recall}"

    # widest probe = exact search (every cluster scanned; fp32 storage so
    # ranks match the fp32 exact index bit-for-bit)
    _, ids_full = ivf.search(queries, k=10, nprobe=32)
    assert np.mean([len(set(np.asarray(ids_full)[i]) & set(
        np.asarray(exact_ids)[i])) for i in range(64)]) == 10.0


def test_ivf_search_contract():
    rs = np.random.RandomState(2)
    corpus = _clustered_corpus(rs, n_clusters=4, per_cluster=8, dim=16)
    ivf = IVFIPIndex(dim=16, nlist=4, nprobe=1, slack=2.0, seed=3)
    ivf.add(corpus)
    assert ivf.ntotal == 32

    q = corpus[:5]
    scores, ids = ivf.search(q, k=50)  # k exceeds probed rows → −1 pad
    assert scores.shape == (5, 50) and ids.shape == (5, 50)
    ids = np.asarray(ids)
    valid = ids >= 0
    assert valid.sum(1).min() >= 1
    # every valid id is a real row and scores match the true inner product
    s = np.asarray(scores)
    for i in range(5):
        for j in np.nonzero(valid[i])[0]:
            true = float(q[i] @ corpus[ids[i, j]])
            assert abs(s[i, j] - true) < 0.05  # bf16 storage tolerance
    # scores are non-increasing over the valid prefix
    for i in range(5):
        vs = s[i][valid[i]]
        assert np.all(np.diff(vs) <= 1e-5)


def test_ivf_empty_and_retrain():
    ivf = IVFIPIndex(dim=8, nlist=2, nprobe=2)
    with pytest.raises(ValueError, match="empty"):
        ivf.search(np.zeros((1, 8), np.float32), k=1)
    rs = np.random.RandomState(4)
    ivf.add(rs.randn(16, 8).astype(np.float32))
    assert ivf.capacity >= 8
    ivf.reset()
    assert ivf.ntotal == 0


def test_ivf_add_refits_unless_pinned():
    rs = np.random.RandomState(7)
    a = _clustered_corpus(rs, n_clusters=4, per_cluster=16, dim=16)
    b = _clustered_corpus(rs, n_clusters=4, per_cluster=16, dim=16) + 3.0

    ivf = IVFIPIndex(dim=16, nlist=4, nprobe=2, seed=8)
    ivf.add(a)
    c_after_a = np.asarray(ivf.centroids)
    ivf.add(b)  # no explicit train → refit on the refreshed corpus
    assert not np.allclose(np.asarray(ivf.centroids), c_after_a)

    pinned = IVFIPIndex(dim=16, nlist=4, nprobe=2, seed=8)
    pinned.train(a)
    c_pinned = np.asarray(pinned.centroids)
    pinned.add(b)  # explicit train pins the clustering
    assert np.allclose(np.asarray(pinned.centroids), c_pinned)


def test_ivf_sharded_mesh_search():
    """Cluster-sharded IVF on an 8-device mesh: exhaustive per-shard probing
    (nprobe=nlist) must equal exact numpy top-k, and modest nprobe must keep
    high recall; only [Q, k] candidates cross shards."""
    import jax
    from jax.sharding import Mesh

    rs = np.random.RandomState(11)
    corpus = _clustered_corpus(rs, n_clusters=24, per_cluster=32, dim=32)
    queries = corpus[rs.choice(len(corpus), 32, replace=False)]
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))

    import jax.numpy as jnp
    ivf = IVFIPIndex(dim=32, nlist=26, nprobe=8, seed=12, mesh=mesh,
                     dtype=jnp.float32)  # 26 clusters over 8 shards → pad 6
    ivf.add(corpus)
    assert ivf._bins_ids.shape[0] == 32  # padded to a multiple of 8
    exact = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]

    # exhaustive: every shard probes all its clusters
    _, ids = ivf.search(queries, k=10, nprobe=26)
    overlap = np.mean([len(set(np.asarray(ids)[i]) & set(exact[i]))
                       for i in range(len(queries))])
    assert overlap == 10.0

    _, ids8 = ivf.search(queries, k=10, nprobe=8)
    recall = np.mean([len(set(np.asarray(ids8)[i]) & set(exact[i])) / 10
                      for i in range(len(queries))])
    assert recall >= 0.85, recall


def test_ivf_save_load_roundtrip(tmp_path):
    """save/load skips the k-means fit AND the packing pass; identical
    search results across fp32/bf16/int8-dims, single-device and across a
    shard-count change (26 clusters save unpadded, reload onto 8 shards)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    rs = np.random.RandomState(15)
    corpus = _clustered_corpus(rs, n_clusters=24, per_cluster=32, dim=32)
    queries = corpus[rs.choice(len(corpus), 16, replace=False)]
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    for quantize, dtype in ((False, jnp.float32), (False, jnp.bfloat16),
                            ("dims", jnp.float32)):
        a = IVFIPIndex(dim=32, nlist=26, nprobe=8, seed=12, dtype=dtype,
                       quantize=quantize)
        a.add(corpus)
        s1, i1 = a.search(queries, k=10)
        path = str(tmp_path / f"ivf_{quantize}_{dtype.__name__}")
        a.save(path)
        for m in (None, mesh):
            b = IVFIPIndex.load(path, mesh=m)
            assert b.ntotal == len(corpus) and b.nprobe == 8
            s2, i2 = b.search(queries, k=10)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                       rtol=1e-5)
            # centroids load pinned: a re-add reuses the clustering
            assert b._pinned
    with pytest.raises(ValueError, match="empty"):
        IVFIPIndex(dim=32).save(str(tmp_path / "never"))


def test_ivf_int8_dims_quantization():
    """int8 bins with per-dim scales: near-identical ranking to fp32 IVF
    (scales fold into the query and out of the search centroids)."""
    import jax.numpy as jnp

    rs = np.random.RandomState(13)
    corpus = _clustered_corpus(rs, n_clusters=16, per_cluster=32, dim=32)
    queries = corpus[rs.choice(len(corpus), 32, replace=False)]
    exact = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]

    q8 = IVFIPIndex(dim=32, nlist=16, nprobe=16, seed=14, quantize="dims",
                    dtype=jnp.float32)
    q8.add(corpus)
    assert q8._bins_emb.dtype == jnp.int8
    _, ids = q8.search(queries, k=10, nprobe=16)  # exhaustive probe
    recall = np.mean([len(set(np.asarray(ids)[i]) & set(exact[i])) / 10
                      for i in range(len(queries))])
    assert recall >= 0.97, recall
    # scores approximate the true inner products (int8 tolerance)
    scores, ids = q8.search(queries[:4], k=3, nprobe=16)
    for i in range(4):
        for j in range(3):
            true = float(queries[i] @ corpus[np.asarray(ids)[i, j]])
            assert abs(float(np.asarray(scores)[i, j]) - true) < 0.05

    with pytest.raises(ValueError, match="per-row"):
        IVFIPIndex(dim=8, quantize="rows")


def test_ivf_chunked_assignment_matches_small_chunk():
    """add() streams assignment in chunks; a chunk smaller than the corpus
    must produce the same bins as one big chunk."""
    rs = np.random.RandomState(9)
    corpus = _clustered_corpus(rs, n_clusters=8, per_cluster=32, dim=16)
    big = IVFIPIndex(dim=16, nlist=8, nprobe=8, seed=10)
    big.add(corpus)
    small = IVFIPIndex(dim=16, nlist=8, nprobe=8, seed=10)
    small._ASSIGN_CHUNK = 17  # non-divisor chunk
    small.add(corpus)
    assert np.array_equal(np.asarray(big._bins_ids),
                          np.asarray(small._bins_ids))


def test_ivf_serves_through_retriever():
    """Drop-in behind the serving Retriever (same contract as FlatIPIndex)."""
    from ance_tpu.serve import Retriever

    rs = np.random.RandomState(5)
    corpus = _clustered_corpus(rs, n_clusters=8, per_cluster=16, dim=16)
    ivf = IVFIPIndex(dim=16, nlist=8, nprobe=8, seed=6)
    ivf.add(corpus)

    def encode_fn(params, ids, mask):
        del params, mask
        return corpus[np.asarray(ids)[:, 0]]

    r = Retriever(encode_fn, None, ivf,
                  embedding2id=np.arange(len(corpus), dtype=np.int64))
    tok = np.arange(4, dtype=np.int32)[:, None]
    scores, pids = r.search_tokens(tok, np.ones_like(tok), k=3)
    assert pids.shape == (4, 3)
    # nprobe=nlist → exhaustive: matches the exact index (IP self-match is
    # NOT guaranteed — another row can have a larger dot product)
    exact = np.argsort(-(corpus[:4] @ corpus.T), axis=1)[:, :3]
    assert np.array_equal(np.asarray(pids), exact)
