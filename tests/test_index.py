"""Exact-IP index: parity with exhaustive numpy search, single-device and on
an 8-device CPU mesh (replacing FAISS IndexFlatIP,
reference run_ann_data_gen.py:265-303)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ance_tpu.index.flat import FlatIPIndex, knn_inner_product, topk_inner_product


def _data(n=1000, q=17, d=32, seed=0):
    rs = np.random.RandomState(seed)
    corpus = rs.randn(n, d).astype(np.float32)
    queries = rs.randn(q, d).astype(np.float32)
    return queries, corpus


def _np_topk(queries, corpus, k):
    scores = queries @ corpus.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_topk_matches_numpy_exhaustive():
    queries, corpus = _data()
    k = 25
    s, i = topk_inner_product(jnp.asarray(queries), jnp.asarray(corpus),
                              k=k, chunk_rows=128)
    ref_s, ref_i = _np_topk(queries, corpus, k)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)


def test_topk_with_ragged_chunks_and_padding():
    queries, corpus = _data(n=999)  # not a multiple of chunk size
    s, i = topk_inner_product(jnp.asarray(queries), jnp.asarray(corpus),
                              k=10, chunk_rows=256)
    ref_s, ref_i = _np_topk(queries, corpus, 10)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_flat_index_single_device():
    queries, corpus = _data(n=500, q=9, d=16, seed=1)
    index = FlatIPIndex(dim=16, chunk_rows=64)
    index.add(corpus)
    assert index.ntotal == 500
    s, i = index.search(queries, k=7)
    ref_s, ref_i = _np_topk(queries, corpus, 7)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)


def test_flat_index_sharded_mesh():
    queries, corpus = _data(n=1003, q=13, d=32, seed=2)  # ragged over 8 shards
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    index = FlatIPIndex(dim=32, mesh=mesh, axis="data", chunk_rows=64)
    index.add(corpus)
    assert index.ntotal == 1003
    s, i = index.search(queries, k=20)
    ref_s, ref_i = _np_topk(queries, corpus, 20)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)


def test_sharded_equals_single_device():
    queries, corpus = _data(n=640, q=5, d=16, seed=3)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharded = FlatIPIndex(dim=16, mesh=mesh, chunk_rows=40)
    single = FlatIPIndex(dim=16, chunk_rows=40)
    sharded.add(corpus)
    single.add(corpus)
    s1, i1 = sharded.search(queries, k=12)
    s2, i2 = single.search(queries, k=12)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_sharded_internal_padding_never_surfaces():
    """Regression (ADVICE r1, high): per-shard chunk padding rows in
    NON-last shards scored 0.0 and aliased other shards' real ids. With
    all-negative true scores every phantom 0.0 would win; the result must
    still equal exhaustive numpy search."""
    rs = np.random.RandomState(6)
    d = 8
    base_vecs = np.abs(rs.randn(75, d)).astype(np.float32)
    corpus = base_vecs  # all-positive rows
    queries = -np.abs(rs.randn(5, d)).astype(np.float32)  # all scores < 0
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    # 75 rows pad to 80 → 10 rows/shard; chunk_rows=4 → per-shard scan pads
    # to 12 rows, i.e. 2 internal padding rows in EVERY shard whose global
    # ids (base+10, base+11) alias real rows of later shards
    index = FlatIPIndex(dim=d, mesh=mesh, chunk_rows=4, method="scan")
    index.add(corpus)
    s, i = index.search(queries, k=4)
    ref_s, ref_i = _np_topk(queries, corpus, 4)
    assert np.all(np.asarray(s) < 0), "phantom non-negative score surfaced"
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)


def test_knn_inner_product_entry():
    """Index-free path (reference eval_mrr.py search_knn)."""
    queries, corpus = _data(n=300, q=4, d=8, seed=4)
    s, i = knn_inner_product(queries, corpus, k=5)
    ref_s, ref_i = _np_topk(queries, corpus, 5)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_index_rebuild_replaces_contents():
    queries, corpus = _data(n=100, q=3, d=8, seed=5)
    index = FlatIPIndex(dim=8, chunk_rows=32)
    index.add(corpus)
    _, before = index.search(queries, k=3)
    corpus2 = corpus[::-1].copy()  # reversed rows → ids must flip
    index.add(corpus2)
    _, after = index.search(queries, k=3)
    np.testing.assert_array_equal(np.asarray(after), 99 - np.asarray(before))


def test_update_slice_equals_full_rebuild_single_device():
    """allocate + in-place update_slice must search identically to the
    rebuild-from-scratch add() path (including a short final slice)."""
    queries, corpus = _data(n=100, q=7, d=8, seed=7)
    full = FlatIPIndex(dim=8, chunk_rows=32)
    full.add(corpus)

    inc = FlatIPIndex(dim=8, chunk_rows=32)
    inc.allocate(100, 8, slice_rows=16)
    for s in range(0, 100, 16):
        inc.update_slice(s, corpus[s:s + 16])  # last slice: 4 rows, padded
    assert inc.ntotal == 100
    s1, i1 = full.search(queries, k=9)
    s2, i2 = inc.search(queries, k=9)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_update_slice_equals_full_rebuild_on_mesh():
    """Sharded in-HBM segment swap: slice writes route to the owning shard
    only; results equal the single-device rebuild."""
    queries, corpus = _data(n=100, q=5, d=8, seed=8)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    single = FlatIPIndex(dim=8, chunk_rows=32)
    single.add(corpus)

    inc = FlatIPIndex(dim=8, mesh=mesh, chunk_rows=32)
    inc.allocate(100, 8, slice_rows=16)  # per-shard 16 rows → 128 padded
    from jax.sharding import NamedSharding, PartitionSpec as P
    assert inc._emb.sharding == NamedSharding(mesh, P("data", None))
    for s in range(0, 100, 16):
        inc.update_slice(s, corpus[s:s + 16])
    s1, i1 = single.search(queries, k=9)
    s2, i2 = inc.search(queries, k=9)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    # slices are overwritable in place: refreshing rows changes results
    inc.update_slice(0, corpus[16:32])
    _, i3 = inc.search(queries, k=9)
    assert not np.array_equal(np.asarray(i2), np.asarray(i3))


def test_update_slice_guards():
    corpus = np.eye(8, dtype=np.float32)
    idx = FlatIPIndex(dim=8)
    with pytest.raises(ValueError):
        idx.update_slice(0, corpus)  # no allocate()
    idx.allocate(8, 8, slice_rows=4)
    with pytest.raises(ValueError):
        idx.update_slice(2, corpus[:4])  # unaligned start
    with pytest.raises(ValueError):
        idx.update_slice(0, corpus)  # slice too large
    with pytest.raises(ValueError):
        FlatIPIndex(dim=8, quantize=True).allocate(8, 8, slice_rows=4)


def test_quantized_index_near_exact():
    """int8 per-row quantized index: ~4x smaller than fp32 FAISS, ranking
    near-exact on realistic (LayerNorm'd) embeddings."""
    rs = np.random.RandomState(9)
    corpus = rs.randn(2000, 64).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)  # unit-ish rows
    queries = rs.randn(16, 64).astype(np.float32)
    exact = FlatIPIndex(dim=64, method="scan")
    quant = FlatIPIndex(dim=64, method="scan", quantize=True)
    exact.add(corpus)
    quant.add(corpus)
    _, ie = exact.search(queries, k=10)
    sq, iq = quant.search(queries, k=10)
    overlap = np.mean([len(set(np.asarray(ie)[i]) & set(np.asarray(iq)[i]))
                       / 10 for i in range(16)])
    assert overlap >= 0.9, overlap
    # top-1 agreement should be near perfect
    top1 = np.mean(np.asarray(ie)[:, 0] == np.asarray(iq)[:, 0])
    assert top1 >= 0.9
    # storage dtype really is int8
    assert quant._emb.dtype == jnp.int8


def test_quantized_index_sharded():
    rs = np.random.RandomState(10)
    corpus = rs.randn(640, 32).astype(np.float32)
    queries = rs.randn(5, 32).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    quant_m = FlatIPIndex(dim=32, mesh=mesh, method="scan", quantize=True)
    quant_s = FlatIPIndex(dim=32, method="scan", quantize=True)
    quant_m.add(corpus)
    quant_s.add(corpus)
    s1, i1 = quant_m.search(queries, k=7)
    s2, i2 = quant_s.search(queries, k=7)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_dims_quantized_index_with_blockmax_path():
    """Per-dim int8 quantization folds scales into the query, so the fused
    blockmax path applies; ranking matches the scan path exactly."""
    rs = np.random.RandomState(11)
    corpus = rs.randn(1000, 32).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rs.randn(8, 32).astype(np.float32)

    exact = FlatIPIndex(dim=32, method="scan")
    qd_scan = FlatIPIndex(dim=32, method="scan", quantize="dims")
    exact.add(corpus)
    qd_scan.add(corpus)
    _, ie = exact.search(queries, k=10)
    _, iq = qd_scan.search(queries, k=10)
    overlap = np.mean([len(set(np.asarray(ie)[i]) & set(np.asarray(iq)[i]))
                       / 10 for i in range(8)])
    assert overlap >= 0.9, overlap
    assert qd_scan._emb.dtype == jnp.int8
    # "dims" mode is blockmax-eligible ("rows" is not)
    assert FlatIPIndex(dim=32, method="blockmax",
                       quantize="dims")._use_blockmax()
    assert not FlatIPIndex(dim=32, method="blockmax",
                           quantize="rows")._use_blockmax()

    with pytest.raises(ValueError):
        FlatIPIndex(dim=32, quantize="nope")


def test_int8_allocate_update_slice_matches_add():
    """quantize='dims' allocate + update_slice (the at-scale build path: the
    full 8.8M MS MARCO corpus only fits one v5e core as int8) must search
    identically to the add()-built dims-quantized index when given the same
    corpus-global scales — single-device and sharded."""
    from ance_tpu.index.flat import quantize_dims_int8

    rs = np.random.RandomState(12)
    corpus = rs.randn(200, 16).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rs.randn(6, 16).astype(np.float32)
    _, scales = quantize_dims_int8(jnp.asarray(corpus))

    ref = FlatIPIndex(dim=16, method="scan", quantize="dims")
    ref.add(corpus)
    meshes = [None, Mesh(np.array(jax.devices()).reshape(8), ("data",))]
    for mesh in meshes:
        inc = FlatIPIndex(dim=16, mesh=mesh, method="scan", quantize="dims")
        inc.allocate(200, 16, slice_rows=32, scales=scales)
        assert inc._emb.dtype == jnp.int8
        for s in range(0, 200, 32):  # short final slice: 8 rows
            inc.update_slice(s, corpus[s:s + 32])
        s1, i1 = ref.search(queries, k=9)
        s2, i2 = inc.search(queries, k=9)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    # guards: dims allocate without scales; scales on an unquantized index
    with pytest.raises(ValueError, match="scales"):
        FlatIPIndex(dim=16, quantize="dims").allocate(8, 16, slice_rows=4)
    with pytest.raises(ValueError, match="scales"):
        FlatIPIndex(dim=16).allocate(8, 16, slice_rows=4,
                                     scales=np.ones(16, np.float32))


def test_add_chunked_matches_add():
    """add_chunked (streamed build — never stages the full fp corpus in
    device memory; the serving path at 8.8M scale) returns identical search
    results to add(): same scales formula for 'dims', same cast otherwise."""
    rs = np.random.RandomState(13)
    corpus = rs.randn(300, 16).astype(np.float32)
    queries = rs.randn(5, 16).astype(np.float32)
    for quantize in (False, "dims"):
        a = FlatIPIndex(dim=16, method="scan", quantize=quantize)
        b = FlatIPIndex(dim=16, method="scan", quantize=quantize)
        a.add(corpus)
        b.add_chunked(corpus, slice_rows=64)  # 300 → short final chunk
        s1, i1 = a.search(queries, k=8)
        s2, i2 = b.search(queries, k=8)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    with pytest.raises(ValueError, match="dims"):
        FlatIPIndex(dim=16, quantize="rows").add_chunked(corpus)


def test_index_save_load_roundtrip(tmp_path):
    """save/load (FAISS write_index analogue): identical search results
    across dtypes, int8 stays int8 on disk (no re-quantization on load),
    and a single-device save reloads onto the 8-shard mesh (padding recut
    for the new shard count)."""
    rs = np.random.RandomState(14)
    corpus = rs.randn(100, 16).astype(np.float32)  # 100 % 8 != 0: repad path
    queries = rs.randn(4, 16).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    for quantize, dtype in ((False, jnp.float32), (False, jnp.bfloat16),
                            ("dims", jnp.float32), ("rows", jnp.float32)):
        a = FlatIPIndex(dim=16, method="scan", quantize=quantize, dtype=dtype)
        a.add(corpus)
        path = str(tmp_path / f"idx_{quantize}_{dtype.__name__}")
        a.save(path)
        s1, i1 = a.search(queries, k=7)
        for m in (None, mesh):
            b = FlatIPIndex.load(path, mesh=m, method="scan")
            assert b.ntotal == 100
            if quantize:
                assert b._emb.dtype == jnp.int8
            s2, i2 = b.search(queries, k=7)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                       rtol=1e-6)
    with pytest.raises(ValueError, match="empty"):
        FlatIPIndex(dim=16).save(str(tmp_path / "never"))

    # the reverse direction: save FROM the 8-shard mesh (rows AND per-row
    # scales carry padding to 104) → load on a single device. The padded
    # scales must be stripped on save or load re-pads emb to a different
    # length than scales and the first search crashes on the mismatch.
    a = FlatIPIndex(dim=16, method="scan", quantize="rows", mesh=mesh)
    a.add(corpus)
    path = str(tmp_path / "idx_rows_meshsave")
    a.save(path)
    s1, i1 = a.search(queries, k=7)
    b = FlatIPIndex.load(path, mesh=None, method="scan")
    assert b.ntotal == 100 and b._scales.shape[0] == b._emb.shape[0]
    s2, i2 = b.search(queries, k=7)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_update_slice_out_of_range_raises():
    from ance_tpu.index.flat import FlatIPIndex

    idx = FlatIPIndex(dim=8)
    idx.allocate(10, 8, slice_rows=4)  # padded to 12 rows
    idx.update_slice(8, np.ones((2, 8), np.float32))  # short final: fine
    with pytest.raises(ValueError, match="outside buffer"):
        idx.update_slice(12, np.ones((4, 8), np.float32))
    with pytest.raises(ValueError, match="outside buffer"):
        idx.update_slice(-4, np.ones((4, 8), np.float32))
