"""Token cache round-trip + byte-level format parity.

Format under test is the reference EmbeddingCache record layout
(reference utils/util.py:257-307, data/msmarco_data.py:64-94).
"""

import json

import numpy as np

from ance_tpu.data.cache import TokenCache, TokenCacheWriter, merge_split_files


def _write_cache(tmp_path, n=17, max_len=24, seed=3):
    rs = np.random.RandomState(seed)
    base = str(tmp_path / "passages")
    rows = []
    with TokenCacheWriter(base, max_len) as w:
        for _ in range(n):
            length = int(rs.randint(1, max_len + 1))
            toks = np.zeros(max_len, dtype=np.int32)
            toks[:length] = rs.randint(5, 30000, size=length)
            rows.append((length, toks))
            w.write(length, toks)
    return base, rows


def test_roundtrip(tmp_path):
    base, rows = _write_cache(tmp_path)
    with TokenCache(base) as cache:
        assert len(cache) == len(rows)
        for i, (length, toks) in enumerate(rows):
            got_len, got_toks = cache[i]
            assert got_len == length
            np.testing.assert_array_equal(got_toks, toks)


def test_batch_gather(tmp_path):
    base, rows = _write_cache(tmp_path)
    keys = [3, 0, 16, 7, 7]
    with TokenCache(base) as cache:
        lengths, tokens = cache.batch(keys)
    for j, k in enumerate(keys):
        assert lengths[j] == rows[k][0]
        np.testing.assert_array_equal(tokens[j], rows[k][1])


def test_byte_format_matches_reference_layout(tmp_path):
    """Parse the file exactly the way reference utils/util.py:279-283 does."""
    base, rows = _write_cache(tmp_path, n=5, max_len=8)
    meta = json.load(open(base + "_meta"))
    assert meta["type"] == "int32"
    assert meta["total_number"] == 5
    assert meta["embedding_size"] == 8
    record_size = 8 * 4 + 4
    raw = open(base, "rb").read()
    assert len(raw) == 5 * record_size
    for i, (length, toks) in enumerate(rows):
        rec = raw[i * record_size:(i + 1) * record_size]
        assert int.from_bytes(rec[:4], "big") == length
        np.testing.assert_array_equal(
            np.frombuffer(rec[4:], dtype=np.int32), toks)


def test_seeded_permutation_iteration(tmp_path):
    base, rows = _write_cache(tmp_path, n=10, max_len=4)
    with TokenCache(base, seed=11) as cache:
        perm = np.random.RandomState(11).permutation(10)
        got = [length for length, _ in cache]
        assert got == [rows[p][0] for p in perm]


def test_merge_split_files(tmp_path):
    max_len = 6
    base = str(tmp_path / "merged")
    # two splits with id-prefixed records, reference msmarco_data.py layout
    records = {0: [(100, 3), (102, 5)], 1: [(101, 1)]}
    for split, rows in records.items():
        with open(f"{base}_split{split}", "wb") as f:
            for rid, length in rows:
                f.write(rid.to_bytes(8, "big"))
                f.write(length.to_bytes(4, "big"))
                f.write(np.full(max_len, rid, dtype=np.int32).tobytes())
    id2offset = merge_split_files(base, 2, max_len,
                                  keep_id=lambda r: r != 102)
    assert id2offset == {100: 0, 101: 1}
    with TokenCache(base) as cache:
        assert len(cache) == 2
        length, toks = cache[id2offset[101]]
        assert length == 1
        assert (toks == 101).all()
