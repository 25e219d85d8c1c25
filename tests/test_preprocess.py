"""Preprocessing pipeline: raw TSV → binary caches + offset-space qrels
(reference data/msmarco_data.py parity), and raw-text process fns."""

import numpy as np
import pytest

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.preprocess import (
    PreprocessConfig, load_id_map, preprocess)
from ance_tpu.data.process_fn import dual_batches, encode_padded, triple_batches


class FakeTokenizer:
    """Deterministic word→id tokenizer (no network, no vocab files).

    encode() mimics HF semantics: prepend CLS(=2), append SEP(=3), truncate
    to max_length.
    """
    pad_token_id = 0
    sep_token = "[SEP]"

    def encode(self, text, add_special_tokens=True, max_length=None):
        # zlib.crc32 is process-stable (python hash() is randomized per run)
        import zlib
        ids = [2] + [4 + (zlib.crc32(w.encode()) % 1000)
                     for w in text.split()] + [3]
        if max_length is not None:
            ids = ids[:max_length]
        return ids


def make_fake_tokenizer():
    return FakeTokenizer()


def _write_corpus(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "collection.tsv").write_text(
        "0\talpha beta gamma\n"
        "1\tdelta epsilon\n"
        "2\tzeta eta theta iota kappa\n"
        "3\tlambda\n")
    (d / "queries.train.tsv").write_text(
        "100\talpha beta\n"
        "101\tunjudged query\n"     # no qrel → must be dropped
        "102\tzeta eta\n")
    (d / "qrels.train.tsv").write_text(
        "100\t0\t0\t1\n"
        "102\t0\t2\t1\n")
    (d / "queries.dev.small.tsv").write_text("200\tdelta\n")
    (d / "qrels.dev.small.tsv").write_text("200\t0\t1\t1\n")
    return str(d)


@pytest.mark.slow
def test_preprocess_passage_mode(tmp_path):
    data_dir = _write_corpus(tmp_path)
    out_dir = str(tmp_path / "out")
    cfg = PreprocessConfig(data_dir=data_dir, out_data_dir=out_dir,
                           data_type=1, max_seq_length=16,
                           max_query_length=8, num_processes=2)
    maps = preprocess(cfg, make_fake_tokenizer)

    # split-merge order is split-major, not line order (the reference's
    # numbered_byte_file_generator behaves identically, util.py:246-254);
    # ids always map through pid2offset so only coverage matters
    assert set(maps["pid2offset"]) == {0, 1, 2, 3}
    assert sorted(maps["pid2offset"].values()) == [0, 1, 2, 3]
    with TokenCache(out_dir + "/passages") as cache:
        assert len(cache) == 4
        tok = FakeTokenizer()
        for pid, text in [(0, "alpha beta gamma"), (2, "zeta eta theta iota kappa")]:
            length, toks = cache[maps["pid2offset"][pid]]
            expect = tok.encode(text, max_length=16)
            assert length == len(expect)
            np.testing.assert_array_equal(toks[:length], expect)

    # unjudged query dropped; offsets contiguous
    q2o = maps["train_qid2offset"]
    assert set(q2o) == {100, 102} and sorted(q2o.values()) == [0, 1]
    with TokenCache(out_dir + "/train-query") as cache:
        assert len(cache) == 2
    # offset-space qrels: (qid, pid) pairs map through the offset tables
    p2o = maps["pid2offset"]
    lines = open(out_dir + "/train-qrel.tsv").read().splitlines()
    assert sorted(lines) == sorted(
        [f"{q2o[100]}\t{p2o[0]}\t1", f"{q2o[102]}\t{p2o[2]}\t1"])
    dev_q2o = maps["dev_qid2offset"]
    assert open(out_dir + "/dev-qrel.tsv").read() == \
        f"{dev_q2o[200]}\t{p2o[1]}\t1\n"
    # pid2offset pickle round-trip
    assert load_id_map(out_dir + "/pid2offset.pickle") == maps["pid2offset"]
    # idempotent restart (reference msmarco_data.py:145-147)
    assert preprocess(cfg, make_fake_tokenizer) == {"skipped": True}


def test_preprocess_doc_mode(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "msmarco-docs.tsv").write_text(
        "D1\thttp://x\ttitle one\tbody text here\n"
        "D2\thttp://y\ttitle two\t" + "L" * 20000 + "\n")
    (d / "msmarco-doctrain-queries.tsv").write_text("7\tquery text\n")
    # doc-mode qrels are space-delimited with D-prefixed ids
    (d / "msmarco-doctrain-qrels.tsv").write_text("7 0 D1 1\n")
    (d / "msmarco-test2019-queries.tsv").write_text("9\tdev q\n")
    (d / "2019qrels-docs.txt").write_text("9 0 D2 2\n")
    out_dir = str(tmp_path / "out")
    cfg = PreprocessConfig(data_dir=str(d), out_data_dir=out_dir,
                           data_type=0, max_seq_length=32,
                           max_query_length=8, max_doc_character=100,
                           num_processes=1)
    maps = preprocess(cfg, make_fake_tokenizer)
    assert maps["pid2offset"] == {1: 0, 2: 1}
    # url <sep> title <sep> body with 100-char clamp
    tok = FakeTokenizer()
    expect = tok.encode(
        ("http://x [SEP] title one [SEP] body text here")[:100],
        max_length=32)
    with TokenCache(out_dir + "/passages") as cache:
        length, toks = cache[0]
        np.testing.assert_array_equal(toks[:length], expect)
    assert open(out_dir + "/train-qrel.tsv").read() == "0\t0\t1\n"
    assert open(out_dir + "/dev-qrel.tsv").read() == "0\t1\t2\n"


def test_encode_padded_and_triple_batches():
    tok = FakeTokenizer()
    ids, mask = encode_padded(tok, "a b c", max_len=4)
    assert mask.tolist() == [1, 1, 1, 1]  # CLS a b c (SEP truncated)
    ids2, mask2 = encode_padded(tok, "a", max_len=8)
    assert mask2.sum() == 3 and ids2[3:].tolist() == [0] * 5

    lines = [f"q {i}\tpos {i}\tneg {i}" for i in range(5)]
    batches = list(triple_batches(tok, lines, batch_size=2, max_len=8))
    assert len(batches) == 2  # 5 lines → 2 full batches, remainder dropped
    assert batches[0]["query_ids"].shape == (2, 8)
    with pytest.raises(ValueError):
        next(triple_batches(tok, ["only\ttwo"], 1, 8))


def test_dual_batches_partial_final():
    tok = FakeTokenizer()
    lines = [f"{i}\ttext {i}" for i in range(5)]
    batches = list(dual_batches(tok, lines, batch_size=2, max_len=8))
    assert [b["ids"].shape[0] for b in batches] == [2, 2, 1]
    np.testing.assert_array_equal(batches[2]["rec_ids"], [4])


def test_host_striping_in_process_fns():
    tok = FakeTokenizer()
    lines = [f"{i}\ttext {i}" for i in range(6)]
    b0 = list(dual_batches(tok, lines, 3, 8, host_id=0, num_hosts=2))
    b1 = list(dual_batches(tok, lines, 3, 8, host_id=1, num_hosts=2))
    np.testing.assert_array_equal(b0[0]["rec_ids"], [0, 2, 4])
    np.testing.assert_array_equal(b1[0]["rec_ids"], [1, 3, 5])
