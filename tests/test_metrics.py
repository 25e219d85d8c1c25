"""Metric parity tests: official MS MARCO MRR semantics, trec_eval-style
NDCG/MAP on hand-computed cases, dedup ranking, and DPR answer matching."""

import math

import numpy as np
import pytest

from ance_tpu.evaluation.metrics import (
    dedup_ranking, eval_dev_ndcg, map_at_k, mrr_at_k, ndcg_at_k,
    quality_checks, recall_at_k)
from ance_tpu.evaluation.qa_validation import (
    check_answer, coverage_at_k, has_answer, tokenize_words)


def test_mrr_official_semantics():
    # qid 1: hit at rank 2 → 1/2. qid 2: no hit. qid 3 (in qrels, not ranked).
    qrels = {1: [10], 2: [20], 3: [30]}
    ranked = {1: [99, 10, 5], 2: [1, 2, 3], 4: [30]}  # qid 4 not in qrels
    m = mrr_at_k(qrels, ranked, k=10)
    # divided by len(qrels)=3 (reference msmarco_eval.py:136), not by matched
    assert m["MRR @10"] == pytest.approx(0.5 / 3)
    assert m["QueriesRanked"] == 3


def test_mrr_cutoff():
    qrels = {1: [10]}
    ranked = {1: [0] * 10 + [10]}  # hit at rank 11 > MaxMRRRank
    assert mrr_at_k(qrels, ranked, k=10)["MRR @10"] == 0.0


def test_quality_checks_duplicates():
    ok, _ = quality_checks({1: [5, 6, 7, 0, 0]})  # zeros exempt
    assert ok
    bad, msg = quality_checks({1: [5, 6, 5]})
    assert not bad and "PID=5" in msg


def test_ndcg_hand_computed():
    # ranks: [rel2, rel0, rel1]; DCG = 2/log2(2) + 0 + 1/log2(4) = 2.5
    # ideal: [2, 1] → IDCG = 2 + 1/log2(3)
    qrels = {1: {10: 2, 11: 1}}
    ranked = {1: [10, 99, 11]}
    got = ndcg_at_k(qrels, ranked, k=10)[1]
    assert got == pytest.approx((2 + 0.5) / (2 + 1 / math.log2(3)))


def test_ndcg_no_relevant_is_zero():
    assert ndcg_at_k({1: {}}, {1: [5, 6]}, k=10)[1] == 0.0
    assert ndcg_at_k({}, {1: [5, 6]}, k=10)[1] == 0.0


def test_map_hand_computed():
    # relevant {10, 11}; hits at ranks 1 and 3 → AP = (1/1 + 2/3)/2
    qrels = {1: {10: 1, 11: 1}}
    ranked = {1: [10, 99, 11]}
    assert map_at_k(qrels, ranked)[1] == pytest.approx((1 + 2 / 3) / 2)


def test_recall_at_k():
    qrels = {1: {10: 1, 11: 1}, 2: {20: 1}}
    ranked = {1: [10, 5], 2: [7, 8]}
    assert recall_at_k(qrels, ranked, k=2) == pytest.approx((0.5 + 0.0) / 2)


def test_dedup_ranking_multivector():
    """MaxP: several embedding rows per passage id; first occurrence wins
    (reference run_ann_data_gen.py:409-423)."""
    # embedding rows 0,1 → pid 100; rows 2,3 → pid 200
    passage_embedding2id = np.array([100, 100, 200, 200])
    query_embedding2id = np.array([7])
    neighbors = np.array([[1, 0, 3, 2]])
    ranked = dedup_ranking(neighbors, query_embedding2id, passage_embedding2id)
    assert ranked == {7: [100, 200]}


def test_eval_dev_ndcg_pipeline():
    passage_embedding2id = np.arange(6)
    query_embedding2id = np.array([0, 1])
    qrels = {0: {3: 1}, 1: {0: 1}}
    neighbors = np.array([[3, 1, 2, 0, 4, 5],    # hit at rank 1 → ndcg 1.0
                          [5, 4, 0, 1, 2, 3]])   # hit at rank 3 → 1/log2(4)
    ndcg, n = eval_dev_ndcg(neighbors, query_embedding2id,
                            passage_embedding2id, qrels)
    assert n == 2
    assert ndcg == pytest.approx((1.0 + 0.5) / 2)


def test_tokenizer_and_has_answer():
    assert tokenize_words("Hello, World!") == ["hello", ",", "world", "!"]
    assert has_answer(["the cat"], "I saw The CAT on the mat")
    assert not has_answer(["the dog"], "I saw the cat on the mat")
    assert not has_answer(["cat"], None)
    # unicode normalization: café with combining accent matches composed form
    assert has_answer(["café"], "we met at the café yesterday")


def test_coverage_at_k():
    hits = [[False, True, False], [False] * 3, [True]]
    cov = coverage_at_k(hits, ks=(1, 2))
    assert cov[1] == pytest.approx(1 / 3)
    assert cov[2] == pytest.approx(2 / 3)
