"""Offline eval (notebook parity) + observability utilities."""

import json

import numpy as np
import pytest

from ance_tpu.evaluation.offline import (
    full_ranking_eval, hole_rate, load_embedding_shards, rerank_eval)
from ance_tpu.utils.observability import MetricsLogger, StepTimer


def test_hole_rate():
    qrels = {1: {10: 1, 11: 0}}
    ranked = {1: [10, 11, 99]}  # 11 judged (rel 0), 99 unjudged
    assert hole_rate(qrels, ranked, k=3) == pytest.approx(1 / 3)


def test_full_ranking_eval_perfect_and_random():
    psg = np.eye(8, dtype=np.float32)
    psg_ids = np.arange(8)
    q_ids = np.array([0, 1])
    qrels = {0: {3: 1}, 1: {5: 1}}
    perfect_q = psg[[3, 5]].copy()
    m = full_ranking_eval(perfect_q, q_ids, psg, psg_ids, qrels, topn=8)
    assert m["ndcg_10"] == pytest.approx(1.0)
    assert m["mrr_10"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)
    assert m["hole_rate_10"] == pytest.approx(7 / 8)  # 1 judged of 8 results


def test_rerank_eval_restricted_to_candidates():
    psg = np.eye(6, dtype=np.float32)
    psg_ids = np.arange(6)
    q = psg[[2]].copy()
    qrels = {0: {2: 1}}
    # candidate list excludes the relevant passage → mrr 0
    m0 = rerank_eval(q, np.array([0]), psg, psg_ids, {0: [1, 3]}, qrels)
    assert m0["mrr_10"] == 0.0
    m1 = rerank_eval(q, np.array([0]), psg, psg_ids, {0: [1, 2, 3]}, qrels)
    assert m1["mrr_10"] == pytest.approx(1.0)


def test_load_embedding_shards(tmp_path):
    for rank in (0, 2):  # rank 1 missing — skipped like the reference loader
        np.save(tmp_path / f"emb_data_obj_{rank}.npy",
                np.full((2, 3), rank, np.float32))
    arr = load_embedding_shards(str(tmp_path / "emb"))
    assert arr.shape == (4, 3)
    assert (arr[:2] == 0).all() and (arr[2:] == 2).all()
    assert load_embedding_shards(str(tmp_path / "missing")) is None


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(1, loss=0.5, note="x")
    log.log(2, loss=np.float32(0.25))
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 0.5 and lines[0]["note"] == "x"
    assert lines[1]["step"] == 2 and lines[1]["loss"] == 0.25
    # disabled logger is a no-op
    MetricsLogger(None).log(1, loss=1.0)


def test_step_timer():
    t = StepTimer(window=5)
    assert t.steps_per_sec() == 0.0
    for _ in range(6):
        t.tick()
    assert t.steps_per_sec() > 0


def test_eval_full_cli_roundtrip(tmp_path, capsys):
    """Dump shards → eval-full subcommand → metrics JSON (notebook flow)."""
    from ance_tpu.evaluation.offline import save_embedding_shard
    psg = np.eye(8, dtype=np.float32)
    q = psg[[3, 5]].copy()
    save_embedding_shard(str(tmp_path / "q"), q)
    save_embedding_shard(str(tmp_path / "qid"), np.array([0, 1]))
    save_embedding_shard(str(tmp_path / "p"), psg[:4], rank=0)
    save_embedding_shard(str(tmp_path / "p"), psg[4:], rank=1)
    save_embedding_shard(str(tmp_path / "pid"), np.arange(4), rank=0)
    save_embedding_shard(str(tmp_path / "pid"), np.arange(4, 8), rank=1)
    (tmp_path / "qrel.tsv").write_text("0\t3\t1\n1\t5\t1\n")

    from ance_tpu.cli import main
    main(["eval-full",
          "--query_prefix", str(tmp_path / "q"),
          "--query_id_prefix", str(tmp_path / "qid"),
          "--passage_prefix", str(tmp_path / "p"),
          "--passage_id_prefix", str(tmp_path / "pid"),
          "--qrels", str(tmp_path / "qrel.tsv"), "--topn", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mrr_10"] == 1.0 and out["recall"] == 1.0
