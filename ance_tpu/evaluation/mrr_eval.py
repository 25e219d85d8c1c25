"""In-train MRR evaluation: full ranking + BM25-candidate reranking.

Parity target: reference utils/eval_mrr.py. The reference gathers per-rank
embedding shards via pickled NCCL all_gather (eval_mrr.py:127-139) and merges
rank-sharded KNN results with −128/−1 padding (eval_mrr.py:173-203); here
embeddings arrive already global (single program over the mesh), so only the
ranking semantics remain: per-query dedup, unfilled slots = pid 0, official
MRR@10 scorer.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from ance_tpu.evaluation.metrics import mrr_at_k, quality_checks
from ance_tpu.index.flat import knn_inner_product


def parse_top_dev(path: str, qid_col: int = 0, pid_col: int = 1
                  ) -> dict[int, list[int]]:
    """BM25 top-1000 candidate file (reference eval_mrr.py:49-59)."""
    ret: dict[int, list[int]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            cells = line.strip().split("\t")
            if len(cells) <= max(qid_col, pid_col):
                continue
            ret.setdefault(int(cells[qid_col]), []).append(int(cells[pid_col]))
    return ret


def get_topk_restricted(q_emb: np.ndarray, psg_embs: np.ndarray,
                        pid_dict: Mapping[int, int], psg_ids: np.ndarray,
                        pid_subset: Sequence[int], top_k: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k restricted to a candidate pid subset
    (reference eval_mrr.py:94-105; −128/−1 sentinel when empty)."""
    subset_ix = np.asarray([pid_dict[p] for p in pid_subset
                            if p != -1 and p in pid_dict], dtype=np.int64)
    if len(subset_ix) == 0:
        return np.full((top_k,), -128.0), np.full((top_k,), -1, dtype=int)
    sub = psg_embs[subset_ix]
    k = min(top_k, len(subset_ix))
    D, I = knn_inner_product(q_emb, sub, k=k)
    D, I = np.asarray(D)[0], np.asarray(I)[0]
    if k < top_k:  # pad to fixed width with sentinels
        D = np.concatenate([D, np.full(top_k - k, -128.0)])
        I = np.concatenate([subset_ix[I], np.full(top_k - k, -1)])
        return D, psg_ids_safe(psg_ids, I)
    return D, psg_ids[subset_ix[I]]


def psg_ids_safe(psg_ids: np.ndarray, rows: np.ndarray) -> np.ndarray:
    out = np.full(rows.shape, -1, dtype=np.int64)
    valid = rows >= 0
    out[valid] = psg_ids[rows[valid]]
    return out


def ranking_to_candidates(D: np.ndarray, I: np.ndarray,
                          qids: np.ndarray) -> dict[int, list[int]]:
    """Score-sorted, deduped, 1000-slot candidate lists
    (reference eval_mrr.py:182-194; empty slots stay pid 0)."""
    idx = np.argsort(D, axis=1)[:, ::-1][:, :10]
    sorted_I = np.take_along_axis(I, idx, axis=1)
    candidates: dict[int, list[int]] = {}
    for i, qid in enumerate(np.asarray(qids)):
        qid = int(qid)
        if qid not in candidates:
            candidates[qid] = [0] * 1000
        j = 0
        seen: set[int] = set()
        for pid in sorted_I[i]:
            pid = int(pid)
            if pid >= 0 and pid not in seen:
                candidates[qid][j] = pid
                j += 1
                seen.add(pid)
    return candidates


def compute_mrr(D: np.ndarray, I: np.ndarray, qids: np.ndarray,
                ref_dict: Mapping[int, Sequence[int]]) -> float:
    """Official MRR@10 over a (scores, pids) ranking
    (reference eval_mrr.py:173-203)."""
    candidates = ranking_to_candidates(D, I, qids)
    ok, message = quality_checks(candidates)
    if message:
        print(message)
    return mrr_at_k(ref_dict, candidates, k=10)["MRR @10"]


def combined_eval(query_embs: np.ndarray, query_ids: np.ndarray,
                  psg_embs: np.ndarray, psg_ids: np.ndarray,
                  topk_dev_qid_pid: Mapping[int, Sequence[int]],
                  ref_dict: Mapping[int, Sequence[int]],
                  full_depth: int = 100) -> tuple[float, float]:
    """(reranking_mrr, full_ranking_mrr) — reference eval_mrr.py:127-170."""
    D, I_rows = knn_inner_product(query_embs, psg_embs,
                                  k=min(full_depth, psg_embs.shape[0]))
    D, I_rows = np.asarray(D), np.asarray(I_rows)
    I = psg_ids[I_rows]
    pid_dict = {int(p): i for i, p in enumerate(psg_ids)}
    d_data, i_data = [], []
    for i, qid in enumerate(np.asarray(query_ids)):
        ds, pids = get_topk_restricted(
            query_embs[i:i + 1], psg_embs, pid_dict, psg_ids,
            topk_dev_qid_pid.get(int(qid), []), 10)
        d_data.append(ds)
        i_data.append(pids)
    reranking_mrr = compute_mrr(np.asarray(d_data), np.asarray(i_data),
                                query_ids, ref_dict)
    full_ranking_mrr = compute_mrr(D, I, query_ids, ref_dict)
    return reranking_mrr, full_ranking_mrr


def embed_text_file(encode_fn, params, tokenizer, path: str, max_len: int,
                    batch_size: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Embed an ``id\\ttext`` TSV via on-the-fly tokenization
    (reference eval_mrr.py:16-46 embedding_inference over dual_process_fn)."""
    import jax.numpy as jnp
    from ance_tpu.data.process_fn import dual_batches

    embs, ids = [], []
    with open(path, encoding="utf-8") as f:
        for batch in dual_batches(tokenizer, f, batch_size, max_len):
            out = encode_fn(params, jnp.asarray(batch["ids"]),
                            jnp.asarray(batch["mask"]))
            embs.append(np.asarray(out, np.float32))
            ids.append(batch["rec_ids"])
    return np.concatenate(embs), np.concatenate(ids)


def passage_dist_eval(*, query_encode_fn, body_encode_fn, params, tokenizer,
                      queries_path: str, collection_path: str,
                      top1000_path: str, qrels_path: str,
                      max_query_length: int = 64, max_seq_length: int = 128,
                      batch_size: int = 64) -> tuple[float, float]:
    """In-train dev MRR: (reranking_mrr, full_ranking_mrr)
    (reference utils/eval_mrr.py:108-124)."""
    q_embs, q_ids = embed_text_file(query_encode_fn, params, tokenizer,
                                    queries_path, max_query_length,
                                    batch_size)
    p_embs, p_ids = embed_text_file(body_encode_fn, params, tokenizer,
                                    collection_path, max_seq_length,
                                    batch_size)
    top1k = parse_top_dev(top1000_path, qid_col=0, pid_col=1)
    ref = load_msmarco_reference(qrels_path)
    return combined_eval(q_embs, q_ids, p_embs, p_ids, top1k, ref)


def load_msmarco_reference(path: str) -> dict[int, list[int]]:
    """qrels.dev.small.tsv → qid → [pids]
    (reference msmarco_eval.py:19-45)."""
    out: dict[int, list[int]] = {}
    with open(path) as f:
        for line in f:
            cells = line.strip().split("\t")
            if len(cells) < 3:
                continue
            out.setdefault(int(cells[0]), []).append(int(cells[2]))
    return out
