"""DPR ANN data generation: answer-validated retrieval + answer-filtered
negative mining.

Parity target: reference drivers/run_ann_data_gen_dpr.py:230-345. Differences
from the MS MARCO generator: validation is answer-string matching over the
retrieved passages' raw text (top-k hit curve), negative mining rejects
passages that contain the answer, and the ndcg sidecar carries
top20/top100(+trivia) instead of NDCG.
"""

from __future__ import annotations

import json
import os
import random
from typing import Mapping, Optional, Sequence

import numpy as np

from ance_tpu.evaluation.qa_validation import has_answer

ANN_DATA_PREFIX = "ann_training_data_"
ANN_NDCG_PREFIX = "ann_ndcg_"


def generate_new_ann_dpr(*, output_num: int, checkpoint_path: str, params,
                         query_encode_fn, body_encode_fn,
                         train_query_cache, test_query_cache,
                         trivia_test_query_cache, passage_cache,
                         passage_texts: Mapping[int, tuple[str, str]],
                         train_answers: Mapping[int, Sequence[str]],
                         test_answers: Mapping[int, Sequence[str]],
                         trivia_test_answers: Mapping[int, Sequence[str]],
                         training_query_positive_id: Mapping[int, int],
                         output_dir: str, topk_training: int = 100,
                         negative_sample: int = 20,
                         dev_search_depth: int = 100,
                         encode_batch_size: int = 128,
                         index=None, index_quantize=None, seed: int = 0,
                         mesh=None) -> dict:
    """One DPR encode→index→validate→mine→write pass
    (reference run_ann_data_gen_dpr.py:204-278).

    ``passage_texts`` is keyed by cache OFFSET (combine load_passage_texts
    with pid2offset upstream — reference load_data builds exactly this)."""
    from ance_tpu.index.flat import FlatIPIndex
    from ance_tpu.train.encode import encode_cache

    q_emb, q_ids = encode_cache(query_encode_fn, params, train_query_cache,
                                encode_batch_size)
    test_emb, test_ids = encode_cache(query_encode_fn, params,
                                      test_query_cache, encode_batch_size)
    trivia_emb, trivia_ids = encode_cache(
        query_encode_fn, params, trivia_test_query_cache, encode_batch_size)
    passage_emb, passage_ids = encode_cache(
        body_encode_fn, params, passage_cache, encode_batch_size)

    if index is None:
        index = FlatIPIndex(dim=passage_emb.shape[1], mesh=mesh,
                            quantize=index_quantize or False)
    if index.quantize == "dims":
        index.add_chunked(passage_emb)  # no fp-corpus HBM staging
    else:
        index.add(passage_emb)

    k_dev = min(dev_search_depth, index.ntotal)
    _, dev_I = index.search(test_emb, k_dev)
    top_k_hits = validate(passage_texts, test_answers, np.asarray(dev_I),
                          test_ids, passage_ids)
    _, dev_I_trivia = index.search(trivia_emb, k_dev)
    top_k_hits_trivia = validate(passage_texts, trivia_test_answers,
                                 np.asarray(dev_I_trivia), trivia_ids,
                                 passage_ids)

    k_mine = min(topk_training, index.ntotal)
    _, I = index.search(q_emb, k_mine)
    negatives = mine_negatives_dpr(passage_texts, train_answers, q_ids,
                                   passage_ids, np.asarray(I),
                                   training_query_positive_id,
                                   negative_sample)
    metrics = {
        "top20": top_k_hits[min(19, len(top_k_hits) - 1)],
        "top100": top_k_hits[min(99, len(top_k_hits) - 1)],
        "top20_trivia": top_k_hits_trivia[min(19, len(top_k_hits_trivia) - 1)],
        "top100_trivia": top_k_hits_trivia[
            min(99, len(top_k_hits_trivia) - 1)],
    }
    data_path, ndcg_path = write_dpr_ann_data(
        output_dir, output_num, q_ids, training_query_positive_id, negatives,
        metrics, checkpoint_path, seed=seed)
    out = dict(metrics)
    out.update({"data_path": data_path, "ndcg_path": ndcg_path,
                "index": index})
    return out


def validate(passage_texts: Mapping[int, tuple[str, str]],
             answers: Mapping[int, Sequence[str]],
             closest_docs: np.ndarray,
             query_embedding2id: np.ndarray,
             passage_embedding2id: np.ndarray) -> list[float]:
    """Top-k answer-hit curve (reference run_ann_data_gen_dpr.py:312-340):
    top_k_hits[k] = fraction of queries with an answer-bearing passage in
    their top (k+1)."""
    scores = []
    for qi in range(closest_docs.shape[0]):
        qid = int(query_embedding2id[qi])
        hits = []
        for pidx in closest_docs[qi]:
            doc_id = int(passage_embedding2id[pidx])
            text = passage_texts[doc_id][0]
            hits.append(has_answer(answers[qid], text))
        scores.append(hits)
    n_docs = closest_docs.shape[1]
    top_k_hits = [0] * n_docs
    for question_hits in scores:
        best = next((i for i, x in enumerate(question_hits) if x), None)
        if best is not None:
            top_k_hits[best:] = [v + 1 for v in top_k_hits[best:]]
    return [v / len(scores) for v in top_k_hits]


def mine_negatives_dpr(passage_texts: Mapping[int, tuple[str, str]],
                       answers: Mapping[int, Sequence[str]],
                       query_embedding2id: np.ndarray,
                       passage_embedding2id: np.ndarray,
                       closest_docs: np.ndarray,
                       training_query_positive_id: Mapping[int, int],
                       negative_sample: int) -> dict[int, list[int]]:
    """Answer-filtered negative mining
    (reference run_ann_data_gen_dpr.py:281-309). NOTE reference quirk kept:
    the candidate counter increments whether or not the passage is accepted,
    so answer-bearing candidates consume budget."""
    out: dict[int, list[int]] = {}
    for qi in range(closest_docs.shape[0]):
        qid = int(query_embedding2id[qi])
        pos_pid = training_query_positive_id[qid]
        out[qid] = []
        neg_cnt = 0
        for pidx in closest_docs[qi]:
            doc_id = int(passage_embedding2id[pidx])
            if doc_id == pos_pid:
                continue
            if doc_id in out[qid]:
                continue
            if neg_cnt >= negative_sample:
                break
            text = passage_texts[doc_id][0]
            if not has_answer(answers[qid], text):
                out[qid].append(doc_id)
            neg_cnt += 1
    return out


def write_dpr_ann_data(output_dir: str, output_num: int,
                       query_embedding2id: np.ndarray,
                       training_query_positive_id: Mapping[int, int],
                       query_negative_passage: Mapping[int, Sequence[int]],
                       metrics: dict, checkpoint_path: str,
                       seed: int = 0) -> tuple[str, str]:
    """Shuffled triples + top-k-hit JSON sidecar (written LAST as the ready
    signal; reference run_ann_data_gen_dpr.py:265-278)."""
    os.makedirs(output_dir, exist_ok=True)
    data_path = os.path.join(output_dir, ANN_DATA_PREFIX + str(output_num))
    order = list(range(len(query_embedding2id)))
    random.Random(seed).shuffle(order)
    with open(data_path, "w") as f:
        for qi in order:
            qid = int(query_embedding2id[qi])
            negs = query_negative_passage.get(qid, [])
            if not negs:
                continue
            f.write("{}\t{}\t{}\n".format(
                qid, training_query_positive_id[qid],
                ",".join(str(p) for p in negs)))
    sidecar = dict(metrics)
    sidecar["checkpoint"] = checkpoint_path
    ndcg_path = os.path.join(output_dir, ANN_NDCG_PREFIX + str(output_num))
    with open(ndcg_path, "w") as f:
        json.dump(sidecar, f)
    return data_path, ndcg_path
