"""ANN data generation: encode → index → evaluate → mine → hand off.

The generator half of the ANCE loop (reference drivers/run_ann_data_gen.py).
Behavioral parity, TPU-native internals:

  * encoding runs through :mod:`ance_tpu.train.encode` (data-parallel mesh)
    instead of per-rank StreamInferenceDoc + NFS shard merge;
  * FAISS FlatIP is replaced by :class:`ance_tpu.index.flat.FlatIPIndex`
    (device-resident, shard_map'd);
  * file protocol unchanged: ``ann_training_data_<n>`` (shuffled
    ``qid\\tpos\\tneg,...`` lines) then ``ann_ndcg_<n>`` JSON written LAST as
    the completeness signal (reference run_ann_data_gen.py:314-334;
    discovery via util.py:229-243).
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Mapping, Optional, Sequence

import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.evaluation.metrics import eval_dev_ndcg
from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.train.encode import encode_cache

ANN_DATA_PREFIX = "ann_training_data_"
ANN_NDCG_PREFIX = "ann_ndcg_"


# --------------------------------------------------------------------------
# Discovery (trainer side)

def get_latest_ann_data(ann_dir: str) -> tuple[int, Optional[str], Optional[dict]]:
    """Newest (data_no, training_data_path, ndcg_json); (−1, None, None) if
    none (reference utils/util.py:229-243 — ndcg file is the ready signal)."""
    if not os.path.isdir(ann_dir):
        return -1, None, None
    nums = []
    for name in next(os.walk(ann_dir))[2]:
        if name.startswith(ANN_NDCG_PREFIX):
            try:
                nums.append(int(name[len(ANN_NDCG_PREFIX):]))
            except ValueError:
                continue
    if not nums:
        return -1, None, None
    n = max(nums)
    with open(os.path.join(ann_dir, ANN_NDCG_PREFIX + str(n))) as f:
        ndcg_json = json.load(f)
    return n, os.path.join(ann_dir, ANN_DATA_PREFIX + str(n)), ndcg_json


# --------------------------------------------------------------------------
# Query chunk rotation

def query_chunk_range(num_queries: int, chunk_factor: int,
                      output_num: int) -> tuple[int, int]:
    """1/chunk_factor of train queries per generation, rotating by
    output_num (reference run_ann_data_gen.py:281-296).

    chunk_factor is clamped to num_queries: with fewer queries than chunks
    (tiny corpora, smoke runs) per_chunk would be 0 and every non-last
    rotation would hand the encoder an EMPTY range, which crashes the
    refresh (np.concatenate of zero batches) instead of mining."""
    if chunk_factor <= 0:
        chunk_factor = 1
    chunk_factor = max(1, min(chunk_factor, num_queries))
    effective_idx = output_num % chunk_factor
    per_chunk = num_queries // chunk_factor
    start = per_chunk * effective_idx
    end = num_queries if effective_idx == chunk_factor - 1 \
        else start + per_chunk
    return start, end


# --------------------------------------------------------------------------
# Negative mining

def mine_negatives(query_embedding2id: np.ndarray,
                   passage_embedding2id: np.ndarray,
                   training_query_positive_id: Mapping[int, int],
                   neighbor_ids: np.ndarray,
                   negative_sample: int,
                   select_topk: bool = False,
                   rng: Optional[random.Random] = None
                   ) -> tuple[dict[int, list[int]], float]:
    """Top-k (or shuffled) negative selection with positive-skip, dedupe, and
    inline MRR probe (reference run_ann_data_gen.py:339-396).

    Returns (qid → negative pids, mrr) — mrr is meaningful only when
    ``select_topk``.
    """
    rng = rng or random.Random(0)
    query_negative_passage: dict[int, list[int]] = {}
    mrr = 0.0
    num_queries = 0
    for qi in range(neighbor_ids.shape[0]):
        qid = int(query_embedding2id[qi])
        if qid not in training_query_positive_id:
            continue
        num_queries += 1
        pos_pid = training_query_positive_id[qid]
        row = neighbor_ids[qi]
        if select_topk:
            selected = row[:negative_sample + 1]
        else:
            idx = list(range(neighbor_ids.shape[1]))
            rng.shuffle(idx)
            selected = row[idx]
        negs: list[int] = []
        rank = 0
        for emb_idx in selected:
            neg_pid = int(passage_embedding2id[emb_idx])
            rank += 1
            if neg_pid == pos_pid:
                if rank <= 10:
                    mrr += 1.0 / rank
                continue
            if neg_pid in negs:
                continue
            if len(negs) >= negative_sample:
                break
            negs.append(neg_pid)
        query_negative_passage[qid] = negs
    return query_negative_passage, (mrr / num_queries if num_queries else 0.0)


# --------------------------------------------------------------------------
# File handoff

def write_ann_data(output_dir: str, output_num: int,
                   query_embedding2id: np.ndarray,
                   training_query_positive_id: Mapping[int, int],
                   query_negative_passage: Mapping[int, Sequence[int]],
                   dev_ndcg: float, checkpoint_path: str,
                   seed: int = 0) -> tuple[str, str]:
    """Write shuffled triple lines then the ndcg JSON sidecar (ready signal
    LAST — reference run_ann_data_gen.py:314-334)."""
    os.makedirs(output_dir, exist_ok=True)
    data_path = os.path.join(output_dir, ANN_DATA_PREFIX + str(output_num))
    order = list(range(len(query_embedding2id)))
    random.Random(seed).shuffle(order)
    with open(data_path, "w") as f:
        for qi in order:
            qid = int(query_embedding2id[qi])
            if qid not in training_query_positive_id or \
                    qid not in query_negative_passage:
                continue
            negs = query_negative_passage[qid]
            if not negs:
                continue
            f.write("{}\t{}\t{}\n".format(
                qid, training_query_positive_id[qid],
                ",".join(str(p) for p in negs)))
    ndcg_path = os.path.join(output_dir, ANN_NDCG_PREFIX + str(output_num))
    with open(ndcg_path, "w") as f:
        json.dump({"ndcg": dev_ndcg, "checkpoint": checkpoint_path}, f)
    return data_path, ndcg_path


# --------------------------------------------------------------------------
# Full generation pass

@dataclasses.dataclass
class AnnGenConfig:
    topk_training: int = 500
    negative_sample: int = 5
    ann_chunk_factor: int = 5        # reference default (run_ann_data_gen.py:542)
    ann_measure_topk_mrr: bool = False
    dev_search_depth: int = 100      # dev_I search width (run_ann_data_gen.py:276)
    encode_batch_size: int = 128
    multichunk: bool = False         # MaxP document mode
    index_quantize: str | None = None  # 'dims': int8 index (full 8.8M corpus
                                       # on one v5e core; see index/flat.py)
    seed: int = 0


def generate_new_ann(cfg: AnnGenConfig, *,
                     output_num: int,
                     checkpoint_path: str,
                     params,
                     query_encode_fn,
                     body_encode_fn,
                     dev_query_cache: TokenCache,
                     passage_cache: TokenCache,
                     train_query_cache: TokenCache,
                     training_query_positive_id: Mapping[int, int],
                     dev_query_positive_id: Mapping[int, Mapping[int, int]],
                     output_dir: str,
                     index: Optional[FlatIPIndex] = None,
                     inference_only: bool = False,
                     mesh=None) -> Optional[dict]:
    """One encode→index→eval→mine→write pass
    (reference run_ann_data_gen.py:231-336). ``mesh`` shards the freshly
    built index over the data axis (the reference shards its inference the
    same way, util.py:318-329; rank-0-only FAISS build had no equivalent
    to lose)."""
    dev_q_emb, dev_q_ids = encode_cache(
        query_encode_fn, params, dev_query_cache, cfg.encode_batch_size)
    passage_emb, passage_ids = encode_cache(
        body_encode_fn, params, passage_cache, cfg.encode_batch_size,
        multichunk=cfg.multichunk)

    if index is None:
        index = FlatIPIndex(dim=passage_emb.shape[1], mesh=mesh,
                            quantize=cfg.index_quantize or False)
    if index.quantize == "dims":
        # streamed build — never stages the fp corpus in HBM (27 GB at the
        # 8.8M reference scale; the int8 index is 6.3 GB)
        index.add_chunked(passage_emb)
    else:
        index.add(passage_emb)

    if inference_only:
        return {"index": index, "passage_embedding2id": passage_ids,
                "dev_query_embedding": dev_q_emb,
                "dev_query_embedding2id": dev_q_ids}

    _, dev_neighbors = index.search(dev_q_emb, cfg.dev_search_depth)
    dev_ndcg, num_dev = eval_dev_ndcg(
        np.asarray(dev_neighbors), dev_q_ids, passage_ids,
        dev_query_positive_id)

    n_train_q = len(train_query_cache)
    q_start, q_end = query_chunk_range(n_train_q, cfg.ann_chunk_factor,
                                       output_num)
    train_q_emb, train_q_ids = encode_cache(
        query_encode_fn, params, train_query_cache, cfg.encode_batch_size,
        start=q_start, stop=q_end)

    _, train_neighbors = index.search(train_q_emb, cfg.topk_training)
    negatives, ann_mrr = mine_negatives(
        train_q_ids, passage_ids, training_query_positive_id,
        np.asarray(train_neighbors), cfg.negative_sample,
        select_topk=cfg.ann_measure_topk_mrr,
        rng=random.Random(cfg.seed + output_num))

    data_path, ndcg_path = write_ann_data(
        output_dir, output_num, train_q_ids, training_query_positive_id,
        negatives, dev_ndcg, checkpoint_path, seed=cfg.seed + output_num)
    return {"dev_ndcg": dev_ndcg, "num_queries_dev": num_dev,
            "ann_mrr": ann_mrr, "data_path": data_path,
            "ndcg_path": ndcg_path, "index": index,
            "passage_embedding2id": passage_ids}
