"""Pipelined ANCE: index refresh overlapped with training on one schedule.

The reference runs trainer and index-builder as two polling jobs; a full
corpus re-encode stalls negative freshness for its entire duration
(reference run_ann.py:182-228 / run_ann_data_gen.py:663-702). Here both live
in ONE program on one mesh (SURVEY.md §7.2 step 8, the north star):

  * training params update every step;
  * a frozen SNAPSHOT of the params encodes the corpus in fixed-size slices,
    one slice scheduled between every ``train_steps_per_slice`` train steps —
    re-encode cost is amortized instead of serialized;
  * when the last slice lands, the refreshed embeddings swap into the
    HBM-resident index, dev NDCG is evaluated, the next train-query chunk is
    mined for negatives (rotation parity: reference
    run_ann_data_gen.py:281-296), the training feed switches to the new
    triples, and a new snapshot is taken.

Staleness semantics: negatives used at any step come from the previous
completed refresh — the same one-refresh lag as the reference's
checkpoint-polling loop, with ``train_steps_per_slice`` as the explicit
staleness/throughput knob (SURVEY.md §7.3 flags this as the knob to expose).
"""

from __future__ import annotations

import dataclasses
import logging
import random
from typing import Callable, Mapping, Optional

import jax
import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import TripletBatches, expand_triples, infinite_batches
from ance_tpu.evaluation.metrics import eval_dev_ndcg
from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.train.ann_gen import mine_negatives, query_chunk_range
from ance_tpu.train.encode import encode_cache

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PipelineConfig:
    train_steps_per_slice: int = 8     # staleness/throughput knob
    encode_slice_size: int = 4096      # corpus records per encode slice
    encode_batch_size: int = 128
    batch_size: int = 32
    topk_training: int = 500
    negative_sample: int = 5
    ann_chunk_factor: int = 5
    ann_measure_topk_mrr: bool = False
    dev_search_depth: int = 100
    multichunk: bool = False
    shuffle_seed: int = 42


class PipelinedAnce:
    """Single-program ANCE with slice-pipelined index refresh."""

    def __init__(self, cfg: PipelineConfig, *, state, train_step: Callable,
                 rng, params_of: Callable,
                 query_encode_fn, body_encode_fn,
                 passage_cache: TokenCache,
                 train_query_cache: TokenCache,
                 dev_query_cache: TokenCache,
                 train_qrels: Mapping[int, Mapping[int, int]],
                 dev_qrels: Mapping[int, Mapping[int, int]],
                 mesh=None):
        self.cfg = cfg
        self.state = state
        self.train_step = train_step
        self.rng = rng
        self.params_of = params_of
        self.qfn, self.bfn = query_encode_fn, body_encode_fn
        self.passage_cache = passage_cache
        self.train_query_cache = train_query_cache
        self.dev_query_cache = dev_query_cache
        self.train_positive = {q: next(iter(r))
                               for q, r in train_qrels.items() if r}
        self.dev_qrels = dev_qrels
        self.index: Optional[FlatIPIndex] = None
        if mesh is not None:
            self.index = FlatIPIndex(dim=0, mesh=mesh)  # dim set on first add
        self.refresh_no = 0
        self.snapshot = self._snapshot_params()
        self._slice_cursor = 0
        self._emb_parts: list[np.ndarray] = []
        self._id_parts: list[np.ndarray] = []
        self._batches = None
        self.history: list[dict] = []
        self.schedule_trace: list[str] = []  # 'T' train step / 'E' slice
        self._losses_since_refresh: list[float] = []

    def _snapshot_params(self):
        """Deep-copy the live params: the jitted train step donates its
        input state, so snapshot buffers must not alias it (the
        two-param-copies memory cost anticipated in SURVEY.md §7.3)."""
        import jax.numpy as jnp
        return jax.tree.map(jnp.copy, self.params_of(self.state))

    # -- refresh machinery --------------------------------------------------
    def _encode_slice(self) -> bool:
        """Encode the next corpus slice with the snapshot params. Returns
        True when this slice completed the corpus."""
        n = len(self.passage_cache)
        start = self._slice_cursor
        stop = min(start + self.cfg.encode_slice_size, n)
        emb, ids = encode_cache(self.bfn, self.snapshot, self.passage_cache,
                                self.cfg.encode_batch_size,
                                multichunk=self.cfg.multichunk,
                                start=start, stop=stop)
        self._emb_parts.append(emb)
        self._id_parts.append(ids)
        self._slice_cursor = stop
        self.schedule_trace.append("E")
        return stop >= n

    def _finish_refresh(self) -> dict:
        """Swap refreshed embeddings into the index, evaluate, mine, switch
        the training feed, take a new snapshot."""
        cfg = self.cfg
        passage_emb = np.concatenate(self._emb_parts, axis=0)
        passage_ids = np.concatenate(self._id_parts, axis=0)
        self._emb_parts, self._id_parts = [], []
        self._slice_cursor = 0

        if self.index is None:
            self.index = FlatIPIndex(dim=passage_emb.shape[1])
        elif self.index.dim == 0:
            self.index.dim = passage_emb.shape[1]
        self.index.add(passage_emb)  # atomic in-HBM swap

        dev_emb, dev_ids = encode_cache(self.qfn, self.snapshot,
                                        self.dev_query_cache,
                                        cfg.encode_batch_size)
        k_dev = min(cfg.dev_search_depth, self.index.ntotal)
        _, dev_nb = self.index.search(dev_emb, k_dev)
        dev_nb = np.asarray(dev_nb)
        dev_ndcg, _ = eval_dev_ndcg(dev_nb, dev_ids, passage_ids,
                                    self.dev_qrels)
        # recall@search-depth: earlier-moving signal than NDCG@10
        from ance_tpu.evaluation.metrics import dedup_ranking, recall_at_k
        dev_recall = recall_at_k(
            self.dev_qrels,
            dedup_ranking(dev_nb, dev_ids, passage_ids), k=k_dev)

        n_q = len(self.train_query_cache)
        q_start, q_end = query_chunk_range(n_q, cfg.ann_chunk_factor,
                                           self.refresh_no)
        tq_emb, tq_ids = encode_cache(self.qfn, self.snapshot,
                                      self.train_query_cache,
                                      cfg.encode_batch_size,
                                      start=q_start, stop=q_end)
        k_mine = min(cfg.topk_training, self.index.ntotal)
        _, nb = self.index.search(tq_emb, k_mine)
        negatives, ann_mrr = mine_negatives(
            tq_ids, passage_ids, self.train_positive, np.asarray(nb),
            cfg.negative_sample, select_topk=cfg.ann_measure_topk_mrr,
            rng=random.Random(cfg.shuffle_seed + self.refresh_no))

        triples = []
        for qid, negs in negatives.items():
            pos = self.train_positive.get(qid)
            if pos is None:
                continue
            for neg in negs:
                triples.append((qid, pos, neg))
        if triples:
            feed = TripletBatches(
                self.train_query_cache, self.passage_cache,
                np.asarray(triples, np.int64), cfg.batch_size,
                seed=cfg.shuffle_seed + self.refresh_no)
            self._batches = infinite_batches(feed)

        entry = {"refresh": self.refresh_no, "dev_ndcg": dev_ndcg,
                 "dev_recall": dev_recall,
                 "ann_mrr": ann_mrr, "num_triples": len(triples),
                 "step": int(jax.device_get(self.state.step))}
        if self._losses_since_refresh:
            entry["mean_loss"] = float(np.mean(
                jax.device_get(self._losses_since_refresh)))
            self._losses_since_refresh = []
        logger.info("pipelined refresh %s", entry)
        self.history.append(entry)
        self.refresh_no += 1
        self.snapshot = self._snapshot_params()
        return entry

    def bootstrap(self) -> dict:
        """Initial full refresh (all slices) before training starts — the
        reference's 'initial ann data generation' (commands/run_train.sh)."""
        while not self._encode_slice():
            pass
        return self._finish_refresh()

    # -- the interleaved schedule -------------------------------------------
    def run(self, num_steps: int) -> None:
        """Run ``num_steps`` train steps with encode slices interleaved every
        ``train_steps_per_slice`` steps."""
        if self._batches is None:
            self.bootstrap()
        for i in range(num_steps):
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = self.train_step(self.state,
                                                  next(self._batches), sub)
            # keep the device array — converting per step would force a sync
            # and break dispatch pipelining; resolved at refresh time
            self._losses_since_refresh.append(metrics["loss"])
            self.schedule_trace.append("T")
            if (i + 1) % self.cfg.train_steps_per_slice == 0:
                if self._encode_slice():
                    self._finish_refresh()
