"""Pipelined ANCE: index refresh overlapped with training on one schedule.

The reference runs trainer and index-builder as two polling jobs; a full
corpus re-encode stalls negative freshness for its entire duration
(reference run_ann.py:182-228 / run_ann_data_gen.py:663-702). Here both live
in ONE program on one mesh (SURVEY.md §7.2 step 8, the north star):

  * training params update every step;
  * ALL generator work — corpus re-encode, dev-query encode, dev search,
    train-query encode, mining search — is cut into fixed-size work items,
    one item executed between every ``train_steps_per_slice`` train steps, so
    the gap between consecutive train steps is bounded by ≈ one item instead
    of a whole generation (the stall the reference schedule serializes);
  * corpus embeddings live in HBM: each encode slice stays device-resident
    and lands in the sharded index buffer via an in-place
    ``dynamic_update_slice`` (FlatIPIndex.update_slice) — the O(corpus)
    host accumulate/concatenate/re-add round-trip is gone;
  * one buffer, no copy: the schedule orders every search item of refresh k
    strictly after its last corpus slice and strictly before refresh k+1's
    first slice, so searches always see a complete, consistent index and no
    second (double) buffer is needed.

Work-item tags in ``schedule_trace`` (T = train step between items):
  E corpus encode slice → in-HBM write       D dev-query encode
  S dev search chunk                          V dev metrics (host)
  Q train-query chunk encode                  M mining search + select
  F finalize: triples, feed swap, new snapshot, seed next cycle

Staleness semantics: negatives used at any step come from the previous
completed refresh — the same one-refresh lag as the reference's
checkpoint-polling loop, with ``train_steps_per_slice`` as the explicit
staleness/throughput knob (SURVEY.md §7.3 flags this as the knob to expose).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import logging
import random
import threading
import time
from typing import Callable, Mapping, Optional

import jax
import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import TripletBatches, infinite_batches
from ance_tpu.evaluation.metrics import (
    dedup_ranking, eval_dev_ndcg, recall_at_k)
from ance_tpu.index.flat import FlatIPIndex
from ance_tpu.train.ann_gen import mine_negatives, query_chunk_range
from ance_tpu.train.encode import encode_cache, encode_cache_to_device

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
    search_chunk_queries: int = 4096   # queries per search work item
    multichunk: bool = False
    index_quantize: Optional[str] = None  # 'dims': int8 HBM index (half the
                                          # bf16 footprint — what fits the
                                          # full 8.8M MS MARCO corpus on one
                                          # v5e core); scales snapshot from
                                          # the first encoded slice
    int8_clip_guard: float = 0.01      # mid-cycle guard: if a slice write
                                       # clips more than this fraction of
                                       # its entries, widen the cycle's
                                       # scales immediately (see
                                       # _encode_corpus_slice) — a sharp
                                       # magnitude shift must not silently
                                       # saturate the rest of the cycle
    rewarmup_per_dataset: bool = False  # reset the LR schedule at every
                                        # feed swap (reference default
                                        # without --single_warmup,
                                        # run_ann.py:210-215); needs
                                        # make_optimizer(..., rewarmup=...)
    shuffle_seed: int = 42
    feed_workers: int = 8              # mmap-gather prefetch threads
                                       # (DESIGN.md §5 feed table: 8 =
                                       # measured cold-cache optimum;
                                       # 0 = serial gathers)
    log_trust_ratios: bool = False     # LAMB trust-ratio stats per refresh
                                       # (reference lamb.py:11-22 log_lamb_rs)
    checkpoint_dir: Optional[str] = None
    save_every: int = 0                # steps between mid-run checkpoints
                                       # (0 = refresh boundaries only)
    host_id: int = 0                   # multi-host: this process's stripe
    num_hosts: int = 1                 # (reference run_ann.py:603-646
                                       # per-process topology; batch_size
                                       # and encode_batch_size are PER-HOST
                                       # row counts, global = x num_hosts)


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
                 mesh=None, metrics_logger=None, batch_transform=None):
        """``batch_transform`` maps a host-local feed batch to the global
        device batch (core.mesh.shard_batch on multi-host systems); None =
        feed batches go to the train step as-is."""
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
        self.mesh = mesh
        self.metrics_logger = metrics_logger
        self.batch_transform = batch_transform
        self._async_ckptr = None
        if cfg.num_hosts > 1 and mesh is None:
            raise ValueError("multi-host pipelined mode requires a mesh")
        self.index: Optional[FlatIPIndex] = None
        # serializes index buffer REPLACEMENT against live-serving readers:
        # update_slice DONATES the old embedding buffer (flat.py
        # _build_update), so a concurrent search that grabbed the old
        # reference would hit a deleted array. Writers (this loop's thread)
        # and external readers (serve.LoopRetriever) both take this lock;
        # loop-internal reads (dev search, mining) run on the writer thread
        # and need no lock.
        self.index_lock = threading.Lock()
        self.refresh_no = 0
        self._refresh_t0 = time.perf_counter()
        self.snapshot = self._snapshot_params()
        self._batches = None
        self.history: list[dict] = []
        self.schedule_trace: list[str] = []
        self.item_times: dict[str, list[float]] = collections.defaultdict(list)
        self._losses_since_refresh: list = []
        self._work: collections.deque = collections.deque()
        self._cyc: dict = {}  # per-cycle accumulators
        self._passage_ids: Optional[np.ndarray] = None
        self._rows_per_record: Optional[int] = None
        self._seed_cycle()

    def _snapshot_params(self):
        """Deep-copy the live params: the jitted train step donates its
        input state, so snapshot buffers must not alias it (the
        two-param-copies memory cost anticipated in SURVEY.md §7.3)."""
        import jax.numpy as jnp
        return jax.tree.map(jnp.copy, self.params_of(self.state))

    # -- work items ----------------------------------------------------------
    def _encode_corpus_slice(self, start: int, stop: int) -> None:
        """Encode corpus records [start, stop) with the snapshot params and
        write them straight into the HBM-resident index buffer."""
        emb, ids = encode_cache_to_device(
            self.bfn, self.snapshot, self.passage_cache,
            self.cfg.encode_batch_size, multichunk=self.cfg.multichunk,
            start=start, stop=stop, **self._host_kwargs())
        scales = None
        if self.cfg.index_quantize == "dims" and start == 0:
            # re-snapshot the corpus-global per-dim scales from this CYCLE's
            # first slice: every slice of a cycle is encoded with the same
            # frozen snapshot params, so scales taken here fit the whole
            # cycle (1.5x margin for slice-to-slice variation). Rows from the
            # previous cycle decode against the new scales until rewritten —
            # a bounded one-cycle mis-scaling, milder than the stale
            # negatives ANCE's convergence already tolerates (SURVEY §7.3
            # staleness semantics); drift shows up in int8_clip_frac.
            import jax.numpy as jnp
            amax = jnp.max(jnp.abs(emb.astype(jnp.float32)), axis=0)
            scales = jnp.maximum(amax * 1.5 / 127.0, 1e-8)
        if self.index is None or self.index._slice_rows is None:
            n = len(self.passage_cache)
            self._rows_per_record = emb.shape[0] // (stop - start)
            self._passage_ids = np.repeat(
                np.arange(n, dtype=np.int64), self._rows_per_record)
            if self.index is None:
                self.index = FlatIPIndex(
                    dim=emb.shape[1], mesh=self.mesh,
                    quantize=self.cfg.index_quantize or False)
            self.index.allocate(
                n * self._rows_per_record, emb.shape[1],
                slice_rows=self.cfg.encode_slice_size * self._rows_per_record,
                scales=scales)
        elif scales is not None:
            self.index.set_scales(scales)
        if self.cfg.index_quantize == "dims":
            # observability for the snapshot-scales design: the fraction of
            # entries the int8 write CLIPPED this cycle (row-weighted — a
            # short final slice must not skew the mean). Drift beyond the
            # cycle's scales shows up as int8_clip_frac in the refresh
            # entry instead of silently saturating the index.
            import jax.numpy as jnp
            if not hasattr(self, "_clip_count_fn"):
                self._clip_count_fn = jax.jit(lambda e, s: jnp.sum(
                    (jnp.abs(e.astype(jnp.float32)) >
                     s[None, :] * 127.0).astype(jnp.float32)))
            clipped = self._clip_count_fn(emb, self.index._scales)
            # MID-CYCLE GUARD: a sharp distribution shift between slices
            # must not saturate the index for the rest of the cycle. If
            # this slice clips beyond the threshold, widen the scales NOW
            # (monotonically — never shrink mid-cycle) before writing it.
            # Rows written earlier this cycle then decode slightly shrunk
            # against the wider scales — the same bounded one-cycle
            # mis-scaling as the cross-cycle case, vs unbounded saturation
            # without the guard.
            if self.cfg.int8_clip_guard and float(jax.device_get(clipped)) \
                    > self.cfg.int8_clip_guard * emb.size:
                amax = jnp.max(jnp.abs(emb.astype(jnp.float32)), axis=0)
                widened = jnp.maximum(
                    jnp.maximum(amax * 1.5 / 127.0, 1e-8),
                    self.index._scales)
                self.index.set_scales(widened)
                self._cyc["scale_widenings"] = \
                    self._cyc.get("scale_widenings", 0) + 1
                logger.warning(
                    "int8 clip guard: slice at row %s clipped >%.1f%% of "
                    "entries; widened per-dim scales mid-cycle (widening "
                    "#%s this cycle)", start,
                    100.0 * self.cfg.int8_clip_guard,
                    self._cyc["scale_widenings"])
                clipped = self._clip_count_fn(emb, self.index._scales)
            self._cyc.setdefault("clip_counts", []).append(
                (clipped, emb.size))
        with self.index_lock:
            self.index.update_slice(start * self._rows_per_record, emb)

    def _host_kwargs(self) -> dict:
        """Encode-path fan-out args: every host feeds its block of each
        global encode batch (global batch = num_hosts x encode_batch_size
        rows, contiguous in corpus order on the data axis)."""
        if self.cfg.num_hosts <= 1:
            return {}
        return {"host_id": self.cfg.host_id,
                "num_hosts": self.cfg.num_hosts, "mesh": self.mesh}

    def _encode_dev(self) -> None:
        self._cyc["dev_emb"], self._cyc["dev_ids"] = encode_cache(
            self.qfn, self.snapshot, self.dev_query_cache,
            self.cfg.encode_batch_size, **self._host_kwargs())

    def _search_dev(self, qs: int, qe: int) -> None:
        k = min(self.cfg.dev_search_depth, self.index.ntotal)
        _, nb = self.index.search(self._cyc["dev_emb"][qs:qe], k)
        self._cyc.setdefault("dev_nb", []).append(np.asarray(nb))

    def _dev_metrics(self) -> None:
        parts = self._cyc.pop("dev_nb", [])
        dev_ids = self._cyc.pop("dev_ids", np.zeros((0,), np.int64))
        if not parts or len(dev_ids) == 0:
            # empty dev set: no search items ran; report zeros rather than
            # kill the job at the first refresh boundary — but say so LOUDLY
            # once: at scale a broken dev feed would otherwise be
            # indistinguishable from a catastrophically bad model in the
            # metrics stream
            if not getattr(self, "_warned_empty_dev", False):
                self._warned_empty_dev = True
                logger.warning(
                    "dev metrics: ZERO dev queries reached the search items "
                    "(dev-query cache empty or dev search produced nothing); "
                    "dev_ndcg/dev_recall will report 0.0 — this is a broken "
                    "dev feed, not a model score")
            self._cyc["dev_ndcg"] = self._cyc["dev_recall"] = 0.0
            self._cyc.pop("dev_emb", None)
            return
        dev_nb = np.concatenate(parts, axis=0)
        k = min(self.cfg.dev_search_depth, self.index.ntotal)
        dev_ndcg, _ = eval_dev_ndcg(dev_nb, dev_ids, self._passage_ids,
                                    self.dev_qrels)
        # recall@search-depth: earlier-moving signal than NDCG@10
        dev_recall = recall_at_k(
            self.dev_qrels,
            dedup_ranking(dev_nb, dev_ids, self._passage_ids), k=k)
        self._cyc["dev_ndcg"], self._cyc["dev_recall"] = dev_ndcg, dev_recall
        self._cyc.pop("dev_emb", None)

    def _encode_train_queries(self, q_start: int, q_end: int) -> None:
        self._cyc["tq_emb"], self._cyc["tq_ids"] = encode_cache(
            self.qfn, self.snapshot, self.train_query_cache,
            self.cfg.encode_batch_size, start=q_start, stop=q_end,
            **self._host_kwargs())

    def _mine_chunk(self, qs: int, qe: int, chunk_no: int) -> None:
        cfg = self.cfg
        k = min(cfg.topk_training, self.index.ntotal)
        tq_emb = self._cyc["tq_emb"]
        tq_ids = self._cyc["tq_ids"][qs:qe]
        _, nb = self.index.search(tq_emb[qs:qe], k)
        negs, mrr = mine_negatives(
            tq_ids, self._passage_ids, self.train_positive, np.asarray(nb),
            cfg.negative_sample, select_topk=cfg.ann_measure_topk_mrr,
            rng=random.Random(cfg.shuffle_seed
                              + 7919 * self.refresh_no + chunk_no))
        self._cyc.setdefault("negatives", {}).update(negs)
        n_q = sum(1 for q in tq_ids if int(q) in self.train_positive)
        self._cyc.setdefault("mrr_parts", []).append((mrr, n_q))

    def _finalize_refresh(self) -> dict:
        """Build triples, switch the training feed, record metrics, take a
        new snapshot, and seed the next cycle's work queue."""
        cfg = self.cfg
        negatives = self._cyc.pop("negatives", {})
        parts = self._cyc.pop("mrr_parts", [(0.0, 0)])
        total_q = sum(w for _, w in parts)
        ann_mrr = (sum(m * w for m, w in parts) / total_q) if total_q else 0.0

        triples = []
        for qid, negs in negatives.items():
            pos = self.train_positive.get(qid)
            if pos is None:
                continue
            for neg in negs:
                triples.append((qid, pos, neg))
        if triples:
            # mining is deterministic and replicated, so every host builds
            # the identical triple list and stripes it by host_id — the
            # same global row coverage as the reference's StreamingDataset
            # rank striping (util.py:318-329)
            feed = TripletBatches(
                self.train_query_cache, self.passage_cache,
                np.asarray(triples, np.int64), cfg.batch_size,
                seed=cfg.shuffle_seed + self.refresh_no,
                host_id=cfg.host_id, num_hosts=cfg.num_hosts)
            self._batches = infinite_batches(
                feed, workers=cfg.feed_workers)
            if cfg.rewarmup_per_dataset:
                # fresh LR warmup for the new dataset, horizon = its size
                # (reference run_ann.py:210-215, num_training_steps =
                # len(ann_training_data))
                import dataclasses as _dc
                from ance_tpu.optim.schedules import reset_rewarmup
                self.state = _dc.replace(
                    self.state, opt_state=reset_rewarmup(
                        self.state.opt_state, horizon=len(triples)))

        entry = {"refresh": self.refresh_no,
                 "dev_ndcg": self._cyc.pop("dev_ndcg", 0.0),
                 "dev_recall": self._cyc.pop("dev_recall", 0.0),
                 "ann_mrr": ann_mrr, "num_triples": len(triples),
                 "step": int(jax.device_get(self.state.step))}
        if self._losses_since_refresh:
            entry["mean_loss"] = float(np.mean(
                jax.device_get(self._losses_since_refresh)))
            self._losses_since_refresh = []
        clip_counts = self._cyc.pop("clip_counts", None)
        if clip_counts:
            clipped = float(np.sum(jax.device_get(
                [c for c, _ in clip_counts])))
            entry["int8_clip_frac"] = clipped / sum(n for _, n in clip_counts)
            entry["int8_scale_widenings"] = self._cyc.pop(
                "scale_widenings", 0)
        if cfg.log_trust_ratios and hasattr(self.state, "opt_state"):
            from ance_tpu.optim.lamb import trust_ratio_summary
            summary = trust_ratio_summary(self.state.opt_state,
                                          self.params_of(self.state))
            if summary:
                entry.update(summary)
        entry["refresh_sec"] = round(
            time.perf_counter() - self._refresh_t0, 2)
        self._refresh_t0 = time.perf_counter()
        logger.info("pipelined refresh %s", entry)
        if self.metrics_logger is not None:
            self.metrics_logger.log(entry["step"], **{
                k: v for k, v in entry.items()
                if k != "step" and isinstance(v, (int, float))})
        self.history.append(entry)
        if cfg.checkpoint_dir:
            self._save_checkpoint()
        self.refresh_no += 1
        self._cyc.pop("tq_emb", None)
        self._cyc.pop("tq_ids", None)
        self.snapshot = self._snapshot_params()
        self._seed_cycle()
        return entry

    # -- cycle scheduling ------------------------------------------------------
    def _seed_cycle(self) -> None:
        """Queue one full refresh cycle as ordered work items. Search items
        come strictly after the last corpus slice, so every search sees a
        complete refreshed index (single-buffer consistency)."""
        cfg = self.cfg
        work = self._work
        n = len(self.passage_cache)
        for s in range(0, n, cfg.encode_slice_size):
            work.append(("E", functools.partial(
                self._encode_corpus_slice, s,
                min(s + cfg.encode_slice_size, n))))
        work.append(("D", self._encode_dev))
        n_dev = len(self.dev_query_cache)
        for qs in range(0, n_dev, cfg.search_chunk_queries):
            work.append(("S", functools.partial(
                self._search_dev, qs, min(qs + cfg.search_chunk_queries,
                                          n_dev))))
        work.append(("V", self._dev_metrics))
        q_start, q_end = query_chunk_range(
            len(self.train_query_cache), cfg.ann_chunk_factor,
            self.refresh_no)
        work.append(("Q", functools.partial(
            self._encode_train_queries, q_start, q_end)))
        n_tq = q_end - q_start
        for i, qs in enumerate(range(0, n_tq, cfg.search_chunk_queries)):
            work.append(("M", functools.partial(
                self._mine_chunk, qs, min(qs + cfg.search_chunk_queries,
                                          n_tq), i)))
        work.append(("F", self._finalize_refresh))

    def _save_checkpoint(self) -> None:
        """Params + optimizer state + refresh counter — enough for an
        idempotent restart (resume() re-bootstraps mining from the restored
        params; the reference's recovery is likewise regenerate-on-restart,
        run_ann_data_gen.py:663-666).

        NON-BLOCKING: only the device→host copy is synchronous; the disk
        write runs in orbax's background thread so it overlaps the next
        train steps instead of stalling the step gap (at 8.8M scale the
        params + LAMB moments serialize for seconds). The previous save is
        fenced first, and the DONE marker is published only at the fence —
        the completeness protocol is unchanged (reference save-fence
        behavior: run_warmup.py:222-244)."""
        from ance_tpu.train.checkpoint import AsyncCheckpointer
        if jax.process_index() != 0:
            return  # rank-0-only save (reference run_ann.py:307-334)
        if self._async_ckptr is None:
            self._async_ckptr = AsyncCheckpointer(self.cfg.checkpoint_dir)
        self._async_ckptr.wait()  # fence + publish any in-flight save
        step = int(jax.device_get(self.state.step))
        self._async_ckptr.save(step, self.params_of(self.state),
                               opt_state=getattr(self.state, "opt_state",
                                                 None),
                               extra={"refresh_no": self.refresh_no})

    def flush_checkpoints(self) -> None:
        """Fence the last async save (publishes its DONE marker). Call
        before shutdown or before reading the newest checkpoint."""
        if self._async_ckptr is not None:
            self._async_ckptr.wait()

    def resume(self) -> int:
        """Restore the newest complete checkpoint from cfg.checkpoint_dir
        into the training state (params + opt state + step + refresh
        rotation). Returns the resumed step (0 = nothing to resume)."""
        from ance_tpu.train import checkpoint as ckpt

        self.state, step, meta = ckpt.resume_train_state(
            self.cfg.checkpoint_dir, self.state)
        if step == 0:
            return 0
        self.refresh_no = int(meta.get("refresh_no", 0))
        # regenerate the in-flight cycle from the restored params
        self.snapshot = self._snapshot_params()
        self._work.clear()
        self._cyc.clear()
        self._batches = None
        self._seed_cycle()
        logger.info("pipelined resume: step %s, refresh %s", step,
                    self.refresh_no)
        return step

    def _run_item(self) -> None:
        tag, fn = self._work.popleft()
        t0 = time.perf_counter()
        fn()
        self.item_times[tag].append(time.perf_counter() - t0)
        self.schedule_trace.append(tag)

    def bootstrap(self) -> dict:
        """Initial full refresh (all work items back to back) before training
        starts — the reference's 'initial ann data generation'
        (commands/run_train.sh)."""
        start_refresh = self.refresh_no
        while self._batches is None:
            if self.refresh_no > start_refresh:
                # a whole cycle completed without producing a feed — loop
                # again and we'd re-encode the corpus forever
                raise RuntimeError(
                    "bootstrap refresh produced zero training triples "
                    "(no train qrels, or mining found no usable negatives); "
                    "check train-qrel.tsv and the corpus/query caches")
            self._run_item()
        return self.history[-1]

    # -- the interleaved schedule -------------------------------------------
    def run(self, num_steps: int) -> None:
        """Run ``num_steps`` train steps with ONE work item executed every
        ``train_steps_per_slice`` steps."""
        if num_steps <= 0:
            return  # a finished/resumed-complete job must not re-bootstrap
        if self._batches is None:
            self.bootstrap()
        for i in range(num_steps):
            self.rng, sub = jax.random.split(self.rng)
            batch = next(self._batches)
            if self.batch_transform is not None:
                batch = self.batch_transform(batch)
            self.state, metrics = self.train_step(self.state, batch, sub)
            # keep the device array — converting per step would force a sync
            # and break dispatch pipelining; resolved at refresh time
            self._losses_since_refresh.append(metrics["loss"])
            self.schedule_trace.append("T")
            if self.cfg.checkpoint_dir and self.cfg.save_every and \
                    (i + 1) % self.cfg.save_every == 0:
                self._save_checkpoint()
            if (i + 1) % self.cfg.train_steps_per_slice == 0 and self._work:
                self._run_item()
        self.flush_checkpoints()
