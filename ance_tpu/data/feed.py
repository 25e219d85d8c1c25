"""Host-side batch assembly from token caches.

Replaces the reference's StreamingDataset + processing-fn pipeline
(reference utils/util.py:310-329, data/msmarco_data.py:275-362) with
vectorized numpy gathers over the memory-mapped caches: a training-data line
``qid \\t pos_pid \\t neg1,neg2,...`` expands into one (query, positive,
negative) triple per negative; attention masks derive from stored lengths.

Sharding model: on multi-host systems each host feeds its own slice of the
line stream (``host_id``/``num_hosts`` stripe the expanded triples the way
StreamingDataset stripes per DDP rank); within a host, batches are delivered
whole and pjit splits them across local devices along the data axis.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np

from ance_tpu.data.cache import TokenCache


def parse_triple_line(line: str) -> tuple[int, int, list[int]]:
    """``qid\\tpos\\tneg1,neg2,...`` (reference msmarco_data.py:338-343)."""
    qid_s, pos_s, negs_s = line.rstrip("\n").split("\t")
    return int(qid_s), int(pos_s), [int(x) for x in negs_s.split(",")]


def expand_triples(lines: Sequence[str]) -> np.ndarray:
    """Lines → [T, 3] int64 (qid, pos_pid, neg_pid), one row per negative."""
    rows = []
    for line in lines:
        if not line.strip():
            continue
        qid, pos, negs = parse_triple_line(line)
        for neg in negs:
            rows.append((qid, pos, neg))
    return np.asarray(rows, dtype=np.int64).reshape(-1, 3)


def sample_one_neg_triples(lines: Sequence[str], seed: int = 0) -> np.ndarray:
    """Lines → [T, 3] with ONE randomly chosen negative per line — the DPR
    feed semantics (reference DPR_data.py:321-327: shuffle negs, take the
    first)."""
    rs = np.random.RandomState(seed)
    rows = []
    for line in lines:
        if not line.strip():
            continue
        qid, pos, negs = parse_triple_line(line)
        rows.append((qid, pos, negs[rs.randint(len(negs))]))
    return np.asarray(rows, dtype=np.int64).reshape(-1, 3)


def mask_from_lengths(lengths: np.ndarray, max_len: int) -> np.ndarray:
    return (np.arange(max_len)[None, :] < lengths[:, None]).astype(np.int32)


def gather_padded(cache: TokenCache, keys: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(ids [B, L] int32, mask [B, L] int32) for a batch of cache offsets."""
    lengths, tokens = cache.batch(keys)
    return tokens.astype(np.int32), mask_from_lengths(
        lengths, cache.embedding_size)


@dataclasses.dataclass
class TripletBatches:
    """Iterate (query, pos, neg) batches from caches + training-data lines.

    ``seed >= 0`` shuffles triple order each epoch (the generator already
    shuffles lines when writing, reference run_ann_data_gen.py:314-320; this
    covers the warmup/epoch path). Incomplete trailing batches are dropped,
    matching DataLoader semantics under DDP striping.
    """

    query_cache: TokenCache
    passage_cache: TokenCache
    triples: np.ndarray            # [T, 3] from expand_triples
    batch_size: int
    seed: int = -1
    host_id: int = 0
    num_hosts: int = 1

    def __len__(self) -> int:
        local = len(range(self.host_id, self.triples.shape[0], self.num_hosts))
        return local // self.batch_size

    def _epoch_triples(self, epoch_idx: int) -> np.ndarray:
        triples = self.triples[self.host_id::self.num_hosts]
        if self.seed >= 0:
            perm = np.random.RandomState(self.seed + epoch_idx).permutation(
                triples.shape[0])
            triples = triples[perm]
        return triples

    def _build_batch(self, rows: np.ndarray) -> dict:
        q_ids, q_mask = gather_padded(self.query_cache, rows[:, 0])
        p_ids, p_mask = gather_padded(self.passage_cache, rows[:, 1])
        n_ids, n_mask = gather_padded(self.passage_cache, rows[:, 2])
        return {"query_ids": q_ids, "query_mask": q_mask,
                "pos_ids": p_ids, "pos_mask": p_mask,
                "neg_ids": n_ids, "neg_mask": n_mask}

    def epoch(self, epoch_idx: int = 0) -> Iterator[dict]:
        triples = self._epoch_triples(epoch_idx)
        B = self.batch_size
        for start in range(0, triples.shape[0] - B + 1, B):
            yield self._build_batch(triples[start:start + B])

    def epoch_prefetched(self, epoch_idx: int = 0, workers: int = 4,
                         depth: int = 8) -> Iterator[dict]:
        """``epoch()`` with up to ``workers`` batches gathered concurrently
        (identical batches, identical order).

        Why threads help a pure-numpy gather: on a cache that is not
        page-cache-resident, the gathers are mmap page faults — IO wait
        that releases the GIL — and ONE faulting thread sustains only
        ~0.7k record-rows/s from disk (docs/perf_feed_r5.py), below the
        ~1.6k rows/s a b64/95 ms train step demands. ``workers`` faulting
        threads keep that many reads in the disk queue, the standard
        replacement for the reference DataLoader's num_workers processes
        (reference run_ann.py:230-235). ``depth`` bounds completed batches
        held ahead of the consumer."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        triples = self._epoch_triples(epoch_idx)
        B = self.batch_size
        starts = range(0, triples.shape[0] - B + 1, B)
        pending: "collections.deque" = collections.deque()
        with ThreadPoolExecutor(max_workers=workers,
                                thread_name_prefix="ance-feed") as ex:
            try:
                for s in starts:
                    pending.append(
                        ex.submit(self._build_batch, triples[s:s + B]))
                    if len(pending) >= max(depth, workers):
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                for f in pending:
                    f.cancel()


def prefetch_batches(batches: Iterator[dict], depth: int = 4
                     ) -> Iterator[dict]:
    """Stage batches ahead on a background thread (SURVEY §7.3's
    "mmap + prefetch workers"; replaces the reference's DataLoader
    num_workers overlap, reference run_ann.py:230-235).

    The gather work in TripletBatches is numpy page-faulting into the
    mmapped caches — pure IO-wait that releases the GIL — so one thread
    overlaps it with the device step even on a 1-core host. ``depth``
    bounds staged batches (each ~a few hundred KB) so a stalled consumer
    can't balloon memory. Worker exceptions re-raise at the consumer;
    closing the generator (or dropping it) unblocks and ends the worker.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for b in batches:
                while not stop.is_set():
                    try:
                        q.put(b, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            item = _END
        except BaseException as e:  # re-raised consumer-side
            item = e
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=worker, daemon=True,
                         name="ance-feed-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def infinite_batches(batches: TripletBatches, *,
                     workers: int = 8) -> Iterator[dict]:
    """Re-iterate forever (reference run_ann.py:230-235 re-iterates the
    StreamingDataset on StopIteration).

    ``workers > 0`` gathers batches through :meth:`epoch_prefetched` —
    order-identical to the serial path but with that many mmap-faulting
    reads kept in the disk queue, the production default: a cold 18 GB
    cache sustains only ~425 rows/s single-threaded vs 1,720 with 8
    workers (docs/perf_feed_r5.py, DESIGN.md §5 feed table). ``workers=0``
    keeps the serial ``epoch()`` path."""
    epoch = 0
    while True:
        yielded = False
        it = (batches.epoch_prefetched(epoch, workers=workers) if workers
              else batches.epoch(epoch))
        for b in it:
            yielded = True
            yield b
        if not yielded:
            raise ValueError("dataset smaller than one batch")
        epoch += 1
