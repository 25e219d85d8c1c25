"""Metrics logging + profiling hooks.

Replaces the reference's rank-0 TensorBoard writer + NDCG JSON sidecars
(reference run_ann.py:50-52, 220-227, 294-305; SURVEY.md §5.5) with a
durable JSONL metrics log, and adds jax profiler capture (SURVEY.md §5.1
notes the reference has no tracing at all — free win).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Iterator, Optional


def setup_logging(rank: int = 0, log_dir: Optional[str] = None) -> None:
    """Rank-aware level (INFO on rank 0, WARN elsewhere — reference
    run_ann.py:630-643)."""
    level = logging.INFO if rank in (-1, 0) else logging.WARNING
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    if log_dir and rank in (-1, 0):
        os.makedirs(log_dir, exist_ok=True)
        handler = logging.FileHandler(os.path.join(log_dir, "train.log"))
        logging.getLogger().addHandler(handler)


class MetricsLogger:
    """Append-only JSONL metrics: one line per event, flushed immediately
    (durable like the reference's ann_ndcg_* sidecars)."""

    def __init__(self, path: Optional[str], enabled: bool = True):
        self.enabled = enabled and path is not None
        self._f = None
        if self.enabled:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)

    def log(self, step: int, **metrics) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._f:
            self._f.close()


@contextlib.contextmanager
def profile(log_dir: Optional[str]) -> Iterator[None]:
    """jax profiler trace capture (view with TensorBoard/XProf)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + examples/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0
