"""The ANCE loop: train on mined negatives while the index refreshes.

Three operating modes, increasing TPU-nativeness:

  1. :func:`run_trainer_job` / :func:`run_generator_job` — two-process
     filesystem-polling compatibility mode, matching the reference's
     architecture exactly (reference run_ann.py:182-228 consumer,
     run_ann_data_gen.py:663-702 producer; checkpoints one way,
     ann_training_data/ann_ndcg the other).
  2. :func:`run_ance_cycles` — single-program alternation: generate → train →
     checkpoint → repeat. Same staleness semantics as (1) with one refresh of
     lag, no polling.
  3. pipelined refresh (train/pipelined.py) — re-encode slices interleaved
     with train steps on one mesh schedule, the SURVEY.md §7.2 step-8 north
     star.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Callable, Mapping, Optional

import jax
import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import TripletBatches, expand_triples, infinite_batches
from ance_tpu.train import checkpoint as ckpt
from ance_tpu.train.ann_gen import (
    AnnGenConfig, generate_new_ann, get_latest_ann_data)

logger = logging.getLogger(__name__)


def load_offset_qrels(path: str) -> dict[int, dict[int, int]]:
    """Offset-space qrels ``qoffset\\tpoffset\\trel`` written by preprocessing
    (reference data/msmarco_data.py:101-123)."""
    out: dict[int, dict[int, int]] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            q, p, rel = line.rstrip("\n").split("\t")
            out.setdefault(int(q), {})[int(p)] = int(rel)
    return out


def positives_from_qrels(qrels: Mapping[int, Mapping[int, int]]
                         ) -> dict[int, int]:
    """qid → single positive pid (reference keeps one positive per train
    query, run_ann_data_gen.py:74-101)."""
    return {qid: next(iter(rels)) for qid, rels in qrels.items() if rels}


@dataclasses.dataclass
class AnceCycleConfig:
    steps_per_cycle: int = 100
    batch_size: int = 32
    num_cycles: int = 3
    shuffle_seed: int = 42
    checkpoint_dir: Optional[str] = None
    feed_workers: int = 8   # mmap-gather prefetch threads (DESIGN.md §5
    # feed table: 8 = measured cold-cache optimum; 0 = serial gathers)


def run_ance_cycles(cycle_cfg: AnceCycleConfig, gen_cfg: AnnGenConfig, *,
                    state, train_step: Callable, rng,
                    params_of: Callable,
                    query_encode_fn, body_encode_fn,
                    dev_query_cache: TokenCache,
                    passage_cache: TokenCache,
                    train_query_cache: TokenCache,
                    train_qrels: Mapping[int, Mapping[int, int]],
                    dev_qrels: Mapping[int, Mapping[int, int]],
                    output_dir: str) -> tuple[object, list[dict]]:
    """Single-program generate→train alternation. Returns (state, history).

    ``params_of(state)`` extracts encoder params from the train state so the
    generator always encodes with the freshest weights (the reference's
    checkpoint lag collapses to zero here; cadence is the staleness knob,
    SURVEY.md §7.3).
    """
    training_positive = positives_from_qrels(train_qrels)
    history = []
    for cycle in range(cycle_cfg.num_cycles):
        result = generate_new_ann(
            gen_cfg, output_num=cycle,
            checkpoint_path=f"cycle-{cycle}",
            params=params_of(state),
            query_encode_fn=query_encode_fn,
            body_encode_fn=body_encode_fn,
            dev_query_cache=dev_query_cache,
            passage_cache=passage_cache,
            train_query_cache=train_query_cache,
            training_query_positive_id=training_positive,
            dev_query_positive_id=dev_qrels,
            output_dir=output_dir)
        lines = open(result["data_path"]).read().splitlines()
        feed = TripletBatches(
            train_query_cache, passage_cache, expand_triples(lines),
            batch_size=cycle_cfg.batch_size,
            seed=cycle_cfg.shuffle_seed + cycle)
        it = infinite_batches(feed, workers=cycle_cfg.feed_workers)
        losses = []
        for _ in range(cycle_cfg.steps_per_cycle):
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, next(it), sub)
            losses.append(float(metrics["loss"]))
        entry = {"cycle": cycle, "dev_ndcg": result["dev_ndcg"],
                 "ann_mrr": result["ann_mrr"],
                 "mean_loss": float(np.mean(losses)),
                 "data_path": result["data_path"]}
        logger.info("ANCE cycle %s: %s", cycle, entry)
        history.append(entry)
        if cycle_cfg.checkpoint_dir:
            ckpt.save_checkpoint(cycle_cfg.checkpoint_dir,
                                 int(jax.device_get(state.step)),
                                 params_of(state), extra={"cycle": cycle})
    return state, history


# --------------------------------------------------------------------------
# Two-job filesystem-polling compatibility mode

def run_generator_job(gen_cfg: AnnGenConfig, *,
                      training_dir: str, init_params,
                      load_params: Callable[[str], object],
                      query_encode_fn, body_encode_fn,
                      dev_query_cache, passage_cache, train_query_cache,
                      train_qrels, dev_qrels, output_dir: str,
                      poll_interval: float = 60.0,
                      max_iterations: Optional[int] = None) -> list[dict]:
    """Poll ``training_dir`` for new complete checkpoints; regenerate on each
    (reference run_ann_data_gen.py:663-702, 60 s sleep loop)."""
    training_positive = positives_from_qrels(train_qrels)
    last_checkpoint = object()  # sentinel: first pass always generates, even
    # with no checkpoint yet (reference generates from init_model_dir,
    # run_ann_data_gen.py:664-700)
    output_num, _, _ = get_latest_ann_data(output_dir)
    output_num += 1
    history = []
    iteration = 0
    while max_iterations is None or iteration < max_iterations:
        iteration += 1
        ckpt_path, step = ckpt.get_latest_checkpoint(training_dir)
        if ckpt_path == last_checkpoint:
            time.sleep(poll_interval)
            continue
        params = init_params if ckpt_path is None \
            else load_params(ckpt_path)
        result = generate_new_ann(
            gen_cfg, output_num=output_num,
            checkpoint_path=ckpt_path or "<init>",
            params=params,
            query_encode_fn=query_encode_fn,
            body_encode_fn=body_encode_fn,
            dev_query_cache=dev_query_cache,
            passage_cache=passage_cache,
            train_query_cache=train_query_cache,
            training_query_positive_id=training_positive,
            dev_query_positive_id=dev_qrels,
            output_dir=output_dir)
        result["checkpoint"] = ckpt_path
        result.pop("index", None)
        result.pop("passage_embedding2id", None)
        history.append(result)
        last_checkpoint = ckpt_path
        output_num += 1
    return history


def run_trainer_job(cycle_cfg: AnceCycleConfig, *,
                    state, train_step: Callable, rng,
                    params_of: Callable,
                    query_cache: TokenCache, passage_cache: TokenCache,
                    ann_dir: str, training_dir: str,
                    max_steps: int,
                    poll_every: int = 100,
                    save_every: int = 500,
                    poll_interval: float = 5.0,
                    triples_fn: Callable = expand_triples,
                    metrics_logger=None,
                    host_id: int = 0, num_hosts: int = 1,
                    batch_transform: Optional[Callable] = None,
                    rewarmup_per_dataset: bool = False) -> object:
    """Train forever, polling ``ann_dir`` for fresh data every ``poll_every``
    steps and checkpointing every ``save_every``
    (reference run_ann.py:180-334).

    ``triples_fn``: lines → [T, 3] triples; pass
    :func:`ance_tpu.data.feed.sample_one_neg_triples` for the DPR feed.
    On multi-host meshes pass this process's ``host_id``/``num_hosts`` (the
    feed stripes triples per host) and ``batch_transform`` assembling local
    rows into global arrays (:func:`ance_tpu.core.mesh.shard_batch`).

    ``rewarmup_per_dataset``: reset the LR schedule at every ann-data swap
    with the new file's line count as decay horizon — the reference's
    default behavior without ``--single_warmup`` (run_ann.py:210-215);
    requires the optimizer built with ``make_optimizer(..., rewarmup=...)``."""
    last_data_no = -1
    it = None
    step_count = int(jax.device_get(state.step))
    while step_count < max_steps:
        if it is None or step_count % poll_every == 0:
            data_no, data_path, _ = get_latest_ann_data(ann_dir)
            if data_no > last_data_no and data_path:
                lines = open(data_path).read().splitlines()
                feed = TripletBatches(
                    query_cache, passage_cache, triples_fn(lines),
                    batch_size=cycle_cfg.batch_size,
                    seed=cycle_cfg.shuffle_seed + data_no,
                    host_id=host_id, num_hosts=num_hosts)
                it = infinite_batches(
                    feed, workers=cycle_cfg.feed_workers)
                last_data_no = data_no
                if rewarmup_per_dataset:
                    from ance_tpu.optim.schedules import reset_rewarmup
                    state = dataclasses.replace(
                        state, opt_state=reset_rewarmup(
                            state.opt_state, horizon=len(lines)))
                logger.info("trainer: switched to ann data %s", data_no)
                if metrics_logger is not None:
                    ndcg_json = get_latest_ann_data(ann_dir)[2] or {}
                    # dev metric plotted on data switch (reference TB scalars,
                    # run_ann.py:220-227)
                    metrics_logger.log(step_count, ann_data_no=data_no,
                                       **{k: v for k, v in ndcg_json.items()
                                          if isinstance(v, (int, float))})
            elif it is None:
                time.sleep(poll_interval)
                continue
        rng, sub = jax.random.split(rng)
        batch = next(it)
        if batch_transform is not None:
            batch = batch_transform(batch)
        state, metrics = train_step(state, batch, sub)
        step_count = int(jax.device_get(state.step))
        if metrics_logger is not None and step_count % poll_every == 0:
            metrics_logger.log(step_count, loss=float(metrics["loss"]))
        if step_count % save_every == 0 or step_count >= max_steps:
            # optimizer state saved alongside params (reference optimizer.pt,
            # run_ann.py:307-334) so restarts continue LAMB moments
            ckpt.save_checkpoint(training_dir, step_count, params_of(state),
                                 opt_state=state.opt_state)
    return state


def resume_train_state(training_dir: str, state):
    """Restore the newest complete checkpoint into ``state`` (params + opt
    state when present — the reference's --load_optimizer_scheduler path,
    run_ann.py:96-105). Returns (state, resumed_step)."""
    from ance_tpu.train.trainer import TrainState
    import jax.numpy as jnp

    path, step = ckpt.get_latest_checkpoint(training_dir)
    if path is None or not ckpt.is_complete(path):
        return state, 0
    params, opt_state, _ = ckpt.load_checkpoint(path, state.params,
                                                state.opt_state)
    return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                      opt_state=opt_state if opt_state is not None
                      else state.opt_state), step
