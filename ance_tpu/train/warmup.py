"""BM25-warmup trainer: epoch-based training straight off raw triples TSV.

Parity target: reference drivers/run_warmup.py:44-281 — epochs re-seek the
triples file, tokenize on the fly (process_fn.triple_process_fn), LAMB/AdamW
with linear or cosine schedule, periodic checkpointing, periodic in-train
MRR eval. The reference's resume-step-skipping (run_warmup.py:144-163) maps
to ``start_step`` batch skipping.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional

import jax

from ance_tpu.data.process_fn import triple_batches
from ance_tpu.train import checkpoint as ckpt

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class WarmupConfig:
    num_epochs: int = 1
    batch_size: int = 32
    max_seq_length: int = 128
    max_steps: int = -1              # >0 stops early
    save_steps: int = 0              # 0 = no periodic checkpoints
    eval_every: int = 0              # steps between eval_fn calls; 0 = never
    checkpoint_dir: Optional[str] = None
    host_id: int = 0
    num_hosts: int = 1
    log_trust_ratios: bool = False   # LAMB trust-ratio stats at eval points
                                     # (reference lamb.py:11-22 log_lamb_rs)


def run_warmup(cfg: WarmupConfig, *, state, train_step: Callable,
               tokenizer, triples_path: str, rng,
               params_of: Callable = lambda s: s.params,
               eval_fn: Optional[Callable] = None,
               start_step: int = 0):
    """Train over the triples file for cfg.num_epochs. Returns
    (state, history) where history holds loss and eval entries."""
    history = []
    global_step = start_step
    if 0 < cfg.max_steps <= start_step:
        # resuming a checkpoint written exactly at max_steps: the run is
        # already complete — training even one more batch would mutate the
        # finished model vs the uninterrupted run
        return state, history
    skip = start_step  # resume: skip already-trained batches (ref :144-163)
    for epoch in range(cfg.num_epochs):
        with open(triples_path, encoding="utf-8") as f:
            batches = triple_batches(tokenizer, f, cfg.batch_size,
                                     cfg.max_seq_length,
                                     host_id=cfg.host_id,
                                     num_hosts=cfg.num_hosts)
            for batch in batches:
                # split BEFORE the skip check: a resumed run's dropout
                # stream then aligns exactly with the uninterrupted run's
                rng, sub = jax.random.split(rng)
                if skip > 0:
                    skip -= 1
                    continue
                state, metrics = train_step(state, batch, sub)
                global_step += 1
                loss = float(metrics["loss"])
                history.append({"step": global_step, "loss": loss})
                if cfg.save_steps and cfg.checkpoint_dir and \
                        global_step % cfg.save_steps == 0:
                    # opt_state included so a preempted 60K-step warmup
                    # resumes faithfully (reference saves optimizer.pt +
                    # scheduler.pt, run_warmup.py:222-243)
                    ckpt.save_checkpoint(cfg.checkpoint_dir, global_step,
                                         params_of(state),
                                         opt_state=getattr(state, "opt_state",
                                                           None),
                                         extra={"epoch": epoch})
                if cfg.log_trust_ratios and cfg.eval_every and \
                        global_step % cfg.eval_every == 0:
                    from ance_tpu.optim.lamb import trust_ratio_summary
                    summary = trust_ratio_summary(state.opt_state,
                                                  params_of(state))
                    if summary:
                        history.append({"step": global_step, **summary})
                if cfg.eval_every and eval_fn is not None and \
                        global_step % cfg.eval_every == 0:
                    rerank_mrr, full_mrr = eval_fn(params_of(state))
                    logger.info("step %s reranking/full mrr: %s/%s",
                                global_step, rerank_mrr, full_mrr)
                    history.append({"step": global_step,
                                    "reranking_mrr": rerank_mrr,
                                    "full_ranking_mrr": full_mrr})
                if 0 < cfg.max_steps <= global_step:
                    return state, history
    if cfg.checkpoint_dir:
        ckpt.save_checkpoint(cfg.checkpoint_dir, global_step,
                             params_of(state),
                             opt_state=getattr(state, "opt_state", None),
                             extra={"final": True})
    return state, history
