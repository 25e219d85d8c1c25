"""DPR BiEncoder training: in-batch negatives over the global batch.

Parity target: reference drivers/run_ann_dpr.py:309-374. The reference
gathers per-rank embeddings with a pickled byte-buffer all_reduce
(dpr_utils.py:95-160) so every rank's softmax sees the global batch; here the
whole batch lives in one jit — when sharded over the mesh's data axis, XLA
inserts the all-gather for the [Q_global, C_global] score matrix over ICI
automatically. Context rows interleave positives at even indices
(run_ann_dpr.py:356-363).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import gather_padded, parse_triple_line
from ance_tpu.models import losses


def encode_towers(model, params, batch, dropout_rng,
                  deterministic: bool = False, multichunk: bool = False):
    """Both tower passes for one batch → (q [B, D], ctx [2B, ...],
    ctx_mask). Context rows interleave pos/neg: ctx[2i] = pos_i,
    ctx[2i+1] = neg_i (reference run_ann_dpr.py:356-363)."""
    # fresh dropout mask per tower (the reference's separate forwards
    # each draw independent randomness)
    q_rng, ctx_rng = jax.random.split(dropout_rng)
    q = model.apply({"params": params}, batch["query_ids"],
                    batch["query_mask"], deterministic=deterministic,
                    rngs={"dropout": q_rng}, method=model.query_emb)
    B = batch["pos_ids"].shape[0]
    ctx_ids = jnp.stack([batch["pos_ids"], batch["neg_ids"]],
                        axis=1).reshape(2 * B, -1)
    ctx_mask = jnp.stack([batch["pos_mask"], batch["neg_mask"]],
                         axis=1).reshape(2 * B, -1)
    body_method = model.body_emb_multichunk if multichunk \
        else model.body_emb
    ctx = model.apply({"params": params}, ctx_ids, ctx_mask,
                      deterministic=deterministic,
                      rngs={"dropout": ctx_rng}, method=body_method)
    return q, ctx, ctx_mask


def inbatch_loss_from_embs(q, ctx, ctx_mask, multichunk: bool = False):
    """Global-softmax in-batch loss over gathered embeddings (positives at
    even ctx indices) → (loss, correct_count)."""
    positive_idx = jnp.arange(q.shape[0]) * 2
    if multichunk:
        return losses.dpr_inbatch_multichunk_loss(q, ctx, ctx_mask,
                                                  positive_idx)
    return losses.dpr_inbatch_loss(q, ctx, positive_idx)


def biencoder_loss_fn(model, deterministic: bool = False,
                      multichunk: bool = False) -> Callable:
    """loss(params, batch, rng) → (loss, correct_count) with positives at
    even ctx indices. ``deterministic=True`` disables dropout — the eval
    path (reference runs dev under model.eval(), run_ann_dpr.py:266-306).
    ``multichunk=True`` scores MaxP documents (max over chunk embeddings,
    losses.dpr_inbatch_multichunk_loss) — in-batch contrastive training for
    long docs, which the reference's triplet-only MaxP path lacks."""

    def loss_fn(params, batch, dropout_rng):
        q, ctx, ctx_mask = encode_towers(model, params, batch, dropout_rng,
                                         deterministic, multichunk)
        return inbatch_loss_from_embs(q, ctx, ctx_mask, multichunk)

    return loss_fn


def make_dpr_train_step(loss_fn: Callable, optimizer,
                        mesh=None, data_axis: str = "data") -> Callable:
    """(state, batch, rng) → (state, metrics incl. correct_ratio)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ance_tpu.train.trainer import TrainState

    def step_fn(state: TrainState, batch, dropout_rng):
        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        B = batch["query_ids"].shape[0]
        metrics = {"loss": loss, "correct": correct,
                   "correct_ratio": correct / B}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(step_fn, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))


def make_dpr_accum_train_step(model, optimizer, accum_steps: int = 1,
                              mesh=None, data_axis: str = "data",
                              deterministic: bool = False,
                              multichunk: bool = False) -> Callable:
    """Gradient accumulation that PRESERVES global in-batch semantics.

    The reference scales its effective batch by gradient_accumulation_steps
    (run_ann_dpr.py:65, 226) but accumulates separate per-microbatch
    softmaxes, shrinking negatives-per-softmax. A naive scan-accum port
    would do the same. This step instead computes the exact full-batch
    gradient at microbatch activation memory (the GradCache decomposition):

      1. forward-only ``lax.scan`` over microbatches accumulating
         EMBEDDINGS (not grads) — activations freed per microbatch;
      2. ONE global-softmax loss + backward over the gathered
         [B, 2B] score matrix → cotangents dL/dq, dL/dctx;
      3. second scan re-encodes each microbatch under ``jax.vjp`` and pulls
         its cotangent rows back to param grads, summing exactly
         dL/dθ = Σ_i dL/de_i · ∂e_i/∂θ.

    The result is bit-equal to the unaccumulated full-batch step (same
    embeddings, same loss, same grads — no semantics change), so large
    published DPR batches run in microbatch memory.

    Batch leading dims must divide by ``accum_steps``. Dropout: each
    microbatch's key is reused between phases 1 and 3 so the VJP re-encode
    sees identical masks; the accum step's dropout stream therefore differs
    from the unaccumulated step's (compare in deterministic mode).
    """
    import optax
    from ance_tpu.train.trainer import TrainState

    if accum_steps <= 1:
        return make_dpr_train_step(
            biencoder_loss_fn(model, deterministic, multichunk),
            optimizer, mesh=mesh, data_axis=data_axis)

    def encode_micro(params, mb, rng):
        return encode_towers(model, params, mb, rng, deterministic,
                             multichunk)

    def step_fn(state: TrainState, batch, dropout_rng):
        A = accum_steps
        micro = jax.tree.map(
            lambda x: x.reshape((A, x.shape[0] // A) + x.shape[1:]), batch)
        rngs = jax.random.split(dropout_rng, A)

        def fwd(_, inp):
            mb, rng = inp
            return None, encode_micro(state.params, mb, rng)

        _, (qs, ctxs, ctx_masks) = jax.lax.scan(fwd, None, (micro, rngs))
        q_all = qs.reshape((-1,) + qs.shape[2:])
        ctx_all = ctxs.reshape((-1,) + ctxs.shape[2:])
        mask_all = ctx_masks.reshape((-1,) + ctx_masks.shape[2:])

        def loss_on(q, ctx):
            return inbatch_loss_from_embs(q, ctx, mask_all, multichunk)

        (loss, correct), (dq, dctx) = jax.value_and_grad(
            loss_on, argnums=(0, 1), has_aux=True)(q_all, ctx_all)

        def bwd(grad_acc, inp):
            mb, rng, dqi, dci = inp

            def enc_p(p):
                q, ctx, _ = encode_micro(p, mb, rng)
                return q, ctx

            _, vjp_fn = jax.vjp(enc_p, state.params)
            (g,) = vjp_fn((dqi, dci))
            return jax.tree.map(jnp.add, grad_acc, g), None

        zero = jax.tree.map(jnp.zeros_like, state.params)
        grads, _ = jax.lax.scan(
            bwd, zero, (micro, rngs, dq.reshape(qs.shape),
                        dctx.reshape(ctxs.shape)))

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        B = batch["query_ids"].shape[0]
        metrics = {"loss": loss, "correct": correct,
                   "correct_ratio": correct / B}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(step_fn, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))


def dpr_dev_batches(query_cache: TokenCache, passage_cache: TokenCache,
                    dev_data_path: str, batch_size: int) -> Iterator[dict]:
    """Dev triples batched for evaluate_dev; incomplete tail dropped.

    Takes the FIRST hard negative per line: the reference dev loader runs
    with shuffle=False (run_ann_dpr.py:276-281), so its
    GetTripletTrainingDataProcessingFn random.shuffle never reorders the
    deterministic dev pass's negatives-choice semantics."""
    rows = []
    with open(dev_data_path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            qid, pos, negs = parse_triple_line(line)
            rows.append((qid, pos, negs[0]))
    rows = np.asarray(rows, dtype=np.int64)
    for s in range(0, rows.shape[0] - batch_size + 1, batch_size):
        r = rows[s:s + batch_size]
        q_ids, q_mask = gather_padded(query_cache, r[:, 0])
        p_ids, p_mask = gather_padded(passage_cache, r[:, 1])
        n_ids, n_mask = gather_padded(passage_cache, r[:, 2])
        yield {"query_ids": q_ids, "query_mask": q_mask,
               "pos_ids": p_ids, "pos_mask": p_mask,
               "neg_ids": n_ids, "neg_mask": n_mask}


def run_dpr_epochs(*, state, train_step: Callable, rng, params_of: Callable,
                   query_cache: TokenCache, passage_cache: TokenCache,
                   train_data_path: str, num_epochs: int, batch_size: int,
                   shuffle_seed: int = 42,
                   dev_eval_fn: Optional[Callable] = None,
                   checkpoint_dir: Optional[str] = None,
                   host_id: int = 0, num_hosts: int = 1,
                   batch_transform: Optional[Callable] = None):
    """Fixed-epoch DPR training — the reference's ``--num_epoch`` alternative
    to ann-polling (run_ann_dpr.py:179-191), with dev NLL/accuracy evaluated
    after every data epoch (run_ann_dpr.py:196-211).

    Each epoch redraws one random hard negative per line (the shuffled
    GetTripletTrainingDataProcessingFn semantics, DPR_data.py:321-327) and
    reshuffles triple order. Returns (state, history)."""
    from ance_tpu.data.feed import TripletBatches, sample_one_neg_triples
    from ance_tpu.train import checkpoint as ckpt

    with open(train_data_path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    history = []
    for epoch in range(num_epochs):
        triples = sample_one_neg_triples(lines, seed=shuffle_seed + epoch)
        feed = TripletBatches(query_cache, passage_cache, triples,
                              batch_size, seed=shuffle_seed,
                              host_id=host_id, num_hosts=num_hosts)
        last_loss = None
        # prefetched gathers (order-identical to .epoch(); overlaps mmap
        # page faults with the device step — DESIGN.md §5 feed table)
        for batch in feed.epoch_prefetched(epoch):
            if batch_transform is not None:
                batch = batch_transform(batch)  # e.g. multi-host global
                # array assembly (shard_batch), as in the polling path
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            last_loss = metrics["loss"]
        entry = {"epoch": epoch,
                 "step": int(jax.device_get(state.step))}
        if last_loss is not None:
            entry["loss"] = float(jax.device_get(last_loss))
        if dev_eval_fn is not None:
            dev_nll, dev_ratio = dev_eval_fn(params_of(state))
            entry["dev_nll"], entry["dev_correct_ratio"] = dev_nll, dev_ratio
        history.append(entry)
        if checkpoint_dir:
            ckpt.save_checkpoint(checkpoint_dir, entry["step"],
                                 params_of(state), opt_state=state.opt_state,
                                 extra={"epoch": epoch})
    return state, history


def evaluate_dev(model, params, query_cache: TokenCache,
                 passage_cache: TokenCache, dev_data_path: str,
                 batch_size: int = 32) -> tuple[float, float]:
    """Dev in-batch NLL + correct ratio, dropout OFF
    (reference run_ann_dpr.py:266-306 evaluate_dev under model.eval())."""
    loss_fn = biencoder_loss_fn(model, deterministic=True)
    eval_fn = jax.jit(lambda p, b: loss_fn(p, b, jax.random.PRNGKey(0)))
    total_loss, total_correct, n_batches, n_q = 0.0, 0, 0, 0
    for batch in dpr_dev_batches(query_cache, passage_cache, dev_data_path,
                                 batch_size):
        loss, correct = eval_fn(params, batch)
        total_loss += float(loss)
        total_correct += int(correct)
        n_batches += 1
        n_q += batch["query_ids"].shape[0]
    if n_batches == 0:
        return 0.0, 0.0
    return total_loss / n_batches, total_correct / n_q
