"""Jitted training step for the dual-encoder NLL objectives.

One compiled function covers the reference trainer inner loop
(reference drivers/run_ann.py:240-334):

  * three encoder passes (query / positive / negative) + NLL triplet loss
    (or MaxP multichunk loss),
  * gradient accumulation via ``lax.scan`` over microbatches (replaces the
    step%accum + ``no_sync`` dance, reference run_ann.py:256-278),
  * global-norm gradient clipping (reference run_ann.py:280-284),
  * LAMB/AdamW update + schedule.

Data parallelism: run the step under a ``Mesh`` with the batch sharded along
the data axis; XLA inserts the gradient all-reduce over ICI (replacing DDP,
reference run_ann.py:121-128).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ance_tpu.models import losses
from ance_tpu.optim.lamb import reference_lamb


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(name: str = "lamb", learning_rate=1e-4,
                   eps: float = 1e-8, weight_decay: float = 0.0,
                   max_grad_norm: float = 1.0,
                   no_decay_bias_ln: bool = True,
                   rewarmup: Optional[tuple] = None
                   ) -> optax.GradientTransformation:
    """Reference optimizer menu (run_ann.py:79-93): lamb | adamw, preceded by
    global-norm clipping (run_ann.py:280-284). Biases and LayerNorms skip
    weight decay by default (reference no_decay grouping,
    dpr_utils.py:80-92 / run_ann.py:58-78).

    ``rewarmup=(warmup_steps, initial_horizon)`` builds the per-dataset
    RE-warmup schedule instead (the reference's default without
    ``--single_warmup``, run_ann.py:210-215): ``learning_rate`` must then be
    the float base lr; the inner optimizer runs at lr 1.0 and a trailing
    ``scale_by_rewarmup`` applies the schedule — exactly equal scaling, but
    with an anchor the trainer resets via ``optim.schedules.reset_rewarmup``
    at every ann-data swap."""
    from ance_tpu.optim.lamb import bias_layernorm_no_decay_mask
    mask = bias_layernorm_no_decay_mask \
        if (no_decay_bias_ln and weight_decay) else None
    inner_lr = learning_rate
    if rewarmup is not None:
        if callable(learning_rate):
            raise ValueError("rewarmup needs a float base learning_rate "
                             "(the schedule is owned by scale_by_rewarmup)")
        inner_lr = 1.0
    if name.lower() == "lamb":
        inner = reference_lamb(inner_lr, eps=eps,
                               weight_decay=weight_decay, decay_mask=mask)
    elif name.lower() == "adamw":
        inner = optax.adamw(inner_lr, eps=eps, weight_decay=weight_decay,
                            mask=mask)
    else:
        raise ValueError(f"optimizer {name} not recognized! lamb or adamw")
    parts = []
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(inner)
    if rewarmup is not None:
        from ance_tpu.optim.schedules import scale_by_rewarmup
        warmup_steps, initial_horizon = rewarmup
        parts.append(scale_by_rewarmup(learning_rate, warmup_steps,
                                       initial_horizon))
    return optax.chain(*parts) if len(parts) > 1 else parts[0]


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def triplet_loss_fn(model, multichunk: bool = False,
                    fused_body: bool = False) -> Callable:
    """loss(params, batch, dropout_rng) for FirstP (NLL) or MaxP
    (NLL_MultiChunk) training.

    ``fused_body=True`` encodes positives and negatives (identical shapes)
    as ONE [2B, S] pass instead of two [B, S] passes: every encoder op is
    row-independent, so the result is exactly equal in deterministic mode
    (test_train.py asserts it) and the per-element dropout masks stay iid —
    the same distribution the reference's separate forwards draw
    (run_ann.py:240-261). The win is GEMM width: [2B·S, H] matmuls where
    the batch knee hasn't saturated the MXU yet."""

    def loss_fn(params, batch, dropout_rng):
        # one subkey per encoder pass: pos and neg share shapes, so a shared
        # key would give them IDENTICAL dropout masks (the reference's three
        # forwards each draw fresh randomness)
        q_rng, pos_rng, neg_rng = jax.random.split(dropout_rng, 3)
        q = model.apply({"params": params}, batch["query_ids"],
                        batch["query_mask"], deterministic=False,
                        rngs={"dropout": q_rng}, method=model.query_emb)
        body_method = model.body_emb_multichunk if multichunk \
            else model.body_emb
        if fused_body:
            B = batch["pos_ids"].shape[0]
            ids = jnp.concatenate([batch["pos_ids"], batch["neg_ids"]], 0)
            msk = jnp.concatenate([batch["pos_mask"], batch["neg_mask"]], 0)
            both = model.apply({"params": params}, ids, msk,
                               deterministic=False, rngs={"dropout": pos_rng},
                               method=body_method)
            pos, neg = both[:B], both[B:]
        else:
            pos = model.apply({"params": params}, batch["pos_ids"],
                              batch["pos_mask"], deterministic=False,
                              rngs={"dropout": pos_rng}, method=body_method)
            neg = model.apply({"params": params}, batch["neg_ids"],
                              batch["neg_mask"], deterministic=False,
                              rngs={"dropout": neg_rng}, method=body_method)
        if multichunk:
            return losses.nll_multichunk_loss(q, pos, batch["pos_mask"],
                                              neg, batch["neg_mask"])
        return losses.nll_triplet_loss(q, pos, neg)

    return loss_fn


def fast_dropout_key(rng: jax.Array) -> jax.Array:
    """Derive an ``rbg`` key (XLA RngBitGenerator — the TPU's hardware RNG)
    from a threefry key.

    Measured motivation (docs/perf_train_r5.py, v5e): dropout RNG is 55 ms
    of the 142 ms b64 train step — threefry generates ~460M bernoulli draws
    per step in software integer ops on the VPU. The rbg impl lowers to the
    hardware generator. Draws remain iid Bernoulli, but the STREAM differs
    from threefry's and is not guaranteed bit-stable across shardings or
    compiler versions — fine for dropout, wrong for anything that must
    reproduce bit-for-bit, which is why this is opt-in per train step."""
    data = jax.random.bits(rng, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def make_train_step(loss_fn: Callable, optimizer,
                    accum_steps: int = 1,
                    mesh: Optional[Mesh] = None,
                    data_axis: str = "data",
                    fast_dropout_rng: Optional[bool] = None) -> Callable:
    """Build the jitted step: (state, batch, rng) → (state, metrics).

    With ``accum_steps > 1`` each batch's leading dim must be divisible by
    it; microbatches run sequentially under ``lax.scan`` and gradients
    average, matching torch grad-accumulation loss scaling
    (reference run_ann.py:263-268 loss/accum).

    ``fast_dropout_rng`` converts the step's dropout stream to the TPU
    hardware RNG (see :func:`fast_dropout_key`; measured 1.485× at b64,
    docs/perf_train_r5b_run.jsonl).
    Default: on for TPU backends, off elsewhere (CPU tests keep threefry's
    bit-stable cross-sharding streams).
    """
    if fast_dropout_rng is None:
        fast_dropout_rng = jax.default_backend() == "tpu"

    def split_micro(x):
        return x.reshape((accum_steps, x.shape[0] // accum_steps) +
                         x.shape[1:])

    def step_fn(state: TrainState, batch, dropout_rng):
        if fast_dropout_rng:
            dropout_rng = fast_dropout_key(dropout_rng)
        grad_fn = jax.value_and_grad(loss_fn)

        if accum_steps == 1:
            loss, grads = grad_fn(state.params, batch, dropout_rng)
        else:
            micro = jax.tree.map(split_micro, batch)
            rngs = jax.random.split(dropout_rng, accum_steps)

            def body(carry, inp):
                loss_acc, grad_acc = carry
                mb, rng = inp
                loss, grads = grad_fn(state.params, mb, rng)
                return (loss_acc + loss,
                        jax.tree.map(jnp.add, grad_acc, grads)), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros([], jnp.float32), zero), (micro, rngs))
            loss = loss / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))
