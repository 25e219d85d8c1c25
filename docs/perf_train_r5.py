"""Round-5: train-step limiter decomposition (the encode-style treatment).

The FirstP train step (3 towers fwd+bwd + clip + LAMB, trainer.py) sat at
118.3 ms @ b64 (~44% MFU, BENCH_r04) while encode reached 68.3% — and never
got the limiter decomposition that took encode from 46% to 68%
(DESIGN.md §5). This measures, A/B within one run on the real chip at the
bench geometry (b64, q64/p128, bf16):

  1. step split:     fwd | fwd+bwd | optimizer-only (clip+LAMB+schedule)
  2. optimizer:      LAMB vs AdamW vs LAMB-without-clip (per-leaf norm cost)
  3. dropout:        full step with attention+hidden dropout (production,
                     now that attention-probs dropout exists) vs hidden-only
                     (the r4 baseline config) vs deterministic
  4. levers:         remat=True | fused-attention (incl. fused Pallas bwd)
                     at seq 128 | accum_steps=2 @ total b128 | batch sweep

Timing: axon's block_until_ready is a no-op — materialize via D2H sum.
Full-step variants chain through donated TrainState (true step latency);
fwd/grad-only variants have no carried state, so their numbers are
throughput-style (dispatch pipelining may hide a fraction of a ms) — used
only relative to each other.

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_train_r5.py > /tmp/train_r5.log 2>&1 < /dev/null &
"""

import dataclasses
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.losses import nll_triplet_loss
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.trainer import (
    TrainState, init_train_state, make_optimizer, make_train_step,
    triplet_loss_fn)

QLEN, PLEN = 64, 128
REPS, STEPS = 5, 10


def mat(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def make_batch(rs, B):
    return {
        "query_ids": jnp.asarray(rs.randint(4, 50000, (B, QLEN)), jnp.int32),
        "query_mask": jnp.ones((B, QLEN), jnp.int32),
        "pos_ids": jnp.asarray(rs.randint(4, 50000, (B, PLEN)), jnp.int32),
        "pos_mask": jnp.ones((B, PLEN), jnp.int32),
        "neg_ids": jnp.asarray(rs.randint(4, 50000, (B, PLEN)), jnp.int32),
        "neg_mask": jnp.ones((B, PLEN), jnp.int32),
    }


def det_loss_fn(model):
    """triplet_loss_fn with ALL dropout off (deterministic ceiling)."""
    def loss_fn(params, batch, dropout_rng):
        q = model.apply({"params": params}, batch["query_ids"],
                        batch["query_mask"], method=model.query_emb)
        pos = model.apply({"params": params}, batch["pos_ids"],
                          batch["pos_mask"], method=model.body_emb)
        neg = model.apply({"params": params}, batch["neg_ids"],
                          batch["neg_mask"], method=model.body_emb)
        return nll_triplet_loss(q, pos, neg)
    return loss_fn


def time_stateful(step, state, batch, tag):
    it = iter(range(100_000))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    mat(m["loss"])  # compile
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, batch, jax.random.PRNGKey(next(it)))
        mat(m["loss"])
        best.append((time.perf_counter() - t0) / STEPS * 1000.0)
    ms = round(min(best), 2)
    print(json.dumps({tag: ms}), flush=True)
    return ms


def time_stateless(fn, args_fn, tag):
    out = fn(*args_fn(0))
    mat(jax.tree.leaves(out)[0])  # compile
    best = []
    for r in range(REPS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            out = fn(*args_fn(r * STEPS + i))
        mat(jax.tree.leaves(out)[0])
        best.append((time.perf_counter() - t0) / STEPS * 1000.0)
    ms = round(min(best), 2)
    print(json.dumps({tag: ms}), flush=True)
    return ms


def main():
    rs = np.random.RandomState(0)
    B = 64
    batch = make_batch(rs, B)
    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=768)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-4, 10, 1000))
    res = {}

    # ---- 1+3. full-step variants (stateful, donated) -------------------
    def full(tag, model_, loss_builder, opt_=None):
        o = opt_ or opt
        step = make_train_step(loss_builder(model_), o)
        state = init_train_state(jax.tree.map(jnp.copy, params), o)
        res[tag] = time_stateful(step, state, batch, tag)

    full("full_drop", model, triplet_loss_fn)            # production now
    cfg_h = dataclasses.replace(cfg, attention_dropout=0.0)
    full("full_hidden_only", RobertaDot(cfg_h, out_dim=768),
         triplet_loss_fn)                                # r4 baseline config
    full("full_nodrop", model, det_loss_fn)              # ceiling

    # ---- 1. fwd / fwd+bwd (stateless) ----------------------------------
    loss_drop = triplet_loss_fn(model)
    loss_det = det_loss_fn(model)
    fwd_drop = jax.jit(loss_drop)
    fwd_det = jax.jit(loss_det)
    grad_drop = jax.jit(jax.value_and_grad(loss_drop))
    grad_det = jax.jit(jax.value_and_grad(loss_det))
    keys = [jax.random.PRNGKey(i) for i in range(REPS * STEPS + 1)]
    res["fwd_drop"] = time_stateless(
        fwd_drop, lambda i: (params, batch, keys[i]), "fwd_drop")
    res["fwd_nodrop"] = time_stateless(
        fwd_det, lambda i: (params, batch, keys[i]), "fwd_nodrop")
    res["grad_drop"] = time_stateless(
        grad_drop, lambda i: (params, batch, keys[i]), "grad_drop")
    res["grad_nodrop"] = time_stateless(
        grad_det, lambda i: (params, batch, keys[i]), "grad_nodrop")

    # ---- 2. optimizer-only (stateful on the grads from one real step) --
    _, grads = grad_drop(params, batch, keys[0])
    grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)

    def opt_only(tag, o):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def apply_opt(state, grads):
            updates, opt_state = o.update(grads, state.opt_state,
                                          state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=opt_state), \
                {"loss": updates["embedding_head"]["bias"][0]}

        state = init_train_state(jax.tree.map(jnp.copy, params), o)
        res[tag] = time_stateful(lambda s, b, r: apply_opt(s, grads),
                                 state, batch, tag)

    opt_only("opt_lamb_clip", opt)
    opt_only("opt_lamb_noclip",
             make_optimizer("lamb", warmup_linear(1e-4, 10, 1000),
                            max_grad_norm=0.0))
    opt_only("opt_adamw", make_optimizer("adamw",
                                         warmup_linear(1e-4, 10, 1000)))

    # ---- 4. levers ------------------------------------------------------
    cfg_r = dataclasses.replace(cfg, remat=True)
    full("full_remat", RobertaDot(cfg_r, out_dim=768), triplet_loss_fn)
    # fused Pallas attention incl. the fused backward, at seq 128 (dropout
    # forces xla, so compare on the deterministic loss)
    cfg_f = dataclasses.replace(cfg, attention_impl="fused")
    full("full_nodrop_fused", RobertaDot(cfg_f, out_dim=768), det_loss_fn)

    # accum_steps=2 at total b128: per-triple cost vs two b64 steps
    step2 = make_train_step(triplet_loss_fn(model), opt, accum_steps=2)
    state2 = init_train_state(jax.tree.map(jnp.copy, params), opt)
    res["accum2_b128"] = time_stateful(step2, state2, make_batch(rs, 128),
                                       "accum2_b128")

    # batch sweep with the production config
    for Bs in (96, 128):
        step = make_train_step(triplet_loss_fn(model), opt)
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        res[f"full_drop_b{Bs}"] = time_stateful(
            step, state, make_batch(rs, Bs), f"full_drop_b{Bs}")

    for k in ("full_drop", "full_drop_b96", "full_drop_b128"):
        Bk = int(k.rsplit("b", 1)[1]) if "_b" in k else 64
        print(json.dumps({k + "_triples_per_s":
                          round(Bk / res[k] * 1000, 1)}), flush=True)
    print(json.dumps({"summary": res}), flush=True)


if __name__ == "__main__":
    main()
