"""Round-5 phase 2: hardware-RNG dropout (rbg) A/B on the real chip.

perf_train_r5.py found dropout RNG = 55 ms of the 142 ms b64 step (39%):
threefry software RNG over ~460M bernoulli draws. This A/Bs
make_train_step(fast_dropout_rng=True) — the rbg/RngBitGenerator stream —
against threefry at b64/b96/b128, production config (attention + hidden
dropout 0.1).

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_train_r5b.py > /tmp/train_r5b.log 2>&1 < /dev/null &
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.optim.schedules import warmup_linear
from ance_tpu.train.trainer import (
    init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

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


def main():
    rs = np.random.RandomState(0)
    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=768)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, QLEN), jnp.int32),
                                 jnp.ones((2, QLEN), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-4, 10, 1000))
    res = {}
    for B in (64, 96, 128):
        batch = make_batch(rs, B)
        for fast in (False, True):
            step = make_train_step(triplet_loss_fn(model), opt,
                                   fast_dropout_rng=fast)
            state = init_train_state(jax.tree.map(jnp.copy, params), opt)
            state, m = step(state, batch, jax.random.PRNGKey(1))
            mat(m["loss"])  # compile
            it = iter(range(100_000))
            best = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    state, m = step(state, batch,
                                    jax.random.PRNGKey(next(it)))
                mat(m["loss"])
                best.append((time.perf_counter() - t0) / STEPS * 1000.0)
            key = f"b{B}_{'rbg' if fast else 'threefry'}"
            res[key] = round(min(best), 2)
            print(json.dumps({key: res[key], "triples_per_s":
                              round(B / res[key] * 1000, 1)}), flush=True)
    for B in (64, 96, 128):
        print(json.dumps({f"b{B}_speedup":
                          round(res[f"b{B}_threefry"] / res[f"b{B}_rbg"], 3)}),
              flush=True)
    print(json.dumps({"summary": res}), flush=True)


if __name__ == "__main__":
    main()
