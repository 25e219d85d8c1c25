"""Round-3: fused pos+neg body pass in the triplet train step.

The FirstP train step runs THREE encoder passes (query seq 64, pos seq 128,
neg seq 128 — reference run_ann.py:240-261). pos and neg have identical
shapes, so one [2B, 128] pass replaces two [B, 128] passes: same math
per row (exactness asserted in test_train.py), but every GEMM runs at
[2B*S, H] — the encode batch sweep (docs/perf_mfu_r3.py) showed 16,384-row
GEMMs (b128*seq128) beat 8,192-row ones, which is exactly the b64 train
step's body width.

A/B within one run at the bench config (b64) and the measured knee (b96).

Usage: setsid env PYTHONPATH=/root/repo:/root/.axon_site nohup \
  python docs/perf_fusedbody_r3.py > /tmp/fusedbody_r3.log 2>&1 < /dev/null &
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
REPS = 5
STEPS = 10


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

    results = {}
    for B in (64, 96):
        batch = make_batch(rs, B)
        for fused in (False, True):
            step = make_train_step(
                triplet_loss_fn(model, fused_body=fused), opt)
            # the jitted step DONATES its input state — a shared `params`
            # would be deleted after the first config's first step
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
            key = f"b{B}_{'fused' if fused else '3pass'}"
            results[key] = round(min(best), 2)
            print(json.dumps({key: results[key],
                              "triples_per_s": round(B / min(best) * 1000, 1)}),
                  flush=True)

    for B in (64, 96):
        a, b = results[f"b{B}_3pass"], results[f"b{B}_fused"]
        print(json.dumps({f"b{B}_speedup": round(a / b, 4)}), flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
