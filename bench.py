"""Headline benchmark: corpus-encoding throughput on the real TPU chip.

ANCE's stated efficiency bottleneck is the encoding update, not ANN search
(reference README.md:21-24), so the headline metric is passages encoded per
second with the flagship FirstP encoder (roberta-base geometry, bf16,
seq 128 — the reference's passage config, commands/run_train.sh:30-36).

Baseline for ``vs_baseline``: the reference trains/encodes on 4×V100 fp16
(commands/run_train.sh:25-40). A V100 sustains roughly 500 passages/s at
seq 128 for roberta-base inference under apex O1 (~25% of 112 TF/s peak on
the ~170 GFLOP/passage forward), giving ~2000 passages/s for the 4-GPU job.
``vs_baseline = ours / 2000``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_PASSAGES_PER_SEC = 2000.0  # 4×V100 fp16 estimate, see docstring
SEQ = 128
BATCH = 256
STEPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    cfg = EncoderConfig(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = RobertaDot(cfg, out_dim=768)

    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 50000, (BATCH, SEQ)), jnp.int32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2], mask[:2]
                                 )["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.body_emb)

    import jax.numpy as _jnp
    float(_jnp.sum(encode(params, ids, mask)))  # compile + materialize
    t0 = time.perf_counter()
    out = None
    for _ in range(STEPS):
        out = encode(params, ids, mask)
    # force full materialization — on the remote-attached TPU,
    # block_until_ready alone returns before execution finishes
    float(_jnp.sum(out))
    dt = time.perf_counter() - t0

    pps = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "firstp_encode_throughput",
        "value": round(pps, 1),
        "unit": "passages/sec",
        "vs_baseline": round(pps / BASELINE_PASSAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
