"""Round-4: XLA scheduling-flag sweep on the encode headline.

The encode step sits at 66-68% MFU with every model-level lever measured
(DESIGN.md §5); the remaining gap is XLA scheduling slack. The one untried
lever is the compiler's own knobs. XLA_FLAGS is read at backend init, so
each variant runs in a fresh subprocess timing the exact bench.py encode
shape (RobertaDot bf16, b128 seq128, 20-step windows).

Variants: scoped-VMEM limit (bigger scoped vmem → more aggressive fusion;
a deliberately tiny 512 KiB variant doubles as a PROBE that the flag
actually reaches the remote axon compiler — if it doesn't slow down or
fail, flags are ignored and the sweep is inconclusive), and the
latency-hiding scheduler toggle. Baseline runs FIRST and LAST to bracket
the time-shared chip's drift.

RESULT (2026-08-19, perf_xlaflags_r4_run.jsonl): the lever is UNREACHABLE
in this environment. The local client's parse_flags_from_env aborts on
every TPU flag ("Unknown flag in XLA_FLAGS: --xla_tpu_...") — the axon
jax client does not link the TPU compiler's flag registry, and every
perf-relevant scheduling knob is --xla_tpu_-prefixed. Recorded as a dead
end; on directly-attached TPU hosts (production) the sweep would run
as written.

Timing note that cost the first run: jax.block_until_ready does NOT
actually block on the experimental axon platform (windows "measured"
981k passages/s); materialize through np.asarray (D2H) as bench.py does,
and time N windows so the transfer amortizes.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
  python docs/perf_xlaflags_r4.py > docs/perf_xlaflags_r4_run.jsonl
"""

import json
import os
import subprocess
import sys
import time

VARIANTS = [
    ("baseline_a", ""),
    ("vmem_probe_tiny", "--xla_tpu_scoped_vmem_limit_kib=512"),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_latency_hiding", "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("baseline_b", ""),
]


def child():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig

    batch, seq, steps = 128, 128, 20
    cfg = EncoderConfig(dtype=jnp.bfloat16)
    model = RobertaDot(cfg, out_dim=768)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 50000, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2], mask[:2]
                                 )["params"]

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=model.body_emb)

    t0 = time.perf_counter()
    np.asarray(encode(params, ids, mask))  # block_until_ready is a no-op
    compile_s = time.perf_counter() - t0   # on axon; D2H actually waits

    vals = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = encode(params, ids, mask)
        np.asarray(out)
        vals.append(batch * steps / (time.perf_counter() - t0))
    print(json.dumps({"compile_s": round(compile_s, 1),
                      "pps_best": round(max(vals), 0),
                      "pps_all": [round(v) for v in vals]}))


def main():
    for name, flags in VARIANTS:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        t0 = time.perf_counter()
        try:
            p = subprocess.run(
                [sys.executable, __file__, "child"], env=env,
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired:
            # tunnel outage / chip contention — record and keep sweeping
            print(json.dumps({"variant": name, "flags": flags,
                              "timeout_s": 900}), flush=True)
            continue
        rec = {"variant": name, "flags": flags,
               "wall_s": round(time.perf_counter() - t0, 1)}
        tail = [ln for ln in p.stdout.strip().splitlines() if ln][-1:] or [""]
        if p.returncode == 0:
            try:
                rec.update(json.loads(tail[0]))
            except ValueError:
                rec.update({"rc": 0, "unparsed": tail[0][:200]})
        else:
            rec.update({"rc": p.returncode,
                        "stderr_tail": p.stderr.strip()[-300:]})
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child()
    else:
        main()
