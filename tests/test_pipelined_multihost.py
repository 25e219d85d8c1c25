"""Multi-host pipelined ANCE: the flagship one-program mode across OS
processes (VERDICT r2 #1 — the blocking prerequisite for the v5p-32 target).

Two processes x 4 virtual CPU devices, Gloo collectives. Each host feeds its
block of every encode batch and its stripe of the mined triples; the sharded
index, dev search, and mining run identically (replicated) on both. The
bootstrap refresh must match a single-process run EXACTLY, and the train
losses must match up to fp reduction order (the global batch holds the same
triple SET, permuted by per-host striping; dropout is off, so row order only
changes the mean's summation order).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, json
pid, port, data_dir, n_procs, steps = (int(sys.argv[1]), sys.argv[2],
                                       sys.argv[3], int(sys.argv[4]),
                                       int(sys.argv[5]))
ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else ""
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           + str(8 // n_procs))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from ance_tpu.core.mesh import initialize_distributed
initialize_distributed(coordinator_address="127.0.0.1:" + port,
                       num_processes=n_procs, process_id=pid)
assert jax.process_count() == n_procs and jax.device_count() == 8
sys.path.insert(0, os.path.join(__REPO__, "tests"))
from test_pipelined_multihost import build_loop, run_steps
loop = build_loop(data_dir, host_id=pid, num_hosts=n_procs,
                  ckpt_dir=ckpt_dir or None)
boot = loop.bootstrap()
losses = run_steps(loop, steps)
loop.flush_checkpoints()
print("RESULT " + json.dumps({
    "boot_ndcg": boot["dev_ndcg"], "boot_triples": boot["num_triples"],
    "losses": losses, "refresh_no": loop.refresh_no}), flush=True)
""".replace("__REPO__", repr(REPO))


def _write_data(tmp_path):
    from ance_tpu.data.cache import TokenCacheWriter
    rs = np.random.RandomState(7)
    with TokenCacheWriter(str(tmp_path / "passages"), 12) as w:
        for _ in range(32):
            w.write(12, rs.randint(4, 60, 12).astype(np.int32))
    with TokenCacheWriter(str(tmp_path / "train-query"), 8) as w:
        for _ in range(8):
            w.write(8, rs.randint(4, 60, 8).astype(np.int32))
    with TokenCacheWriter(str(tmp_path / "dev-query"), 8) as w:
        for _ in range(4):
            w.write(8, rs.randint(4, 60, 8).astype(np.int32))
    return tmp_path


def build_loop(data_dir, host_id, num_hosts, ckpt_dir=None):
    """Deterministic tiny pipelined loop (seed-0 init on every process).
    batch/encode sizes are PER-HOST: global train batch 16 = ALL triples
    (8 queries x 2 negatives), so every step sees the same triple set
    regardless of striping."""
    import jax
    import jax.numpy as jnp
    from ance_tpu.core.mesh import make_mesh, shard_batch
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    from ance_tpu.optim.schedules import warmup_linear
    from ance_tpu.train.encode import make_encode_fn
    from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
    from ance_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

    cfg = EncoderConfig(vocab_size=64, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=16, pad_token_id=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = RobertaDot(cfg, out_dim=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, 8), jnp.int32),
                                 jnp.ones((2, 8), jnp.int32))["params"]
    opt = make_optimizer("lamb", warmup_linear(1e-3, 2, 100))
    state = init_train_state(params, opt)
    mesh = make_mesh()
    step = make_train_step(triplet_loss_fn(model), opt, mesh=mesh)
    qfn = make_encode_fn(model, RobertaDot.query_emb, mesh=mesh)
    bfn = make_encode_fn(model, RobertaDot.body_emb, mesh=mesh)
    pc = TokenCache(os.path.join(data_dir, "passages")).open()
    tq = TokenCache(os.path.join(data_dir, "train-query")).open()
    dq = TokenCache(os.path.join(data_dir, "dev-query")).open()
    train_qrels = {q: {q % 32: 1} for q in range(8)}
    dev_qrels = {q: {(q + 3) % 32: 1} for q in range(4)}
    pcfg = PipelineConfig(
        train_steps_per_slice=2, encode_slice_size=16,
        encode_batch_size=8 // num_hosts * num_hosts,  # 8, per-host blocks
        batch_size=16 // num_hosts,                    # global batch 16
        topk_training=16, negative_sample=2, ann_chunk_factor=1,
        search_chunk_queries=64, shuffle_seed=5,
        host_id=host_id, num_hosts=num_hosts,
        checkpoint_dir=ckpt_dir)
    return PipelinedAnce(
        pcfg, state=state, train_step=step, rng=jax.random.PRNGKey(11),
        params_of=lambda s: s.params, query_encode_fn=qfn,
        body_encode_fn=bfn, passage_cache=pc, train_query_cache=tq,
        dev_query_cache=dq, train_qrels=train_qrels, dev_qrels=dev_qrels,
        mesh=mesh,
        batch_transform=(lambda b: shard_batch(b, mesh)))


def run_steps(loop, n):
    """n train steps (staying inside refresh cycle 1 — no finalize, so the
    triple feed stays the bootstrap one on every topology)."""
    import jax
    loop.run(n)
    return [float(x) for x in jax.device_get(loop._losses_since_refresh)]


def _spawn_workers(data_dir, port, n_procs, steps, env, ckpt_dir=""):
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), port, data_dir,
         str(n_procs), str(steps), ckpt_dir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(n_procs)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    return [json.loads(out.split("RESULT", 1)[1].strip().splitlines()[0])
            for out, _ in outs]


@pytest.mark.slow
def test_two_process_pipelined_matches_single(tmp_path):
    data_dir = str(_write_data(tmp_path))
    port = str(29810 + os.getpid() % 150)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    results = _spawn_workers(data_dir, port, n_procs=2, steps=8, env=env)

    # both processes observe the identical global computation
    assert results[0] == results[1]
    assert len(results[0]["losses"]) == 8

    # single-process reference on the same 8 virtual devices
    single = build_loop(data_dir, host_id=0, num_hosts=1)
    boot = single.bootstrap()
    losses = run_steps(single, 8)

    # bootstrap refresh: params identical (no training yet) → encode, index,
    # dev search, and mining replicate exactly across topologies
    assert results[0]["boot_triples"] == boot["num_triples"] == 16
    assert results[0]["boot_ndcg"] == pytest.approx(boot["dev_ndcg"],
                                                    abs=1e-9)
    # train losses: same triple SET per global batch, order permuted by
    # striping → equal up to fp summation order
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=2e-4)


@pytest.mark.slow
def test_four_process_pipelined_matches_single(tmp_path):
    """2×2 scale-up of the identity proof (VERDICT r4 item 5): FOUR
    processes × 2 virtual devices run a FULL refresh cycle (16 steps =
    8 work items incl. finalize) plus 4 steps on the freshly MINED
    triples — exercising per-host feed striping at num_hosts=4 across a
    mining handoff — and must match the single-process run. The finalize
    also exercises rank-0-only checkpointing: exactly two complete
    checkpoints (bootstrap's finalize at step 0, the cycle's at step 16),
    written by process 0 only."""
    data_dir = str(_write_data(tmp_path))
    ckpt_dir = str(tmp_path / "ckpts")
    port = str(29660 + os.getpid() % 150)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    results = _spawn_workers(data_dir, port, n_procs=4, steps=20, env=env,
                             ckpt_dir=ckpt_dir)

    # all four processes observe the identical global computation
    assert all(r == results[0] for r in results)
    assert results[0]["refresh_no"] == 2
    # 4 losses since the finalize — these trained on MINED triples, so
    # equality across topologies covers mining + 4-way striping together
    assert len(results[0]["losses"]) == 4

    # rank-0-only checkpointing: every refresh boundary saved exactly once
    # (4 processes wrote 2 checkpoints total, not 8), both complete
    from ance_tpu.train.checkpoint import DONE_MARKER
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts == ["checkpoint-0", "checkpoint-16"], ckpts
    for c in ckpts:
        assert os.path.exists(os.path.join(ckpt_dir, c, DONE_MARKER))

    # single-process reference on the same 8 virtual devices
    single = build_loop(data_dir, host_id=0, num_hosts=1)
    boot = single.bootstrap()
    losses = run_steps(single, 20)
    assert results[0]["boot_triples"] == boot["num_triples"] == 16
    assert results[0]["boot_ndcg"] == pytest.approx(boot["dev_ndcg"],
                                                    abs=1e-9)
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=2e-4)
