"""Multi-host (multi-process) data parallelism smoke test.

Two OS processes, 4 virtual CPU devices each, Gloo collectives — the
CPU-backed stand-in for a 2-host TPU pod slice (replacing the reference's
torch.distributed.launch + NCCL topology, run_ann.py:603-646). Each process
feeds its host stripe of the triples (TripletBatches host_id/num_hosts) and
assembles global batches with shard_batch; the final loss must equal a
single-process run over the identically-ordered global batch exactly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

# whole-module e2e tier: deselect with -m 'not slow' for the smoke run
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from ance_tpu.core.mesh import initialize_distributed, make_mesh, shard_batch
initialize_distributed(coordinator_address="127.0.0.1:" + port,
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8
sys.path.insert(0, os.path.join(%r, "tests"))
from test_multihost import build_setup
state, step_fn, feed_cls = build_setup(data_dir, host_id=pid, num_hosts=2)
mesh = make_mesh()
with mesh:
    losses = []
    for i, batch in enumerate(feed_cls.epoch(0)):
        state, m = step_fn(state, shard_batch(batch, mesh),
                           jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
print("LOSSES", repr(losses), flush=True)
""" % REPO


def _write_caches(tmp_path):
    from ance_tpu.data.cache import TokenCacheWriter
    rs = np.random.RandomState(5)
    qp = str(tmp_path / "queries")
    pp = str(tmp_path / "passages")
    with TokenCacheWriter(qp, 8) as w:
        for _ in range(32):
            w.write(8, rs.randint(4, 60, 8).astype(np.int32))
    with TokenCacheWriter(pp, 12) as w:
        for _ in range(32):
            w.write(12, rs.randint(4, 60, 12).astype(np.int32))
    triples = np.stack([np.arange(32), np.arange(32),
                        (np.arange(32) + 1) % 32], axis=1).astype(np.int64)
    np.save(str(tmp_path / "triples.npy"), triples)
    return tmp_path


def build_setup(data_dir, host_id, num_hosts):
    """Deterministic tiny model + feed; shared by workers and the reference.
    seed-0 init → identical params in every process."""
    import jax
    import jax.numpy as jnp
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.data.feed import TripletBatches
    from ance_tpu.models.dot_models import RobertaDot
    from ance_tpu.models.transformer import EncoderConfig
    from ance_tpu.optim.schedules import warmup_linear
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
    from ance_tpu.core.mesh import make_mesh
    step = make_train_step(triplet_loss_fn(model), opt, mesh=make_mesh())
    qc = TokenCache(os.path.join(data_dir, "queries")).open()
    pc = TokenCache(os.path.join(data_dir, "passages")).open()
    triples = np.load(os.path.join(data_dir, "triples.npy"))
    feed = TripletBatches(qc, pc, triples, batch_size=8, seed=-1,
                          host_id=host_id, num_hosts=num_hosts)
    return state, step, feed


def test_two_process_dp_matches_single_process(tmp_path):
    data_dir = str(_write_caches(tmp_path))
    port = str(29600 + os.getpid() % 500)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), port, data_dir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    losses = [eval(out.split("LOSSES", 1)[1].strip())
              for out, _ in outs]
    # both processes observe the SAME global loss every step
    assert losses[0] == losses[1]
    assert len(losses[0]) == 2  # 32 triples / 2 hosts / batch 8

    # single-process reference over the same global row order
    # (global batch = [host0 stripe batch; host1 stripe batch])
    import jax
    from ance_tpu.core.mesh import make_mesh, shard_batch
    state, step_fn, _ = build_setup(data_dir, host_id=0, num_hosts=1)
    feeds = [build_setup(data_dir, host_id=h, num_hosts=2)[2]
             for h in range(2)]
    mesh = make_mesh()
    ref_losses = []
    with mesh:
        for i, (b0, b1) in enumerate(zip(feeds[0].epoch(0),
                                         feeds[1].epoch(0))):
            merged = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
            state, m = step_fn(state, shard_batch(merged, mesh),
                               jax.random.PRNGKey(100 + i))
            ref_losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses[0], ref_losses, rtol=1e-6)
