"""Tensor parallelism (core/tp.py): sharded-vs-replicated identity on the
virtual 8-device mesh. Beyond-parity — the reference is DDP-only
(run_ann.py:603-646); TP is the TPU-native scaling axis DDP cannot reach."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ance_tpu.core.tp import (
    encoder_param_shardings, make_mesh_2d, param_spec, shard_params_tp,
    validate_tp)
from ance_tpu.models.dot_models import RobertaDot
from ance_tpu.models.transformer import EncoderConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def _tiny(heads=4, impl="xla"):
    return EncoderConfig(num_layers=2, hidden_size=32, num_heads=heads,
                         intermediate_size=64, vocab_size=100,
                         max_position_embeddings=40, attention_impl=impl)


def _model_and_params(cfg):
    model = RobertaDot(cfg, out_dim=32)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(4, 90, (8, 16)), jnp.int32)
    mask = jnp.ones((8, 16), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:2],
                                 mask[:2])["params"]
    return model, params, ids, mask


def test_param_specs_cover_the_megatron_layout():
    cfg = _tiny()
    _, params, _, _ = _model_and_params(cfg)
    mesh = make_mesh_2d(model=4)
    specs = encoder_param_shardings(params, mesh)
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
    qk = next(k for k in flat if "attention/query/kernel" in k)
    ok = next(k for k in flat if "attention/out/kernel" in k)
    up = next(k for k in flat if "mlp/intermediate/kernel" in k)
    down = next(k for k in flat if "mlp/output/kernel" in k)
    ln = next(k for k in flat if "layer_norm" in k and k.endswith("scale"))
    assert flat[qk] == P(None, "model")      # column-parallel
    assert flat[ok] == P("model", None)      # row-parallel
    assert flat[up] == P(None, "model")
    assert flat[down] == P("model", None)
    assert flat[ln] == P()                   # replicated
    # biases follow their kernels
    assert flat[qk.replace("kernel", "bias")] == P("model")
    assert flat[ok.replace("kernel", "bias")] == P()


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_tp_encode_matches_replicated():
    """dp=2 x tp=4 sharded forward == single-device forward (fp32)."""
    cfg = _tiny()
    model, params, ids, mask = _model_and_params(cfg)

    @jax.jit
    def encode(p, i, m):
        return model.apply({"params": p}, i, m, method=model.body_emb)

    ref = np.asarray(encode(params, ids, mask))

    mesh = make_mesh_2d(model=4, data=2)
    validate_tp(cfg, mesh)
    p_tp = shard_params_tp(params, mesh)
    data = NamedSharding(mesh, P("data"))
    out = encode(p_tp, jax.device_put(ids, data), jax.device_put(mask, data))
    # the TP out-projection all-reduce changes fp32 summation order only
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
    # and the weights really are distributed: a column-parallel kernel's
    # per-device shard holds 1/4 of the features
    qk = p_tp["encoder"]["layer_0"]["attention"]["query"]["kernel"]
    shard_shapes = {s.data.shape for s in qk.addressable_shards}
    assert shard_shapes == {(32, 8)}


@pytest.mark.slow  # parity/e2e tier: fast tier must stay <4 min (r4)
def test_tp_train_step_matches_dp():
    """One optimizer step with TP-sharded params == the replicated step."""
    import optax
    from ance_tpu.train.trainer import TrainState

    cfg = _tiny()
    model, params, ids, mask = _model_and_params(cfg)
    # sgd is linear in the gradient, so sharded-vs-replicated deltas stay
    # at all-reduce fp32 noise scale (adamw's g/sqrt(nu) step-1 update is
    # ~sign(g) and flips on near-zero grads, amplifying that noise 100x)
    opt = optax.sgd(1e-2)

    def loss_fn(p, i, m):
        emb = model.apply({"params": p}, i, m, method=model.body_emb)
        return jnp.sum(emb ** 2)

    @jax.jit
    def step(state, i, m):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, i, m)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state), loss

    def fresh(p):
        return TrainState(step=jnp.zeros([], jnp.int32), params=p,
                          opt_state=jax.jit(opt.init)(p))

    ref_state, ref_loss = step(fresh(params), ids, mask)

    mesh = make_mesh_2d(model=4, data=2)
    p_tp = shard_params_tp(params, mesh)
    # opt moments inherit the param shardings through SPMD propagation
    data = NamedSharding(mesh, P("data"))
    tp_state, tp_loss = step(fresh(p_tp), jax.device_put(ids, data),
                             jax.device_put(mask, data))
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        tp_state.params, ref_state.params)


def test_validate_tp_rejects_bad_geometry():
    mesh = make_mesh_2d(model=4, data=2)
    with pytest.raises(ValueError, match="num_heads"):
        validate_tp(_tiny(heads=6), mesh)
    with pytest.raises(ValueError, match="Pallas"):
        validate_tp(_tiny(impl="auto"), mesh)
    # tp=1 meshes validate anything
    validate_tp(_tiny(impl="auto"), make_mesh_2d(model=1, data=8))


def test_param_spec_path_rules():
    mk = lambda *parts: tuple(jax.tree_util.DictKey(p) for p in parts)
    assert param_spec(mk("l", "attention", "value", "kernel")) == \
        P(None, "model")
    assert param_spec(mk("l", "mlp", "output", "kernel")) == P("model", None)
    assert param_spec(mk("l", "mlp", "output", "bias")) == P()
    assert param_spec(mk("embeddings", "word_embeddings", "embedding")) == P()
