"""LAMB parity vs a torch re-execution of the reference update rule
(reference utils/lamb.py:95-121), plus schedule shape checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.optim.lamb import reference_lamb
from ance_tpu.optim.schedules import warmup_cosine, warmup_linear

torch = pytest.importorskip("torch")


def torch_reference_lamb_step(p, grad, m, v, lr, b1, b2, eps, wd, adam):
    """Reference utils/lamb.py:95-121 update, executed with torch ops."""
    m = b1 * m + (1 - b1) * grad
    v = b2 * v + (1 - b2) * grad * grad
    adam_step = m / (v.sqrt() + eps)
    if wd != 0:
        adam_step = adam_step + wd * p
    weight_norm = p.pow(2).sum().sqrt().clamp(0, 10)
    adam_norm = adam_step.pow(2).sum().sqrt()
    if weight_norm == 0 or adam_norm == 0:
        trust_ratio = 1.0
    else:
        trust_ratio = (weight_norm / adam_norm).item()
    if adam:
        trust_ratio = 1.0
    p = p - lr * trust_ratio * adam_step
    return p, m, v


@pytest.mark.parametrize("wd,adam", [(0.0, False), (0.01, False), (0.0, True)])
def test_lamb_matches_reference_math(wd, adam):
    rs = np.random.RandomState(0)
    shapes = {"w": (16, 8), "b": (8,), "big": (64,)}
    params = {k: rs.randn(*s).astype(np.float32) for k, s in shapes.items()}
    params["big"] = params["big"] * 10.0  # push ‖w‖ past the clamp at 10
    lr, b1, b2, eps = 2e-3, 0.9, 0.999, 1e-6

    opt = reference_lamb(lr, b1, b2, eps, weight_decay=wd, adam=adam)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = opt.init(jp)

    tp = {k: torch.tensor(v.copy()) for k, v in params.items()}
    tm = {k: torch.zeros_like(t) for k, t in tp.items()}
    tv = {k: torch.zeros_like(t) for k, t in tp.items()}

    step = jax.jit(lambda g, s, p: opt.update(g, s, p))
    for it in range(5):
        grads = {k: rs.randn(*shapes[k]).astype(np.float32)
                 for k in shapes}
        jg = {k: jnp.asarray(v) for k, v in grads.items()}
        updates, state = step(jg, state, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, updates)
        for k in shapes:
            tp[k], tm[k], tv[k] = torch_reference_lamb_step(
                tp[k], torch.tensor(grads[k]), tm[k], tv[k],
                lr, b1, b2, eps, wd, adam)
    for k in shapes:
        np.testing.assert_allclose(np.asarray(jp[k]), tp[k].numpy(),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"leaf {k} diverged")


def test_lamb_zero_param_trust_ratio_is_one():
    """weight_norm==0 → trust ratio 1 (reference lamb.py:111-112)."""
    opt = reference_lamb(1.0, eps=1e-6)
    p = {"z": jnp.zeros(4)}
    state = opt.init(p)
    g = {"z": jnp.ones(4)}
    updates, _ = opt.update(g, state, p)
    # m=0.1, v=0.001, adam_step=0.1/(0.0316+1e-6)≈3.162; trust=1; u=-lr*step
    expect = -(0.1 / (np.sqrt(0.001) + 1e-6)) * np.ones(4)
    np.testing.assert_allclose(np.asarray(updates["z"]), expect, rtol=1e-5)


def _norm_tree():
    rs = np.random.RandomState(3)
    return {
        "dense": {"kernel": jnp.asarray(rs.randn(8, 4), jnp.float32),
                  "bias": jnp.asarray(rs.randn(4), jnp.float32)},
        "layer_norm": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        "attention_layer_norm": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
    }


def test_no_decay_mask_excludes_bias_and_layernorm():
    from ance_tpu.optim.lamb import bias_layernorm_no_decay_mask
    mask = bias_layernorm_no_decay_mask(_norm_tree())
    assert mask == {
        "dense": {"kernel": True, "bias": False},
        "layer_norm": {"scale": False, "bias": False},
        "attention_layer_norm": {"scale": False, "bias": False},
    }


@pytest.mark.parametrize("name", ["lamb", "adamw"])
def test_optimizer_no_decay_grouping(name):
    """Reference dpr_utils.py:80-92 grouping: weight decay must act on the
    dense kernel but leave bias/LayerNorm updates identical to wd=0."""
    from ance_tpu.train.trainer import make_optimizer
    params = _norm_tree()
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.01), params)

    def one_update(wd):
        opt = make_optimizer(name, 1e-3, weight_decay=wd, max_grad_norm=0.0)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        return updates

    u0, u1 = one_update(0.0), one_update(0.1)
    # decayed: kernel update changes with wd
    assert not np.allclose(np.asarray(u0["dense"]["kernel"]),
                           np.asarray(u1["dense"]["kernel"]))
    # no-decay leaves: identical regardless of wd
    for mod, leaf in (("dense", "bias"), ("layer_norm", "scale"),
                      ("layer_norm", "bias"),
                      ("attention_layer_norm", "scale")):
        np.testing.assert_allclose(np.asarray(u0[mod][leaf]),
                                   np.asarray(u1[mod][leaf]), rtol=1e-6,
                                   err_msg=f"{mod}/{leaf} was decayed")


def test_trust_ratio_summary_for_lamb_only():
    from ance_tpu.train.trainer import make_optimizer
    from ance_tpu.optim.lamb import trust_ratio_summary
    params = _norm_tree()
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.01), params)

    opt = make_optimizer("lamb", 1e-3)
    state = opt.init(params)
    _, state = opt.update(grads, state, params)
    summary = trust_ratio_summary(state, params)
    assert set(summary) == {"trust_ratio_min", "trust_ratio_mean",
                            "trust_ratio_max"}
    assert 0 < summary["trust_ratio_min"] <= summary["trust_ratio_max"]

    adamw = make_optimizer("adamw", 1e-3)
    assert trust_ratio_summary(adamw.init(params), params) is None


def test_warmup_linear_schedule():
    s = warmup_linear(1.0, warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    np.testing.assert_allclose(float(s(60)), 0.5)
    np.testing.assert_allclose(float(s(110)), 0.0)
    assert float(s(200)) == 0.0


def test_warmup_cosine_schedule():
    s = warmup_cosine(2.0, warmup_steps=10, total_steps=110)
    np.testing.assert_allclose(float(s(5)), 1.0)
    np.testing.assert_allclose(float(s(10)), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(s(60)), 1.0, atol=1e-5)  # cos midpoint
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-6)


def _hf_linear_lambda(step, warmup, total):
    """HF get_linear_schedule_with_warmup's lr factor (what the reference
    rebuilds per ann-data file, run_ann.py:210-215)."""
    if step < warmup:
        return step / max(1, warmup)
    return max(0.0, (total - step) / max(1, total - warmup))


def test_rewarmup_matches_reference_lambda_shape():
    """scale_by_rewarmup's lr trace IS the HF scheduler lambda, and
    reset_rewarmup restarts it with the new horizon (reference run_ann.py
    210-215: fresh scheduler per dataset with num_training_steps =
    len(ann_training_data))."""
    from ance_tpu.optim.schedules import (
        reset_rewarmup, scale_by_rewarmup)

    base, warmup, h1, h2 = 2.0, 4, 20, 12
    tx = scale_by_rewarmup(base, warmup, initial_horizon=h1)
    params = {"w": jnp.ones((3,))}
    ones = {"w": jnp.ones((3,))}
    state = tx.init(params)

    trace = []
    for _ in range(8):
        scaled, state = tx.update(ones, state, params)
        trace.append(float(scaled["w"][0]))  # update == lr since input is 1
    want = [base * _hf_linear_lambda(s, warmup, h1) for s in range(8)]
    np.testing.assert_allclose(trace, want, rtol=1e-6)

    # dataset swap: anchor at the current step, new horizon
    state = reset_rewarmup(state, horizon=h2)
    trace2 = []
    for _ in range(h2 + 2):
        scaled, state = tx.update(ones, state, params)
        trace2.append(float(scaled["w"][0]))
    want2 = [base * _hf_linear_lambda(s, warmup, h2)
             for s in range(h2 + 2)]
    np.testing.assert_allclose(trace2, want2, rtol=1e-6)
    assert trace2[0] == 0.0          # the re-warmup actually restarted
    assert trace2[h2] == 0.0         # and decays to zero at the new horizon


@pytest.mark.parametrize("name", ["lamb", "adamw"])
def test_rewarmup_optimizer_equals_inline_schedule(name):
    """make_optimizer(rewarmup=...) must trace EXACTLY the same params as
    the same linear schedule passed inside the optimizer — post-scaling by
    the scalar lr commutes with LAMB's trust ratio and AdamW's decay."""
    from ance_tpu.train.trainer import make_optimizer

    rs = np.random.RandomState(3)
    params = {"w": jnp.asarray(rs.randn(4, 4), jnp.float32),
              "b": jnp.asarray(rs.randn(4), jnp.float32)}
    base, warmup, total = 1e-2, 3, 50
    opt_a = make_optimizer(name, warmup_linear(base, warmup, total),
                           weight_decay=0.01)
    opt_b = make_optimizer(name, base, weight_decay=0.01,
                           rewarmup=(warmup, total))
    pa, pb = params, params
    sa, sb = opt_a.init(pa), opt_b.init(pb)
    import optax
    for i in range(7):
        g = jax.tree.map(
            lambda p: jnp.asarray(rs.randn(*p.shape), jnp.float32), params)
        ua, sa = opt_a.update(g, sa, pa)
        ub, sb = opt_b.update(g, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
    for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-7)


def test_reset_rewarmup_requires_rewarmup_optimizer():
    from ance_tpu.optim.schedules import reset_rewarmup
    from ance_tpu.train.trainer import make_optimizer

    params = {"w": jnp.ones((2,))}
    plain = make_optimizer("lamb", warmup_linear(1e-3, 2, 10))
    with pytest.raises(ValueError, match="no RewarmupState"):
        reset_rewarmup(plain.init(params), horizon=5)
