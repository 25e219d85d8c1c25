"""LAMB optimizer with the reference's exact (nonstandard) semantics.

The reference LAMB (reference utils/lamb.py:95-121) deviates from both the
paper and optax's textbook ``optax.lamb``:

  * NO bias correction of the moments (lamb.py:100-102),
  * weight norm clamped to [0, 10] (lamb.py:104),
  * trust ratio = 1 whenever either norm is zero (lamb.py:111-114),
  * weight decay added to the adam step BEFORE the trust-ratio norm
    (lamb.py:107-108),
  * ``adam=True`` forces trust ratio 1 (degenerates to un-debiased Adam,
    lamb.py:118-119).

SURVEY.md §7.3 flags these numerics as a hard part: port exactly, don't
substitute the textbook version. The trust ratio is per-parameter-tensor
(per pytree leaf), matching torch's per-``Parameter`` state; the reference's
"layerwise" optimizer groups (run_ann.py:58-93) share identical hyperparams,
so per-leaf treatment is mathematically identical.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class LambState(NamedTuple):
    count: chex.Array   # []
    mu: optax.Updates   # first moment
    nu: optax.Updates   # second moment


def reference_lamb(learning_rate: optax.ScalarOrSchedule,
                   b1: float = 0.9,
                   b2: float = 0.999,
                   eps: float = 1e-6,
                   weight_decay: float = 0.0,
                   adam: bool = False,
                   decay_mask=None) -> optax.GradientTransformation:
    """Build the GradientTransformation. Defaults match reference
    utils/lamb.py:45 (note eps default 1e-6 there; drivers pass
    ``--adam_epsilon`` 1e-8).

    ``decay_mask``: callable params → pytree of bools; leaves marked False
    skip weight decay (the reference's bias/LayerNorm no-decay grouping,
    dpr_utils.py:80-92 / run_ann.py:58-78)."""

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return LambState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("reference_lamb requires params")
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        lr = learning_rate(count - 1) if callable(learning_rate) \
            else learning_rate

        def leaf_update(m, v, p, decay):
            adam_step = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0 and decay:  # decay is a static bool
                adam_step = adam_step + weight_decay * p
            weight_norm = jnp.clip(
                jnp.sqrt(jnp.sum(jnp.square(p))), 0.0, 10.0)
            adam_norm = jnp.sqrt(jnp.sum(jnp.square(adam_step)))
            trust_ratio = jnp.where(
                (weight_norm == 0.0) | (adam_norm == 0.0),
                1.0, weight_norm / jnp.where(adam_norm == 0.0, 1.0, adam_norm))
            if adam:
                trust_ratio = 1.0
            return -lr * trust_ratio * adam_step

        mask = decay_mask(params) if decay_mask is not None \
            else jax.tree.map(lambda _: True, params)
        new_updates = jax.tree.map(leaf_update, mu, nu, params, mask)
        return new_updates, LambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def bias_layernorm_no_decay_mask(params):
    """Decay mask excluding biases and every LayerNorm parameter (their
    module names all contain 'norm'), matching the reference's no_decay
    grouping on ["bias", "LayerNorm.weight"] (dpr_utils.py:80-92)."""
    def decide(path, _leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys and keys[-1] == "bias":
            return False
        return not any("norm" in k.lower() for k in keys)
    return jax.tree_util.tree_map_with_path(decide, params)


def find_lamb_state(opt_state) -> LambState | None:
    """Locate the LambState inside a (possibly chained) optax state tree."""
    if isinstance(opt_state, LambState):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = find_lamb_state(sub)
            if found is not None:
                return found
    return None


def trust_ratio_summary(opt_state, params, eps: float = 1e-6,
                        weight_decay: float = 0.0) -> dict | None:
    """min/mean/max of the per-leaf LAMB trust ratios — the in-loop
    observability the reference plots as TB histograms (utils/lamb.py:11-22
    log_lamb_rs). Returns None when the optimizer isn't LAMB."""
    state = find_lamb_state(opt_state)
    if state is None:
        return None
    ratios = jnp.stack(jax.tree.leaves(
        lamb_trust_ratios(state, params, eps, weight_decay)))
    ratios = jax.device_get(ratios)
    return {"trust_ratio_min": float(ratios.min()),
            "trust_ratio_mean": float(ratios.mean()),
            "trust_ratio_max": float(ratios.max())}


def lamb_trust_ratios(state: LambState, params, eps: float = 1e-6,
                      weight_decay: float = 0.0) -> dict:
    """Diagnostic: per-leaf trust ratios for TB-histogram-style logging
    (reference utils/lamb.py:11-22 log_lamb_rs)."""
    def ratio(m, v, p):
        adam_step = m / (jnp.sqrt(v) + eps)
        if weight_decay != 0.0:
            adam_step = adam_step + weight_decay * p
        wn = jnp.clip(jnp.sqrt(jnp.sum(jnp.square(p))), 0.0, 10.0)
        an = jnp.sqrt(jnp.sum(jnp.square(adam_step)))
        return jnp.where((wn == 0.0) | (an == 0.0), 1.0,
                         wn / jnp.where(an == 0.0, 1.0, an))
    return jax.tree.map(ratio, state.mu, state.nu, params)
