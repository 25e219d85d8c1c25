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
                   adam: bool = False) -> optax.GradientTransformation:
    """Build the GradientTransformation. Defaults match reference
    utils/lamb.py:45 (note eps default 1e-6 there; drivers pass
    ``--adam_epsilon`` 1e-8)."""

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

        def leaf_update(m, v, p):
            adam_step = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0:
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

        new_updates = jax.tree.map(leaf_update, mu, nu, params)
        return new_updates, LambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


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
