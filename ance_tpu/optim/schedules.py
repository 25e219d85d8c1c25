"""Learning-rate schedules matching the reference drivers.

The reference uses HF transformers 2.3.0 schedules:
  * ``WarmupLinearSchedule``  (run_ann.py / run_warmup.py default)
  * ``WarmupCosineSchedule``  (run_warmup.py:86-94 ``--lr_style cosine``)
Both are linear-warmup from 0; decay begins at ``warmup_steps``.

Per-dataset RE-warmup: by default (without ``--single_warmup``) the
reference trainer builds a FRESH ``get_linear_schedule_with_warmup`` on
every new ann-data file, with the decay horizon set to that file's line
count (reference run_ann.py:210-215) — the LR ramps from 0 again at each
swap. :func:`scale_by_rewarmup` is the optax port: an lr-scaling transform
whose state carries a resettable ``anchor`` (the optimizer step of the last
swap) and a dynamic ``horizon``, so :func:`reset_rewarmup` re-anchors the
schedule without recompiling the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def warmup_linear(base_lr: float, warmup_steps: int, total_steps: int):
    """lr(step) = base · min(step/warmup, (total−step)/(total−warmup))⁺."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps
        decay = (total_steps - step) / max(1.0, total_steps - warmup_steps)
        return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return schedule


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  cycles: float = 0.5):
    """Linear warmup then cosine decay with ``cycles`` half-cosines."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(step / warmup_steps, 0.0, 1.0)
        progress = jnp.clip((step - warmup_steps) /
                            max(1.0, total_steps - warmup_steps), 0.0, 1.0)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(
            jnp.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def constant(base_lr: float):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)
    return schedule


class RewarmupState(NamedTuple):
    count: chex.Array    # [] int32, optimizer steps taken overall
    anchor: chex.Array   # [] int32, step of the last dataset swap
    horizon: chex.Array  # [] fp32, current dataset's decay horizon


def _rewarmup_lr(base_lr: float, warmup_steps: int, local, horizon):
    """HF ``get_linear_schedule_with_warmup`` lambda at a LOCAL step
    (reference run_ann.py:210-215 rebuilds it per dataset): step/warmup
    during warmup, then linear decay to zero at ``horizon``."""
    w = max(warmup_steps, 1)
    local = jnp.asarray(local, jnp.float32)
    warm = local / w
    decay = (horizon - local) / jnp.maximum(1.0, horizon - w)
    return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)


def scale_by_rewarmup(base_lr: float, warmup_steps: int,
                      initial_horizon: float
                      ) -> optax.GradientTransformation:
    """Multiply updates by the re-anchorable warmup-linear schedule.

    Chain it AFTER the inner optimizer built with learning_rate=1.0 — the
    lr is a scalar, so post-scaling is exactly equal to passing it inside
    (LAMB's trust ratio is lr-independent). The schedule evaluates at the
    PRE-increment step (first update sees lr(0)), matching both
    reference_lamb's ``count - 1`` convention and torch LambdaLR's
    ``last_epoch=-1`` start."""

    def init_fn(params):
        del params
        return RewarmupState(count=jnp.zeros([], jnp.int32),
                             anchor=jnp.zeros([], jnp.int32),
                             horizon=jnp.asarray(initial_horizon,
                                                 jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        lr = _rewarmup_lr(base_lr, warmup_steps,
                          state.count - state.anchor, state.horizon)
        scaled = jax.tree.map(lambda u: u * lr, updates)
        return scaled, RewarmupState(count=state.count + 1,
                                     anchor=state.anchor,
                                     horizon=state.horizon)

    return optax.GradientTransformation(init_fn, update_fn)


def find_rewarmup_state(opt_state) -> RewarmupState | None:
    if isinstance(opt_state, RewarmupState):
        return opt_state
    if isinstance(opt_state, (tuple, list)) \
            and not hasattr(opt_state, "_fields"):
        for sub in opt_state:
            found = find_rewarmup_state(sub)
            if found is not None:
                return found
    return None


def reset_rewarmup(opt_state, horizon: float):
    """Re-anchor the schedule at the current step with a new decay horizon
    (the reference's fresh scheduler per ann-data file, run_ann.py:210-215;
    ``horizon`` = that file's training-line count). Returns a new opt_state
    tree; raises if no RewarmupState is present (the optimizer was built
    without ``rewarmup``)."""
    hits = 0

    def visit(s):
        nonlocal hits
        if isinstance(s, RewarmupState):
            hits += 1
            # anchor must be a COPY of count: aliasing the same buffer
            # twice in the state pytree breaks the train step's donation
            return RewarmupState(count=s.count, anchor=jnp.copy(s.count),
                                 horizon=jnp.asarray(horizon, jnp.float32))
        if isinstance(s, (tuple, list)) and not hasattr(s, "_fields"):
            return type(s)(visit(x) for x in s)
        return s

    new_state = visit(opt_state)
    if not hits:
        raise ValueError("opt_state has no RewarmupState — build the "
                         "optimizer with make_optimizer(..., rewarmup=...)")
    return new_state


def rewarmup_current_lr(opt_state, base_lr: float, warmup_steps: int
                        ) -> float:
    """The lr the NEXT update will apply (observability/test hook)."""
    s = find_rewarmup_state(opt_state)
    if s is None:
        raise ValueError("opt_state has no RewarmupState")
    return float(_rewarmup_lr(base_lr, warmup_steps,
                              jax.device_get(s.count - s.anchor),
                              jax.device_get(s.horizon)))
