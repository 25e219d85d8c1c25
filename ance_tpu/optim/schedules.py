"""Learning-rate schedules matching the reference drivers.

The reference uses HF transformers 2.3.0 schedules:
  * ``WarmupLinearSchedule``  (run_ann.py / run_warmup.py default)
  * ``WarmupCosineSchedule``  (run_warmup.py:86-94 ``--lr_style cosine``)
Both are linear-warmup from 0; decay begins at ``warmup_steps``.
"""

from __future__ import annotations

import jax.numpy as jnp


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
