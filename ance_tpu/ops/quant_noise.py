"""Quantization noise (Quant-Noise, Fan et al. 2020) — block DropConnect.

Exact port of the reference's fairseq ``quant_noise`` wrapper
(reference model/SEED_Encoder/modules.py:1631-1711): during TRAINING each
contiguous ``block_size`` span of a weight matrix's input axis is dropped
iid with probability ``p`` (independently per output feature) and the
surviving weights are scaled by ``1/(1-p)``; evaluation uses the raw
weights. The reference registers a forward pre-hook that mutates
``module.weight`` in place; the functional JAX form takes and returns the
kernel, and the caller applies it only on the training path.

The reference attaches this to the SEED attention projections
(modules.py:439-443, 666-670) and the AdaptiveSoftmax head/tails
(modules.py:1114, 1136) with ``q_noise=0`` in every shipped SEED config —
a dormant-but-present capability. Here it is exposed as
``EncoderConfig(quant_noise_p=..., quant_noise_block=...)`` on the shared
encoder stack (models/transformer.py), which covers both places the SEED
retrieval models run attention.

Layout note: torch ``nn.Linear.weight`` is [out, in] and the reference
tiles blocks along ``in`` per output row; flax ``nn.Dense`` kernels are
[in, out], so blocks tile axis 0 here — the same (out_feature, in_block)
granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quant_noise(key: jax.Array, kernel: jax.Array, p: float,
                block_size: int) -> jax.Array:
    """Training-time block quantization noise on a [in, out] kernel.

    Each (in-block, out-feature) block of ``block_size`` input rows is
    zeroed with probability ``p``; all surviving entries scale by
    ``1/(1-p)`` (reference modules.py:1707-1708 ``s * masked_fill``).
    ``p=0`` returns the kernel unchanged. The input axis must be a
    multiple of ``block_size`` (reference modules.py:1663).
    """
    if p <= 0.0:
        return kernel
    if not 0.0 < p < 1.0:
        raise ValueError(f"quant_noise p must be in [0, 1), got {p}")
    in_f, out_f = kernel.shape
    if in_f % block_size:
        raise ValueError(
            f"input features {in_f} not a multiple of block size "
            f"{block_size} (reference modules.py:1663)")
    drop = jax.random.bernoulli(key, p, (in_f // block_size, out_f))
    mask = jnp.repeat(drop, block_size, axis=0)          # [in, out]
    scale = jnp.asarray(1.0 / (1.0 - p), kernel.dtype)
    return jnp.where(mask, jnp.zeros((), kernel.dtype), kernel * scale)
