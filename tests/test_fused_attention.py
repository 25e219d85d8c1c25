"""Fused whole-sequence attention kernel: exact parity with the XLA path
(interpret mode on CPU; the TPU lowering is exercised by the perf drives)."""

import numpy as np

import jax
import jax.numpy as jnp

from ance_tpu.ops.attention import (
    mask_to_bias, multi_head_attention, xla_attention)
from ance_tpu.ops.fused_attention import _fused_forward, fused_attention


def _data(B=4, S=128, H=12, D=64, seed=0):
    rs = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rs.randn(B, S, H, D), jnp.float32)
               for _ in range(3))
    mask = np.ones((B, S), np.int32)
    mask[0, S - 28:] = 0
    mask[-1, S // 4:] = 0
    return q, k, v, jnp.asarray(mask)


def test_fused_matches_xla_with_padding():
    q, k, v, mask = _data()
    want = xla_attention(q, k, v, mask_to_bias(mask))
    got = _fused_forward(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_xla_maxp_shape():
    """The shape the kernel was built for: 512-token MaxP chunks."""
    q, k, v, mask = _data(B=2, S=512, H=4, D=64, seed=1)
    want = xla_attention(q, k, v, mask_to_bias(mask))
    got = _fused_forward(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_backward_matches_xla():
    """custom_vjp recompute backward ≡ differentiating the XLA path."""
    q, k, v, mask = _data(B=2, S=64, H=2, D=64, seed=2)
    bias = mask_to_bias(mask)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, bias) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # the vjp's forward invokes the compiled kernel; force interpret on CPU
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_auto_dispatch_on_cpu_is_xla():
    """auto == xla on CPU — results identical bit for bit."""
    q, k, v, mask = _data(B=2, S=32, H=2, D=64, seed=3)
    a = multi_head_attention(q, k, v, mask, impl="auto")
    b = multi_head_attention(q, k, v, mask, impl="xla")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
