"""Flash attention vs the XLA reference implementation (interpret mode on
CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.ops.attention import mask_to_bias, xla_attention

import ance_tpu.ops.flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Pallas TPU kernels run in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _inputs(B=2, S=64, H=2, D=16, seed=0, dtype=np.float32):
    rs = np.random.RandomState(seed)
    q, k, v = (rs.randn(B, S, H, D).astype(dtype) for _ in range(3))
    lengths = rs.randint(S // 2, S + 1, size=B)
    mask = (np.arange(S)[None, :] < lengths[:, None]).astype(np.int32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)


def test_flash_matches_xla_attention():
    q, k, v, mask = _inputs()
    out = fa.flash_attention(q, k, v, mask, 32, 32)
    ref = xla_attention(q, k, v, mask_to_bias(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_no_mask():
    q, k, v, _ = _inputs(seed=1)
    out = fa.flash_attention(q, k, v, None, 32, 32)
    ref = xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_single_block_and_multi_block_agree():
    q, k, v, mask = _inputs(S=64, seed=2)
    one = fa.flash_attention(q, k, v, mask, 64, 64)
    many = fa.flash_attention(q, k, v, mask, 16, 16)
    np.testing.assert_allclose(np.asarray(one), np.asarray(many),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_xla():
    q, k, v, mask = _inputs(B=1, S=32, H=2, D=8, seed=3)
    bias = mask_to_bias(mask)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, mask, 16, 16) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, bias) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_with_flash_impl_matches_xla_impl():
    """TransformerEncoder(attention_impl='flash') ≡ 'xla' end to end."""
    from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder
    cfg_x = EncoderConfig(vocab_size=80, hidden_size=32, num_layers=2,
                          num_heads=4, intermediate_size=64,
                          max_position_embeddings=80, pad_token_id=1,
                          hidden_dropout=0.0, attention_dropout=0.0,
                          attention_impl="xla")
    import dataclasses
    cfg_f = dataclasses.replace(cfg_x, attention_impl="flash")
    rs = np.random.RandomState(4)
    B, S = 2, 64
    ids = rs.randint(4, 80, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 40:] = 0
    enc_x = TransformerEncoder(cfg_x)
    params = enc_x.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))["params"]
    out_x = enc_x.apply({"params": params}, jnp.asarray(ids),
                        jnp.asarray(mask))
    out_f = TransformerEncoder(cfg_f).apply({"params": params},
                                            jnp.asarray(ids),
                                            jnp.asarray(mask))
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out_f)[valid],
                               np.asarray(out_x)[valid],
                               rtol=1e-4, atol=1e-4)
