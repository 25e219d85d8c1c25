"""LayerDrop + quantization noise — the last dormant fairseq surfaces.

Reference semantics under test:
  * quant_noise (modules.py:1631-1711): training-only block DropConnect —
    Bernoulli(p) per (output feature, input block), survivors scaled
    1/(1-p), eval untouched.
  * LayerDropModuleList (modules.py:103-135): each encoder layer is
    skipped whole-batch with probability p per iteration during training;
    evaluation always runs every layer; no rescaling of survivors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder
from ance_tpu.ops.quant_noise import quant_noise

CFG = dict(vocab_size=101, hidden_size=16, num_layers=3, num_heads=2,
           intermediate_size=32, max_position_embeddings=40,
           hidden_dropout=0.0, attention_dropout=0.0)


def _ids(batch=2, seq=8, seed=0):
    rs = np.random.RandomState(seed)
    ids = jnp.asarray(rs.randint(4, 100, (batch, seq)), jnp.int32)
    return ids, jnp.ones_like(ids)


class TestQuantNoise:
    def test_p_zero_identity(self):
        k = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
        out = quant_noise(jax.random.PRNGKey(0), k, 0.0, 4)
        np.testing.assert_array_equal(out, k)

    def test_block_structure_and_scale(self):
        """Entries are either 0 (dropped block) or kernel/(1-p), and the
        drop pattern is constant within each (input-block, out-feature)
        cell — the reference's repeat_interleave granularity
        (modules.py:1685-1687)."""
        p, bs = 0.4, 4
        kernel = jnp.asarray(np.random.RandomState(1).rand(16, 6) + 0.5,
                             jnp.float32)
        out = np.asarray(quant_noise(jax.random.PRNGKey(3), kernel, p, bs))
        ratio = out / np.asarray(kernel)           # 0 or 1/(1-p) (fp32)
        assert ((ratio == 0.0) |
                np.isclose(ratio, 1 / (1 - p), rtol=1e-5)).all()
        dropped = (ratio == 0.0).reshape(16 // bs, bs, 6)
        assert (dropped == dropped[:, :1, :]).all(), \
            "drop decision must be constant within a block"

    def test_drop_rate_statistics(self):
        p, bs = 0.25, 8
        kernel = jnp.ones((64, 128), jnp.float32)
        outs = [np.asarray(quant_noise(jax.random.PRNGKey(i), kernel, p, bs))
                for i in range(20)]
        frac = np.mean([np.mean(o == 0) for o in outs])
        assert abs(frac - p) < 0.02

    def test_expectation_preserved(self):
        """E[noised] == kernel (the 1/(1-p) scale makes it unbiased — the
        property the paper's QAT argument rests on)."""
        p, bs = 0.5, 2
        kernel = jnp.full((8, 300), 2.0, jnp.float32)
        mean = np.mean([np.asarray(
            quant_noise(jax.random.PRNGKey(i), kernel, p, bs))
            for i in range(200)], axis=0)
        # per-entry std of the mean is 2/sqrt(200) ≈ 0.14: check the global
        # mean tightly and each entry at ~5 sigma
        assert abs(mean.mean() - 2.0) < 0.05
        np.testing.assert_allclose(mean, 2.0, atol=0.75)

    def test_bad_block_size_raises(self):
        with pytest.raises(ValueError, match="multiple of block size"):
            quant_noise(jax.random.PRNGKey(0), jnp.ones((10, 4)), 0.1, 4)


class TestEncoderKnobs:
    def _run(self, cfg_kw, deterministic, seed=0, rng_seed=7):
        cfg = EncoderConfig(**{**CFG, **cfg_kw})
        model = TransformerEncoder(cfg)
        ids, mask = _ids(seed=seed)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        return params, model.apply(
            {"params": params}, ids, mask, deterministic=deterministic,
            rngs={} if deterministic else
            {"dropout": jax.random.PRNGKey(rng_seed)})

    def test_param_tree_unchanged_by_knobs(self):
        """Checkpoints interop: enabling layerdrop/quant_noise must not
        change parameter names or shapes."""
        base, _ = self._run({}, True)
        knobs, _ = self._run({"layerdrop_rate": 0.3, "quant_noise_p": 0.2,
                              "quant_noise_block": 8}, True)
        assert jax.tree_util.tree_structure(base) == \
            jax.tree_util.tree_structure(knobs)
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(knobs)):
            assert a.shape == b.shape

    def test_eval_ignores_both_knobs(self):
        _, base = self._run({}, True)
        _, with_knobs = self._run({"layerdrop_rate": 0.5,
                                   "quant_noise_p": 0.3}, True)
        np.testing.assert_allclose(np.asarray(base), np.asarray(with_knobs),
                                   rtol=1e-6)

    def test_layerdrop_one_skips_every_layer(self):
        """rate=1.0 during training: the stack reduces to the embeddings —
        the reference's 'might not iterate over any layers' extreme
        (modules.py:115-117)."""
        cfg = EncoderConfig(**{**CFG, "layerdrop_rate": 1.0})
        model = TransformerEncoder(cfg)
        ids, mask = _ids()
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        out = model.apply({"params": params}, ids, mask, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        from ance_tpu.models.transformer import Embeddings
        emb = Embeddings(cfg).apply(
            {"params": params["embeddings"]}, ids, deterministic=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(emb),
                                   rtol=1e-5, atol=1e-6)

    def test_layerdrop_varies_with_rng(self):
        cfg = EncoderConfig(**{**CFG, "layerdrop_rate": 0.5})
        model = TransformerEncoder(cfg)
        ids, mask = _ids()
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        outs = [np.asarray(model.apply(
            {"params": params}, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(i)})) for i in range(6)]
        distinct = {o.tobytes() for o in outs}
        assert len(distinct) > 1, "different rngs must drop different layers"

    def test_quant_noise_trains_noisily_and_centered(self):
        """Training outputs vary with rng, and their mean stays near the
        noise-free output (unbiased weights ⇒ approximately centered
        activations at small p)."""
        cfg_kw = {"quant_noise_p": 0.15, "quant_noise_block": 4}
        params, clean = self._run(cfg_kw, True)
        cfg = EncoderConfig(**{**CFG, **cfg_kw})
        model = TransformerEncoder(cfg)
        ids, mask = _ids()
        outs = [np.asarray(model.apply(
            {"params": params}, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(i)})) for i in range(30)]
        assert len({o.tobytes() for o in outs}) > 1
        err = np.abs(np.mean(outs, axis=0) - np.asarray(clean))
        scale = np.abs(np.asarray(clean)).mean() + 1e-6
        assert err.mean() / scale < 0.35
