"""CLI warm-start dispatch (ADVICE r1, medium): each model family must route
through its own torch→flax mapping, and structural mismatches must raise
instead of silently leaving random init behind."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ance_tpu.cli import _warm_start_params
from ance_tpu.models.dot_models import BiEncoder, RobertaDot
from ance_tpu.models.registry import get_model_spec
from ance_tpu.models.transformer import EncoderConfig

VOCAB, HID, LAYERS, HEADS, FFN = 32, 8, 2, 2, 16


def _hf_encoder_sd(rs, prefix, max_pos=20, type_vocab=2):
    def t(*shape):
        return torch.tensor(rs.randn(*shape).astype(np.float32) * 0.05)
    sd = {
        prefix + "embeddings.word_embeddings.weight": t(VOCAB, HID),
        prefix + "embeddings.position_embeddings.weight": t(max_pos, HID),
        prefix + "embeddings.token_type_embeddings.weight": t(type_vocab, HID),
        prefix + "embeddings.LayerNorm.weight": t(HID) + 1.0,
        prefix + "embeddings.LayerNorm.bias": t(HID),
    }
    for i in range(LAYERS):
        lp = f"{prefix}encoder.layer.{i}."
        for name, dout, din in (
                ("attention.self.query", HID, HID),
                ("attention.self.key", HID, HID),
                ("attention.self.value", HID, HID),
                ("attention.output.dense", HID, HID),
                ("intermediate.dense", FFN, HID),
                ("output.dense", HID, FFN)):
            sd[lp + name + ".weight"] = t(dout, din)
            sd[lp + name + ".bias"] = t(dout)
        for name in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[lp + name + ".weight"] = t(HID) + 1.0
            sd[lp + name + ".bias"] = t(HID)
    return sd


def _tiny_bert_cfg():
    return EncoderConfig.bert_base(
        vocab_size=VOCAB, hidden_size=HID, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=FFN, max_position_embeddings=20,
        hidden_dropout=0.0, attention_dropout=0.0)


def _tiny_roberta_cfg():
    return EncoderConfig(
        vocab_size=VOCAB, hidden_size=HID, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=FFN, max_position_embeddings=20,
        type_vocab_size=1, hidden_dropout=0.0, attention_dropout=0.0)


def _init(model):
    ids = jnp.ones((2, 6), jnp.int32)
    return model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]


def test_seed_pretrain_checkpoint_warmstarts_seeddot(tmp_path):
    """The native pretrain→fine-tune handoff (reference README.md:83-87
    workflow): a ``seed-pretrain`` msgpack MLM checkpoint grafts its
    encoder onto the seeddot model; decoder + LM head are dropped and the
    projection head stays freshly initialized."""
    from ance_tpu.cli import _has_warm_start, _warm_start_params
    from ance_tpu.models.seed import (
        SeedDecoderConfig, SeedForMaskedLM, seed_dot_model,
        seed_encoder_config)
    from ance_tpu.train.checkpoint import save_checkpoint

    geom = dict(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=40,
                hidden_dropout=0.0, attention_dropout=0.0)
    mlm = SeedForMaskedLM(
        seed_encoder_config(**geom),
        SeedDecoderConfig(num_layers=1, attention_window=2, hidden_size=32,
                          num_heads=4, intermediate_size=64,
                          max_positions=40, dropout=0.0))
    ids = jnp.ones((2, 8), jnp.int32)
    mlm_params = jax.jit(mlm.init)(jax.random.PRNGKey(1), ids,
                                   jnp.ones_like(ids), ids[:, :6])["params"]
    save_checkpoint(str(tmp_path / "pretrain"), 5,
                    jax.device_get(mlm_params))
    assert _has_warm_start(str(tmp_path / "pretrain"))

    dot = seed_dot_model(out_dim=16, **geom)
    init = _init(dot)
    spec = get_model_spec("seeddot_nll")
    warm = _warm_start_params(spec, init, str(tmp_path / "pretrain"))

    got = np.asarray(
        warm["encoder"]["embeddings"]["word_embeddings"]["embedding"])
    want = np.asarray(
        mlm_params["encoder"]["embeddings"]["word_embeddings"]["embedding"])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(warm["encoder"]["layer_1"]["mlp"]["intermediate"]["kernel"]),
        np.asarray(mlm_params["encoder"]["layer_1"]["mlp"]["intermediate"]
                   ["kernel"]))
    # fresh head survives; no decoder/LM leaves leak into the dot tree
    np.testing.assert_array_equal(
        np.asarray(warm["embedding_head"]["kernel"]),
        np.asarray(init["embedding_head"]["kernel"]))
    assert "lm_dense" not in warm and "decoder_layer_0" not in warm


def test_native_dot_checkpoint_warmstarts_same_family(tmp_path):
    """A checkpoint from OUR trainer (dot tree) also warm-starts directly
    via --model_name_or_path — e.g. reusing a FirstP checkpoint as the
    init of a new experiment without --training_dir resume semantics."""
    from ance_tpu.cli import _warm_start_params
    from ance_tpu.train.checkpoint import save_checkpoint

    model = RobertaDot(_tiny_roberta_cfg(), out_dim=16)
    src = _init(model)
    save_checkpoint(str(tmp_path / "run1"), 3, jax.device_get(src))

    fresh = RobertaDot(_tiny_roberta_cfg(), out_dim=16)
    init2 = jax.jit(fresh.init)(jax.random.PRNGKey(7),
                                jnp.ones((2, 6), jnp.int32),
                                jnp.ones((2, 6), jnp.int32))["params"]
    spec = get_model_spec("rdot_nll")
    warm = _warm_start_params(spec, init2, str(tmp_path / "run1"))
    np.testing.assert_array_equal(
        np.asarray(warm["embedding_head"]["kernel"]),
        np.asarray(src["embedding_head"]["kernel"]))


def test_dpr_warmstart_routes_to_biencoder_mapping(tmp_path):
    rs = np.random.RandomState(0)
    sd = {}
    for tower in ("question_model", "ctx_model"):
        sd.update(_hf_encoder_sd(rs, tower + "."))
    torch.save({"model_dict": sd, "optimizer_dict": {}},
               tmp_path / "pytorch_model.bin")

    params = _init(BiEncoder(_tiny_bert_cfg()))
    out = _warm_start_params(get_model_spec("dpr"), params, str(tmp_path))
    got = out["question_model"]["encoder"]["embeddings"][
        "word_embeddings"]["embedding"]
    want = sd["question_model.embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(np.asarray(got), want)
    # ctx tower differs from question tower (independent params grafted)
    got_ctx = out["ctx_model"]["encoder"]["embeddings"][
        "word_embeddings"]["embedding"]
    assert not np.allclose(np.asarray(got_ctx), want)


def test_rdot_warmstart_keeps_fresh_head(tmp_path):
    rs = np.random.RandomState(1)
    sd = _hf_encoder_sd(rs, "roberta.", type_vocab=1)
    torch.save(sd, tmp_path / "pytorch_model.bin")

    model = RobertaDot(_tiny_roberta_cfg(), out_dim=4)
    params = _init(model)
    head_before = np.asarray(params["embedding_head"]["kernel"])
    out = _warm_start_params(get_model_spec("rdot_nll"), params,
                             str(tmp_path))
    got = out["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_allclose(
        np.asarray(got), sd["roberta.embeddings.word_embeddings.weight"].numpy())
    # no embeddingHead in the checkpoint → init head kept
    np.testing.assert_array_equal(np.asarray(out["embedding_head"]["kernel"]),
                                  head_before)


def test_dpr_checkpoint_into_rdot_raises(tmp_path):
    """The pre-fix behavior silently grafted garbage; now it must raise."""
    rs = np.random.RandomState(2)
    sd = {}
    for tower in ("question_model", "ctx_model"):
        sd.update(_hf_encoder_sd(rs, tower + "."))
    torch.save({"model_dict": sd}, tmp_path / "pytorch_model.bin")

    model = RobertaDot(_tiny_roberta_cfg(), out_dim=4)
    params = _init(model)
    with pytest.raises(KeyError):
        _warm_start_params(get_model_spec("rdot_nll"), params, str(tmp_path))


def test_ambiguous_checkpoint_dir_raises(tmp_path):
    """A dir with several torch artifacts (e.g. a sharded HF checkpoint)
    must error clearly instead of grafting the alphabetically-first shard."""
    import torch
    from ance_tpu.models.hf_loader import load_torch_state_dict

    d = tmp_path / "ckpt"
    d.mkdir()
    torch.save({"a": torch.zeros(1)}, d / "pytorch_model-00001-of-00002.bin")
    torch.save({"b": torch.zeros(1)}, d / "pytorch_model-00002-of-00002.bin")
    torch.save({"args": 1}, d / "training_args.bin")  # must be ignored
    with pytest.raises(FileNotFoundError, match="ambiguous"):
        load_torch_state_dict(d)
    # a single candidate (plus training_args.bin) still loads
    (d / "pytorch_model-00002-of-00002.bin").unlink()
    sd = load_torch_state_dict(d)
    assert "a" in sd
