"""HF/torch checkpoint EXPORT: the inverse of the hf_loader import path.

The reference ecosystem consumes ``from_pretrained`` directories
(drivers/run_ann.py:680-685) and single-file DPR CheckpointState dicts
(drivers/run_ann_dpr.py:376-392); these tests assert that checkpoints
trained here survive the trip out — round-trip identity through our own
importer, torch-side forward parity, and a real ``from_pretrained`` load
of the exported directory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.models.dot_models import BiEncoder, RobertaDot
from ance_tpu.models.hf_export import (
    save_dpr_checkpoint, save_hf_checkpoint, torch_robertadot_state_dict,
    torch_seeddot_state_dict)
from ance_tpu.models.hf_loader import (
    biencoder_params_from_torch, load_torch_state_dict,
    robertadot_params_from_torch, seeddot_params_from_torch)
from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _small_cfg(**kw):
    return EncoderConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64,
                         max_position_embeddings=40, type_vocab_size=1,
                         pad_token_id=1, position_style="roberta",
                         hidden_dropout=0.0, attention_dropout=0.0, **kw)


def _batch(pad_id=1, vocab=100, B=3, S=12, seed=7):
    rs = np.random.RandomState(seed)
    ids = rs.randint(4, vocab, size=(B, S)).astype(np.int32)
    lengths = rs.randint(3, S + 1, size=B)
    mask = (np.arange(S)[None, :] < lengths[:, None]).astype(np.int32)
    return np.where(mask == 1, ids, pad_id), mask


def _tree_allclose(a, b, path=""):
    assert set(a) == set(b), f"{path}: {sorted(a)} vs {sorted(b)}"
    for k in a:
        where = f"{path}/{k}"
        if isinstance(a[k], dict):
            _tree_allclose(a[k], b[k], where)
        else:
            np.testing.assert_allclose(np.asarray(a[k], np.float32),
                                       np.asarray(b[k], np.float32),
                                       atol=0, rtol=0, err_msg=where)


def _init_robertadot(cfg, out_dim=16):
    model = RobertaDot(cfg, out_dim=out_dim)
    ids, mask = _batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(3), jnp.asarray(ids),
                                 jnp.asarray(mask))["params"]
    return model, params


def test_robertadot_export_import_roundtrip():
    cfg = _small_cfg()
    _, params = _init_robertadot(cfg)
    sd = torch_robertadot_state_dict(params)
    back = robertadot_params_from_torch(sd, cfg.num_layers)
    _tree_allclose(jax.device_get(params), back)


@pytest.mark.slow  # parity tier: fast tier stays <4 min
def test_export_forward_parity_in_torch():
    """The exported backbone, loaded into a torch RobertaModel, reproduces
    our flax encoder's hidden states — the mirror image of
    test_models.py::test_roberta_forward_parity."""
    cfg = _small_cfg()
    model, params = _init_robertadot(cfg)
    ids, mask = _batch(seed=11)

    hf_cfg = transformers.RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        attn_implementation="eager")
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    sd = torch_robertadot_state_dict(params)
    backbone = {k[len("roberta."):]: v for k, v in sd.items()
                if k.startswith("roberta.")}
    missing, unexpected = hf.load_state_dict(backbone, strict=False)
    assert not unexpected, unexpected
    assert all("pooler" in k for k in missing), missing

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(TransformerEncoder(cfg).apply)(
        {"params": jax.device_get(params)["encoder"]}, jnp.asarray(ids),
        jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-3, atol=5e-4)


def test_save_hf_checkpoint_from_pretrained(tmp_path):
    """The exported DIRECTORY (bin + config.json) loads through the same
    ``from_pretrained`` entry the reference drivers use, offline, and the
    loaded torch model matches our query_emb through the head replica."""
    cfg = _small_cfg()
    model, params = _init_robertadot(cfg)
    out = save_hf_checkpoint(tmp_path / "ckpt", params, cfg)

    hf = transformers.RobertaModel.from_pretrained(
        out, add_pooling_layer=False, attn_implementation="eager").eval()
    ids, mask = _batch(seed=13)
    with torch.no_grad():
        cls = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()[:, 0]
    p = jax.device_get(params)
    proj = cls @ np.asarray(p["embedding_head"]["kernel"]) + \
        np.asarray(p["embedding_head"]["bias"])
    mu, var = proj.mean(-1, keepdims=True), proj.var(-1, keepdims=True)
    head = (proj - mu) / np.sqrt(var + 1e-5) * \
        np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])

    ours = np.asarray(jax.jit(
        lambda i, m: model.apply({"params": params}, i, m,
                                 method=RobertaDot.query_emb))(
        jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, head, rtol=2e-3, atol=1e-3)

    # and our own importer accepts the directory (full two-way trip)
    back = robertadot_params_from_torch(load_torch_state_dict(out),
                                        cfg.num_layers)
    _tree_allclose(jax.device_get(params), back)


def test_dpr_checkpoint_roundtrip(tmp_path):
    """BiEncoder → reference CheckpointState file → re-import: identical
    trees, and the file carries the reference's exact field set
    (dpr_utils.py:23-25)."""
    cfg = EncoderConfig.bert_base(vocab_size=120, hidden_size=32,
                                  num_layers=2, num_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=40,
                                  hidden_dropout=0.0, attention_dropout=0.0)
    model = BiEncoder(cfg)
    ids, mask = _batch(pad_id=0, vocab=120)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(5), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(ids), jnp.asarray(mask))["params"]

    path = save_dpr_checkpoint(tmp_path / "checkpoint-7", params, offset=7)
    raw = torch.load(path, map_location="cpu", weights_only=True)
    assert set(raw) == {"model_dict", "optimizer_dict", "scheduler_dict",
                        "offset", "epoch", "encoder_params"}
    assert raw["offset"] == 7

    back = biencoder_params_from_torch(load_torch_state_dict(path),
                                       cfg.num_layers)
    want = {t: {"encoder": jax.device_get(params)[t]["encoder"]}
            for t in ("question_model", "ctx_model")}
    _tree_allclose(want, back)


@pytest.mark.slow  # e2e tier: fast tier stays <4 min
def test_cli_export_hf(tmp_path, capsys):
    """The user surface: msgpack checkpoint → ``export-hf`` → a directory
    torch's from_pretrained accepts (the reference's load path,
    run_ann.py:680-685)."""
    import json

    from ance_tpu.cli import main
    from ance_tpu.train.checkpoint import save_checkpoint

    overrides = {"vocab_size": 100, "hidden_size": 32, "num_layers": 2,
                 "num_heads": 4, "intermediate_size": 64,
                 "max_position_embeddings": 40}
    cfg = _small_cfg()
    _, params = _init_robertadot(cfg, out_dim=768)
    save_checkpoint(str(tmp_path / "ckpts"), 9, jax.device_get(params))

    main(["export-hf", "--model_type", "rdot_nll",
          "--encoder_overrides", json.dumps(overrides),
          "--training_dir", str(tmp_path / "ckpts"),
          "--out_dir", str(tmp_path / "out")])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["step"] == 9

    hf = transformers.RobertaModel.from_pretrained(
        str(tmp_path / "out"), add_pooling_layer=False,
        attn_implementation="eager").eval()
    assert hf.config.num_hidden_layers == 2

    # --init_model_dir pointing at the checkpoint dir itself must keep the
    # real step (the reference's DPR resume reads the exported offset)
    main(["export-hf", "--model_type", "rdot_nll",
          "--encoder_overrides", json.dumps(overrides),
          "--init_model_dir", str(tmp_path / "ckpts" / "checkpoint-9"),
          "--out_dir", str(tmp_path / "out_direct")])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["step"] == 9

    # refusing to export an un-checkpointed init is part of the contract
    with pytest.raises(SystemExit, match="refusing"):
        main(["export-hf", "--model_type", "rdot_nll",
              "--encoder_overrides", json.dumps(overrides),
              "--training_dir", str(tmp_path / "empty"),
              "--out_dir", str(tmp_path / "out2")])


def test_dpr_export_covers_bert_state_dict():
    """The reference restores CheckpointState with a STRICT load_state_dict
    into HFBertEncoder towers — which are BertModels WITH a pooler
    (run_ann_dpr.py:401, model/models.py:223-244) — so the exported
    model_dict must carry every key a real BertModel expects, including the
    inert ``pooler.dense.*`` pair (HFBertEncoder.forward discards
    pooled_output for sequence_output[:, 0])."""
    from ance_tpu.models.hf_export import torch_biencoder_model_dict

    cfg = EncoderConfig.bert_base(vocab_size=120, hidden_size=32,
                                  num_layers=2, num_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=40,
                                  hidden_dropout=0.0, attention_dropout=0.0)
    model = BiEncoder(cfg)
    ids, mask = _batch(pad_id=0, vocab=120)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(5), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(ids), jnp.asarray(mask))["params"]
    sd = torch_biencoder_model_dict(params)

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=cfg.type_vocab_size,
        pad_token_id=0, attn_implementation="eager")
    bert = transformers.BertModel(hf_cfg)  # pooler on: the reference's shape
    for tower in ("question_model", "ctx_model"):
        tower_sd = {k[len(tower) + 1:]: v for k, v in sd.items()
                    if k.startswith(tower + ".")}
        # strict load — exactly what _load_saved_state does
        bert.load_state_dict(tower_sd, strict=True)
        assert f"{tower}.pooler.dense.weight" in sd
        assert f"{tower}.pooler.dense.bias" in sd


def test_seed_export_slices_position_table_to_fairseq_rows():
    """seed_encoder_config keeps 516 position rows of headroom; fairseq's
    LearnedPositionalEmbedding allocates max_positions+pad+1 = 514, and the
    reference loads strictly — the export must slice back (the exact inverse
    of hf_loader._pad_position_table) or the reference hits a size
    mismatch."""
    from ance_tpu.models.hf_export import torch_seed_encoder_state_dict
    from ance_tpu.models.hf_loader import seed_encoder_params_from_torch
    from ance_tpu.models.seed import seed_encoder_config
    from ance_tpu.models.transformer import TransformerEncoder

    cfg = seed_encoder_config(vocab_size=64, hidden_size=16, num_layers=1,
                              num_heads=2, intermediate_size=32,
                              hidden_dropout=0.0, attention_dropout=0.0)
    assert cfg.max_position_embeddings == 516  # the default headroom
    enc = TransformerEncoder(cfg)
    ids = jnp.ones((1, 4), jnp.int32)
    params = jax.device_get(jax.jit(enc.init)(
        jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"])

    sd = torch_seed_encoder_state_dict(params)
    pos = sd["seed_encoder.encoder.sentence_encoder.embed_positions.weight"]
    assert tuple(pos.shape) == (514, 16)

    # import pads 514 back to 516 with zeros: the indexed rows round-trip
    back = seed_encoder_params_from_torch(sd)
    orig = np.asarray(params["embeddings"]["position_embeddings"]["embedding"])
    got = np.asarray(back["embeddings"]["position_embeddings"]["embedding"])
    np.testing.assert_array_equal(got[:514], orig[:514])
    np.testing.assert_array_equal(got[514:], 0.0)

    # long-context guard: a table with TRAINED rows past the default slice
    # (more than the 2-row import headroom) must refuse the silent
    # truncation — the caller has to state their geometry's row count
    long_params = {"embeddings": {
        "word_embeddings": params["embeddings"]["word_embeddings"],
        "position_embeddings": {"embedding": np.ones((1026, 16), np.float32)},
        "layer_norm": params["embeddings"]["layer_norm"]},
        "layer_0": params["layer_0"]}
    with pytest.raises(ValueError, match="trained, not padding"):
        torch_seed_encoder_state_dict(long_params)
    # explicit row count (or None) exports that geometry fine
    sd_long = torch_seed_encoder_state_dict(long_params,
                                            fairseq_position_rows=1026)
    assert sd_long["seed_encoder.encoder.sentence_encoder."
                   "embed_positions.weight"].shape[0] == 1026


def test_seed_mlm_export_import_roundtrip():
    """Full pretraining tree (encoder + windowed decoder + LM head) out to
    the HF-saved fairseq naming and back — the artifact a reference user
    needs to continue our SEED pretraining in their stack."""
    from ance_tpu.models.hf_export import torch_seed_mlm_state_dict
    from ance_tpu.models.hf_loader import seed_mlm_params_from_torch
    from ance_tpu.models.seed import (
        SeedDecoderConfig, SeedForMaskedLM, seed_encoder_config)

    mlm = SeedForMaskedLM(
        seed_encoder_config(vocab_size=100, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64,
                            max_position_embeddings=40,
                            hidden_dropout=0.0, attention_dropout=0.0),
        SeedDecoderConfig(num_layers=1, attention_window=2, hidden_size=32,
                          num_heads=4, intermediate_size=64,
                          max_positions=40, dropout=0.0))
    ids = jnp.ones((2, 8), jnp.int32)
    params = jax.device_get(jax.jit(mlm.init)(
        jax.random.PRNGKey(2), ids, jnp.ones_like(ids),
        ids[:, :6])["params"])
    sd = torch_seed_mlm_state_dict(params)
    assert "lm_head.bias" in sd and "decoder.layers.0.fc1.weight" in sd
    back = seed_mlm_params_from_torch(sd, max_position_embeddings=40)
    _tree_allclose(params, back)


def test_seeddot_export_import_roundtrip():
    cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=20,
                        use_type_embeddings=False, embed_zero_pad=True,
                        pad_token_id=1, position_style="roberta",
                        hidden_dropout=0.0, attention_dropout=0.0)
    model, params = RobertaDot(cfg, out_dim=16), None
    ids, mask = _batch(vocab=128, S=10)
    params = jax.jit(model.init)(jax.random.PRNGKey(9), jnp.asarray(ids),
                                 jnp.asarray(mask))["params"]
    sd = torch_seeddot_state_dict(params)
    assert any(k.startswith("seed_encoder.encoder.sentence_encoder.")
               for k in sd)
    back = seeddot_params_from_torch(sd, cfg.num_layers,
                                     max_position_embeddings=20)
    _tree_allclose(jax.device_get(params), back)
