"""Export ance_tpu flax parameter trees back to HuggingFace/torch formats.

The exact inverse of :mod:`ance_tpu.models.hf_loader` — so checkpoints flow
BOTH ways between this framework and the reference ecosystem:

  * ``save_hf_checkpoint`` writes a ``pytorch_model.bin`` + ``config.json``
    directory that the reference's ``from_pretrained`` path accepts
    (reference drivers/run_ann.py:680-685 loads RobertaDot_NLL_LN via
    ``from_pretrained``; its state dict is ``roberta.*`` backbone keys plus
    the ``embeddingHead``/``norm`` projection extras, model/models.py:137-147).
  * ``save_dpr_checkpoint`` writes the single-file DPR ``CheckpointState``
    dict the reference saves/loads (utils/dpr_utils.py:23-25,
    drivers/run_ann_dpr.py:376-392): ``model_dict`` carries
    ``question_model.* / ctx_model.*`` BertModel keys.

Torch is only used host-side to serialize; no device work happens here.
Round-trip identity (export → hf_loader import → same tree) and torch-side
forward parity are asserted in tests/test_hf_export.py.
"""

from __future__ import annotations

import json
import os
from typing import Mapping

import numpy as np


def _t(x) -> "torch.Tensor":  # noqa: F821 — torch imported lazily
    import torch
    # np.array (not asarray): torch tensors must own writable storage
    return torch.from_numpy(np.array(x, np.float32))


def _dense_out(sd: dict, prefix: str, p: Mapping) -> None:
    # flax Dense kernels are [in, out]; torch Linear stores [out, in]
    sd[prefix + ".weight"] = _t(np.asarray(p["kernel"], np.float32).T)
    sd[prefix + ".bias"] = _t(p["bias"])


def _layer_norm_out(sd: dict, prefix: str, p: Mapping) -> None:
    sd[prefix + ".weight"] = _t(p["scale"])
    sd[prefix + ".bias"] = _t(p["bias"])


def torch_encoder_state_dict(params: Mapping, prefix: str = "") -> dict:
    """Map TransformerEncoder params onto HF BERT/RoBERTa backbone keys
    (inverse of hf_loader.encoder_params_from_torch)."""
    sd: dict = {}
    emb = params["embeddings"]
    p = prefix
    sd[p + "embeddings.word_embeddings.weight"] = _t(
        emb["word_embeddings"]["embedding"])
    sd[p + "embeddings.position_embeddings.weight"] = _t(
        emb["position_embeddings"]["embedding"])
    if "token_type_embeddings" in emb:
        sd[p + "embeddings.token_type_embeddings.weight"] = _t(
            emb["token_type_embeddings"]["embedding"])
    _layer_norm_out(sd, p + "embeddings.LayerNorm", emb["layer_norm"])
    i = 0
    while f"layer_{i}" in params:
        lp = f"{p}encoder.layer.{i}."
        layer = params[f"layer_{i}"]
        attn = layer["attention"]
        _dense_out(sd, lp + "attention.self.query", attn["query"])
        _dense_out(sd, lp + "attention.self.key", attn["key"])
        _dense_out(sd, lp + "attention.self.value", attn["value"])
        _dense_out(sd, lp + "attention.output.dense", attn["out"])
        _layer_norm_out(sd, lp + "attention.output.LayerNorm",
                        layer["attention_layer_norm"])
        _dense_out(sd, lp + "intermediate.dense", layer["mlp"]["intermediate"])
        _dense_out(sd, lp + "output.dense", layer["mlp"]["output"])
        _layer_norm_out(sd, lp + "output.LayerNorm",
                        layer["output_layer_norm"])
        i += 1
    if i == 0:
        raise KeyError("no layer_0 in encoder params — wrong tree?")
    return sd


def torch_robertadot_state_dict(params: Mapping) -> dict:
    """RobertaDot params → the reference RobertaDot_NLL_LN state dict
    (``roberta.*`` backbone + ``embeddingHead``/``norm`` head,
    reference model/models.py:137-147). The reference class also carries an
    unused ``classifier.*`` sub-module; ``from_pretrained`` freshly
    initializes missing keys, and the dot models never call it."""
    sd = torch_encoder_state_dict(params["encoder"], prefix="roberta.")
    if "embedding_head" in params:
        _dense_out(sd, "embeddingHead", params["embedding_head"])
        _layer_norm_out(sd, "norm", params["norm"])
    return sd


def torch_seed_encoder_state_dict(
        params: Mapping,
        prefix: str = "seed_encoder.encoder.sentence_encoder.",
        fairseq_position_rows: int | None = 514) -> dict:
    """TransformerEncoder params (SEED flavor: no segment table) → fairseq
    TransformerSentenceEncoder keys (inverse of
    hf_loader.seed_encoder_params_from_torch; reference
    transformer_sentence_encoder.py:695-925). The default prefix matches an
    HF-saved SEED checkpoint (modeling_seed_encoder.py:115-135), so a SEED
    model pretrained here (train/seed_pretrain.py) can warm-start the
    reference's fine-tuning drivers.

    ``fairseq_position_rows``: fairseq's LearnedPositionalEmbedding allocates
    max_positions + pad + 1 rows (512 + 1 + 1 = 514), while our configs keep
    headroom (seed_encoder_config default 516); the import direction
    zero-pads 514→516 (hf_loader._pad_position_table), so the exact inverse
    is slicing back — otherwise the reference hits a strict-load size
    mismatch on embed_positions.weight. Rows ≥ 514 are never indexed at
    seq ≤ 512, so the slice is lossless. Tables already at or below the
    fairseq row count (e.g. tiny test geometries) export verbatim; pass
    ``None`` to always export verbatim.

    The default slice is refused (ValueError) when the table has more than
    2 rows of headroom over ``fairseq_position_rows``: a long-context
    config (e.g. max_position_embeddings=1026 trained at seq 1024) has
    TRAINED rows past 514 that cannot be distinguished from headroom here,
    and silently dropping them would corrupt the export. Such models must
    pass their own row count (fairseq allocates max_positions + pad + 1)
    or ``None``."""
    sd: dict = {}
    emb = params["embeddings"]
    p = prefix
    sd[p + "embed_tokens.weight"] = _t(emb["word_embeddings"]["embedding"])
    pos = np.asarray(emb["position_embeddings"]["embedding"], np.float32)
    if fairseq_position_rows is not None and \
            pos.shape[0] > fairseq_position_rows:
        if pos.shape[0] > fairseq_position_rows + 2:
            raise ValueError(
                f"position table has {pos.shape[0]} rows — more than the "
                f"import headroom over fairseq_position_rows="
                f"{fairseq_position_rows}; rows past the slice look "
                "trained, not padding. Pass the target geometry's own row "
                "count (max_positions + 2) or None to export verbatim.")
        pos = pos[:fairseq_position_rows]
    sd[p + "embed_positions.weight"] = _t(pos)
    _layer_norm_out(sd, p + "emb_layer_norm", emb["layer_norm"])
    i = 0
    while f"layer_{i}" in params:
        lp = f"{p}layers.{i}."
        layer = params[f"layer_{i}"]
        attn = layer["attention"]
        _dense_out(sd, lp + "self_attn.q_proj", attn["query"])
        _dense_out(sd, lp + "self_attn.k_proj", attn["key"])
        _dense_out(sd, lp + "self_attn.v_proj", attn["value"])
        _dense_out(sd, lp + "self_attn.out_proj", attn["out"])
        _layer_norm_out(sd, lp + "self_attn_layer_norm",
                        layer["attention_layer_norm"])
        _dense_out(sd, lp + "fc1", layer["mlp"]["intermediate"])
        _dense_out(sd, lp + "fc2", layer["mlp"]["output"])
        _layer_norm_out(sd, lp + "final_layer_norm",
                        layer["output_layer_norm"])
        i += 1
    if i == 0:
        raise KeyError("no layer_0 in encoder params — wrong tree?")
    return sd


def torch_seeddot_state_dict(params: Mapping,
                             fairseq_position_rows: int | None = 514) -> dict:
    """seeddot_nll params → the reference SEEDEncoderDot_NLL_LN state dict
    (fairseq sentence-encoder backbone + embeddingHead/norm,
    reference model/models.py:201-221)."""
    sd = torch_seed_encoder_state_dict(
        params["encoder"], fairseq_position_rows=fairseq_position_rows)
    if "embedding_head" in params:
        _dense_out(sd, "embeddingHead", params["embedding_head"])
        _layer_norm_out(sd, "norm", params["norm"])
    return sd


def torch_seed_mlm_state_dict(params: Mapping,
                              fairseq_position_rows: int | None = 514) -> dict:
    """SeedForMaskedLM params (train/seed_pretrain.py output) → an HF-saved
    SEED checkpoint state dict (inverse of
    hf_loader.seed_mlm_params_from_torch): encoder under
    ``seed_encoder.encoder.sentence_encoder.``, decoder under ``decoder.``,
    LM head at ``lm_head.*`` (reference modeling_seed_encoder.py:136-183) —
    so a SEED model PRETRAINED HERE can continue pretraining or fine-tune
    in the reference stack."""
    sd = torch_seed_encoder_state_dict(
        params["encoder"], fairseq_position_rows=fairseq_position_rows)
    d = "decoder."
    i = 0
    while f"decoder_layer_{i}" in params:
        lp = f"{d}layers.{i}."
        layer = params[f"decoder_layer_{i}"]
        for name in ("self_attn", "encoder_attn"):
            for part, proj in (("q", "q_proj"), ("k", "k_proj"),
                               ("v", "v_proj"), ("out", "out_proj")):
                _dense_out(sd, lp + f"{name}.{proj}",
                           layer[f"{name}_{part}"])
            _layer_norm_out(sd, lp + f"{name}_layer_norm",
                            layer[f"{name}_layer_norm"])
        _layer_norm_out(sd, lp + "final_layer_norm",
                        layer["final_layer_norm"])
        _dense_out(sd, lp + "fc1", layer["fc1"])
        _dense_out(sd, lp + "fc2", layer["fc2"])
        i += 1
    sd[d + "embed_positions.weight"] = _t(params["decoder_pos"]["embedding"])
    _layer_norm_out(sd, d + "layernorm_embedding",
                    params["decoder_embed_norm"])
    _layer_norm_out(sd, d + "layer_norm", params["decoder_final_norm"])
    _dense_out(sd, "lm_head.dense", params["lm_dense"])
    _layer_norm_out(sd, "lm_head.layer_norm", params["lm_norm"])
    sd["lm_head.bias"] = _t(params["lm_bias"])
    return sd


def torch_biencoder_model_dict(params: Mapping) -> dict:
    """BiEncoder params → the DPR ``model_dict`` (``question_model.*`` /
    ``ctx_model.*`` bare-BertModel keys — HFBertEncoder IS a BertModel,
    reference model/models.py:223-244).

    BertModel always instantiates a pooler, and the reference restores
    CheckpointState with a strict ``load_state_dict``
    (run_ann_dpr.py _load_saved_state), so ``pooler.dense.*`` keys must be
    present even though our towers have no pooler: HFBertEncoder.forward
    discards pooled_output in favor of sequence_output[:, 0]
    (reference model/models.py:252-260), so freshly-initialized values are
    inert. We emit a deterministic BERT-style init (N(0, 0.02) weight,
    zero bias) so exports are byte-reproducible."""
    sd: dict = {}
    for tower in ("question_model", "ctx_model"):
        tower_sd = torch_encoder_state_dict(params[tower]["encoder"])
        for k, v in tower_sd.items():
            sd[f"{tower}.{k}"] = v
        hidden = int(np.shape(
            params[tower]["encoder"]["embeddings"]["word_embeddings"]
            ["embedding"])[1])
        rng = np.random.default_rng(0)
        sd[f"{tower}.pooler.dense.weight"] = _t(
            rng.normal(0.0, 0.02, (hidden, hidden)).astype(np.float32))
        sd[f"{tower}.pooler.dense.bias"] = _t(
            np.zeros((hidden,), np.float32))
    return sd


def roberta_config_json(config) -> dict:
    """Minimal HF RobertaConfig payload for ``config.json`` so the exported
    directory loads via ``from_pretrained`` without network access."""
    return {
        "model_type": "roberta",
        "architectures": ["RobertaForSequenceClassification"],
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "num_hidden_layers": config.num_layers,
        "num_attention_heads": config.num_heads,
        "intermediate_size": config.intermediate_size,
        "max_position_embeddings": config.max_position_embeddings,
        "type_vocab_size": config.type_vocab_size,
        "hidden_act": "gelu",
        "layer_norm_eps": config.layer_norm_eps,
        "pad_token_id": config.pad_token_id,
        "hidden_dropout_prob": config.hidden_dropout,
        "attention_probs_dropout_prob": config.attention_dropout,
    }


def save_hf_checkpoint(out_dir: str | os.PathLike, params: Mapping,
                       config) -> str:
    """Write an HF-format checkpoint directory (``pytorch_model.bin`` +
    ``config.json``) from RobertaDot params — loadable by the reference's
    ``from_pretrained`` flow (run_ann.py:680-685) AND by our own
    hf_loader.load_torch_state_dict → robertadot_params_from_torch."""
    import torch
    out_dir = str(out_dir)
    emb = np.shape(
        params["encoder"]["embeddings"]["word_embeddings"]["embedding"])
    n_layers = sum(1 for k in params["encoder"] if k.startswith("layer_"))
    if emb != (config.vocab_size, config.hidden_size) \
            or n_layers != config.num_layers:
        raise ValueError(
            f"checkpoint geometry {emb} x {n_layers} layers does not match "
            f"the config ({config.vocab_size}, {config.hidden_size}) x "
            f"{config.num_layers} — config.json would lie about the weights")
    os.makedirs(out_dir, exist_ok=True)
    sd = torch_robertadot_state_dict(params)
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(roberta_config_json(config), f, indent=2)
    return out_dir


def save_dpr_checkpoint(path: str | os.PathLike, params: Mapping,
                        offset: int = 0, epoch: int = 0,
                        encoder_params: dict | None = None) -> str:
    """Write the reference's single-file DPR CheckpointState dict
    (torch.save of the namedtuple's _asdict(), run_ann_dpr.py:376-392).
    optimizer/scheduler dicts are empty — the reference's loader only
    touches them when explicitly resuming optimization."""
    import torch
    path = str(path)
    state = {
        "model_dict": torch_biencoder_model_dict(params),
        "optimizer_dict": {},
        "scheduler_dict": {},
        "offset": offset,
        "epoch": epoch,
        "encoder_params": encoder_params or {},
    }
    torch.save(state, path)
    return path
