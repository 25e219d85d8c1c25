"""Import HuggingFace PyTorch checkpoints into ance_tpu flax parameter trees.

Supports:
  * plain ``roberta-base`` / ``bert-base-uncased`` backbones (warm start,
    reference README.md:61-87 workflow),
  * released ANCE checkpoints (RobertaForSequenceClassification +
    ``embeddingHead``/``norm`` extras, reference model/models.py:137-147),
  * DPR BiEncoder CheckpointState dicts (``question_model.* / ctx_model.*``
    prefixes, reference utils/dpr_utils.py:23-25).

Torch is only used host-side to deserialize; everything device-side is JAX.
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _dense(sd: Mapping, prefix: str) -> dict:
    # torch Linear stores [out, in]; flax Dense kernels are [in, out]
    return {"kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"])}


def _layer_norm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _infer_num_layers(sd: Mapping, layer_prefix: str) -> int:
    """Count encoder layers by their key indices (e.g. 'encoder.layer.')."""
    n = -1
    for k in sd:
        if k.startswith(layer_prefix):
            idx = k[len(layer_prefix):].split(".", 1)[0]
            if idx.isdigit():
                n = max(n, int(idx))
    if n < 0:
        raise KeyError(f"no layers under {layer_prefix!r} in state dict")
    return n + 1


def encoder_params_from_torch(sd: Mapping, num_layers: int | None = None,
                              prefix: str = "") -> dict:
    """Map an HF BERT/RoBERTa backbone state dict onto TransformerEncoder."""
    p = prefix
    if num_layers is None:
        num_layers = _infer_num_layers(sd, p + "encoder.layer.")
    emb = {
        "word_embeddings": {
            "embedding": _np(sd[p + "embeddings.word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _np(sd[p + "embeddings.position_embeddings.weight"])},
        "token_type_embeddings": {
            "embedding": _np(sd[p + "embeddings.token_type_embeddings.weight"])},
        "layer_norm": _layer_norm(sd, p + "embeddings.LayerNorm"),
    }
    params = {"embeddings": emb}
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, lp + "attention.self.query"),
                "key": _dense(sd, lp + "attention.self.key"),
                "value": _dense(sd, lp + "attention.self.value"),
                "out": _dense(sd, lp + "attention.output.dense"),
            },
            "attention_layer_norm": _layer_norm(
                sd, lp + "attention.output.LayerNorm"),
            "mlp": {
                "intermediate": _dense(sd, lp + "intermediate.dense"),
                "output": _dense(sd, lp + "output.dense"),
            },
            "output_layer_norm": _layer_norm(sd, lp + "output.LayerNorm"),
        }
    return params


def _find_backbone_prefix(sd: Mapping, candidates=("roberta.", "bert.", "")):
    for cand in candidates:
        if any(k.startswith(cand + "embeddings.word_embeddings") for k in sd):
            return cand
    raise KeyError("no BERT/RoBERTa backbone found in state dict")


def robertadot_params_from_torch(sd: Mapping,
                                 num_layers: int | None = None) -> dict:
    """Build RobertaDot params from an ANCE (or plain roberta) state dict.

    If the projection head (``embeddingHead``/``norm``, reference
    models.py:145-146) is absent — e.g. warm-starting from roberta-base — the
    caller should graft freshly initialized head params on top.
    """
    prefix = _find_backbone_prefix(sd)
    params = {"encoder": encoder_params_from_torch(sd, num_layers, prefix)}
    if "embeddingHead.weight" in sd:
        params["embedding_head"] = _dense(sd, "embeddingHead")
        params["norm"] = _layer_norm(sd, "norm")
    return params


def biencoder_params_from_torch(sd: Mapping,
                                num_layers: int | None = None) -> dict:
    """Build BiEncoder params from a DPR CheckpointState model dict."""
    out = {}
    for tower in ("question_model", "ctx_model"):
        tower_sd = {k[len(tower) + 1:]: v for k, v in sd.items()
                    if k.startswith(tower + ".")}
        prefix = _find_backbone_prefix(tower_sd)
        out[tower] = {"encoder": encoder_params_from_torch(
            tower_sd, num_layers, prefix)}
    return out


def _find_seed_prefix(sd: Mapping, marker: str = "sentence_encoder.") -> str:
    """Locate the fairseq sentence-encoder prefix in a SEED state dict —
    ``seed_encoder.encoder.sentence_encoder.`` in HF-saved checkpoints
    (reference modeling_seed_encoder.py:115-135), bare
    ``encoder.sentence_encoder.`` in raw fairseq ones."""
    for k in sd:
        idx = k.find(marker)
        if idx >= 0 and k.endswith("embed_tokens.weight"):
            return k[:idx + len(marker)]
    raise KeyError("no fairseq sentence_encoder found in state dict")


def _pad_position_table(table: np.ndarray, rows: int) -> np.ndarray:
    """fairseq allocates max_positions + pad + 1 position rows (514); our
    configs may reserve headroom (e.g. 516). Extra rows are never indexed at
    seq ≤ max_positions, so zero-padding is exact."""
    if table.shape[0] > rows:
        raise ValueError(f"position table {table.shape[0]} rows exceeds the "
                         f"model's {rows}")
    if table.shape[0] == rows:
        return table
    pad = np.zeros((rows - table.shape[0], table.shape[1]), table.dtype)
    return np.concatenate([table, pad], axis=0)


def seed_encoder_params_from_torch(sd: Mapping,
                                   num_layers: int | None = None,
                                   max_position_embeddings: int = 516) -> dict:
    """Map a fairseq TransformerSentenceEncoder (reference
    transformer_sentence_encoder.py:695-925) onto TransformerEncoder:
    embed_tokens/embed_positions/emb_layer_norm → embeddings (no segment
    table, num_segments=0), layers.{i}.self_attn.{q,k,v,out}_proj →
    attention, fc1/fc2 → mlp, post-LN names aligned."""
    p = _find_seed_prefix(sd)
    if num_layers is None:
        num_layers = _infer_num_layers(sd, p + "layers.")
    emb = {
        "word_embeddings": {"embedding": _np(sd[p + "embed_tokens.weight"])},
        "position_embeddings": {"embedding": _pad_position_table(
            _np(sd[p + "embed_positions.weight"]), max_position_embeddings)},
        "layer_norm": _layer_norm(sd, p + "emb_layer_norm"),
    }
    params = {"embeddings": emb}
    for i in range(num_layers):
        lp = f"{p}layers.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, lp + "self_attn.q_proj"),
                "key": _dense(sd, lp + "self_attn.k_proj"),
                "value": _dense(sd, lp + "self_attn.v_proj"),
                "out": _dense(sd, lp + "self_attn.out_proj"),
            },
            "attention_layer_norm": _layer_norm(sd, lp + "self_attn_layer_norm"),
            "mlp": {
                "intermediate": _dense(sd, lp + "fc1"),
                "output": _dense(sd, lp + "fc2"),
            },
            "output_layer_norm": _layer_norm(sd, lp + "final_layer_norm"),
        }
    return params


def seeddot_params_from_torch(sd: Mapping,
                              num_layers: int | None = None,
                              max_position_embeddings: int = 516) -> dict:
    """Build seeddot_nll (RobertaDot over the SEED encoder) params from a
    SEED checkpoint — pretrained SEEDEncoderForMaskedLM (warm start,
    reference README.md:83-87) or a fine-tuned SEEDEncoderDot_NLL_LN (which
    adds embeddingHead/norm, reference models.py:201-221)."""
    params = {"encoder": seed_encoder_params_from_torch(
        sd, num_layers, max_position_embeddings)}
    if "embeddingHead.weight" in sd:
        params["embedding_head"] = _dense(sd, "embeddingHead")
        params["norm"] = _layer_norm(sd, "norm")
    return params


def seed_mlm_params_from_torch(sd: Mapping,
                               num_enc_layers: int | None = None,
                               num_dec_layers: int | None = None,
                               max_position_embeddings: int = 516) -> dict:
    """Build SeedForMaskedLM params from a pretrained SEED checkpoint
    (encoder + windowed decoder + LM head, reference
    modeling_seed_encoder.py:136-183)."""
    params = {"encoder": seed_encoder_params_from_torch(
        sd, num_enc_layers, max_position_embeddings)}
    enc_p = _find_seed_prefix(sd)
    outer = enc_p[:-len("encoder.sentence_encoder.")] \
        if enc_p.endswith("encoder.sentence_encoder.") else ""
    outer = outer[len("seed_encoder."):] if outer.startswith("seed_encoder.") \
        else outer
    d = outer + "decoder."
    if num_dec_layers is None:
        num_dec_layers = _infer_num_layers(sd, d + "layers.")

    def _attn(lp: str, name: str) -> dict:
        return {f"{name}_q": _dense(sd, lp + name + ".q_proj"),
                f"{name}_k": _dense(sd, lp + name + ".k_proj"),
                f"{name}_v": _dense(sd, lp + name + ".v_proj"),
                f"{name}_out": _dense(sd, lp + name + ".out_proj")}

    for i in range(num_dec_layers):
        lp = f"{d}layers.{i}."
        layer = {
            "self_attn_layer_norm": _layer_norm(sd, lp + "self_attn_layer_norm"),
            "encoder_attn_layer_norm": _layer_norm(
                sd, lp + "encoder_attn_layer_norm"),
            "final_layer_norm": _layer_norm(sd, lp + "final_layer_norm"),
            "fc1": _dense(sd, lp + "fc1"),
            "fc2": _dense(sd, lp + "fc2"),
        }
        layer.update(_attn(lp, "self_attn"))
        layer.update(_attn(lp, "encoder_attn"))
        params[f"decoder_layer_{i}"] = layer
    params["decoder_pos"] = {"embedding": _np(sd[d + "embed_positions.weight"])}
    params["decoder_embed_norm"] = _layer_norm(sd, d + "layernorm_embedding")
    params["decoder_final_norm"] = _layer_norm(sd, d + "layer_norm")
    params["lm_dense"] = _dense(sd, outer + "lm_head.dense")
    params["lm_norm"] = _layer_norm(sd, outer + "lm_head.layer_norm")
    params["lm_bias"] = _np(sd[outer + "lm_head.bias"])
    return params


def load_torch_state_dict(path: str | os.PathLike) -> dict:
    """Load ``pytorch_model.bin`` (or a directory containing it) host-side."""
    import torch
    path = str(path)
    if os.path.isdir(path):
        preferred = os.path.join(path, "pytorch_model.bin")
        if os.path.exists(preferred):
            path = preferred
        else:
            cands = sorted(f for f in os.listdir(path)
                           if f.endswith((".bin", ".pt"))
                           and f != "training_args.bin")
            if not cands:
                raise FileNotFoundError(f"no torch checkpoint in {path}")
            if len(cands) > 1:
                # e.g. a sharded HF checkpoint or several fairseq .pt files:
                # picking the alphabetically-first would silently graft a
                # partial tower and fail deep in the param mapping
                raise FileNotFoundError(
                    f"ambiguous checkpoint dir {path}: {cands}; expected a "
                    "single pytorch_model.bin/.pt (sharded checkpoints are "
                    "not supported — consolidate first)")
            path = os.path.join(path, cands[0])
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_dict" in sd:  # DPR CheckpointState
        sd = sd["model_dict"]
    elif isinstance(sd, dict) and "model" in sd and isinstance(
            sd["model"], dict):  # fairseq checkpoint (SEED pretraining)
        sd = sd["model"]
    return sd


def graft(params: dict, loaded: dict) -> dict:
    """Overlay ``loaded`` onto a freshly initialized ``params`` tree, keeping
    init values for any leaves absent from ``loaded`` (e.g. a new head).

    Every loaded key must have a counterpart in the init tree — a structural
    mismatch means the checkpoint doesn't fit this model, and silently
    inserting orphan keys would turn the warm-start into a no-op."""
    import jax

    def merge(init_sub: dict, loaded_sub: dict, path: str) -> dict:
        out = dict(init_sub)
        for k, v in loaded_sub.items():
            where = f"{path}/{k}" if path else k
            if k not in out:
                raise KeyError(
                    f"checkpoint key {where!r} has no counterpart in the "
                    f"model's param tree (available: {sorted(out)}) — wrong "
                    "model_type for this checkpoint?")
            if isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = merge(out[k], v, where)
            else:
                expected = jax.numpy.shape(out[k])
                if tuple(np.shape(v)) != tuple(expected):
                    raise ValueError(
                        f"shape mismatch grafting {where}: "
                        f"{np.shape(v)} vs {expected}")
                out[k] = v
        return out

    return merge(params, loaded, "")
