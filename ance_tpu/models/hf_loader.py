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


def encoder_params_from_torch(sd: Mapping, num_layers: int,
                              prefix: str = "") -> dict:
    """Map an HF BERT/RoBERTa backbone state dict onto TransformerEncoder."""
    p = prefix
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


def robertadot_params_from_torch(sd: Mapping, num_layers: int = 12) -> dict:
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


def biencoder_params_from_torch(sd: Mapping, num_layers: int = 12) -> dict:
    """Build BiEncoder params from a DPR CheckpointState model dict."""
    out = {}
    for tower in ("question_model", "ctx_model"):
        tower_sd = {k[len(tower) + 1:]: v for k, v in sd.items()
                    if k.startswith(tower + ".")}
        prefix = _find_backbone_prefix(tower_sd)
        out[tower] = {"encoder": encoder_params_from_torch(
            tower_sd, num_layers, prefix)}
    return out


def load_torch_state_dict(path: str | os.PathLike) -> dict:
    """Load ``pytorch_model.bin`` (or a directory containing it) host-side."""
    import torch
    path = str(path)
    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_model.bin")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_dict" in sd:  # DPR CheckpointState
        sd = sd["model_dict"]
    return sd


def graft(params: dict, loaded: dict) -> dict:
    """Overlay ``loaded`` onto a freshly initialized ``params`` tree, keeping
    init values for any leaves absent from ``loaded`` (e.g. a new head)."""
    import jax

    def merge(init_sub: dict, loaded_sub: dict) -> dict:
        out = dict(init_sub)
        for k, v in loaded_sub.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge(out[k], v)
            else:
                expected = jax.numpy.shape(out[k]) if k in out else None
                if expected is not None and tuple(np.shape(v)) != tuple(expected):
                    raise ValueError(
                        f"shape mismatch grafting {k}: {np.shape(v)} vs {expected}")
                out[k] = v
        return out

    return merge(params, loaded)
