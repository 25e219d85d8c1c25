"""Model registry: model-type string → factory + tokenizer + data plumbing.

Parity target: reference ``MSMarcoConfigDict`` (model/models.py:289-322) —
the repo's single config system for model selection. Each entry knows how to
build the flax model, which HF tokenizer name backs preprocessing, whether
body encoding is multi-chunk (MaxP), and which loss the trainer uses.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ance_tpu.models.dot_models import BiEncoder, RobertaDot
from ance_tpu.models.seed import seed_dot_model
from ance_tpu.models.transformer import EncoderConfig


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    build: Callable[..., object]          # (**overrides) → flax module
    tokenizer_name: str                   # HF tokenizer backing preprocessing
    use_mean: bool = False                # pooling (reference use_mean flag)
    multichunk: bool = False              # MaxP body encoding
    loss: str = "nll"                     # nll | nll_multichunk | dpr_inbatch
    two_tower: bool = False


def _rdot(dtype=jnp.float32, attention_impl="auto",
          config_overrides=None, **kw) -> RobertaDot:
    cfg = EncoderConfig(dtype=dtype, attention_impl=attention_impl,
                        **(config_overrides or {}))
    return RobertaDot(cfg, use_mean=False, out_dim=768, **kw)


def _rdot_multichunk(dtype=jnp.float32, attention_impl="auto",
                     config_overrides=None, **kw):
    cfg = EncoderConfig(dtype=dtype, attention_impl=attention_impl,
                        **(config_overrides or {}))
    return RobertaDot(cfg, use_mean=False, out_dim=768, base_len=512, **kw)


def _dpr(dtype=jnp.float32, attention_impl="auto",
         config_overrides=None, **kw) -> BiEncoder:
    cfg = EncoderConfig.bert_base(dtype=dtype, attention_impl=attention_impl,
                                  **(config_overrides or {}))
    return BiEncoder(cfg, **kw)


REGISTRY: dict[str, ModelSpec] = {
    # reference models.py:300-303
    "rdot_nll": ModelSpec(
        name="rdot_nll", build=_rdot, tokenizer_name="roberta-base"),
    # reference models.py:304-307 (MaxP, seq 2048 = 4×512 chunks)
    "rdot_nll_multi_chunk": ModelSpec(
        name="rdot_nll_multi_chunk", build=_rdot_multichunk,
        tokenizer_name="roberta-base", multichunk=True,
        loss="nll_multichunk"),
    # reference models.py:308-313
    "dpr": ModelSpec(
        name="dpr", build=_dpr, tokenizer_name="bert-base-uncased",
        loss="dpr_inbatch", two_tower=True),
    # reference models.py:314-319
    "seeddot_nll": ModelSpec(
        name="seeddot_nll", build=seed_dot_model,
        tokenizer_name="seed-wordpiece"),
}


def get_model_spec(name: str) -> ModelSpec:
    if name not in REGISTRY:
        raise KeyError(
            f"unknown model type {name!r}; available: {sorted(REGISTRY)}")
    return REGISTRY[name]
