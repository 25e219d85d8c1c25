"""Tensor (model-axis) parallelism for the encoder — beyond-parity.

The reference is DDP-only (reference drivers/run_ann.py:603-646): every GPU
holds a full replica, which caps the model size at one device's memory and
leaves nothing for ICI-rich TPU topologies to exploit beyond data
parallelism. This module adds Megatron-style tensor parallelism the GSPMD
way: no model-code changes — we annotate PARAMETER shardings over a 2-D
``(data, model)`` mesh and let XLA's SPMD partitioner insert the collectives
(all-reduce after each row-parallel matmul, riding ICI).

Layout (Megatron-LM §3; jax-ml scaling-book "model parallelism" recipe):

  * column-parallel (activations gain a model-sharded feature dim, no
    communication): attention query/key/value kernels ``[H, H]`` split on
    the OUTPUT feature axis — equivalently heads split across devices —
    and the MLP up-projection ``[H, 4H]``. Their biases shard alike.
  * row-parallel (contraction over the sharded dim → XLA inserts one
    all-reduce): attention out-projection ``[H, H]`` and the MLP
    down-projection ``[4H, H]`` split on the INPUT axis. Biases replicated.
  * everything else (embeddings, LayerNorms, pooler heads) replicated —
    at reference scale (≤ BERT-base) they are not worth sharding.

The head reshape ``[B,S,H] → [B,S,heads,head_dim]`` propagates the feature
sharding onto the heads axis, so ``num_heads % tp == 0`` is required (and
``intermediate_size % tp == 0``). The Pallas attention kernels are opaque
to the partitioner, so TP forces ``attention_impl="xla"`` — XLA's attention
partitions cleanly over sharded heads.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ance_tpu.core.mesh import DATA_AXIS

MODEL_AXIS = "model"

_COLUMN = ("attention/query/", "attention/key/", "attention/value/",
           "mlp/intermediate/")
_ROW = ("attention/out/", "mlp/output/")


def make_mesh_2d(model: int, data: Optional[int] = None,
                 data_axis: str = DATA_AXIS,
                 model_axis: str = MODEL_AXIS) -> Mesh:
    """``(data, model)`` mesh: adjacent device ids share a model group so
    the per-matmul all-reduces ride the fastest ICI links."""
    devices = jax.devices()
    data = data or len(devices) // model
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} exceeds {len(devices)} devices")
    return Mesh(np.asarray(devices[:data * model]).reshape(data, model),
                (data_axis, model_axis))


def param_spec(path: tuple, model_axis: str = MODEL_AXIS) -> P:
    """PartitionSpec for one encoder parameter, by its flax path."""
    p = "/".join(str(getattr(k, "key", k)) for k in path)
    if p.endswith("kernel"):
        if any(m in p for m in _COLUMN):
            return P(None, model_axis)
        if any(m in p for m in _ROW):
            return P(model_axis, None)
    if p.endswith("bias") and any(m in p for m in _COLUMN):
        return P(model_axis)
    return P()


def encoder_param_shardings(params, mesh: Mesh,
                            model_axis: str = MODEL_AXIS):
    """Pytree of NamedShardings matching ``params`` (pass as jit
    in_shardings, or device_put the params through it)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, param_spec(path, model_axis)),
        params)


def validate_tp(config, mesh: Mesh, model_axis: str = MODEL_AXIS) -> None:
    """Fail loudly on geometry the layout cannot split."""
    tp = mesh.shape[model_axis]
    if tp <= 1:
        return
    if config.num_heads % tp:
        raise ValueError(f"num_heads {config.num_heads} not divisible by "
                         f"tp {tp}")
    if config.intermediate_size % tp:
        raise ValueError(f"intermediate_size {config.intermediate_size} "
                         f"not divisible by tp {tp}")
    impl = getattr(config, "attention_impl", "xla")
    if impl not in ("xla", "xla_bf16"):
        # 'auto' resolves to the Pallas fused kernel at seq >= 256 on TPU
        # (ops/attention.py) — opaque to the SPMD partitioner
        raise ValueError(
            f"attention_impl={impl!r} may select a Pallas kernel, which the "
            "SPMD partitioner cannot split; tensor parallelism requires an "
            "explicit 'xla' or 'xla_bf16'")


def shard_params_tp(params, mesh: Mesh, model_axis: str = MODEL_AXIS):
    """device_put the param tree into its TP layout."""
    return jax.device_put(params,
                          encoder_param_shardings(params, mesh, model_axis))
