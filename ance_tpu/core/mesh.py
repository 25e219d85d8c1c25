"""Device mesh setup and batch sharding.

The reference's process-per-GPU DDP topology (reference drivers/run_ann.py:
603-646 set_env + NCCL) maps onto a single ``jax.sharding.Mesh``:

  * ``data`` axis — batch rows and corpus rows are sharded here; gradient
    all-reduce is inserted by XLA over ICI (replaces DDP's fused all-reduce,
    reference run_ann.py:121-128).
  * params are replicated (all reference models are ≤ BERT-base; SURVEY.md
    §2.2 "Model-parallel-free model size").
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> tuple[int, int]:
    """Multi-host bring-up (replaces the reference's per-GPU
    torch.distributed.launch + init_process_group, run_ann.py:603-646).

    On TPU pods jax.distributed discovers the topology automatically; args
    are only needed off-TPU. Returns (process_index, process_count). Safe to
    call in single-process runs (no-op)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif jax.process_count() > 1:
        pass  # already initialized by the TPU runtime
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-dim sharding for host→device batch transfer."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, np.ndarray], mesh: Mesh,
                axis: str = DATA_AXIS) -> dict:
    """Assemble per-host batches into global arrays split over the data axis.

    Single process: a plain device_put. Multi-process (multi-host): each
    process passes its HOST-LOCAL rows (the feed's host_id/num_hosts stripe,
    replacing the reference's StreamingDataset rank striping util.py:310-329)
    and the global array is assembled process-locally — global row order is
    [host0 rows; host1 rows; ...] following mesh device order."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple
