"""Batched embedding inference over token caches.

Replaces the reference's StreamInferenceDoc pipeline (reference
drivers/run_ann_data_gen.py:139-263): iterate a token cache in fixed-size
batches, run the frozen encoder, and collect embeddings. Multi-vector (MaxP)
documents flatten chunk embeddings with repeated ids
(reference run_ann_data_gen.py:182-189).

On a mesh, batches are sharded along the data axis so the corpus encode runs
data-parallel; embeddings land back on host as numpy (or stay device-resident
when feeding the in-HBM index directly).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.feed import mask_from_lengths


def iter_cache_batches(cache: TokenCache, batch_size: int,
                       start: int = 0, stop: Optional[int] = None,
                       host_id: int = 0, num_hosts: int = 1
                       ) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (global offsets [≤B], ids, mask); the final batch is padded by
    repeating the last record (padded rows are dropped by the caller).

    Multi-host: every host iterates the same GLOBAL key sequence but
    gathers only its contiguous 1/num_hosts block of each batch
    ([host·B/H, (host+1)·B/H)) — the caller assembles the global device
    batch with make_array_from_process_local_data, whose data-axis device
    order is exactly [host0 rows; host1 rows; ...]. Keys stay global so
    embedding-id bookkeeping is identical on every host."""
    if batch_size % num_hosts:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"num_hosts {num_hosts}")
    per_host = batch_size // num_hosts
    stop = cache.total_number if stop is None else stop
    for s in range(start, stop, batch_size):
        keys = np.arange(s, min(s + batch_size, stop))
        real = len(keys)
        if real < batch_size:
            keys = np.concatenate(
                [keys, np.full(batch_size - real, keys[-1])])
        local = keys if num_hosts == 1 else \
            keys[host_id * per_host:(host_id + 1) * per_host]
        lengths, tokens = cache.batch(local)
        mask = mask_from_lengths(lengths, cache.embedding_size)
        yield keys[:real], tokens.astype(np.int32), mask


def make_encode_fn(model, method, mesh: Optional[Mesh] = None,
                   data_axis: str = "data",
                   param_shardings=None) -> Callable:
    """Jitted (params, ids, mask) → embeddings; batch sharded over the mesh.

    ``param_shardings``: optional NamedSharding pytree for the params —
    pass core.tp.encoder_param_shardings(...) to run the encode
    tensor-parallel over a 2-D (data, model) mesh (params stay replicated
    when omitted, the reference's DDP-style layout)."""
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask, method=method)

    if mesh is None:
        return jax.jit(encode)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    p_in = param_shardings if param_shardings is not None else repl
    return jax.jit(encode, in_shardings=(p_in, data, data),
                   out_shardings=repl)


def _global_batcher(mesh: Optional[Mesh], num_hosts: int,
                    data_axis: str = "data") -> Callable:
    """host-local rows → device batch. Single-process: plain jnp.asarray.
    Multi-process: assemble the global data-axis-sharded array from each
    host's contiguous block (the encode-side analogue of
    core.mesh.shard_batch)."""
    if num_hosts <= 1:
        return jnp.asarray
    if mesh is None:
        raise ValueError("multi-host encode requires a mesh")
    sharding = NamedSharding(mesh, P(data_axis))
    return lambda x: jax.make_array_from_process_local_data(sharding, x)


def encode_cache_to_device(encode_fn: Callable, params, cache: TokenCache,
                           batch_size: int = 128, multichunk: bool = False,
                           start: int = 0, stop: Optional[int] = None,
                           host_id: int = 0, num_hosts: int = 1,
                           mesh: Optional[Mesh] = None
                           ) -> tuple[jax.Array, np.ndarray]:
    """Encode records [start, stop) keeping embeddings DEVICE-resident —
    the feed path for the in-HBM index refresh (no host round-trip; the
    reference's np.save/merge boundary, util.py:87-146, disappears).

    Returns (embeddings [M, D] jax.Array, embedding2id [M] np.int64).
    MaxP chunk rows flatten on device; ids repeat per chunk
    (reference run_ann_data_gen.py:182-189). Multi-host: each host feeds
    its block of every batch (see iter_cache_batches); the returned
    embeddings are replicated, ids identical on every host."""
    to_dev = _global_batcher(mesh, num_hosts)
    parts: list[jax.Array] = []
    id_parts: list[np.ndarray] = []
    for keys, ids, mask in iter_cache_batches(cache, batch_size, start, stop,
                                              host_id, num_hosts):
        out = encode_fn(params, to_dev(ids), to_dev(mask))
        real = len(keys)
        if multichunk:
            C = out.shape[1]
            parts.append(out[:real].reshape(real * C, -1))
            id_parts.append(np.repeat(keys, C))
        else:
            parts.append(out[:real])
            id_parts.append(keys)
    emb = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return emb, np.concatenate(id_parts).astype(np.int64)


def encode_cache(encode_fn: Callable, params, cache: TokenCache,
                 batch_size: int = 128, multichunk: bool = False,
                 start: int = 0, stop: Optional[int] = None,
                 flush_every: int = 16, host_id: int = 0,
                 num_hosts: int = 1, mesh: Optional[Mesh] = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Encode cache records [start, stop) → (embeddings [M, D] fp32,
    embedding2id [M] int64).

    With ``multichunk`` the encoder returns [B, C, D]; rows flatten to
    [B·C, D] and each record id repeats C times
    (reference run_ann_data_gen.py:182-189 MaxP handling).

    Dispatch is pipelined: up to ``flush_every`` batches stay in flight as
    device arrays before being pulled to host, so the host tokenization/
    gather overlaps device compute instead of synchronizing per batch.
    """
    emb_parts, id_parts = [], []
    pending: list[tuple[jax.Array, int, np.ndarray]] = []

    def flush():
        for out_dev, real, keys in pending:
            out = np.asarray(out_dev, dtype=np.float32)
            if multichunk:
                C = out.shape[1]
                emb_parts.append(out[:real].reshape(real * C, -1))
                id_parts.append(np.repeat(keys, C))
            else:
                emb_parts.append(out[:real])
                id_parts.append(keys)
        pending.clear()

    to_dev = _global_batcher(mesh, num_hosts)
    for keys, ids, mask in iter_cache_batches(cache, batch_size, start, stop,
                                              host_id, num_hosts):
        out_dev = encode_fn(params, to_dev(ids), to_dev(mask))
        pending.append((out_dev, len(keys), keys))
        if len(pending) >= flush_every:
            flush()
    flush()
    return (np.concatenate(emb_parts, axis=0),
            np.concatenate(id_parts, axis=0).astype(np.int64))
