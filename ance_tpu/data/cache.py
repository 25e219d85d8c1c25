"""Fixed-record binary token caches.

On-disk format is byte-compatible with the reference's ``EmbeddingCache``
(reference utils/util.py:257-307):

  * ``<base>``        concatenated records, each ``4-byte big-endian length``
                      followed by ``embedding_size`` items of ``dtype``
  * ``<base>_meta``   JSON ``{"type": "int32", "total_number": N,
                      "embedding_size": L}``

Unlike the reference's seek()-per-record reader, reads go through a
``np.memmap`` so random access and batched gather are zero-copy on the host
and friendly to a prefetching feeder. Big-endian length prefixes are kept for
format compatibility (reference utils/util.py:281).
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Sequence

import numpy as np


class TokenCache:
    """Random-access reader over a fixed-record token cache.

    Parity target: reference utils/util.py:257-307 (EmbeddingCache). Supports
    context-manager use, integer indexing returning ``(length, tokens)``,
    seeded-permutation iteration, and adds vectorized ``batch()`` access.
    """

    def __init__(self, base_path: str | os.PathLike, seed: int = -1):
        self.base_path = str(base_path)
        with open(self.base_path + "_meta", "r") as f:
            meta = json.load(f)
        self.dtype = np.dtype(meta["type"])
        self.total_number = int(meta["total_number"])
        self.embedding_size = int(meta["embedding_size"])
        self.record_size = self.embedding_size * self.dtype.itemsize + 4
        if seed >= 0:
            self.ix_array = np.random.RandomState(seed).permutation(self.total_number)
        else:
            self.ix_array = np.arange(self.total_number)
        self._raw: np.memmap | None = None

    # -- lifecycle ---------------------------------------------------------
    def open(self) -> "TokenCache":
        self._raw = np.memmap(self.base_path, dtype=np.uint8, mode="r",
                              shape=(self.total_number * self.record_size,))
        return self

    def close(self) -> None:
        self._raw = None

    def __enter__(self) -> "TokenCache":
        return self.open()

    def __exit__(self, exc_type, exc, tb) -> None:
        self.close()

    # -- access ------------------------------------------------------------
    def _records(self) -> np.ndarray:
        if self._raw is None:
            self.open()
        return self._raw.reshape(self.total_number, self.record_size)

    def __getitem__(self, key: int) -> tuple[int, np.ndarray]:
        if key < 0 or key >= self.total_number:
            raise IndexError(
                f"Index {key} is out of bound for cached embeddings of size "
                f"{self.total_number}")
        rec = self._records()[key]
        length = int.from_bytes(bytes(rec[:4]), "big")
        tokens = np.frombuffer(rec[4:].tobytes(), dtype=self.dtype)
        return length, tokens

    def batch(self, keys: Sequence[int] | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized gather: returns ``(lengths [B], tokens [B, L])``."""
        keys = np.asarray(keys, dtype=np.int64)
        recs = self._records()[keys]  # [B, record_size] fancy-gather
        lengths = recs[:, :4].copy().view(">u4")[:, 0].astype(np.int64)
        tokens = np.frombuffer(recs[:, 4:].tobytes(), dtype=self.dtype)
        return lengths, tokens.reshape(len(keys), self.embedding_size)

    def __iter__(self):
        for i in range(self.total_number):
            yield self[int(self.ix_array[i])]

    def __len__(self) -> int:
        return self.total_number


class TokenCacheWriter:
    """Streams fixed-size records into a cache file and writes its meta JSON.

    Produces files readable by :class:`TokenCache` and by the reference's
    EmbeddingCache (format fixed at reference utils/util.py:257-271 and
    data/msmarco_data.py:86-89).
    """

    def __init__(self, base_path: str | os.PathLike, embedding_size: int,
                 dtype: str = "int32"):
        self.base_path = str(base_path)
        self.embedding_size = int(embedding_size)
        self.dtype = np.dtype(dtype)
        self._f = open(self.base_path, "wb")
        self._count = 0

    def write(self, length: int, tokens: np.ndarray | Sequence[int]) -> int:
        """Append one record; returns its offset index."""
        tokens = np.asarray(tokens, dtype=self.dtype)
        if tokens.shape != (self.embedding_size,):
            raise ValueError(
                f"record must have shape ({self.embedding_size},), got {tokens.shape}")
        self._f.write(int(length).to_bytes(4, "big"))
        self._f.write(tokens.tobytes())
        idx = self._count
        self._count += 1
        return idx

    def close(self) -> None:
        self._f.close()
        meta = {"type": self.dtype.name, "total_number": self._count,
                "embedding_size": self.embedding_size}
        with open(self.base_path + "_meta", "w") as f:
            json.dump(meta, f)

    def __enter__(self) -> "TokenCacheWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.close()


def iter_split_records(base_path: str, num_splits: int,
                       record_size: int) -> Iterable[bytes]:
    """Yield raw records from ``<base>_split{i}`` files in split order.

    Parity: reference utils/util.py:246-254 (numbered_byte_file_generator).
    """
    for i in range(num_splits):
        with open(f"{base_path}_split{i}", "rb") as f:
            while True:
                b = f.read(record_size)
                if not b:
                    break
                yield b


def merge_split_files(base_path: str, num_splits: int, max_len: int,
                      dtype: str = "int32",
                      keep_id=None) -> dict[int, int]:
    """Merge id-prefixed split files into a final cache; return id→offset map.

    Split record layout: 8-byte big-endian id + 4-byte big-endian length +
    ``max_len`` tokens (reference data/msmarco_data.py:64-89). The final cache
    drops the id prefix; ids map to offsets via the returned dict.

    ``keep_id``: optional predicate to drop records (e.g. queries without a
    qrel, reference data/msmarco_data.py:68-71).
    """
    itemsize = np.dtype(dtype).itemsize
    record_size = 8 + 4 + max_len * itemsize
    id2offset: dict[int, int] = {}
    with TokenCacheWriter(base_path, max_len, dtype) as w:
        for record in iter_split_records(base_path, num_splits, record_size):
            rid = int.from_bytes(record[:8], "big")
            if keep_id is not None and not keep_id(rid):
                continue
            length = int.from_bytes(record[8:12], "big")
            tokens = np.frombuffer(record[12:], dtype=dtype)
            id2offset[rid] = w.write(length, tokens)
    return id2offset
