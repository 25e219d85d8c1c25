"""On-the-fly tokenization for raw-text training/eval streams.

Warmup training runs straight off ``triples.train.small.tsv`` without a
binary cache (reference data/process_fn.py:48-71 triple_process_fn used by
drivers/run_warmup.py:171-174); dev eval streams ``(id, text)`` pairs
(dual_process_fn, reference process_fn.py:20-45).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np


def encode_padded(tokenizer, text: str, max_len: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(ids [L] int32, mask [L] int32) — truncate/pad like reference
    process_fn.pad_ids (process_fn.py:4-17)."""
    ids = tokenizer.encode(text.strip(), add_special_tokens=True,
                           max_length=max_len)
    if hasattr(ids, "ids"):
        ids = ids.ids
    ids = list(ids)[:max_len]
    n = len(ids)
    out = np.full(max_len, tokenizer.pad_token_id, np.int32)
    out[:n] = ids
    mask = np.zeros(max_len, np.int32)
    mask[:n] = 1
    return out, mask


def triple_batches(tokenizer, lines: Iterable[str], batch_size: int,
                   max_len: int, host_id: int = 0, num_hosts: int = 1
                   ) -> Iterator[dict]:
    """``query\\tpos\\tneg`` lines → train batches (triple_process_fn parity,
    reference process_fn.py:48-71), striped across hosts like
    StreamingDataset stripes ranks (utils/util.py:318-329)."""
    buf = {k: [] for k in ("query_ids", "query_mask", "pos_ids", "pos_mask",
                           "neg_ids", "neg_mask")}
    for i, line in enumerate(lines):
        if i % num_hosts != host_id:
            continue
        cells = line.rstrip("\n").split("\t")
        if len(cells) != 3:
            raise ValueError(
                f"Line doesn't have correct length: {len(cells)}. Expected 3.")
        for text, prefix in zip(cells, ("query", "pos", "neg")):
            ids, mask = encode_padded(tokenizer, text, max_len)
            buf[f"{prefix}_ids"].append(ids)
            buf[f"{prefix}_mask"].append(mask)
        if len(buf["query_ids"]) == batch_size:
            yield {k: np.stack(v) for k, v in buf.items()}
            buf = {k: [] for k in buf}


def dual_batches(tokenizer, lines: Iterable[str], batch_size: int,
                 max_len: int, host_id: int = 0, num_hosts: int = 1
                 ) -> Iterator[dict]:
    """``id\\ttext`` lines → inference batches with ids
    (dual_process_fn parity, reference process_fn.py:20-45). The final
    partial batch is emitted unpadded."""
    ids_buf, mask_buf, rid_buf = [], [], []
    for i, line in enumerate(lines):
        if i % num_hosts != host_id:
            continue
        cells = line.rstrip("\n").split("\t")
        if len(cells) != 2:
            raise ValueError(
                f"Line doesn't have correct length: {len(cells)}. Expected 2.")
        ids, mask = encode_padded(tokenizer, cells[1], max_len)
        ids_buf.append(ids)
        mask_buf.append(mask)
        rid_buf.append(int(cells[0]))
        if len(ids_buf) == batch_size:
            yield {"ids": np.stack(ids_buf), "mask": np.stack(mask_buf),
                   "rec_ids": np.asarray(rid_buf, np.int64)}
            ids_buf, mask_buf, rid_buf = [], [], []
    if ids_buf:
        yield {"ids": np.stack(ids_buf), "mask": np.stack(mask_buf),
               "rec_ids": np.asarray(rid_buf, np.int64)}
