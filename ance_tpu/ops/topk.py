"""Fused matmul + block-max exact top-k (Pallas).

The streaming-scan top-k in :mod:`ance_tpu.index.flat` writes every [Q,
chunk] score tile to HBM before `lax.top_k` reads it back — ~2·Q·N·4 bytes of
traffic on top of the corpus read. This module implements the fused
alternative (SURVEY.md §7.3 "fused matmul+top-k Pallas kernel"):

  phase 1 (Pallas) — one kernel computes score tiles in VMEM and writes ONLY
      per-``block_size``-row maxima: [Q, N/BS] — a BS× traffic reduction
      (measured sweep on v5e @ 1M×768, Q=512, k=200: BS=16 → 87 ms vs
      721 ms scan baseline = 8.3×; BS=8 ties, BS=32 123 ms, BS=64 209 ms;
      re-swept r3 at Q=2048 k=10: BS=16 still optimal — 62 ms full /
      32.8k qps vs scan 8.6k — larger BS only inflates phase 3);
  phase 2 (XLA)    — top-k over block maxima selects candidate blocks;
  phase 3 (XLA)    — gather the k·BS candidate rows per query, re-score
      exactly, final top-k (scanned over query tiles to bound memory).

EXACTNESS (not an approximation): if entry e were in the true top-k but its
block not among the top-k blocks by max, then ≥ k blocks would each contain
an entry scoring above e — contradiction. Hence the union of the top-k blocks
contains the true top-k entries.

Phase-1 ceiling (r3 measurements, v5e, Q=2048 N=1M D=768 bf16): the fused
matmul+max runs ~45 ms = 71 TF/s ≈ 36% of bf16 peak, and every cheap lever
measured FLAT: q_block tiling 256/512/1024 (VMEM pressure was not the
limiter), chunk_rows 2048 (no change; 4096 crashes the remote compile
helper), pre-transposed query operand (43.5 vs 44.6 ms), bf16 accumulation
(Mosaic rejects: MXU acc must be 32-bit). Phase 2+3 cost 13 ms at k=10.
Whatever bounds phase 1 is inside Mosaic's schedule for the [CHUNK, Q]
shape, not anything reachable from the kernel body — recorded so the next
attempt starts past these dead ends.

Round-4 END-TO-END default selection (docs/perf_topk_defaults_r4.py →
perf_topk_defaults_r4_run.jsonl, real chip, 1M×768): the kernel-level
phase-1 wins from the r4 sweep (block_size=32: −8%, chunk_rows=2048 on
int8: −16%, bf16 phase-1 on int8: −14%) do NOT survive whole-call
accounting. Phase 3 gathers k·block_size rows/query, so bs32 ties at k=10
(62.4 vs 60.7 ms) and LOSES 36% at k=200 (146.4 vs 107.7 ms); chunk 2048
and bf16-vs-fp32 phase 1 land within the run-to-run spread at both
production shapes (dev Q=2048 k=10: 58.3-62.4 ms across the whole grid;
mine Q=512 k=200: 101.3-113.0 ms for every bs16 config). The shipped
defaults below (block_size=16, chunk_rows=1024, query-dtype phase 1) are
the measured end-to-end optimum; per-shape retuning buys ≤3% and is not
worth a config surface. The native int8×int8 phase 1 remains a recorded
dead end (2× slower — Mosaic lowers it off the MXU — and per-query
quantization degrades block selection; docs/perf_topk_int8_r4_run.jsonl).

Round-5: the last untried phase-1 lever — declaring the grid
``dimension_semantics=("parallel", "parallel")`` instead of arbitrary
(every (chunk, q_tile) output block is independent, so Mosaic could in
principle reorder/pipeline deeper) — measured as a WASH on the real chip
(docs/perf_topk_dimsem_r5.py → _run.jsonl, A/B in one run, 1M×768):
phase 1 Q=2048 21.9 vs 22.1 ms, Q=512 9.4 vs 10.0 ms; full path within
spread at both production shapes (dev 55.3k vs 55.1k qps, mine 83.4 vs
83.1 ms). Mosaic's schedule for this kernel is not constrained by the
arbitrary declaration; ``_DIMENSION_SEMANTICS`` stays the module global
the sweep toggles.

The same run RETIRES the "36% of peak" ceiling note above: 21.9 ms for
Q=2048 over 1,000,448×768 bf16 is 2·Q·N·D = 3.15 TF → 143.6 TF/s ≈ 73%
of the v5e's 197 TF/s bf16 peak — phase 1 is near-roofline for a kernel
that also streams the 1.5 GB corpus and writes block maxima. The kernel
is byte-identical to the one the r3 "45 ms ≈ 36%" note measured (git
log -S confirms no body/spec change since), and both sweeps cast queries
to bf16 — the 2× gap is environmental (tunneled-chip session variance
or a platform-stack change between rounds; the same r5 session also saw
mining at 83-84 ms vs r4's 101-107). Re-confirmed in a second r5 session:
21.7 ms / 145.3 TF/s / 73.7% of peak. Whatever the r3 figure's cause, the
"roofline says ~2× more exists" concern does not reproduce: as currently
measured there is no 2× left on the table here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.finfo(jnp.float32).min

# Grid scheduling contract for the phase-1 kernel. Every (chunk, q_tile)
# output block is independent, so "parallel" is semantically valid too;
# module-level so docs/perf_topk_dimsem_r5.py can A/B it on the chip.
_DIMENSION_SEMANTICS = ("arbitrary", "arbitrary")


def _blockmax_kernel(q_ref, c_ref, o_ref, *, block_size: int):
    """One corpus chunk: transposed scores [CHUNK, Q] in VMEM → block maxima
    [CHUNK/BS, Q] in HBM.

    The reduction groups CHUNK rows on the SUBLANE axis — Mosaic supports
    reshapes that keep the minor (lane) dimension intact, so the scores are
    computed corpus-major ([CHUNK, Q]) and the caller transposes the final
    [N/BS, Q] block-max matrix once in XLA.

    Operand dtypes set the MXU rate: both int8 → native int8 multiply with
    int32 accumulation (2x the bf16 MXU rate on v5e+, and the int8 corpus
    tile is never widened in VMEM); an int8 corpus with a float query is
    upcast to the query dtype (bf16 queries keep the bf16 MXU rate — fp32
    queries would drop phase 1 to the fp32 rate).
    """
    q = q_ref[...]
    c = c_ref[...]
    acc = jnp.int32 if (c.dtype == jnp.int8 and q.dtype == jnp.int8) \
        else jnp.float32
    if c.dtype != q.dtype and acc != jnp.int32:
        c = c.astype(q.dtype)  # int8 corpus, float query: upcast in VMEM
    s = jax.lax.dot_general(c, q, (((1,), (1,)), ((), ())),
                            preferred_element_type=acc)  # [CHUNK, Q]
    chunk, Q = s.shape
    r = s.reshape(chunk // block_size, block_size, Q)
    o_ref[...] = jnp.max(r, axis=1)


@functools.partial(jax.jit, static_argnames=("block_size", "chunk_rows",
                                             "q_block", "interpret"))
def blockmax_scores(queries: jax.Array, corpus: jax.Array, *,
                    block_size: int = 16, chunk_rows: int = 1024,
                    q_block: int = 0,
                    interpret: bool = False) -> jax.Array:
    """[Q, D] × [N, D] → per-block score maxima [Q, N/block_size]
    (int32 when both operands are int8 — the native int8 MXU path —
    fp32 otherwise).

    N must be a multiple of chunk_rows, chunk_rows of block_size (pad
    upstream; padded rows should be zero vectors — their score 0 may only
    matter if real scores are all negative AND padding exists, which
    :func:`topk_blockmax` guards by masking padded blocks).

    ``q_block`` tiles the query axis inside the kernel grid (0 = all
    queries in one tile). At large Q the [chunk, Q] fp32 score tile is the
    VMEM high-water (Q=2048 → 8 MB of 16 MB); tiling it restores DMA/MXU
    double-buffering headroom. The corpus chunk is the grid's inner-most
    constant, so it is fetched once per chunk regardless of tiling.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % chunk_rows == 0 and chunk_rows % block_size == 0
    if not q_block or q_block >= Q:
        q_block = Q
    assert Q % q_block == 0
    n_chunks = N // chunk_rows
    n_qt = Q // q_block
    blocks_per_chunk = chunk_rows // block_size

    out_dtype = jnp.int32 if (corpus.dtype == jnp.int8 and
                              queries.dtype == jnp.int8) else jnp.float32
    kernel = functools.partial(_blockmax_kernel, block_size=block_size)
    bm_t = pl.pallas_call(
        kernel,
        grid=(n_chunks, n_qt),
        in_specs=[
            pl.BlockSpec((q_block, D), lambda ci, qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, D), lambda ci, qi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blocks_per_chunk, q_block),
                               lambda ci, qi: (ci, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // block_size, Q), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_DIMENSION_SEMANTICS),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * N * D,
            bytes_accessed=(Q * D + N * D) * queries.dtype.itemsize +
            Q * (N // block_size) * 4,
            transcendentals=0),
        interpret=interpret,
    )(queries, corpus)
    return bm_t.T


@functools.partial(jax.jit, static_argnames=("k", "block_size", "chunk_rows",
                                             "q_tile", "q_block",
                                             "phase1_dtype", "interpret"))
def topk_blockmax(queries: jax.Array, corpus: jax.Array, *, k: int,
                  block_size: int = 16, chunk_rows: int = 1024,
                  q_tile: int = 64, q_block: int = 0,
                  phase1_dtype=None,
                  interpret: bool = False,
                  valid_rows=None):
    """Exact top-k inner product via the block-max bound.

    Returns (scores [Q, k] fp32, ids [Q, k] int32). Corpus rows ≥
    ``valid_rows`` are treated as padding (excluded).

    ``phase1_dtype`` (int8 corpora only) sets the QUERY dtype of the
    phase-1 block-max matmul — the MXU rate lever:
      * None (default): queries pass through at their own dtype (fp32 from
        the quantized index path → fp32 MXU rate, the round-3 behavior);
      * ``jnp.bfloat16``: phase 1 runs at the bf16 MXU rate;
      * ``jnp.int8``: queries are symmetric-quantized PER ROW on the fly
        and phase 1 runs the native int8 multiply with int32 accumulation
        (2x bf16 peak on v5e+). A per-query positive scale never reorders
        that query's blocks, so candidate selection is unaffected by the
        per-row scales and phase 3 still rescores candidates exactly in
        fp32 from the ORIGINAL queries.
    With a reduced-precision phase 1 the top-k remains exact as long as no
    true top-k row's block falls below the k-th block under the quantized
    maxima — the same (empirically robust) near-tie caveat the bf16-corpus
    path already carries; phase 3 exactness is unconditional over the
    selected candidates.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    if valid_rows is None:
        valid_rows = jnp.asarray(N, jnp.int32)

    # pad corpus rows to chunk multiple, queries to q_tile multiple
    padded_n = -(-N // chunk_rows) * chunk_rows
    corpus_p = jnp.pad(corpus, ((0, padded_n - N), (0, 0)))
    padded_q = -(-Q // q_tile) * q_tile
    queries_p = jnp.pad(queries, ((0, padded_q - Q), (0, 0)))

    if corpus.dtype == jnp.int8:
        if phase1_dtype == jnp.int8:
            # per-row symmetric int8 query quantization (monotone per query)
            qmax = jnp.maximum(jnp.max(jnp.abs(queries_p), axis=1,
                                       keepdims=True), 1e-12)
            qf = jnp.clip(jnp.round(queries_p * (127.0 / qmax)),
                          -127, 127).astype(jnp.int8)
        elif phase1_dtype is not None:
            qf = queries_p.astype(phase1_dtype)
        else:
            qf = queries_p  # legacy: kernel upcasts corpus to query dtype
    else:
        qf = queries_p.astype(corpus.dtype)
    qb = q_block if q_block and padded_q % q_block == 0 else 0
    bm = blockmax_scores(qf, corpus_p, block_size=block_size,
                         chunk_rows=chunk_rows, q_block=qb,
                         interpret=interpret)
    n_blocks = padded_n // block_size
    block_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_blocks), 1)
    block_valid = block_ids * block_size < valid_rows
    neg = jnp.iinfo(jnp.int32).min if bm.dtype == jnp.int32 else NEG_INF
    bm = jnp.where(block_valid, bm, neg)

    k_blocks = min(k, n_blocks)
    _, top_blocks = jax.lax.top_k(bm, k_blocks)      # [Qp, k_blocks]

    # phase 3: per-query-tile candidate gather + exact re-score
    n_tiles = padded_q // q_tile
    tb_tiles = top_blocks.reshape(n_tiles, q_tile, k_blocks)
    q_tiles = queries_p.reshape(n_tiles, q_tile, D).astype(jnp.float32)

    def tile_body(carry, inp):
        q_t, blocks_t = inp                           # [T, D], [T, kb]
        rows = (blocks_t[:, :, None] * block_size +
                jnp.arange(block_size)[None, None, :]
                ).reshape(q_tile, k_blocks * block_size)  # [T, kb*BS]
        cand = corpus_p[rows]                          # [T, kb*BS, D]
        s = jnp.einsum("td,tcd->tc", q_t, cand.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        s = jnp.where(rows < valid_rows, s, NEG_INF)
        top_s, pos = jax.lax.top_k(s, min(k, s.shape[1]))
        top_i = jnp.take_along_axis(rows, pos, axis=1).astype(jnp.int32)
        if top_s.shape[1] < k:  # k > kb*BS (tiny corpora)
            pad = k - top_s.shape[1]
            top_s = jnp.pad(top_s, ((0, 0), (0, pad)),
                            constant_values=NEG_INF)
            top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
        return carry, (top_s, top_i)

    _, (scores, ids) = jax.lax.scan(tile_body, None, (q_tiles, tb_tiles))
    scores = scores.reshape(padded_q, -1)[:Q]
    ids = ids.reshape(padded_q, -1)[:Q]
    ids = jnp.where(scores <= NEG_INF, -1, ids)
    return scores, ids
