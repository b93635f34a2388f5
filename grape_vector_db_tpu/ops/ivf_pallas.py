"""Pallas DMA-pipelined IVF probe — score each query's probed lists at
streaming HBM bandwidth.

XLA lowers the IVF probe's ``vecs[probe]`` ([L, C, D] indexed by [B, P]) as a
row gather running at ~90 GB/s on v5e — an 8x per-byte penalty vs the
streaming scan (726 GB/s) that cancels IVF's read-volume advantage (measured:
nprobe=1 on 1M clustered = 9.4k QPS, worse than the flat int8 scan's 84k).

This kernel restores the advantage: each (query, probe-slot) cell issues ONE
async DMA of the whole probed list — a contiguous, sublane-aligned
``[C, D]`` block of ~0.5-1 MB (list capacities are multiples of 64; the
sub-8-row alignment wall that disproved per-row DMA gather in
``gather_pallas.py`` does not apply) — double-buffered so the next list
streams in while the current one is scored with a single MXU ``dot``.
Validity folds into the score-weight plane (1/|v| for cosine, 1.0 for dot —
see ``make_recip``): ``recip == 0`` marks invalid slots and becomes a -1e9
score bias in-kernel.

Output is the raw per-cell score plane ``[B*P, C]``; the caller flattens,
adds global slot ids, and runs the standard top-k selection (XLA) on it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ivf_probe_scores", "ivf_pallas_supported", "pallas_ivf_topk",
           "nblocks_from_counts",
           "ivf_probe_scores_int8", "pallas_ivf_topk_int8", "make_factor",
           "ivf_probe_scores_int4", "pallas_ivf_topk_int4",
           "finalize_probe_topk"]


def ivf_pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def finalize_probe_topk(
    qp: jax.Array,        # [B, D] prepared queries
    probe: jax.Array,     # [B, P] probed list ids
    scores: jax.Array,    # [B, P, C] stage-2 scores (invalid <= -1e9)
    k: int,
    metric: str,
    cell_mask: jax.Array | None = None,  # [L, C] bool filter
    rescore: int = 0,
    vecs: jax.Array | None = None,       # [L, C, D] rescore shadow
    weight_fn=None,       # (rl [B,R], rp [B,R]) -> [B,R] f32 score weight
                          #   (1/norm for cosine, 1 for dot; 0 = invalid)
) -> Tuple[jax.Array, jax.Array]:
    """Shared stage-2 selection: slot mapping, filter-mask fold, optional
    exact rescore of the top candidates, final top-k + pad.

    One implementation so the invalid-score sentinel contract (-1e9 from the
    scoring stage, -inf after mask/validity folds, ``rv > -1e8`` as the
    rescore guard) and the cosine <=1.0 clamp stay single-sourced across the
    bf16 / int8 / XLA-fallback probes."""
    b, p, c = scores.shape
    pos = lax.broadcasted_iota(jnp.int32, (b, p, c), 2)
    gslot = (probe[:, :, None] * c + pos).reshape(b, p * c)
    flat = scores.reshape(b, p * c)
    if cell_mask is not None:
        allowed = cell_mask[probe]                             # [B, P, C]
        flat = jnp.where(allowed.reshape(b, p * c), flat, -jnp.inf)

    if rescore and vecs is not None:
        r = min(rescore, p * c)
        rv, ridx = lax.top_k(flat, r)
        rslot = jnp.take_along_axis(gslot, ridx, axis=1)       # [B, R]
        rl, rp = rslot // c, rslot % c
        cand = vecs[rl, rp]                                    # [B, R, D]
        w = weight_fn(rl, rp)                                  # [B, R]
        prec = (lax.Precision.HIGHEST if cand.dtype == jnp.float32
                else lax.Precision.DEFAULT)
        dots = jnp.einsum("bd,brd->br", qp.astype(cand.dtype), cand,
                          preferred_element_type=jnp.float32, precision=prec)
        exact = dots * w
        if metric == "cosine":
            exact = jnp.minimum(exact, 1.0)
        # rv > -1e8 excludes masked (-inf) AND invalid (-1e9) candidates;
        # w > 0 excludes cells deleted after the candidate scores were built.
        exact = jnp.where((rv > -1e8) & (w > 0), exact, -jnp.inf)
        kk = min(k, r)
        vals, idx = lax.top_k(exact, kk)
        slots = jnp.take_along_axis(rslot, idx, axis=1)
    else:
        kk = min(k, p * c)
        vals, idx = lax.top_k(flat, kk)
        if metric == "cosine":
            vals = jnp.minimum(vals, 1.0)
        vals = jnp.where(vals > -1e8, vals, -jnp.inf)
        slots = jnp.take_along_axis(gslot, idx, axis=1)
    if kk < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        slots = jnp.pad(slots, ((0, 0), (0, k - kk)))
    return vals, slots


# DMA block granularity (rows). Lists are fetched in RB-row blocks and only
# blocks below the list's high-water mark move — padding beyond it costs no
# bandwidth. >= 8 sublanes (Mosaic tiling) and divides every legal list
# capacity (multiples of 128).
RB = 64


def _ragged_cell_dma(probe_smem, nblk_smem, data_hbm, plane_hbm,
                     scratch_d, scratch_p, sem_d, sem_p, rb=RB):
    """(start_cell, wait_cell) for the ragged double-buffered fetch: the
    [8, C] weight plane moves whole; the [C, D] data block moves in rb-row
    blocks, skipping blocks past the list's high-water mark (nblk_smem).
    Shared by the bf16 and int8 kernels so fixes cannot drift. ``rb``
    defaults to RB; callers pass rb=C when C is not a multiple of RB (tiny
    interpret-mode slices), degrading to whole-list fetch."""

    def block_dma(slot, lst, i):
        return pltpu.make_async_copy(
            data_hbm.at[lst, pl.ds(i * rb, rb)],
            scratch_d.at[slot, pl.ds(i * rb, rb)],
            sem_d.at[slot, i],
        )

    def plane_dma(slot, lst):
        return pltpu.make_async_copy(plane_hbm.at[lst], scratch_p.at[slot],
                                     sem_p.at[slot])

    def start_cell(slot, cell):
        lst = probe_smem[cell]
        plane_dma(slot, lst).start()

        def blk(i, _):
            block_dma(slot, lst, i).start()
            return _

        lax.fori_loop(0, nblk_smem[lst], blk, None)

    def wait_cell(slot, cell):
        lst = probe_smem[cell]
        plane_dma(slot, lst).wait()

        def blk(i, _):
            block_dma(slot, lst, i).wait()
            return _

        lax.fori_loop(0, nblk_smem[lst], blk, None)

    return start_cell, wait_cell


def _probe_kernel(probe_smem, nblk_smem, q_vmem, vecs_hbm, recip_hbm,
                  out_vmem, scratch_v, scratch_r, sem_v, sem_r, rb=RB):
    ncells = out_vmem.shape[0]          # B * P
    start_cell, wait_cell = _ragged_cell_dma(
        probe_smem, nblk_smem, vecs_hbm, recip_hbm,
        scratch_v, scratch_r, sem_v, sem_r, rb=rb)

    start_cell(0, 0)
    n_q = q_vmem.shape[0]

    def body(cell, _):
        slot = lax.rem(cell, 2)
        nxt = lax.rem(cell + 1, 2)

        @pl.when(cell + 1 < ncells)
        def _():
            start_cell(nxt, cell + 1)

        wait_cell(slot, cell)

        b = cell // (ncells // n_q)     # query index (cells ordered b-major)
        qrow = q_vmem[pl.ds(b, 1), :]                       # [1, D] f32
        lst_v = scratch_v[slot]                              # [C, D] bf16
        # Rows beyond the fetched blocks hold a previous list's (finite)
        # data — their recip entries are 0, so they score -1e9 regardless.
        dots = jax.lax.dot_general(
            qrow.astype(lst_v.dtype), lst_v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [1, C]
        recip = scratch_r[slot][0:1, :]                      # [1, C] f32
        # select-style mask: rows beyond the fetched blocks may be
        # UNINITIALIZED VMEM (first cells) — a multiplicative mask would
        # leak nan*0 = nan through the additive bias
        scores = jnp.where(recip == 0.0, -1e9, dots * recip)
        out_vmem[pl.ds(cell, 1), :] = scores
        return _

    lax.fori_loop(0, ncells, body, None)


# Per-format scoped-VMEM output budgets (f32 cells) for the probe-scores
# kernels: ~16 MB limit minus each kernel's double-buffer scratch (bf16
# scratch 2xCxD bf16 is the largest). Module-level so tests can shrink them
# to exercise the chunked path at interpret-mode shapes.
_PROBE_OUT_BUDGET = {"bf16": 2_000_000, "int8": 2_500_000, "int4": 3_000_000}


def _probe_p_chunks(b: int, p: int, c: int, budget_cells: int):
    """Chunk plan for the probe-scores kernels' P axis, or None.

    The whole [B*P, C] f32 scores output lives in VMEM for the duration of
    the kernel (grid=1), so B*P*C must stay under the ~16 MB scoped limit
    minus the double-buffer scratch (the r5 OOM: the exhaustive scan at
    fetch=64 over the 16.78M layout asked for 69.7 MB). Returns a list of
    (lo, hi) column slices; prefers an even split so every chunk compiles
    the SAME program (each relay compile is minutes under congestion)."""
    p_sub = max(1, budget_cells // (b * c))
    if p <= p_sub:
        return None
    nchunks = -(-p // p_sub)
    cap = min(2 * nchunks, p)
    while p % nchunks and nchunks < cap:
        nchunks += 1
    p_sub = -(-p // nchunks)
    return [(lo, min(lo + p_sub, p)) for lo in range(0, p, p_sub)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_probe_scores(
    q: jax.Array,       # [B, D] f32, L2-normalized (cosine) or raw (dot)
    probe: jax.Array,   # [B, P] int32 list ids
    vecs: jax.Array,    # [L, C, D] bf16 (C % 64 == 0, D % 128 == 0)
    recip: jax.Array,   # [L, 8, C] f32 weight plane from make_recip (0 = invalid)
    nblocks: jax.Array | None = None,  # [L] int32 ceil(high_water / RB);
                                       # None = fetch full capacity
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, P, C] f32 cosine/dot scores (invalid slots <= -1e9).

    Requires C %% 128 == 0 (Mosaic DMA lane alignment for the recip plane).
    With ``nblocks`` (per-list occupied RB-row blocks) only occupied blocks
    are fetched — on half-full lists that halves the DMA bytes, and the
    probe is bandwidth-bound, so QPS scales ~linearly with bytes saved.
    """
    b, d = q.shape
    p = probe.shape[1]
    l, c, _ = vecs.shape
    chunks = _probe_p_chunks(b, p, c, _PROBE_OUT_BUDGET["bf16"])
    if chunks is not None:
        return jnp.concatenate(
            [ivf_probe_scores(q, probe[:, lo:hi], vecs, recip,
                              nblocks=nblocks, interpret=interpret)
             for lo, hi in chunks], axis=1)
    if c % 128 and not interpret:
        raise ValueError(f"list capacity {c} must be a multiple of 128 "
                         "for the Pallas probe (Mosaic lane alignment)")
    if d % 128 and not interpret:
        raise ValueError(f"dimension {d} must be a multiple of 128 for the "
                         "Pallas probe (Mosaic DMA lane alignment); use the "
                         "XLA probe for unaligned dims")
    ncells = b * p
    rb = RB if (c >= RB and c % RB == 0) else c
    if nblocks is None:
        nblocks = jnp.full((l,), c // rb, dtype=jnp.int32)
    else:
        if nblocks.shape != (l,):
            raise ValueError(
                f"nblocks shape {nblocks.shape} != ({l},) — stale layout? "
                "(list count changed since the counts were taken)")
        # clamp in-graph: an overshooting count (stale after a regrow, or an
        # rb degraded to whole-list) must not drive OOB DMA trip counts
        nblocks = jnp.clip(nblocks, 0, c // rb)

    out = pl.pallas_call(
        functools.partial(_probe_kernel, rb=rb),
        out_shape=jax.ShapeDtypeStruct((ncells, c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),    # q
                pl.BlockSpec(memory_space=pl.ANY),     # vecs (HBM)
                pl.BlockSpec(memory_space=pl.ANY),     # recip (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, c, d), vecs.dtype),
                pltpu.VMEM((2, 8, c), jnp.float32),
                pltpu.SemaphoreType.DMA((2, c // rb)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(probe.reshape(ncells), nblocks.astype(jnp.int32), q, vecs, recip)
    return out.reshape(b, p, c)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric",
                                             "interpret"))
def pallas_ivf_topk(
    queries: jax.Array,   # [B, D] f32 raw
    centroids: jax.Array, # [L, D] f32 (unit-norm for cosine/dot)
    vecs: jax.Array,      # [L, C, D] storage dtype
    recip: jax.Array,     # [L, 8, C] f32 masked reciprocal norms
    k: int,
    nprobe: int,
    metric: str = "cosine",
    interpret: bool = False,
    cell_mask: jax.Array | None = None,  # [L, C] bool filter (True = allowed)
    nblocks: jax.Array | None = None,    # [L] int32 occupied RB-row blocks
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops/ivf._ivf_topk's (vals, slots) contract (cosine/dot),
    with the stage-2 gather+score replaced by the DMA kernel.

    ``cell_mask`` folds a filter (engine/filtering.py mask_for_slots →
    compile_mask) into the selection AFTER the kernel: gathering
    ``cell_mask[probe]`` moves 1 byte per scored cell vs the 1536 bytes/row
    the XLA vector gather would re-read, so filtered IVF search keeps the
    DMA probe's ~54x bandwidth advantage (filtering.rs:374-488 semantics)."""
    from grape_vector_db_tpu.ops.distance import prepare_queries

    b, d = queries.shape
    l, c, _ = vecs.shape
    qp = prepare_queries(queries, metric)
    cq = lax.dot_general(qp, centroids, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    _, probe = lax.top_k(cq, min(nprobe, l))                    # [B, P]

    scores = ivf_probe_scores(qp, probe.astype(jnp.int32), vecs, recip,
                              nblocks=nblocks,
                              interpret=interpret)              # [B, P, C]
    return finalize_probe_topk(qp, probe, scores, k, metric,
                               cell_mask=cell_mask)


def _probe_kernel_int8(probe_smem, nblk_smem, q_vmem, codes_hbm, factor_hbm,
                       out_vmem, scratch_c, scratch_f, sem_c, sem_f, rb=RB):
    """Int8 variant of ``_probe_kernel``: DMAs int8 code blocks (half the
    bytes/list of bf16), upcasts in VMEM, and scores with an asymmetric
    bf16-query x dequantized-int8-corpus MXU dot. ``factor`` folds the
    per-row dequant scale and the cosine norm division (0 = invalid).
    Ragged fetch as in the bf16 kernel: only occupied RB-row blocks move."""
    ncells = out_vmem.shape[0]          # B * P
    start_cell, wait_cell = _ragged_cell_dma(
        probe_smem, nblk_smem, codes_hbm, factor_hbm,
        scratch_c, scratch_f, sem_c, sem_f, rb=rb)

    start_cell(0, 0)
    n_q = q_vmem.shape[0]

    def body(cell, _):
        slot = lax.rem(cell, 2)
        nxt = lax.rem(cell + 1, 2)

        @pl.when(cell + 1 < ncells)
        def _():
            start_cell(nxt, cell + 1)

        wait_cell(slot, cell)

        b = cell // (ncells // n_q)     # query index (cells ordered b-major)
        qrow = q_vmem[pl.ds(b, 1), :]                        # [1, D] f32
        lst_c = scratch_c[slot].astype(jnp.bfloat16)         # [C, D]
        dots = jax.lax.dot_general(
            qrow.astype(jnp.bfloat16), lst_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [1, C]
        factor = scratch_f[slot][0:1, :]                     # [1, C] f32
        # select-style mask: see _probe_kernel (nan-safe vs uninit VMEM)
        scores = jnp.where(factor == 0.0, -1e9, dots * factor)
        out_vmem[pl.ds(cell, 1), :] = scores
        return _

    lax.fori_loop(0, ncells, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_probe_scores_int8(
    q: jax.Array,       # [B, D] f32, L2-normalized (cosine) or raw (dot)
    probe: jax.Array,   # [B, P] int32 list ids
    codes: jax.Array,   # [L, C, D] int8 (C % 128 == 0, D % 128 == 0)
    factor: jax.Array,  # [L, 8, C] f32: masked scale/norm (0 = invalid)
    nblocks: jax.Array | None = None,  # [L] int32 occupied RB-row blocks
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, P, C] f32 cosine/dot scores (invalid slots <= -1e9)."""
    b, d = q.shape
    p = probe.shape[1]
    l, c, _ = codes.shape
    chunks = _probe_p_chunks(b, p, c, _PROBE_OUT_BUDGET["int8"])
    if chunks is not None:
        return jnp.concatenate(
            [ivf_probe_scores_int8(q, probe[:, lo:hi], codes, factor,
                                   nblocks=nblocks, interpret=interpret)
             for lo, hi in chunks], axis=1)
    if c % 128 and not interpret:
        raise ValueError(f"list capacity {c} must be a multiple of 128 "
                         "for the Pallas probe (Mosaic lane alignment)")
    if d % 128 and not interpret:
        raise ValueError(f"dimension {d} must be a multiple of 128 for the "
                         "Pallas probe (Mosaic DMA lane alignment); use the "
                         "XLA probe for unaligned dims")
    ncells = b * p
    rb = RB if (c >= RB and c % RB == 0) else c
    if nblocks is None:
        nblocks = jnp.full((l,), c // rb, dtype=jnp.int32)
    else:
        if nblocks.shape != (l,):
            raise ValueError(
                f"nblocks shape {nblocks.shape} != ({l},) — stale layout? "
                "(list count changed since the counts were taken)")
        nblocks = jnp.clip(nblocks, 0, c // rb)

    out = pl.pallas_call(
        functools.partial(_probe_kernel_int8, rb=rb),
        out_shape=jax.ShapeDtypeStruct((ncells, c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),    # q
                pl.BlockSpec(memory_space=pl.ANY),     # codes (HBM)
                pl.BlockSpec(memory_space=pl.ANY),     # factor (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, c, d), codes.dtype),
                pltpu.VMEM((2, 8, c), jnp.float32),
                pltpu.SemaphoreType.DMA((2, c // rb)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(probe.reshape(ncells), nblocks.astype(jnp.int32), q, codes, factor)
    return out.reshape(b, p, c)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric",
                                             "rescore", "interpret"))
def pallas_ivf_topk_int8(
    queries: jax.Array,    # [B, D] f32 raw
    centroids: jax.Array,  # [L, D] f32 (unit-norm for cosine/dot)
    codes: jax.Array,      # [L, C, D] int8
    factor: jax.Array,     # [L, 8, C] f32 masked scale/norm
    k: int,
    nprobe: int,
    metric: str = "cosine",
    rescore: int = 0,
    vecs: jax.Array | None = None,   # [L, C, D] bf16 shadow (rescore > 0)
    recip: jax.Array | None = None,  # [L, 8, C] f32 (rescore > 0)
    interpret: bool = False,
    cell_mask: jax.Array | None = None,  # [L, C] bool filter
    nblocks: jax.Array | None = None,    # [L] int32 occupied RB-row blocks
) -> Tuple[jax.Array, jax.Array]:
    """(vals, slots) over an int8-resident IVF layout via the DMA probe.

    Half the DMA bytes/list of the bf16 probe — the bandwidth AND capacity
    play combined (768 B/row at D=768: ~2x rows/chip and ~2x probe QPS).
    With ``rescore > 0`` and a bf16 shadow (``vecs``/``recip``), the top
    ``rescore`` int8 candidates are exactly rescored (gathering R rows/query
    is cheap — the reference's two-stage shape, quantization.rs:151-193)."""
    from grape_vector_db_tpu.ops.distance import prepare_queries

    b, d = queries.shape
    l, c, _ = codes.shape
    qp = prepare_queries(queries, metric)
    cq = lax.dot_general(qp, centroids, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    _, probe = lax.top_k(cq, min(nprobe, l))                    # [B, P]

    scores = ivf_probe_scores_int8(qp, probe.astype(jnp.int32), codes, factor,
                                   nblocks=nblocks,
                                   interpret=interpret)         # [B, P, C]
    return finalize_probe_topk(
        qp, probe, scores, k, metric, cell_mask=cell_mask,
        rescore=rescore, vecs=vecs,
        weight_fn=None if vecs is None else (lambda rl, rp: recip[rl, 0, rp]),
    )


def _probe_kernel_int4(probe_smem, nblk_smem, q_vmem, codes_hbm, factor_hbm,
                       out_vmem, scratch_c, scratch_f, sem_c, sem_f, rb=RB):
    """Int4 variant of ``_probe_kernel_int8``: DMAs PACKED nibble blocks
    ([C, D/2] int8-typed packed bytes — a quarter of the bf16 bytes/list,
    half of int8's) in 2*RB-row blocks (same bytes per DMA as the int8
    probe's RB-row blocks),
    unpacks the split-plane layout (ops/int4.py: low nibbles = dims
    [0, D/2), high = [D/2, D)) with two elementwise ops, and scores with
    two MXU dots against the matching query halves. The unpack is VPU work
    hidden behind the next list's DMA; no lane interleave ever happens
    (Mosaic cannot lower one)."""
    ncells = out_vmem.shape[0]          # B * P
    start_cell, wait_cell = _ragged_cell_dma(
        probe_smem, nblk_smem, codes_hbm, factor_hbm,
        scratch_c, scratch_f, sem_c, sem_f, rb=rb)

    start_cell(0, 0)
    n_q = q_vmem.shape[0]
    d2 = scratch_c.shape[2]             # packed bytes per row = D/2

    def body(cell, _):
        slot = lax.rem(cell, 2)
        nxt = lax.rem(cell + 1, 2)

        @pl.when(cell + 1 < ncells)
        def _():
            start_cell(nxt, cell + 1)

        wait_cell(slot, cell)

        b = cell // (ncells // n_q)     # query index (cells ordered b-major)
        qrow = q_vmem[pl.ds(b, 1), :]                        # [1, D] f32
        # Mosaic has no uint8->bf16 (or int8 shift-to-bf16) lowering: widen
        # the int8-typed bytes to int32 and do the nibble math there,
        # reaching bf16 via f32 (the only cast chain that compiles —
        # bench/probe_int4_cast.py). Masking the SIGN-EXTENDED int32 with
        # 0xF recovers each nibble directly (no where/+256 widen — that
        # recipe measured 0.088 vs 0.053 ms/128 cells,
        # bench/int4_unpack_ab.py); the -8 level offset folds into the dot:
        # dot(q, u - 8) = dot(q, u) - 8 * sum(q).
        p32 = scratch_c[slot].astype(jnp.int32)              # [C, D/2]
        lo = (jnp.bitwise_and(p32, 0xF)
              .astype(jnp.float32).astype(jnp.bfloat16))     # dims [0, D/2)
        hi = (jnp.bitwise_and(jnp.right_shift(p32, 4), 0xF)
              .astype(jnp.float32).astype(jnp.bfloat16))     # dims [D/2, D)
        qlo = qrow[:, :d2].astype(jnp.bfloat16)
        qhi = qrow[:, d2:].astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        dots = (
            jax.lax.dot_general(qlo, lo, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(qhi, hi, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        )                                                    # [1, C]
        # fold the -8 offset with the SAME bf16-rounded query values the
        # dots saw, so the fold is exact (not the f32 qrow sum)
        qsum = (jnp.sum(qlo.astype(jnp.float32))
                + jnp.sum(qhi.astype(jnp.float32)))
        dots = dots - 8.0 * qsum
        factor = scratch_f[slot][0:1, :]                     # [1, C] f32
        # select-style mask: see _probe_kernel (nan-safe vs uninit VMEM)
        scores = jnp.where(factor == 0.0, -1e9, dots * factor)
        out_vmem[pl.ds(cell, 1), :] = scores
        return _

    lax.fori_loop(0, ncells, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_probe_scores_int4(
    q: jax.Array,       # [B, D] f32, L2-normalized (cosine) or raw (dot)
    probe: jax.Array,   # [B, P] int32 list ids
    codes: jax.Array,   # [L, C, D/2] int8 packed nibbles (C % 128 == 0)
    factor: jax.Array,  # [L, 8, C] f32: masked scale/norm (0 = invalid)
    nblocks: jax.Array | None = None,  # [L] int32 occupied RB-row blocks
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, P, C] f32 cosine/dot scores (invalid slots <= -1e9).

    ``nblocks`` stays in the universal RB(=64)-row granularity
    (nblocks_from_counts); this probe DMAs 2*RB-row blocks — packed rows
    are half-width, so doubling the rows keeps each DMA the same byte size
    as the int8 probe's (half-size blocks measured latency-bound: 0.060 vs
    0.039 ms at 1M nprobe=1, bench/int4_probe_ab.py) — and converts the
    block counts internally (ceil(n/2), exact for nested ceilings).
    """
    b, d = q.shape
    p = probe.shape[1]
    l, c, d2 = codes.shape
    chunks = _probe_p_chunks(b, p, c, _PROBE_OUT_BUDGET["int4"])
    if chunks is not None:
        return jnp.concatenate(
            [ivf_probe_scores_int4(q, probe[:, lo:hi], codes, factor,
                                   nblocks=nblocks, interpret=interpret)
             for lo, hi in chunks], axis=1)
    if d != 2 * d2:
        raise ValueError(f"query dim {d} != 2 x packed width {d2}")
    if c % 128 and not interpret:
        raise ValueError(f"list capacity {c} must be a multiple of 128 "
                         "for the Pallas probe (Mosaic lane alignment)")
    if d2 % 128 and not interpret:
        raise ValueError(f"packed width {d2} (= dim/2) must be a multiple "
                         "of 128 for the Pallas probe (Mosaic DMA lane "
                         "alignment); use the XLA probe for unaligned dims")
    ncells = b * p
    rb = 2 * RB if (c >= 2 * RB and c % (2 * RB) == 0) else (
        RB if (c >= RB and c % RB == 0) else c)
    if nblocks is None:
        nblocks = jnp.full((l,), c // rb, dtype=jnp.int32)
    else:
        if nblocks.shape != (l,):
            raise ValueError(
                f"nblocks shape {nblocks.shape} != ({l},) — stale layout? "
                "(list count changed since the counts were taken)")
        if rb == 2 * RB:
            nblocks = (nblocks + 1) // 2   # RB-blocks -> 2*RB-blocks
        nblocks = jnp.clip(nblocks, 0, c // rb)

    if codes.dtype != jnp.int8:
        # back-compat for uint8-typed codes: same-width bitcast. NOT free —
        # XLA materializes a corpus-wide copy per dispatch (~0.05 ms at
        # 1M x 768, bench/int4_probe_ab.py); quantize_int4 emits int8 so
        # the product path never takes this branch.
        codes = lax.bitcast_convert_type(codes, jnp.int8)
    out = pl.pallas_call(
        functools.partial(_probe_kernel_int4, rb=rb),
        out_shape=jax.ShapeDtypeStruct((ncells, c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),    # q
                pl.BlockSpec(memory_space=pl.ANY),     # packed codes (HBM)
                pl.BlockSpec(memory_space=pl.ANY),     # factor (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, c, d2), codes.dtype),
                pltpu.VMEM((2, 8, c), jnp.float32),
                pltpu.SemaphoreType.DMA((2, c // rb)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(probe.reshape(ncells), nblocks.astype(jnp.int32), q, codes, factor)
    return out.reshape(b, p, c)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric",
                                             "rescore", "interpret"))
def pallas_ivf_topk_int4(
    queries: jax.Array,    # [B, D] f32 raw
    centroids: jax.Array,  # [L, D] f32 (unit-norm for cosine/dot)
    codes: jax.Array,      # [L, C, D/2] int8 packed nibbles
    factor: jax.Array,     # [L, 8, C] f32 masked scale/norm
    k: int,
    nprobe: int,
    metric: str = "cosine",
    rescore: int = 0,
    vecs: jax.Array | None = None,   # [L, C, D] rescore shadow (bf16)
    recip: jax.Array | None = None,  # [L, 8, C] f32 (rescore > 0)
    interpret: bool = False,
    cell_mask: jax.Array | None = None,  # [L, C] bool filter
    nblocks: jax.Array | None = None,    # [L] int32 occupied RB-row blocks
) -> Tuple[jax.Array, jax.Array]:
    """(vals, slots) over an int4-resident IVF layout via the DMA probe.

    A quarter of the bf16 probe's DMA bytes per list (384 B/row at D=768):
    ~4x rows/chip and the fastest probe on the bandwidth ladder. With
    ``rescore > 0`` and a shadow plane, the top ``rescore`` int4 candidates
    are exactly rescored (the reference's two-stage shape,
    quantization.rs:151-193) to recover the nibble quantization's rank
    noise."""
    from grape_vector_db_tpu.ops.distance import prepare_queries

    b, d = queries.shape
    l, c, _ = codes.shape
    qp = prepare_queries(queries, metric)
    cq = lax.dot_general(qp, centroids, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    _, probe = lax.top_k(cq, min(nprobe, l))                    # [B, P]

    scores = ivf_probe_scores_int4(qp, probe.astype(jnp.int32), codes, factor,
                                   nblocks=nblocks,
                                   interpret=interpret)         # [B, P, C]
    return finalize_probe_topk(
        qp, probe, scores, k, metric, cell_mask=cell_mask,
        rescore=rescore, vecs=vecs,
        weight_fn=None if vecs is None else (lambda rl, rp: recip[rl, 0, rp]),
    )


def nblocks_from_counts(counts) -> "jax.Array":
    """Per-list occupied RB-row DMA block counts from per-list row counts
    (high-water marks) — the single home for the ceil(counts / RB) rule."""
    c = jnp.asarray(counts)
    return jnp.ceil(c.astype(jnp.float32) / RB).astype(jnp.int32)


def make_factor(scales: jax.Array, norms: jax.Array,
                valid: jax.Array, metric: str = "cosine") -> jax.Array:
    """[L, C] dequant scales + norms + valid -> [L, 8, C] masked factor plane
    for the int8 probe (8-sublane broadcast: Mosaic DMA tiling)."""
    if metric == "cosine":
        f = scales / jnp.maximum(norms, 1e-12)
    else:
        f = scales
    f = jnp.where(valid, f, 0.0)
    return jnp.broadcast_to(f[:, None, :], (f.shape[0], 8, f.shape[1])
                            ).astype(jnp.float32)


def make_recip(norms: jax.Array, valid: jax.Array,
               metric: str = "cosine") -> jax.Array:
    """[L, C] norms + valid -> [L, 8, C] masked score-weight plane: 1/|v|
    for cosine (the in-kernel norm division), 1.0 for dot (raw dots pass
    through). 0 always marks an invalid slot.

    The 8-sublane broadcast satisfies Mosaic's DMA tiling (slices need >=8
    sublanes and 128-aligned lanes; C must be a multiple of 128). Memory
    overhead is 8 * 4 bytes per slot — ~0.4%% of the bf16 vectors."""
    if metric == "cosine":
        r = jnp.where(valid, 1.0 / jnp.maximum(norms, 1e-12), 0.0)
    else:
        r = jnp.where(valid, 1.0, 0.0)
    return jnp.broadcast_to(r[:, None, :], (r.shape[0], 8, r.shape[1])
                            ).astype(jnp.float32)
