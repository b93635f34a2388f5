"""Fused matmul + segment-max Pallas kernel — exact large-corpus top-k at
the streaming roofline.

The two-phase exact engine (ops/distance._segmax_exact_topk) streams the
corpus through an XLA scan that materializes per-chunk score blocks in HBM
before reducing them to segment maxima: measured 5.4 ms per 128-batch at
1M x 768 on v5e vs the ~2 ms HBM roofline (corpus read is the only
irreducible traffic). This kernel fuses the reduction into the matmul
epilogue: each grid step streams one [CB, D] corpus block into VMEM
(auto-pipelined BlockSpec), scores it against the resident query batch with
one MXU dot, and reduces to segment maxima IN VMEM — the [B, N] score plane
never exists; HBM sees the corpus once plus a 32x-smaller segmax plane.

Segments here are STRIDED within each block (column j holds the max of
block columns {j, j + S, j + 2S, ...}, S = CB/32): the in-kernel reduction
is then five fold-by-halves slice-max ops, which lower cleanly in Mosaic
(a [B, CB] -> [B, CB/32, 32] lane reshape would not). Phase 2 expands a
chosen segment back to its 32 member rows with iota arithmetic and rescores
them exactly — the exactness argument is partition-independent: if a true
top-k value lay outside the chosen segments, k segments would each hold a
strictly larger value (see _segmax_exact_topk).

Reference parity: this accelerates the exact search path of the reference's
full-scan cosine (storage.rs:296-339) at 1M+ scale.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["segmax_scores_pallas", "segmax_scores_pallas_contig",
           "segmax2_scores_pallas", "segmax4_scores_pallas",
           "segmax4_sup_scores_pallas",
           "pallas_segmax_topk", "pallas_segmax2_topk",
           "pallas_segmax4_topk", "segmax_pallas_supported", "SEG"]

SEG = 32          # rows per segment (matches ops/distance.SEGMENT)
CB = 4096         # corpus rows per grid step; CB/SEG = 128 keeps the output
                  # block 128-lane aligned (Mosaic minor-dim tiling)


def segmax_pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def _segmax_kernel(q_vmem, vec_vmem, w_vmem, out_vmem):
    """One grid step: score a [CB, D] corpus block, reduce to strided
    segment maxima [B, CB/SEG]."""
    # f32 storage must not silently demote to bf16 inside the MXU — the
    # exact contract requires phase-1 maxima at the same precision phase 2
    # rescores with (same rule as ops/distance.score_block).
    precision = (lax.Precision.HIGHEST if vec_vmem.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        q_vmem[...].astype(vec_vmem.dtype), vec_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                      # [B, CB]
    w = w_vmem[0:1, :]                                     # [1, CB]
    # select-style mask (not an additive bias): -inf is safe under where,
    # and unlike a -1e9 sentinel cannot outrank a legitimate large-negative
    # dot-metric score
    scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
    # five fold-by-halves: column j accumulates max over {j, j+S, j+2S, ...}
    cur = scores
    width = scores.shape[1]
    while width > scores.shape[1] // SEG:
        half = width // 2
        cur = jnp.maximum(cur[:, :half], cur[:, half:width])
        width = half
    out_vmem[...] = cur


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmax_scores_pallas(
    q: jax.Array,        # [B, D] f32 prepared (normalized for cosine)
    vectors: jax.Array,  # [N, D] bf16/f32, N % CB == 0, D % 128 == 0
    w_plane: jax.Array,  # [8, N] f32 validity-masked weight (0 = invalid)
    interpret: bool = False,
) -> jax.Array:
    """[B, N/SEG] f32 strided segment maxima (block-major: segment
    g = blk * (CB/SEG) + j covers rows blk*CB + j + m*(CB/SEG))."""
    b, d = q.shape
    n = vectors.shape[0]
    if n % CB:
        raise ValueError(f"N={n} must be a multiple of {CB}")
    if d % 128 and not interpret:
        raise ValueError(f"D={d} must be 128-aligned for the Pallas kernel")
    nblocks = n // CB
    kwargs = {}
    if not interpret:
        # At B=128 the strided kernel sits just under Mosaic's 16 MB scoped
        # VMEM default; the B=256 routing cap (ops/distance.scored_topk)
        # would blow it. Same remedy as the contig kernel: raise the cap
        # (v5e has 128 MB of VMEM) instead of shrinking the 6.3 MB corpus
        # block that keeps the DMA at streaming bandwidth.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024,
        )
    return pl.pallas_call(
        _segmax_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n // SEG), jnp.float32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),            # q resident
            pl.BlockSpec((CB, d), lambda i: (i, 0)),           # corpus block
            pl.BlockSpec((8, CB), lambda i: (0, i)),           # weight block
        ],
        out_specs=pl.BlockSpec((b, CB // SEG), lambda i: (0, i)),
        interpret=interpret,
        **kwargs,
    )(q, vectors, w_plane)


def _segmax2_kernel(q_vmem, vec_vmem, w_vmem, mrow_vmem,
                    m1_vmem, i1_vmem, m2_vmem):
    """One grid step: score a [CB, D] corpus block, reduce each strided
    segment to its TOP-2 values + the argmax MEMBER index.

    The extra m2 plane buys phase 2 a provable shrink: a segment can hide a
    top-k row beyond its maximum only if its SECOND value beats the global
    k-th — and at most floor(k/2) segments can (each such segment holds two
    rows above the threshold). So only the top-floor(k/2) segments by m2
    need their members gathered, and every other candidate row (each
    segment's argmax) is already known as (m1, i1) — no gather.

    Argmax recovery: carrying an iota-derived id plane through the fold
    slices crashes Mosaic (lazily-replicated iota hits the
    vector_extract_strided_slice "limits <= dim" check on v5e), so instead
    the folded m1 is strided-expanded back over the block (lane-concat of
    SEG copies), compared for equality against the scores, and the member
    index of the (first) hit is extracted by a min-fold over the constant
    member-index input plane."""
    precision = (lax.Precision.HIGHEST if vec_vmem.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        q_vmem[...].astype(vec_vmem.dtype), vec_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                      # [B, CB]
    w = w_vmem[0:1, :]
    scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
    cb = scores.shape[1]
    # top-2 fold; the first step is special-cased (top-2 of a pair is
    # (max, min)) so no -inf init plane is ever sliced
    half = cb // 2
    a1, b1 = scores[:, :half], scores[:, half:]
    m1 = jnp.maximum(a1, b1)
    m2 = jnp.minimum(a1, b1)
    width = half
    while width > cb // SEG:
        half = width // 2
        a1, b1 = m1[:, :half], m1[:, half:width]
        a2, b2 = m2[:, :half], m2[:, half:width]
        m1 = jnp.maximum(a1, b1)
        m2 = jnp.maximum(jnp.minimum(a1, b1), jnp.maximum(a2, b2))
        width = half
    # member-index recovery: column c of the block belongs to segment
    # j = c % spb with member m = c // spb, so lane-concat of SEG copies of
    # m1 puts each segment's max at all of its member columns
    tiled = jnp.concatenate([m1] * SEG, axis=1)            # [B, CB]
    mrow = mrow_vmem[0:1, :]                               # [1, CB] m-index
    sel = jnp.where(scores == tiled, mrow, float(SEG))
    width = cb
    while width > cb // SEG:
        half = width // 2
        sel = jnp.minimum(sel[:, :half], sel[:, half:width])
        width = half
    m1_vmem[...] = m1
    i1_vmem[...] = sel                                     # member index f32
    m2_vmem[...] = m2


@functools.partial(jax.jit, static_argnames=("interpret", "impl"))
def segmax2_scores_pallas(
    q: jax.Array,        # [B, D] f32 prepared (normalized for cosine)
    vectors: jax.Array,  # [N, D] bf16/f32, N % CB == 0, D % 128 == 0
    w_plane: jax.Array,  # [8, N] f32 validity-masked weight (0 = invalid)
    interpret: bool = False,
    impl: str = "eqfold",  # "eqfold" | "selfold" (member-index recovery)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(m1, i1, m2): [B, N/SEG] top-2 strided segment values + argmax
    MEMBER index (f32 in [0, SEG); block-major segment numbering, same as
    segmax_scores_pallas). Global row of segment g's argmax =
    (g // (CB//SEG)) * CB + g % (CB//SEG) + i1 * (CB//SEG)."""
    b, d = q.shape
    n = vectors.shape[0]
    if n % CB:
        raise ValueError(f"N={n} must be a multiple of {CB}")
    if d % 128 and not interpret:
        raise ValueError(f"D={d} must be 128-aligned for the Pallas kernel")
    nblocks = n // CB
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    # constant member-index plane: column c holds c // (CB//SEG), the same
    # pattern for every block (8-sublane broadcast, like the weight plane)
    mrow = jnp.broadcast_to(
        (jnp.arange(CB, dtype=jnp.int32) // (CB // SEG)
         ).astype(jnp.float32)[None, :], (8, CB))
    spec_out = pl.BlockSpec((b, CB // SEG), lambda i: (0, i))
    kernel = (_segmax2_kernel_selfold if impl == "selfold"
              else _segmax2_kernel)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, n // SEG), jnp.float32),
            jax.ShapeDtypeStruct((b, n // SEG), jnp.float32),
            jax.ShapeDtypeStruct((b, n // SEG), jnp.float32),
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),            # q resident
            pl.BlockSpec((CB, d), lambda i: (i, 0)),           # corpus block
            pl.BlockSpec((8, CB), lambda i: (0, i)),           # weight block
            pl.BlockSpec((8, CB), lambda i: (0, 0)),           # member idx
        ],
        out_specs=(spec_out, spec_out, spec_out),
        interpret=interpret,
        **kwargs,
    )(q, vectors, w_plane, mrow)


def _segmax2_kernel_selfold(q_vmem, vec_vmem, w_vmem, mrow_vmem,
                            m1_vmem, i1_vmem, m2_vmem):
    """Variant of _segmax2_kernel: recover the argmax member index by
    carrying the member-index plane THROUGH the fold with where-selects
    instead of the equality + min-fold pass. The index plane folded here is
    derived from the mrow INPUT (VMEM-resident), not an iota — the Mosaic
    crash that forced the equality workaround was specific to slicing
    lazily-replicated iota-derived planes. Saves the [B, CB] tiled-concat,
    the equality compare against the score plane, and the 5-step min-fold
    (~half the member-recovery VPU work)."""
    precision = (lax.Precision.HIGHEST if vec_vmem.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        q_vmem[...].astype(vec_vmem.dtype), vec_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                      # [B, CB]
    w = w_vmem[0:1, :]
    scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
    mrow = mrow_vmem[0:1, :]                               # [1, CB] f32
    cb = scores.shape[1]
    half = cb // 2
    a1, b1 = scores[:, :half], scores[:, half:]
    ge = a1 >= b1
    m1 = jnp.where(ge, a1, b1)
    m2 = jnp.where(ge, b1, a1)
    i1 = jnp.where(ge, mrow[:, :half], mrow[:, half:])     # [B, half]
    width = half
    while width > cb // SEG:
        half = width // 2
        a1, b1 = m1[:, :half], m1[:, half:width]
        a2, b2 = m2[:, :half], m2[:, half:width]
        ia, ib = i1[:, :half], i1[:, half:width]
        ge = a1 >= b1
        m1 = jnp.where(ge, a1, b1)
        i1 = jnp.where(ge, ia, ib)
        m2 = jnp.maximum(jnp.minimum(a1, b1), jnp.maximum(a2, b2))
        width = half
    m1_vmem[...] = m1
    i1_vmem[...] = i1
    m2_vmem[...] = m2


def _segmax4_core(scores, mrow_vmem):
    """Shared top-4 fold + eqfold member recovery over one block's score
    plane: returns (m1, m2, m3, m4, i1, i2, i3), each [B, CB/SEG]. Factored
    out so the sup-output kernel variant emits the IDENTICAL fold HLO (the
    relay compile cache keys on HLO — the shared body keeps the plain
    kernel's cache entry stable)."""
    cb = scores.shape[1]
    spb = cb // SEG                                        # 128
    qw = cb // 4

    def ce(a, b):  # descending compare-exchange
        return jnp.maximum(a, b), jnp.minimum(a, b)

    # quarter planes: plane p covers block columns {p*qw + c}; folding all
    # four down to width spb makes column j the union over the whole block
    # of columns {j + t*spb}, i.e. exactly strided segment j
    p0 = scores[:, :qw]
    p1 = scores[:, qw:2 * qw]
    p2 = scores[:, 2 * qw:3 * qw]
    p3 = scores[:, 3 * qw:]
    # odd-even sort-4 (descending): (0,1)(2,3)(0,2)(1,3)(1,2)
    a, b = ce(p0, p1)
    c, d = ce(p2, p3)
    a, c = ce(a, c)
    b, d = ce(b, d)
    b, c = ce(b, c)
    m = [a, b, c, d]
    width = qw
    while width > spb:
        half = width // 2
        lo = [x[:, :half] for x in m]
        hi = [x[:, half:width] for x in m]
        # bitonic 4+4 merge, top half: s_i = max(lo_i, hi_{3-i}) holds the
        # union's top-4 and is bitonic; clean up with (0,2)(1,3)(0,1)(2,3)
        s0 = jnp.maximum(lo[0], hi[3])
        s1 = jnp.maximum(lo[1], hi[2])
        s2 = jnp.maximum(lo[2], hi[1])
        s3 = jnp.maximum(lo[3], hi[0])
        s0, s2 = ce(s0, s2)
        s1, s3 = ce(s1, s3)
        s0, s1 = ce(s0, s1)
        s2, s3 = ce(s2, s3)
        m = [s0, s1, s2, s3]
        width = half
    m1, m2, m3, m4 = m                                     # [B, spb] each
    # eqfold member-index recovery for ranks 1..3 (rank 4 needs no index:
    # its segments are fully rescored). On exact rank-value ties (duplicate
    # vectors; likelier under bf16 scoring) the naive equality match would
    # recover the SAME member for every tied rank — returning one row id
    # twice and dropping the other tied row. Break ties by excluding the
    # members already recovered for higher ranks: m_j == m_{j-1} implies
    # the segment's score multiset holds >= j members at that value, so an
    # un-excluded match always exists and ranks 1..3 recover DISTINCT rows.
    mrow = mrow_vmem[0:1, :]                               # [1, CB]
    prev = []                                              # [B, spb] planes
    sels = []
    for mj in (m1, m2, m3):
        tiled = jnp.concatenate([mj] * SEG, axis=1)        # [B, CB]
        hit = scores == tiled
        for ip in prev:
            hit = jnp.logical_and(
                hit, mrow != jnp.concatenate([ip] * SEG, axis=1))
        sel = jnp.where(hit, mrow, float(SEG))
        width = cb
        while width > spb:
            half = width // 2
            sel = jnp.minimum(sel[:, :half], sel[:, half:width])
            width = half
        prev.append(sel)
        sels.append(sel)
    return m1, m2, m3, m4, sels[0], sels[1], sels[2]


def _segmax4_kernel(q_vmem, vec_vmem, w_vmem, mrow_vmem,
                    m1_vmem, m2_vmem, m3_vmem, m4_vmem,
                    i1_vmem, i2_vmem, i3_vmem):
    """One grid step: score a [CB, D] corpus block, reduce each strided
    segment to its TOP-4 values + the member indices of ranks 1..3.

    Why top-4: the phase-2 wall of the top-2 engine is the rescore row
    gather, which is per-ROW bound (~38 ns/row on v5e, dtype-independent —
    CLAUDE.md "binary_profile3"), so the only lever is the number of rows
    gathered. With top-j values and member indices for j <= 3, a rank-j
    top-k row is a KNOWN candidate (no gather) for j <= 3, and a segment
    can hide a rank->=4 row only if its FOURTH value reaches the global
    k-th — at most floor(k/4) segments can (each holds four rows at or
    above the threshold). The rescore gather shrinks floor(k/2) ->
    floor(k/4) segments (k=10: 160 -> 64 rows/query) and for k <= 3
    disappears entirely.

    Fold: the block is split into four width-CB/4 quarter planes, sorted
    descending with a 5-compare-exchange odd-even network, then folded by
    halves with a bitonic 4+4 merge (reverse-pair max stage + 4-element
    bitonic cleanup, 8 compare-exchanges/step) — values only, no index
    carries. Member indexes for ranks 1..3 are then recovered with the
    eqfold trick (strided-expand the rank plane over the block, compare
    against the scores, min-fold the constant member-index plane); on
    exact ties between rank values the recovered members collide, which
    duplicates a row at EQUAL value in the candidate pool — interchangeable
    under the same tie convention as _verified_exact_topk."""
    precision = (lax.Precision.HIGHEST if vec_vmem.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        q_vmem[...].astype(vec_vmem.dtype), vec_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                      # [B, CB]
    w = w_vmem[0:1, :]
    scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
    m1, m2, m3, m4, i1, i2, i3 = _segmax4_core(scores, mrow_vmem)
    i1_vmem[...] = i1
    i2_vmem[...] = i2
    i3_vmem[...] = i3
    m1_vmem[...] = m1
    m2_vmem[...] = m2
    m3_vmem[...] = m3
    m4_vmem[...] = m4


def _segmax4_sup_kernel(q_vmem, vec_vmem, w_vmem, mrow_vmem, lane_vmem,
                        m1_vmem, m2_vmem, m3_vmem, m4_vmem,
                        i1_vmem, i2_vmem, i3_vmem, s1_vmem, s2_vmem):
    """_segmax4_kernel plus per-BLOCK supersegment maxima of the m1/m2
    planes as two extra [B, nblocks] outputs, written one lane per grid
    step into a revisited [B, W] output block (W = lanes per out block;
    grid step i writes lane i % W of out block i // W).

    Why: phase 2's two full-plane selections each start with a [B, N/SEG]
    -> [B, nblocks] contiguous-fan reduce — a full extra HBM pass over each
    16.7 MB plane (B=128 @ 1M) that the kernel can emit for free behind
    the corpus DMA. Block i's segments are exactly the contiguous range
    [i*spb, (i+1)*spb) of the global plane (block-major numbering), so
    s1[:, i] == m1_plane[:, i*spb:(i+1)*spb].max(axis=1) — the same
    supersegment partition _twolevel_topk(fan=spb) builds on the fly.

    The lane-index plane arrives as an INPUT (like mrow): comparing lanes
    against a program_id-derived scalar avoids materializing an iota in
    VMEM (lazily-replicated iota slicing crashes Mosaic on v5e)."""
    precision = (lax.Precision.HIGHEST if vec_vmem.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        q_vmem[...].astype(vec_vmem.dtype), vec_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                      # [B, CB]
    w = w_vmem[0:1, :]
    scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
    m1, m2, m3, m4, i1, i2, i3 = _segmax4_core(scores, mrow_vmem)
    i1_vmem[...] = i1
    i2_vmem[...] = i2
    i3_vmem[...] = i3
    m1_vmem[...] = m1
    m2_vmem[...] = m2
    m3_vmem[...] = m3
    m4_vmem[...] = m4
    # supersegment epilogue: cross-lane max of the folded planes, written
    # into this step's lane of the revisited [B, W] output block. The first
    # visit (t == 0) initializes every other lane to -inf instead of
    # reading the (stale) previous window's values.
    wlanes = s1_vmem.shape[1]
    pid = pl.program_id(0)
    t = (pid % wlanes).astype(jnp.float32)
    hit = lane_vmem[0:1, :] == t                           # [1, W]
    first = (pid % wlanes) == 0
    sup1 = jnp.max(m1, axis=1, keepdims=True)              # [B, 1]
    sup2 = jnp.max(m2, axis=1, keepdims=True)
    prev1 = jnp.where(first, -jnp.inf, s1_vmem[...])
    prev2 = jnp.where(first, -jnp.inf, s2_vmem[...])
    s1_vmem[...] = jnp.where(hit, sup1, prev1)
    s2_vmem[...] = jnp.where(hit, sup2, prev2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmax4_scores_pallas(
    q: jax.Array,        # [B, D] f32 prepared (normalized for cosine)
    vectors: jax.Array,  # [N, D] bf16/f32, N % CB == 0, D % 128 == 0
    w_plane: jax.Array,  # [8, N] f32 validity-masked weight (0 = invalid)
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """(m1, m2, m3, m4, i1, i2, i3): [B, N/SEG] top-4 strided segment values
    + rank-1..3 member indices (f32 in [0, SEG); block-major segment
    numbering, same as segmax_scores_pallas)."""
    b, d = q.shape
    n = vectors.shape[0]
    if n % CB:
        raise ValueError(f"N={n} must be a multiple of {CB}")
    if d % 128 and not interpret:
        raise ValueError(f"D={d} must be 128-aligned for the Pallas kernel")
    nblocks = n // CB
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    mrow = jnp.broadcast_to(
        (jnp.arange(CB, dtype=jnp.int32) // (CB // SEG)
         ).astype(jnp.float32)[None, :], (8, CB))
    spec_out = pl.BlockSpec((b, CB // SEG), lambda i: (0, i))
    return pl.pallas_call(
        _segmax4_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, n // SEG), jnp.float32)
            for _ in range(7)),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),            # q resident
            pl.BlockSpec((CB, d), lambda i: (i, 0)),           # corpus block
            pl.BlockSpec((8, CB), lambda i: (0, i)),           # weight block
            pl.BlockSpec((8, CB), lambda i: (0, 0)),           # member idx
        ],
        out_specs=tuple(spec_out for _ in range(7)),
        interpret=interpret,
        **kwargs,
    )(q, vectors, w_plane, mrow)


SUPW = 128        # lanes per supersegment output block (f32 minor tiling)


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmax4_sup_scores_pallas(
    q: jax.Array,        # [B, D] f32 prepared (normalized for cosine)
    vectors: jax.Array,  # [N, D] bf16/f32, N % CB == 0, D % 128 == 0
    w_plane: jax.Array,  # [8, N] f32 validity-masked weight (0 = invalid)
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """segmax4_scores_pallas plus per-BLOCK supersegment maxima of the
    m1/m2 planes: returns (m1, m2, m3, m4, i1, i2, i3, s1, s2) with
    s1/s2 = [B, nblocks] f32 (s1[:, i] == max over block i's segments of
    m1 — the contiguous fan=CB/SEG partition _twolevel_topk builds with a
    full extra HBM pass over each [B, N/SEG] plane; here it rides the
    kernel's VPU shadow behind the corpus DMA). Grid step i writes lane
    i % SUPW of revisited out block i // SUPW; trailing lanes of a partial
    final block are -inf."""
    b, d = q.shape
    n = vectors.shape[0]
    if n % CB:
        raise ValueError(f"N={n} must be a multiple of {CB}")
    if d % 128 and not interpret:
        raise ValueError(f"D={d} must be 128-aligned for the Pallas kernel")
    nblocks = n // CB
    nsup = -(-nblocks // SUPW) * SUPW
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    mrow = jnp.broadcast_to(
        (jnp.arange(CB, dtype=jnp.int32) // (CB // SEG)
         ).astype(jnp.float32)[None, :], (8, CB))
    # lane-index plane as an INPUT (like mrow): comparing against a
    # program_id-derived scalar avoids a VMEM iota (lazily-replicated iota
    # slicing crashes Mosaic on v5e)
    lane = jnp.broadcast_to(
        jnp.arange(SUPW, dtype=jnp.float32)[None, :], (8, SUPW))
    spec_out = pl.BlockSpec((b, CB // SEG), lambda i: (0, i))
    spec_sup = pl.BlockSpec((b, SUPW), lambda i: (0, i // SUPW))
    outs = pl.pallas_call(
        _segmax4_sup_kernel,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, n // SEG), jnp.float32)
             for _ in range(7)]
            + [jax.ShapeDtypeStruct((b, nsup), jnp.float32)
               for _ in range(2)]),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),            # q resident
            pl.BlockSpec((CB, d), lambda i: (i, 0)),           # corpus block
            pl.BlockSpec((8, CB), lambda i: (0, i)),           # weight block
            pl.BlockSpec((8, CB), lambda i: (0, 0)),           # member idx
            pl.BlockSpec((8, SUPW), lambda i: (0, 0)),         # lane idx
        ],
        out_specs=tuple([spec_out for _ in range(7)]
                        + [spec_sup for _ in range(2)]),
        interpret=interpret,
        **kwargs,
    )(q, vectors, w_plane, mrow, lane)
    return outs[:7] + (outs[7][:, :nblocks], outs[8][:, :nblocks])


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "interpret", "select", "impl")
)
def pallas_segmax4_topk(
    queries: jax.Array,   # [B, D] f32 raw
    vectors: jax.Array,   # [N, D] storage dtype
    norms: jax.Array,     # [N] f32
    valid: jax.Array,     # [N] bool
    k: int,
    metric: str = "cosine",
    interpret: bool = False,
    mask: jax.Array | None = None,  # [N] bool filter (True = allowed)
    select: str = "auto",           # "auto" | "iterative" | "twolevel"
    impl: str = "plain",            # "plain" | "sup" (in-kernel supersegs)
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via the top-4-per-segment kernel: ranks 1..3 of every
    segment are KNOWN candidates (value + member index from the kernel, no
    gather), and only the top-floor(k/4) segments by FOURTH value are fully
    rescored — for k <= 3 the result needs no row gather at all.

    impl="sup" runs the kernel variant that also emits per-block
    supersegment maxima of the m1/m2 planes ([B, nblocks] extra outputs,
    VPU work hidden behind the corpus DMA), so both phase-2 selections
    skip their [B, N/SEG]-plane reduce pass and start directly from the
    precomputed supersegment plane (falls back to iterative selection when
    nblocks < picks — tiny corpora).

    Exactness: let tau be the true k-th score. A top-k row r at rank j
    within its segment s has m_j(s) = score(r) >= tau, and s holds j rows
    >= tau — so at most floor(k/j) segments can contain a rank-j top-k row,
    and every one of them outranks any non-qualifying segment on the m_j
    plane. Top-floor(k/j) by m_j therefore surfaces r as the known
    candidate (m_j, i_j) for j <= 3, and for j >= 4 the rescore of
    top-floor(k/4) segments by m_4 covers r (m_4(s) >= score(r) >= tau for
    any rank->=4 row). Boundary ties are interchangeable by value (same
    convention as _verified_exact_topk)."""
    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  prepare_queries)

    n, d = vectors.shape
    b = queries.shape[0]
    if mask is not None:
        valid = jnp.logical_and(valid, mask)
    q = prepare_queries(queries, metric)
    w_plane = make_weight_plane(norms, valid, metric)
    num_seg = n // SEG
    kk = min(k, num_seg)
    if select == "auto":
        select = "twolevel" if num_seg >= 16_384 else "iterative"
    if impl == "sup":
        (m1, m2, m3, m4, i1, i2, i3, s1p, s2p) = segmax4_sup_scores_pallas(
            q, vectors, w_plane, interpret=interpret)
        sel_m1 = functools.partial(_twolevel_topk_pre, sup=s1p)
        sel_m2 = functools.partial(_twolevel_topk_pre, sup=s2p)
    else:
        m1, m2, m3, m4, i1, i2, i3 = segmax4_scores_pallas(
            q, vectors, w_plane, interpret=interpret)      # [B, N/SEG] each
        sel = _twolevel_topk if select == "twolevel" else _iterative_topk
        sel_m1 = sel_m2 = sel
    spb_ = CB // SEG

    def known_rows(mj, ij, rj, selfn):
        vj, segj = selfn(mj, rj)
        memj = jnp.take_along_axis(ij, segj, axis=1).astype(jnp.int32)
        rowsj = (segj // spb_) * CB + segj % spb_ + memj * spb_
        if metric == "cosine":
            vj = jnp.minimum(vj, 1.0)
        return vj, rowsj, segj

    def member_rows(ij, segj):
        memj = jnp.take_along_axis(ij, segj, axis=1).astype(jnp.int32)
        return (segj // spb_) * CB + segj % spb_ + memj * spb_

    v1, rows1, seg1 = known_rows(m1, i1, kk, sel_m1)
    pools_v = [v1]
    pools_rows = [rows1]
    pools_seg = [seg1]
    # Only TWO full-plane selections are ever needed (m1 for the rank-1
    # candidates, m2 for the rank-2 pool): m2 >= m3 >= m4 pointwise, so any
    # segment with m_j >= tau (j >= 3) also has m2 >= tau — and at most
    # floor(k/2) segments can. The rank-3 pool and the rank-4 rescore set
    # are therefore FOUND WITHIN the m2-top-floor(k/2) segments by a tiny
    # [B, r2] gather + top_k, replacing two more full-[B, N/SEG]-plane
    # selection passes (the selections, not the gather, were the measured
    # phase-2 wall after the top-4 flip — bench/SEGMAX_AB.jsonl tag=top4_ab).
    # Boundary ties stay interchangeable by value: a segment excluded by an
    # m2 tie at tau can only hide rows of value exactly tau.
    r2 = min(kk // 2, num_seg)
    r3 = min(kk // 3, r2)
    r4 = min(kk // 4, r2)
    if r2:
        v2, seg2 = sel_m2(m2, r2)
        if metric == "cosine":
            v2 = jnp.minimum(v2, 1.0)
        pools_v.append(v2)
        pools_rows.append(member_rows(i2, seg2))
        pools_seg.append(seg2)
        # degenerate-plane guard for the RESTRICTED selections below: when
        # m2 has fewer finite segments than r2, the selection's tail
        # repeats segment 0 — which can be a real finite segment whose
        # duplicated m3/m4 values would then shadow other qualifying
        # segments out of the restricted top-k
        dup2 = _dup_pick_mask(seg2)                         # [B, r2]
    if r3:
        m3_at = jnp.where(dup2, -jnp.inf,
                          jnp.take_along_axis(m3, seg2, axis=1))  # [B, r2]
        v3, p3 = lax.top_k(m3_at, r3)
        seg3 = jnp.take_along_axis(seg2, p3, axis=1)
        if metric == "cosine":
            v3 = jnp.minimum(v3, 1.0)
        pools_v.append(v3)
        pools_rows.append(member_rows(i3, seg3))
        pools_seg.append(seg3)
    if r4 == 0:
        cand_vals = jnp.concatenate(pools_v, axis=1)
        cand_rows = jnp.concatenate(pools_rows, axis=1)
        fvals, fpos = lax.top_k(cand_vals, kk)
        fidx = jnp.take_along_axis(cand_rows, fpos, axis=1)
        return fvals, fidx.astype(jnp.int32)

    m4_at = jnp.where(dup2, -jnp.inf,
                      jnp.take_along_axis(m4, seg2, axis=1))  # [B, r2]
    _, p4 = lax.top_k(m4_at, r4)
    seg4 = jnp.take_along_axis(seg2, p4, axis=1)  # segments needing rescore
    blk = seg4 // spb_
    j = seg4 % spb_
    mm = jnp.arange(SEG, dtype=jnp.int32)[None, None, :]
    rows4 = (blk[:, :, None] * CB + j[:, :, None] + mm * spb_
             ).reshape(b, r4 * SEG)               # [B, r4*SEG]
    cvecs = vectors[rows4]
    precision = (
        lax.Precision.HIGHEST if vectors.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    dots = jnp.einsum("bd,bcd->bc", q.astype(vectors.dtype), cvecs,
                      preferred_element_type=jnp.float32, precision=precision)
    cnorms = norms[rows4]
    if metric == "cosine":
        cw = 1.0 / jnp.maximum(cnorms, 1e-12)
    else:
        cw = jnp.ones_like(cnorms)
    cw = jnp.where(valid[rows4], cw, 0.0)
    rs = jnp.where(cw == 0.0, -jnp.inf, dots * cw)
    if metric == "cosine":
        rs = jnp.minimum(rs, 1.0)
    # degenerate-plane guard: repeated seg4 picks (fewer finite m4 segments
    # than r4) would rescore the same rows to equal finite values twice
    rs = jnp.where(jnp.repeat(_dup_pick_mask(seg4), SEG, axis=1),
                   -jnp.inf, rs)

    # dedup: known candidates whose segment is fully rescored appear twice —
    # mask the known copy (the rescore copy carries the same value)
    for i in range(len(pools_v)):
        dup = jnp.any(pools_seg[i][:, :, None] == seg4[:, None, :], axis=2)
        pools_v[i] = jnp.where(dup, -jnp.inf, pools_v[i])

    cand_vals = jnp.concatenate(pools_v + [rs], axis=1)
    cand_rows = jnp.concatenate(pools_rows + [rows4], axis=1)
    fvals, fpos = lax.top_k(cand_vals, kk)
    fidx = jnp.take_along_axis(cand_rows, fpos, axis=1)
    return fvals, fidx.astype(jnp.int32)


def _segmax_kernel_contig(q_vmem, vec_vmem, w_vmem, out_vmem):
    """Transposed grid step: score a [CB, D] corpus block into [CB, B] and
    reduce CONTIGUOUS 32-row groups to segment maxima [CB/SEG, B].

    Contiguous membership is the point: phase 2 then gathers each chosen
    segment as ONE [SEG, D] slice (k contiguous 48 KB reads per query)
    instead of SEG scattered single rows — the strided variant's rescore
    gather was the second-largest term in the 1M exact budget. The group
    reduction folds the SUBLANE dimension by halves ([CB, B] viewed as
    [CB/SEG, SEG, B]; leading-dim splits are layout-free in Mosaic, unlike
    lane reshapes)."""
    precision = (lax.Precision.HIGHEST if vec_vmem.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        vec_vmem[...], q_vmem[...].astype(vec_vmem.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                      # [CB, B]
    w = w_vmem[:, 0:1]                                     # [CB, 1]
    scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
    cur = scores.reshape(scores.shape[0] // SEG, SEG, scores.shape[1])
    width = SEG
    while width > 1:
        half = width // 2
        cur = jnp.maximum(cur[:, :half, :], cur[:, half:width, :])
        width = half
    out_vmem[...] = cur[:, 0, :]                           # [CB/SEG, B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmax_scores_pallas_contig(
    q: jax.Array,         # [B, D] f32 prepared (normalized for cosine)
    vectors: jax.Array,   # [N, D] bf16/f32, N % CB == 0, D % 128 == 0
    w_plane_t: jax.Array, # [N, 8] f32 validity-masked weight (0 = invalid)
    interpret: bool = False,
) -> jax.Array:
    """[N/SEG, B] f32 contiguous segment maxima (segment g covers rows
    g*SEG .. g*SEG+SEG-1; transposed output orientation)."""
    b, d = q.shape
    n = vectors.shape[0]
    if n % CB:
        raise ValueError(f"N={n} must be a multiple of {CB}")
    if d % 128 and not interpret:
        raise ValueError(f"D={d} must be 128-aligned for the Pallas kernel")
    nblocks = n // CB
    kwargs = {}
    if not interpret:
        # the transposed dot plane + fold temporaries push the default 16 MB
        # scoped-VMEM budget (~19.9 MB measured at B=128, D=768); v5e has
        # 128 MB of VMEM — raise the Mosaic cap rather than shrink CB (the
        # 6.3 MB corpus block is what keeps the DMA at streaming bandwidth)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024,
        )
    return pl.pallas_call(
        _segmax_kernel_contig,
        out_shape=jax.ShapeDtypeStruct((n // SEG, b), jnp.float32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),            # q resident
            pl.BlockSpec((CB, d), lambda i: (i, 0)),           # corpus block
            pl.BlockSpec((CB, 8), lambda i: (i, 0)),           # weight block
        ],
        out_specs=pl.BlockSpec((CB // SEG, b), lambda i: (i, 0)),
        interpret=interpret,
        **kwargs,
    )(q, vectors, w_plane_t)


def _twolevel_topk(plane: jax.Array, kk: int, fan: int = 128
                   ) -> Tuple[jax.Array, jax.Array]:
    """Exact top-kk over the minor axis via supersegment pre-selection.

    The iterative max-and-mask selection reads the full [B, W] plane kk
    times (~10x 16.7 MB at 1M rows, 0.45 ms measured) — a large phase-2
    term. Reduce the plane to [B, W/fan] supersegment maxima over
    CONTIGUOUS fan-column blocks (one XLA minor-split reshape + reduce:
    ~one pass of traffic), select top-kk there (kk passes over a fan-x
    smaller plane), then top-kk over the chosen supersegments' children.
    Contiguity is the point: the child fetch is a [1, 1, fan] slice-gather
    (XLA lowers it as kk wide vector loads per row), NOT a kk*fan-element
    scattered gather — the strided-partition variant of this idea measured
    SLOWER than iterative selection (0.75 vs 0.45 ms) purely on that
    gather. Exactness is the segment argument one level up: a top-kk
    column's supersegment bounds it from above, so kk better supersegments
    would imply kk better columns; boundary ties are interchangeable by
    value (same convention as _verified_exact_topk)."""
    from grape_vector_db_tpu.ops.distance import _iterative_topk

    b, w = plane.shape
    ns = w // fan
    if ns < kk or w % fan:
        return _iterative_topk(plane, kk)
    p3 = plane.reshape(b, ns, fan)
    sup = p3.max(axis=-1)                                   # [B, ns]
    return _twolevel_from_sup(p3, sup, kk, fan)


def _twolevel_topk_pre(plane: jax.Array, kk: int, sup: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """_twolevel_topk with the supersegment plane PRECOMPUTED (the
    segmax4 sup-kernel emits it behind the corpus DMA), skipping the
    [B, W]-plane reduce pass. sup[:, i] must equal
    plane[:, i*fan:(i+1)*fan].max(axis=1) with fan = W // ns; falls back
    to iterative selection when ns < kk (tiny corpora)."""
    from grape_vector_db_tpu.ops.distance import _iterative_topk

    b, w = plane.shape
    ns = sup.shape[1]
    if ns < kk or w % ns:
        return _iterative_topk(plane, kk)
    fan = w // ns
    return _twolevel_from_sup(plane.reshape(b, ns, fan), sup, kk, fan)


def _twolevel_from_sup(p3: jax.Array, sup: jax.Array, kk: int, fan: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Shared tail: select top-kk supersegments on `sup`, then exact top-kk
    over the chosen contiguous children of p3 = plane.reshape(b, ns, fan)."""
    from grape_vector_db_tpu.ops.distance import _iterative_topk

    b = p3.shape[0]
    _, blks = _iterative_topk(sup, kk)                      # [B, kk]
    cvals = jnp.take_along_axis(p3, blks[:, :, None], axis=1)  # [B, kk, fan]
    # Degenerate-plane guard: when fewer than kk supersegments hold any
    # finite entry, the iterative selection's tail picks repeat over the
    # all--inf remainder (argmax of -inf = 0), so blks can contain
    # DUPLICATES — without masking, a duplicated supersegment's children
    # enter the final top-k twice and displace true rows. Keep only the
    # first occurrence of each supersegment (finite picks are always
    # distinct; only the -inf tail duplicates).
    is_dup = jnp.any(
        (blks[:, :, None] == blks[:, None, :])
        & (jnp.arange(kk)[None, None, :] < jnp.arange(kk)[None, :, None]),
        axis=2)                                             # [B, kk]
    cvals = jnp.where(is_dup[:, :, None], -jnp.inf, cvals)
    cvals = cvals.reshape(b, kk * fan)
    child = (blks[:, :, None] * fan
             + jnp.arange(fan, dtype=jnp.int32)[None, None, :]
             ).reshape(b, kk * fan)
    tv, tp = lax.top_k(cvals, kk)
    return tv, jnp.take_along_axis(child, tp, axis=1)


def _dup_pick_mask(seg: jax.Array) -> jax.Array:
    """[B, r] bool: True where this segment id already appeared at an
    EARLIER position in the same row. The iterative selection's tail picks
    index 0 repeatedly once a plane is all -inf (fewer finite segments than
    picks — e.g. a large-capacity bucket holding few valid docs), and the
    -inf masking is then a no-op; without this mask the duplicated
    segment's rows would be rescored to the same FINITE values twice and
    lax.top_k could emit one row id twice, displacing a true top-k row."""
    r = seg.shape[1]
    return jnp.any(
        (seg[:, :, None] == seg[:, None, :])
        & (jnp.arange(r)[None, None, :] < jnp.arange(r)[None, :, None]),
        axis=2)


def make_weight_plane(norms: jax.Array, valid: jax.Array,
                      metric: str = "cosine") -> jax.Array:
    """[N] norms + validity -> [8, N] f32 score-weight plane (kernel reads
    sublane 0; 8-sublane broadcast keeps Mosaic DMA tiling happy)."""
    if metric == "cosine":
        w = 1.0 / jnp.maximum(norms, 1e-12)
    else:
        w = jnp.ones_like(norms)
    w = jnp.where(valid, w, 0.0)
    return jnp.broadcast_to(w[None, :], (8, w.shape[0])).astype(jnp.float32)


def make_weight_plane_t(norms: jax.Array, valid: jax.Array,
                        metric: str = "cosine") -> jax.Array:
    """[N] norms + validity -> [N, 8] f32 weight plane for the contiguous
    (transposed) kernel; column 0 is read, 8-lane broadcast keeps the DMA
    tile shape legal."""
    if metric == "cosine":
        w = 1.0 / jnp.maximum(norms, 1e-12)
    else:
        w = jnp.ones_like(norms)
    w = jnp.where(valid, w, 0.0)
    return jnp.broadcast_to(w[:, None], (w.shape[0], 8)).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "interpret", "select", "impl")
)
def pallas_segmax2_topk(
    queries: jax.Array,   # [B, D] f32 raw
    vectors: jax.Array,   # [N, D] storage dtype
    norms: jax.Array,     # [N] f32
    valid: jax.Array,     # [N] bool
    k: int,
    metric: str = "cosine",
    interpret: bool = False,
    mask: jax.Array | None = None,  # [N] bool filter (True = allowed)
    select: str = "auto",           # "auto" | "iterative" | "twolevel"
    impl: str = "eqfold",           # member-recovery kernel variant
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via the top-2-per-segment kernel: candidate rows are the
    top-k segment argmaxes (values already exact — no gather) plus a full
    rescore of only the top-floor(k/2) segments by SECOND value.

    Exactness: let tau be the true k-th score. A top-k row r in segment s is
    either s's argmax — then m1(s) = score(r) >= tau puts s in the top-k
    segments by m1 (k segments with larger m1 would mean k larger rows) — or
    not, in which case m2(s) >= score(r) >= tau; every such segment holds
    two rows >= tau, so more than floor(k/2) of them would exceed k rows.
    Boundary ties are interchangeable by value (same convention as
    _verified_exact_topk). For k == 1 the rescore set is empty and the
    result needs no gather at all."""
    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  prepare_queries)

    n, d = vectors.shape
    b = queries.shape[0]
    if mask is not None:
        valid = jnp.logical_and(valid, mask)
    q = prepare_queries(queries, metric)
    w_plane = make_weight_plane(norms, valid, metric)
    m1, i1, m2 = segmax2_scores_pallas(q, vectors, w_plane,
                                       interpret=interpret,
                                       impl=impl)            # [B, N/SEG]
    num_seg = n // SEG
    kk = min(k, num_seg)
    if select == "auto":
        # num_seg is always a multiple of CB/SEG = 128 here (the kernel
        # requires N % CB == 0), so the only gate is enough supersegments
        select = "twolevel" if num_seg >= 16_384 else "iterative"
    sel = _twolevel_topk if select == "twolevel" else _iterative_topk
    spb_ = CB // SEG
    v1, seg1 = sel(m1, kk)                        # candidate argmax rows
    mem1 = jnp.take_along_axis(i1, seg1, axis=1).astype(jnp.int32)
    rows1 = ((seg1 // spb_) * CB + seg1 % spb_ + mem1 * spb_)  # [B, kk]
    if metric == "cosine":
        v1 = jnp.minimum(v1, 1.0)
    r = min(kk // 2, num_seg)
    if r == 0:
        return v1, rows1.astype(jnp.int32)

    _, seg2 = sel(m2, r)                          # segments needing rescore
    spb = CB // SEG
    blk = seg2 // spb
    j = seg2 % spb
    m = jnp.arange(SEG, dtype=jnp.int32)[None, None, :]
    rows2 = (blk[:, :, None] * CB + j[:, :, None] + m * spb
             ).reshape(b, r * SEG)                # [B, r*SEG]
    cvecs = vectors[rows2]
    precision = (
        lax.Precision.HIGHEST if vectors.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    dots = jnp.einsum("bd,bcd->bc", q.astype(vectors.dtype), cvecs,
                      preferred_element_type=jnp.float32, precision=precision)
    cnorms = norms[rows2]
    if metric == "cosine":
        cw = 1.0 / jnp.maximum(cnorms, 1e-12)
    else:
        cw = jnp.ones_like(cnorms)
    cw = jnp.where(valid[rows2], cw, 0.0)
    rs = jnp.where(cw == 0.0, -jnp.inf, dots * cw)
    if metric == "cosine":
        rs = jnp.minimum(rs, 1.0)
    # degenerate-plane guard: repeated seg2 picks (fewer finite m2 segments
    # than r) would rescore the same rows to equal finite values twice
    rs = jnp.where(jnp.repeat(_dup_pick_mask(seg2), SEG, axis=1),
                   -jnp.inf, rs)

    # dedup: argmax candidates whose segment is fully rescored would appear
    # twice — mask the m1 copy (the rescore copy carries the same value)
    dup = jnp.any(seg1[:, :, None] == seg2[:, None, :], axis=2)  # [B, kk]
    v1 = jnp.where(dup, -jnp.inf, v1)

    cand_vals = jnp.concatenate([v1, rs], axis=1)         # [B, kk + r*SEG]
    cand_rows = jnp.concatenate([rows1, rows2], axis=1)
    fvals, fpos = lax.top_k(cand_vals, kk)
    fidx = jnp.take_along_axis(cand_rows, fpos, axis=1)
    return fvals, fidx.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "interpret", "layout", "select")
)
def pallas_segmax_topk(
    queries: jax.Array,   # [B, D] f32 raw
    vectors: jax.Array,   # [N, D] storage dtype
    norms: jax.Array,     # [N] f32
    valid: jax.Array,     # [N] bool
    k: int,
    metric: str = "cosine",
    interpret: bool = False,
    mask: jax.Array | None = None,  # [N] bool filter (True = allowed)
    layout: str = "strided",        # "strided" | "contig"
    select: str = "auto",  # "auto" | "iterative" | "verified" | "twolevel"
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over the shard via the fused segmax kernel + exact
    rescore of the chosen segments' member rows. Same (vals, idxs) contract
    as ops.distance.scored_topk (cosine/dot; euclidean uses the XLA path).

    ``layout="contig"`` uses the transposed kernel whose segments
    are 32 CONTIGUOUS rows, so the rescore gathers k slices per query
    instead of k*SEG scattered rows; "strided" is the original fold-in-lane
    kernel kept for A/B."""
    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  _verified_exact_topk,
                                                  prepare_queries)

    n, d = vectors.shape
    b = queries.shape[0]
    if mask is not None:
        valid = jnp.logical_and(valid, mask)
    q = prepare_queries(queries, metric)
    if layout == "contig":
        w_plane_t = make_weight_plane_t(norms, valid, metric)
        segmax = segmax_scores_pallas_contig(
            q, vectors, w_plane_t, interpret=interpret).T  # [B, N/SEG]
    else:
        w_plane = make_weight_plane(norms, valid, metric)
        segmax = segmax_scores_pallas(q, vectors, w_plane,
                                      interpret=interpret)  # [B, N/SEG]
    num_seg = n // SEG
    kk = min(k, num_seg)
    if select == "auto":
        # num_seg is always a multiple of CB/SEG = 128 (kernel precondition),
        # so auto is a two-way choice; "verified" remains explicit-only
        select = "twolevel" if num_seg >= 16_384 else "iterative"
    if select == "twolevel":
        _, seg_ids = _twolevel_topk(segmax, kk)
    elif select == "iterative":
        _, seg_ids = _iterative_topk(segmax, kk)
    else:
        _, seg_ids = _verified_exact_topk(segmax, kk)

    if layout == "contig":
        # segment g covers rows g*SEG .. g*SEG+SEG-1: gather each as one
        # [SEG, D] slice (contiguous HBM reads, SEG x fewer descriptors)
        rows = (seg_ids[:, :, None] * SEG
                + jnp.arange(SEG, dtype=jnp.int32)[None, None, :]
                ).reshape(b, kk * SEG)                    # [B, kk*SEG]
        cvecs = vectors.reshape(n // SEG, SEG, d)[seg_ids]  # [B, kk, SEG, D]
        cvecs = cvecs.reshape(b, kk * SEG, d)
    else:
        # strided member-row expansion: segment g = blk * spb + j covers
        # rows blk*CB + j + m*(CB/SEG), m in [0, SEG)
        spb = CB // SEG
        blk = seg_ids // spb
        j = seg_ids % spb
        m = jnp.arange(SEG, dtype=jnp.int32)[None, None, :]
        rows = (blk[:, :, None] * CB + j[:, :, None] + m * spb
                ).reshape(b, kk * SEG)                    # [B, kk*SEG]
        cvecs = vectors[rows]
    precision = (
        lax.Precision.HIGHEST if vectors.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    dots = jnp.einsum("bd,bcd->bc", q.astype(vectors.dtype), cvecs,
                      preferred_element_type=jnp.float32, precision=precision)
    # Same arithmetic form as phase 1 (multiply by masked reciprocal, not
    # divide): the segment-bound exactness argument needs both phases to
    # produce identical scores for identical rows.
    cnorms = norms[rows]
    if metric == "cosine":
        cw = 1.0 / jnp.maximum(cnorms, 1e-12)
    else:
        cw = jnp.ones_like(cnorms)
    cw = jnp.where(valid[rows], cw, 0.0)
    rs = jnp.where(cw == 0.0, -jnp.inf, dots * cw)
    if metric == "cosine":
        rs = jnp.minimum(rs, 1.0)
    # degenerate-plane guard: repeated seg_ids picks (fewer finite segments
    # than kk) would rescore the same rows to equal finite values twice
    rs = jnp.where(jnp.repeat(_dup_pick_mask(seg_ids), SEG, axis=1),
                   -jnp.inf, rs)
    fvals, fpos = lax.top_k(rs, min(k, rs.shape[1]))
    fidx = jnp.take_along_axis(rows, fpos, axis=1)
    return fvals, fidx.astype(jnp.int32)
