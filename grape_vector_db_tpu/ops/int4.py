"""int4 symmetric quantization — the next rung of the HBM-bandwidth ladder.

The IVF Pallas probe (ops/ivf_pallas.py) is DMA-bound: int8-resident lists
already ~double the bf16 probe by halving the bytes per list. Packed int4
halves them AGAIN (0.5 byte/dim), so the same streaming roofline yields
~2x the int8 probe's query throughput and ~2x its rows/chip.

Packing layout (the part the TPU dictates): Mosaic cannot lower lane-axis
interleaves inside a kernel ([C, D/2, 2] -> [C, D] is illegal), so nibbles
are packed SPLIT-PLANE instead of adjacent-dim: byte ``j`` of a row holds
dim ``j`` in its low nibble and dim ``j + D/2`` in its high nibble. The
kernel then unpacks with two pure elementwise ops —

    lo = (packed & 0xF) - 8      # dims [0,      D/2)
    hi = (packed >> 4)  - 8      # dims [D/2,    D)

— and scores with two MXU dots against the matching query halves:
``dot(q[:, :D/2], lo.T) + dot(q[:, D/2:], hi.T)``. No transpose, no
interleave, no gather; the unpack is VPU work fully hidden behind the next
list's DMA. ``D % 256 == 0`` keeps each half a multiple of the 128-lane
tile (768 -> 384 = 3 x 128).

Codes are offset-binary: ``u = clip(round(v / s), -8, 7) + 8`` with
``s = max|v| / 7`` per row, stored as INT8-typed bytes (bit pattern of the
unsigned packed value). int8 — not uint8 — because Mosaic kernels can only
consume int8, and a uint8-typed corpus forces a corpus-wide
``bitcast_convert_type`` inside every probe dispatch, which XLA
materializes as a real copy (~0.05 ms/dispatch at 1M x 768 — measured in
bench/int4_probe_ab.py). A per-row ``factor`` folds dequantization and the
cosine norm division exactly as the int8 scheme does (ops/int8.py).

No reference analog (quantization.rs only has 1-bit); this engine exists
because the TPU memory system rewards it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantize_int4", "unpack_int4", "unpack_int4_split"]


@jax.jit
def quantize_int4(vecs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[M, D] f32 -> (packed [M, D/2] int8 split-plane, scale [M] f32).

    scale = max|v| / 7; levels -8..7 stored offset-binary (u = q + 8).
    The packed bytes carry the unsigned value's bit pattern in an
    int8-typed array (see module docstring for why int8).
    D must be even (capacity dims are 128-aligned everywhere above this).
    """
    vf = vecs.astype(jnp.float32)
    m, d = vf.shape
    assert d % 2 == 0, f"int4 packing needs an even dim, got {d}"
    s = jnp.max(jnp.abs(vf), axis=1) / 7.0
    q = jnp.clip(jnp.round(vf / jnp.maximum(s, 1e-12)[:, None]), -8, 7)
    u = (q + 8.0).astype(jnp.uint8)                       # [M, D] in 0..15
    lo, hi = u[:, : d // 2], u[:, d // 2:]
    packed = jnp.bitwise_or(lo, jnp.left_shift(hi, 4))    # [M, D/2]
    return jax.lax.bitcast_convert_type(packed, jnp.int8), s


@jax.jit
def unpack_int4_split(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., D/2] int8/uint8 -> (lo [..., D/2], hi [..., D/2]) f32 in -8..7.

    ``lo`` holds dims [0, D/2), ``hi`` holds dims [D/2, D) — the same two
    planes the Pallas kernel materializes; callers dot each against the
    matching query half (or concatenate for a full row). Accepts either
    byte dtype: the int32 widen + mask recovers the unsigned nibbles from
    int8-typed storage and is a no-op rearrangement for uint8.
    """
    p32 = packed.astype(jnp.int32)
    lo = jnp.bitwise_and(p32, 0xF).astype(jnp.float32) - 8.0
    hi = jnp.bitwise_and(jnp.right_shift(p32, 4), 0xF).astype(jnp.float32) - 8.0
    return lo, hi


@jax.jit
def unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., D/2] int8/uint8 -> [..., D] f32 dequantized levels (unscaled)."""
    lo, hi = unpack_int4_split(packed)
    return jnp.concatenate([lo, hi], axis=-1)
