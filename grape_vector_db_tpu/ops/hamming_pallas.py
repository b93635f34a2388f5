"""Pallas TPU kernel for the packed-bit Hamming scan.

The XLA path (ops/hamming.py) broadcasts ``[B,1,W] ^ [1,C,W]`` and reduces —
materializing a [B, C, W] int32 intermediate per chunk. This kernel keeps the
word axis in registers: the corpus block lives in VMEM, and a static W-step
loop accumulates ``popcount(q_w ^ c_w)`` directly into the [B, BC] output
block. Per-block traffic drops from (B*C*W + C*W) words to (C*W) words.

Used automatically by BinaryDeviceIndex when running on TPU (DeviceConfig
use_pallas); every other backend (CPU tests, dryruns) uses the XLA fallback.
``interpret=True`` runs the same kernel through the Pallas interpreter for
correctness tests without a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly when a TPU backend exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["hamming_scores_pallas"]

_BLOCK_C = 512  # corpus rows per grid step (codes block: 512 x W uint32)


def _kernel(q_ref, c_ref, out_ref):
    """q_ref [B, W], c_ref [BC, W] (VMEM) -> out_ref [B, BC] int32 distances."""
    w = q_ref.shape[1]
    bc = c_ref.shape[0]
    acc = jnp.zeros((q_ref.shape[0], bc), dtype=jnp.int32)
    for i in range(w):  # static: W = dim/32 (e.g. 24 for 768-d)
        qw = q_ref[:, i:i + 1]                      # [B, 1] uint32
        cw = c_ref[:, i:i + 1].reshape(1, bc)       # [1, BC] uint32
        acc = acc + lax.population_count(jnp.bitwise_xor(qw, cw)).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_scores_pallas(
    qcodes: jax.Array,   # [B, W] uint32
    codes: jax.Array,    # [C, W] uint32, C % _BLOCK_C == 0
    interpret: bool = False,
) -> jax.Array:
    """[B, C] int32 Hamming distances via the Pallas kernel."""
    b, w = qcodes.shape
    c = codes.shape[0]
    assert c % _BLOCK_C == 0, f"corpus block {c} must be a multiple of {_BLOCK_C}"
    grid = (c // _BLOCK_C,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["in_specs"] = [
            pl.BlockSpec((b, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        kwargs["out_specs"] = pl.BlockSpec(
            (b, _BLOCK_C), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    else:
        kwargs["in_specs"] = [
            pl.BlockSpec((b, w), lambda i: (0, 0)),
            pl.BlockSpec((_BLOCK_C, w), lambda i: (i, 0)),
        ]
        kwargs["out_specs"] = pl.BlockSpec((b, _BLOCK_C), lambda i: (0, i))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.int32),
        grid=grid,
        interpret=interpret,
        **kwargs,
    )(qcodes, codes)
