"""Tiny Mosaic lowering probe: which int4-unpack variant compiles on TPU?

The full int4 probe kernel failed to lower with
`Unsupported cast: uint8 -> bfloat16`. This compiles a minimal kernel per
candidate unpack recipe and reports lower/compile/run status for each, so
the real kernel can use a recipe known to work (CLAUDE.md: iterate on a
tiny kernel, not the 1M-layout one).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, D2 = 128, 384


def variant_i8_shift(p8):
    # int8 bitwise ops; arithmetic >> then mask
    lo = jnp.bitwise_and(p8, jnp.int8(0xF)).astype(jnp.bfloat16)
    hi = jnp.bitwise_and(jnp.right_shift(p8, 4),
                         jnp.int8(0xF)).astype(jnp.bfloat16)
    return lo - jnp.bfloat16(8), hi - jnp.bfloat16(8)


def variant_i32_widen(p8):
    # widen to int32 first, shift there, cast int32 -> f32 -> bf16
    p32 = p8.astype(jnp.int32)
    p32 = jnp.where(p32 < 0, p32 + 256, p32)  # recover unsigned byte
    lo = jnp.bitwise_and(p32, 0xF).astype(jnp.float32).astype(jnp.bfloat16)
    hi = jnp.bitwise_and(jnp.right_shift(p32, 4),
                         0xF).astype(jnp.float32).astype(jnp.bfloat16)
    return lo - jnp.bfloat16(8), hi - jnp.bfloat16(8)


def variant_u8_bitcast(pu8):
    # nibble math in uint8, pltpu.bitcast to int8 just for the f-cast
    lo_u = jnp.bitwise_and(pu8, jnp.uint8(0xF))
    hi_u = jnp.right_shift(pu8, jnp.uint8(4))
    lo = pltpu.bitcast(lo_u, jnp.int8).astype(jnp.bfloat16)
    hi = pltpu.bitcast(hi_u, jnp.int8).astype(jnp.bfloat16)
    return lo - jnp.bfloat16(8), hi - jnp.bfloat16(8)


VARIANTS = {
    "i8_shift": (jnp.int8, variant_i8_shift),
    "i32_widen": (jnp.int8, variant_i32_widen),
    "u8_bitcast": (jnp.uint8, variant_u8_bitcast),
}


def make_fn(name):
    dtype, unpack = VARIANTS[name]

    def kernel(q_vmem, codes_vmem, out_vmem):
        lo, hi = unpack(codes_vmem[...])
        dn = (((1,), (1,)), ((), ()))
        out_vmem[...] = (
            lax.dot_general(q_vmem[:, :D2].astype(jnp.bfloat16), lo,
                            dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
            + lax.dot_general(q_vmem[:, D2:].astype(jnp.bfloat16), hi,
                              dimension_numbers=dn,
                              preferred_element_type=jnp.float32))

    @jax.jit
    def fn(q, codes):
        if codes.dtype != dtype:
            codes = lax.bitcast_convert_type(codes, dtype)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        )(q, codes)

    return fn


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 256, (C, D2), dtype=np.uint8))
    q = jnp.asarray(rng.standard_normal((8, 2 * D2)), jnp.float32)

    # ground truth on host
    cu = np.asarray(codes)
    lo = (cu & 0xF).astype(np.float32) - 8
    hi = (cu >> 4).astype(np.float32) - 8
    qh = np.asarray(q)
    want = (qh[:, :D2].astype(np.float32) @ lo.T
            + qh[:, D2:].astype(np.float32) @ hi.T)

    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            out = np.asarray(make_fn(name)(q, codes))
            err = float(np.max(np.abs(out - want)) / np.max(np.abs(want)))
            print(f"{name:12s} OK   rel_err={err:.4f}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name:12s} FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
