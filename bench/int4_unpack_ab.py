"""A/B the int4 probe's per-cell unpack recipes (compute-bound suspect).

bench.py measured the raw int4 probe SLOWER than int8 (0.207 vs 0.049 ms at
1M nprobe=1) despite DMAing half the bytes — the unpack chain
(int8->int32 widen, where(+256), and/shift, ->f32->bf16) is VPU-bound and
dwarfs the DMA saving. This times unpack variants in a synthetic kernel that
mirrors the probe's per-cell work (128 cells x [640, 384] packed block in
VMEM, unpack + two MXU dots each) with no DMA, so differences are pure
compute:

  i32_widen_where : the current production recipe
  i32_nowhere     : drop where/add — `& 0xF` works on the sign-extended
                    int32 directly, `(>> 4) & 0xF` masks the arithmetic
                    shift's sign bits; the -8 offset folds into the dot
                    (dot(q, u-8) = dot(q, u) - 8*sum(q))
  i8_shift        : nibble math in int8 + direct int8->bf16 casts
  bf16_arith      : ONE int8->bf16 cast, then pure bf16 math: u = p + 256
                    if p<0; hi = floor(u/16); lo = u - 16*hi (all exact in
                    bf16 for u <= 255); offsets fold into the dot
  int8_ref        : the int8 kernel's work shape ([640, 768] int8 -> bf16,
                    one dot) as the floor to beat

Run: timeout 1800 python bench/int4_unpack_ab.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C, D2, CELLS, ITERS = 640, 384, 128, 200
D = 2 * D2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dn = (((1,), (1,)), ((), ()))

    def unpack_i32_widen_where(p8):
        p32 = p8.astype(jnp.int32)
        p32 = jnp.where(p32 < 0, p32 + 256, p32)
        lo = (jnp.bitwise_and(p32, 0xF).astype(jnp.float32)
              .astype(jnp.bfloat16) - jnp.bfloat16(8.0))
        hi = (jnp.right_shift(p32, 4).astype(jnp.float32)
              .astype(jnp.bfloat16) - jnp.bfloat16(8.0))
        return lo, hi, False

    def unpack_i32_nowhere(p8):
        p32 = p8.astype(jnp.int32)
        lo = (jnp.bitwise_and(p32, 0xF).astype(jnp.float32)
              .astype(jnp.bfloat16))
        hi = (jnp.bitwise_and(jnp.right_shift(p32, 4), 0xF)
              .astype(jnp.float32).astype(jnp.bfloat16))
        return lo, hi, True          # offset folded into the dot

    def unpack_i8_shift(p8):
        lo = jnp.bitwise_and(p8, jnp.int8(0xF)).astype(jnp.bfloat16)
        hi = jnp.bitwise_and(jnp.right_shift(p8, 4),
                             jnp.int8(0xF)).astype(jnp.bfloat16)
        return lo, hi, True

    def unpack_bf16_arith(p8):
        pf = p8.astype(jnp.bfloat16)
        u = jnp.where(pf < 0, pf + jnp.bfloat16(256.0), pf)
        hi = jnp.floor(u * jnp.bfloat16(1.0 / 16.0))
        lo = u - jnp.bfloat16(16.0) * hi
        return lo, hi, True

    VARIANTS = {
        "i32_widen_where": unpack_i32_widen_where,
        "i32_nowhere": unpack_i32_nowhere,
        "i8_shift": unpack_i8_shift,
        "bf16_arith": unpack_bf16_arith,
    }

    def make_int4(name):
        unpack = VARIANTS[name]

        def kernel(q_vmem, codes_vmem, out_vmem):
            def body(cell, _):
                b = cell % q_vmem.shape[0]
                qrow = q_vmem[pl.ds(b, 1), :]
                lo, hi, folded = unpack(codes_vmem[...])
                qlo = qrow[:, :D2].astype(jnp.bfloat16)
                qhi = qrow[:, D2:].astype(jnp.bfloat16)
                dots = (lax.dot_general(qlo, lo, dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)
                        + lax.dot_general(qhi, hi, dimension_numbers=dn,
                                          preferred_element_type=jnp.float32))
                if folded:
                    dots = dots - 8.0 * jnp.sum(qrow.astype(jnp.bfloat16)
                                                .astype(jnp.float32))
                out_vmem[pl.ds(cell, 1), :] = dots
                return _
            lax.fori_loop(0, CELLS, body, None)

        @jax.jit
        def fn(q, codes):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((CELLS, C), jnp.float32),
            )(q, lax.bitcast_convert_type(codes, jnp.int8))

        return fn

    def make_int8_ref():
        def kernel(q_vmem, codes_vmem, out_vmem):
            def body(cell, _):
                b = cell % q_vmem.shape[0]
                qrow = q_vmem[pl.ds(b, 1), :]
                lst = codes_vmem[...].astype(jnp.bfloat16)
                out_vmem[pl.ds(cell, 1), :] = lax.dot_general(
                    qrow.astype(jnp.bfloat16), lst, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                return _
            lax.fori_loop(0, CELLS, body, None)

        @jax.jit
        def fn(q, codes8):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((CELLS, C), jnp.float32),
            )(q, codes8)

        return fn

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 256, (C, D2), dtype=np.uint8))
    codes8 = jnp.asarray(rng.integers(-127, 128, (C, D), dtype=np.int8))
    q = jnp.asarray(rng.standard_normal((8, D)), jnp.float32)

    # ground truth for the int4 variants
    cu = np.asarray(codes)
    lo = (cu & 0xF).astype(np.float32) - 8
    hi = (cu >> 4).astype(np.float32) - 8
    qh = np.asarray(q).astype(np.float32)
    qb = qh.astype(jnp.bfloat16).astype(np.float32)
    want = qb[:, :D2] @ lo.T + qb[:, D2:] @ hi.T

    def timed(fn, *ops):
        @jax.jit
        def loop(q, *rest):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                out = fn(qq, *rest)
                return acc * 0.5 + out[0, 0] * 1e-6
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))

        float(np.asarray(loop(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(loop(*ops)))
        return max(time.perf_counter() - t0 - 0.025, 1e-9) * 1e3 / ITERS

    results = {}
    for name in VARIANTS:
        try:
            fn = make_int4(name)
            out = np.asarray(fn(q, codes))
            err = float(np.max(np.abs(out[:8] - want))
                        / max(np.max(np.abs(want)), 1e-9))
            ms = timed(fn, q, codes)
            results[name] = {"ms": round(ms, 3), "rel_err": round(err, 5)}
            print(f"{name:16s} OK   {ms:7.3f} ms/{CELLS}cells rel_err={err:.5f}",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            results[name] = {"error": f"{type(e).__name__}: {msg}"}
            print(f"{name:16s} FAIL {type(e).__name__}: {msg}", flush=True)

    try:
        fn8 = make_int8_ref()
        np.asarray(fn8(q, codes8))
        ms = timed(fn8, q, codes8)
        results["int8_ref"] = {"ms": round(ms, 3)}
        print(f"{'int8_ref':16s} OK   {ms:7.3f} ms/{CELLS}cells", flush=True)
    except Exception as e:
        print(f"int8_ref FAIL {e}", flush=True)

    print(json.dumps({"stage": "int4_unpack_ab", "cells": CELLS, "c": C,
                      "d2": D2, **results}), flush=True)


if __name__ == "__main__":
    main()
