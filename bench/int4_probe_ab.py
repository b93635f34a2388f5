"""A/B the REAL int4 Pallas probe's overheads at 1M x 768, nprobe=1.

bench/int4_unpack_ab.py (ITERS=200) showed the unpack compute gap is small:
i32_widen_where 0.088 ms vs i32_nowhere 0.053 ms per 128 cells (int8_ref
0.054), and neither explains the probe's measured 0.207 ms vs int8's
0.049 ms. Chief remaining suspect: `ivf_probe_scores_int4` bitcasts the
ENTIRE [L, C, D/2] uint8 codes array to int8 inside the jit on every
dispatch — if XLA materializes that copy it is ~0.15 GB of HBM traffic
(~0.19 ms) at 1M rows. Variants:

  cur      : production path (uint8 operand, in-jit bitcast, widen_where)
  i8op     : int8 operand, NO in-jit bitcast, same kernel
  nowhere  : i8op + i32_nowhere unpack (offset folded into the dot)
  rb128    : nowhere + rb=128 (DMA blocks the same byte size as int8's)
  int8ref  : the production int8 probe on the same layout (the floor)

Run: timeout 2400 python bench/int4_probe_ab.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, B, C, L, ITERS = 768, 128, 640, 1600, 32   # ~1.02M rows
D2 = DIM // 2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from grape_vector_db_tpu.ops.ivf_pallas import (
        _probe_kernel_int4, _ragged_cell_dma, ivf_probe_scores_int4,
        ivf_probe_scores_int8)

    key = random.PRNGKey(0)
    codes_u8 = random.randint(key, (L, C, D2), 0, 256, jnp.int32
                              ).astype(jnp.uint8)
    codes_i8 = lax.bitcast_convert_type(codes_u8, jnp.int8)
    codes8 = random.randint(key, (L, C, DIM), -127, 128, jnp.int32
                            ).astype(jnp.int8)
    factor = jnp.ones((L, 8, C), jnp.float32)
    q = random.normal(random.PRNGKey(1), (B, DIM), jnp.float32)
    probe = random.randint(random.PRNGKey(2), (B, 1), 0, L, jnp.int32)
    nblk64 = jnp.full((L,), C // 64, jnp.int32)
    nblk128 = jnp.full((L,), C // 128, jnp.int32)

    def timed(fn, *ops, its=ITERS):
        @jax.jit
        def loop(q, *rest):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                out = fn(qq, *rest)
                return acc * 0.5 + out[0, 0, 0] * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(*ops)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(*ops)))
            best = min(best, time.perf_counter() - t0)
        return max(best - 0.025, 1e-9) * 1e3 / its

    def kernel_nowhere(probe_smem, nblk_smem, q_vmem, codes_hbm, factor_hbm,
                       out_vmem, scratch_c, scratch_f, sem_c, sem_f, rb=64):
        ncells = out_vmem.shape[0]
        start_cell, wait_cell = _ragged_cell_dma(
            probe_smem, nblk_smem, codes_hbm, factor_hbm,
            scratch_c, scratch_f, sem_c, sem_f, rb=rb)
        start_cell(0, 0)
        n_q = q_vmem.shape[0]
        d2 = scratch_c.shape[2]

        def body(cell, _):
            slot = lax.rem(cell, 2)
            nxt = lax.rem(cell + 1, 2)

            @pl.when(cell + 1 < ncells)
            def _():
                start_cell(nxt, cell + 1)

            wait_cell(slot, cell)
            b = cell // (ncells // n_q)
            qrow = q_vmem[pl.ds(b, 1), :]
            p32 = scratch_c[slot].astype(jnp.int32)
            lo = (jnp.bitwise_and(p32, 0xF)
                  .astype(jnp.float32).astype(jnp.bfloat16))
            hi = (jnp.bitwise_and(jnp.right_shift(p32, 4), 0xF)
                  .astype(jnp.float32).astype(jnp.bfloat16))
            qlo = qrow[:, :d2].astype(jnp.bfloat16)
            qhi = qrow[:, d2:].astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))
            dots = (lax.dot_general(qlo, lo, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                    + lax.dot_general(qhi, hi, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))
            dots = dots - 8.0 * jnp.sum(qrow)
            factor = scratch_f[slot][0:1, :]
            scores = jnp.where(factor == 0.0, -1e9, dots * factor)
            out_vmem[pl.ds(cell, 1), :] = scores
            return _

        lax.fori_loop(0, ncells, body, None)

    def make_scores(kern, rb):
        @jax.jit
        def fn(q, probe, codes, factor, nblocks):
            ncells = B * probe.shape[1]
            out = pl.pallas_call(
                functools.partial(kern, rb=rb),
                out_shape=jax.ShapeDtypeStruct((ncells, C), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(1,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((2, C, D2), jnp.int8),
                        pltpu.VMEM((2, 8, C), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, C // rb)),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
            )(probe.reshape(ncells), nblocks, q, codes, factor)
            return out.reshape(B, probe.shape[1], C)

        return fn

    out = {}

    def cur(q, probe, codes, factor, nblocks):
        return ivf_probe_scores_int4(q, probe, codes, factor, nblocks)

    out["cur_u8_bitcast"] = round(timed(cur, q, probe, codes_u8, factor,
                                        nblk64), 3)

    i8op = make_scores(_probe_kernel_int4, 64)
    out["i8op"] = round(timed(i8op, q, probe, codes_i8, factor, nblk64), 3)

    nw = make_scores(kernel_nowhere, 64)
    out["nowhere"] = round(timed(nw, q, probe, codes_i8, factor, nblk64), 3)

    nw128 = make_scores(kernel_nowhere, 128)
    out["nowhere_rb128"] = round(timed(nw128, q, probe, codes_i8, factor,
                                       nblk128), 3)

    def ref8(q, probe, codes, factor, nblocks):
        return ivf_probe_scores_int8(q, probe, codes, factor, nblocks)

    out["int8ref"] = round(timed(ref8, q, probe, codes8, factor, nblk64), 3)

    # correctness: nowhere vs production scores on one dispatch
    a = np.asarray(cur(q, probe, codes_u8, factor, nblk64))
    bv = np.asarray(nw(q, probe, codes_i8, factor, nblk64))
    err = float(np.max(np.abs(a - bv)) / max(np.max(np.abs(a)), 1e-9))
    out["nowhere_rel_err"] = round(err, 6)
    c = np.asarray(nw128(q, probe, codes_i8, factor, nblk128))
    out["rb128_rel_err"] = round(
        float(np.max(np.abs(a - c)) / max(np.max(np.abs(a)), 1e-9)), 6)

    print(json.dumps({"stage": "int4_probe_ab", "rows": L * C, **out}),
          flush=True)


if __name__ == "__main__":
    main()
