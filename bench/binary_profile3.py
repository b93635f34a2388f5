"""Part 3: is the rescore gather per-BYTE or per-ROW bound?

binary_profile2.py showed the [128, 1024]-row computed-index gather is a
hard ~41 GB/s wall in XLA regardless of gather formulation (2d/flat/sorted/
take all ~4.94 ms on bf16 768-d rows). If the cost is per-byte, gathering
int8 rows (half the bytes) should halve it -> an int8 rescore tier for the
binary index wins speed AND capacity (868 B/row vs 1632). If it is
per-row, dtype won't matter and the only lever is the rescore budget.

Run: timeout 1800 python bench/binary_profile3.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, DIM, N, R, ITERS = 128, 768, 131_072, 1024, 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.hamming import hamming_topk, pack_bits

    key = random.PRNGKey(0)
    kv, kq = random.split(key)
    vecs_f = random.normal(kv, (N, DIM), jnp.float32)
    v_bf16 = vecs_f.astype(jnp.bfloat16)
    scale = jnp.max(jnp.abs(vecs_f), axis=1, keepdims=True) / 127.0
    v_int8 = jnp.clip(jnp.round(vecs_f / scale), -127, 127).astype(jnp.int8)
    factor = scale[:, 0]
    v_half = vecs_f[:, ::2].astype(jnp.bfloat16)          # 384-d bf16
    queries = random.normal(kq, (B, DIM), jnp.float32)
    codes = pack_bits(vecs_f, 0.0)
    valid = jnp.ones((N,), jnp.bool_)

    def timed(fn, *ops, its=ITERS):
        @jax.jit
        def loop(q, *rest):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                out = fn(qq, *rest)
                leaf = out[0] if isinstance(out, tuple) else out
                leaf = leaf[0, 0] if leaf.ndim else leaf
                return acc * 0.5 + leaf.astype(jnp.float32) * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(loop(*ops)))
        return max(time.perf_counter() - t0 - 0.025, 1e-9) * 1e3 / its

    def sel(q):
        qc = pack_bits(q, 0.0)
        return hamming_topk(qc, codes, valid, k=R, chunk=N, impl="mxu")

    out = {}

    def g_bf16(q, v):
        _, cand = sel(q)
        return jnp.sum(v[cand].astype(jnp.float32), axis=(1, 2))[None, :]

    out["gather_bf16_768"] = round(timed(g_bf16, queries, v_bf16), 3)

    def g_int8(q, v):
        _, cand = sel(q)
        return jnp.sum(v[cand].astype(jnp.float32), axis=(1, 2))[None, :]

    out["gather_int8_768"] = round(timed(g_int8, queries, v_int8), 3)

    def g_half(q, v):
        _, cand = sel(q)
        return jnp.sum(v[cand].astype(jnp.float32), axis=(1, 2))[None, :]

    out["gather_bf16_384"] = round(timed(g_half, queries, v_half), 3)

    # full int8 rescore: gather int8 rows + per-row factor, dot in bf16
    def full_int8(q, v, f):
        d, cand = sel(q)
        rows = v[cand].astype(jnp.bfloat16)                # [B, R, D]
        fr = f[cand]                                       # [B, R]
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        dots = jnp.einsum("bd,brd->br", qn.astype(jnp.bfloat16), rows,
                          preferred_element_type=jnp.float32) * fr
        vals, pos = lax.top_k(dots, 10)
        idx = jnp.take_along_axis(cand, pos, axis=1)
        return vals, idx

    out["rescore_int8_full"] = round(timed(full_int8, queries, v_int8,
                                           factor), 3)

    print(json.dumps({"stage": "binary_profile3", "n": N, "r": R, **out}),
          flush=True)


if __name__ == "__main__":
    main()
