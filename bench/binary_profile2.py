"""Part 2: isolate the binary row's real cost — the candidate-row gather.

binary_profile.py decomposed: prescan+sel 0.668 ms, end-to-end 7.16 ms.
The rescore-only stage timed 0.318 ms but its gather indices were
loop-INVARIANT there, so XLA hoisted the [B, R]-row gather out of the timing
loop — the honest per-iteration cost of `vectors[cand]` with computed
indices is the missing ~6 ms (201 MB at ~32 GB/s, 3x below the documented
~97 GB/s flat row-gather rate). This times gather shapes/variants with
loop-dependent indices to find what's slow and what to do.

Run: timeout 1800 python bench/binary_profile2.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, DIM, N, ITERS = 128, 768, 131_072, 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.index.binary import _rescore_topk
    from grape_vector_db_tpu.ops.hamming import hamming_topk, pack_bits

    key = random.PRNGKey(0)
    kv, kq = random.split(key)
    vecs_f = random.normal(kv, (N, DIM), jnp.float32)
    vectors = vecs_f.astype(jnp.bfloat16)
    norms = jnp.linalg.norm(vecs_f, axis=1)
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

    out = {}

    def sel(q, r):
        qc = pack_bits(q, 0.0)
        return hamming_topk(qc, codes, valid, k=r, chunk=N, impl="mxu")

    # gather with computed (loop-dependent) indices, three shapes
    for r in (64, 256, 1024):
        def gather_2d(q, vectors, r=r):
            _, cand = sel(q, r)
            return jnp.sum(vectors[cand], axis=(1, 2))[None, :]

        out[f"sel_plus_gather2d_r{r}"] = round(timed(gather_2d, queries,
                                                     vectors), 3)

    # flat 1D gather of the same rows
    def gather_flat(q, vectors):
        _, cand = sel(q, 1024)
        rows = vectors[cand.reshape(-1)]
        return jnp.sum(rows.reshape(B, 1024, DIM), axis=(1, 2))[None, :]

    out["sel_plus_gatherflat_r1024"] = round(timed(gather_flat, queries,
                                                   vectors), 3)

    # sorted indices: does gather locality matter?
    def gather_sorted(q, vectors):
        _, cand = sel(q, 1024)
        cand = jnp.sort(cand, axis=1)
        return jnp.sum(vectors[cand], axis=(1, 2))[None, :]

    out["sel_plus_gathersorted_r1024"] = round(timed(gather_sorted, queries,
                                                     vectors), 3)

    # take_along_axis-of-expanded variant (sometimes lowers differently)
    def gather_taa(q, vectors):
        _, cand = sel(q, 1024)
        rows = jnp.take(vectors, cand.reshape(-1), axis=0)
        return jnp.sum(rows.reshape(B, 1024, DIM), axis=(1, 2))[None, :]

    out["sel_plus_take_r1024"] = round(timed(gather_taa, queries, vectors), 3)

    # end-to-end at smaller rescore budgets (what does the row cost if the
    # budget drops?)
    for r in (64, 256):
        def full(q, vectors, norms, r=r):
            d, c = sel(q, r)
            return _rescore_topk(q, vectors, norms, c, d, k=10,
                                 metric="cosine")

        out[f"end_to_end_r{r}"] = round(timed(full, queries, vectors, norms), 3)

    print(json.dumps({"stage": "binary_profile2", "n": N, **out}), flush=True)


if __name__ == "__main__":
    main()
