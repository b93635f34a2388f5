"""Decompose the binary_100k matrix row: prescan vs selection vs rescore.

bench/hamming_hist_ab.py measured approx_max_k(k=1024) at 1.1 ms over
[128, 131072] — NOT the dominant term of the 7.2 ms row. This times each
stage of the two-stage step in-loop to locate the rest (suspects: the MXU
sign-decode's [N, D] bf16 materialization and the [B, R]-row rescore
gather at XLA's ~97 GB/s row-gather rate).

Run: timeout 1200 python bench/binary_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, DIM, N, ITERS, R, K = 128, 768, 131_072, 20, 1024, 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.index.binary import _rescore_topk
    from grape_vector_db_tpu.ops.hamming import (
        _unpack_signs, hamming_scores, hamming_topk, pack_bits)

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
                return acc * 0.5 + leaf[0, 0].astype(jnp.float32) * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(loop(*ops)))
        return max(time.perf_counter() - t0 - 0.025, 1e-9) * 1e3 / its

    out = {}

    # 1. scores only: pack(q) + sign-decode + MXU matmul
    def scores_only(q, codes):
        qc = pack_bits(q, 0.0)
        return hamming_scores(qc, codes, impl="mxu")

    out["prescan_scores_ms"] = round(timed(scores_only, queries, codes), 3)

    # 1b. the corpus sign-decode alone (the [N, D] bf16 materialization)
    def decode_only(q, codes):
        xs = _unpack_signs(codes)
        return xs[:1] * q[0, 0]

    out["corpus_decode_ms"] = round(timed(decode_only, queries, codes), 3)

    # 2. prescan + selection (the full hamming_topk)
    def prescan_sel(q, codes, valid):
        qc = pack_bits(q, 0.0)
        return hamming_topk(qc, codes, valid, k=R, chunk=N, impl="mxu")

    out["prescan_plus_sel_ms"] = round(timed(prescan_sel, queries, codes, valid), 3)

    # 3. rescore alone (gather R rows/query + einsum + top-k)
    dists, cand = jax.jit(
        lambda q: hamming_topk(pack_bits(q, 0.0), codes, valid, k=R,
                               chunk=N, impl="mxu"))(queries)
    cand = cand.block_until_ready()

    def rescore_only(q, vectors, norms, cand, dists):
        return _rescore_topk(q, vectors, norms, cand, dists, k=K,
                             metric="cosine")

    out["rescore_ms"] = round(
        timed(rescore_only, queries, vectors, norms, cand, dists), 3)

    # 4. end to end (the bench.py row shape)
    def full(q, codes, valid, vectors, norms):
        qc = pack_bits(q, 0.0)
        d, c = hamming_topk(qc, codes, valid, k=R, chunk=N, impl="mxu")
        return _rescore_topk(q, vectors, norms, c, d, k=K, metric="cosine")

    out["end_to_end_ms"] = round(
        timed(full, queries, codes, valid, vectors, norms), 3)

    print(json.dumps({"stage": "binary_profile", "n": N, "rescore": R, **out}),
          flush=True)


if __name__ == "__main__":
    main()
