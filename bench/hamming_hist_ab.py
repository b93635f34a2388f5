"""A/B: binary prescan candidate selection at large k (the binary_100k cost).

Today `hamming_topk` selects the k~1024 rescore candidates with
`lax.approx_max_k` over the [B, N] distance plane — measured ~7 ms/128-batch
at 131k (the dominant term of the binary matrix row; the MXU scan itself is
0.11 ms). But Hamming distances are SMALL BOUNDED INTEGERS (0..D), which
admits an exact O(N) threshold selection:

1. per-query histogram over the <=770 distance values -> cumulative counts ->
   the k-th smallest distance t (scatter-add, or a ~10-step masked-count
   binary search if scatter lowers badly),
2. exact compaction of {d < t} plus column-ordered ties at {d == t} into a
   dense [B, k] candidate list, with prefix sums computed EXACTLY on the MXU
   (within-block inclusive prefix = {0,1}-mask [*, 256] @ upper-triangular
   ones — bf16 products, f32 accumulation, sums <= 256 so everything is
   exact),
3. one scatter writes (distance, column) packed into int32 lanes.

Unlike approx_max_k(recall_target=0.95) this is EXACT top-k by distance.
Run: timeout 1200 python bench/hamming_hist_ab.py

MEASURED (2026-08-18, v5e, B=128, N=131072) — the idea is DISPROVEN on TPU:

    k=1024: approx_max_k 1.119 ms | hist+scatter 191.7 ms | bsearch 80.1 ms
    k=4096: approx_max_k 23.32 ms | hist+scatter 192.1 ms | bsearch 80.3 ms
    (all exactness checks pass: exact k-th distance, exact set, strict
    containment, 8/8 queries)

Both variants are SCATTER-bound: the [B, N] -> [B, k] compaction scatter
alone costs ~80 ms and the histogram scatter-add another ~110 ms — XLA
lowers large scatters with colliding indices to an effectively serial form
on TPU (the same pathology as the PQ ADC gather, CLAUDE.md). The MXU
triangular-matmul prefix sums were fine; the scatters kill it. Keep
approx_max_k for selection; note its cost is strongly k-dependent
(1.1 ms @ k=1024 -> 23 ms @ k=4096 over 131k).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, DIM, N, ITERS = 128, 768, 131_072, 20


def hist_select_topk(d, k: int, n_buckets: int = 770, mode: str = "scatter"):
    """Exact smallest-k selection over small-int distances.

    d: [B, N] int32 (invalid rows pre-set to a huge value). Returns
    (dist [B, k] int32, idx [B, k] int32); short rows pad with 2**30 / 0.
    """
    import jax.numpy as jnp
    from jax import lax

    b, n = d.shape
    dc = jnp.minimum(d, n_buckets - 1)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]

    if mode == "scatter":
        hist = jnp.zeros((b, n_buckets), jnp.int32).at[rows, dc].add(1)
        cum = jnp.cumsum(hist, axis=1)
        t = jnp.argmax(cum >= k, axis=1).astype(jnp.int32)
        total = cum[:, -1]
        t = jnp.where(total >= k, t, jnp.int32(n_buckets - 1))
        cum_before = jnp.where(
            t > 0,
            jnp.take_along_axis(cum, jnp.maximum(t - 1, 0)[:, None], 1)[:, 0],
            0,
        )
    else:  # binary-search threshold: ceil(log2(buckets)) masked counts
        lo = jnp.zeros((b,), jnp.int32)
        hi = jnp.full((b,), n_buckets - 1, jnp.int32)
        for _ in range(10):  # 2**10 >= 770
            mid = (lo + hi) // 2
            cnt = jnp.sum((dc <= mid[:, None]).astype(jnp.int32), axis=1)
            hi = jnp.where(cnt >= k, mid, hi)
            lo = jnp.where(cnt >= k, lo, mid + 1)
        t = hi
        cum_before = jnp.sum((dc < t[:, None]).astype(jnp.int32), axis=1)

    strict = dc < t[:, None]
    tie = dc == t[:, None]

    cb = 256  # bf16 partial sums stay exact up to 256
    nb = n // cb
    tri = jnp.triu(jnp.ones((cb, cb), jnp.bfloat16))

    def prefix(mask):
        mb = mask.reshape(b * nb, cb).astype(jnp.bfloat16)
        p = lax.dot_general(mb, tri, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        p = p.reshape(b, nb, cb)
        totals = p[:, :, -1]
        off = jnp.cumsum(totals, axis=1) - totals
        return (p + off[:, :, None]).astype(jnp.int32).reshape(b, n)

    ps = prefix(strict)
    pt = prefix(tie)
    pos = jnp.where(strict, ps - 1,
                    jnp.where(tie, cum_before[:, None] + pt - 1, jnp.int32(k)))
    pos = jnp.minimum(pos, jnp.int32(k))
    packed = dc * jnp.int32(1 << 21) + jnp.arange(n, dtype=jnp.int32)[None, :]
    out = jnp.full((b, k + 1), jnp.int32((1 << 30) * 2 - 1))
    out = out.at[rows, pos].set(packed, mode="drop")[:, :k]
    dist = out >> 21
    idx = jnp.where(dist < n_buckets, out & jnp.int32((1 << 21) - 1), 0)
    dist = jnp.where(dist < n_buckets, dist, jnp.int32(2**30))
    return dist, idx


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.hamming import hamming_scores, hamming_topk, pack_bits

    key = random.PRNGKey(0)
    kv, kq = random.split(key)
    vecs = random.normal(kv, (N, DIM), jnp.float32)
    queries = random.normal(kq, (B, DIM), jnp.float32)
    codes = pack_bits(vecs, 0.0)
    qcodes = pack_bits(queries, 0.0)
    valid = jnp.ones((N,), jnp.bool_)
    results = {}

    def timed(fn, *ops, its=ITERS):
        @jax.jit
        def loop(q, *rest):
            def body(i, acc):
                qq = jnp.bitwise_xor(q, (acc & 1).astype(jnp.uint32))
                vals, idxs = fn(qq, *rest)
                return acc * 0 + vals[0, 0] + idxs[0, 0]
            return lax.fori_loop(0, its, body, jnp.int32(0))

        float(np.asarray(loop(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(loop(*ops)))
        return max(time.perf_counter() - t0 - 0.025, 1e-9) * 1e3 / its

    for k in (1024, 4096):
        kk = k

        def cur(qc, c, v):
            return hamming_topk(qc, c, v, k=kk, chunk=N, impl="mxu")

        def hist_scatter(qc, c, v):
            d = hamming_scores(qc, c, impl="mxu")
            d = jnp.where(v[None, :], d, jnp.int32(2**30))
            return hist_select_topk(d, kk, mode="scatter")

        def hist_bsearch(qc, c, v):
            d = hamming_scores(qc, c, impl="mxu")
            d = jnp.where(v[None, :], d, jnp.int32(2**30))
            return hist_select_topk(d, kk, mode="bsearch")

        ms_cur = timed(cur, qcodes, codes, valid)
        ms_hs = timed(hist_scatter, qcodes, codes, valid)
        ms_hb = timed(hist_bsearch, qcodes, codes, valid)

        # correctness: exact k-th distance + full strict set containment
        d_np = np.asarray(jax.jit(hamming_scores)(qcodes, codes))
        dv, iv = jax.jit(functools.partial(hist_select_topk, k=kk))(
            jnp.asarray(d_np))
        dv, iv = np.asarray(dv), np.asarray(iv)
        ok_thresh = ok_strict = ok_sorted_eq = 0
        for q in range(8):
            srt = np.sort(d_np[q])
            kth = srt[kk - 1]
            sel_sorted = np.sort(dv[q])
            ok_thresh += int(sel_sorted[-1] == kth)
            ok_sorted_eq += int(np.array_equal(sel_sorted, srt[:kk]))
            strict_set = set(np.flatnonzero(d_np[q] < kth).tolist())
            ok_strict += int(strict_set <= set(iv[q].tolist()))
        results[f"k{k}"] = {
            "approx_max_k_ms": round(ms_cur, 3),
            "hist_scatter_ms": round(ms_hs, 3),
            "hist_bsearch_ms": round(ms_hb, 3),
            "exact_kth_dist_8q": ok_thresh,
            "exact_set_8q": ok_sorted_eq,
            "strict_containment_8q": ok_strict,
        }
        print(json.dumps({"stage": "hamming_sel_ab", "k": k, **results[f"k{k}"]}),
              flush=True)


if __name__ == "__main__":
    main()
