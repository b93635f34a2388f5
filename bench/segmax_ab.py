"""A/B the exact@1M fused-segmax variants on the real chip.

Dimensions swept:
  layout  strided (original lane-fold kernel) vs contig (transposed kernel,
          contiguous 32-row segments -> slice-gather rescore)
  select  iterative (k passes of max-and-mask) vs verified (approx_max_k +
          count proof, exact with fallback)
Plus phase-isolated rows (kernel alone; kernel+selection with a dependence
on seg_ids only) to locate the budget.

Timing: fori-loop with loop-carried data dependence (bench.py pattern).
Appends JSON lines to bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, K, BATCH = 768, 10, 128
ITERS = int(os.environ.get("AB_ITERS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  _verified_exact_topk,
                                                  prepare_queries)
    from grape_vector_db_tpu.ops.segmax_pallas import (
        make_weight_plane, make_weight_plane_t, pallas_segmax_topk,
        segmax_scores_pallas, segmax_scores_pallas_contig)

    chunk = 131_072
    key = random.PRNGKey(1)

    @jax.jit
    def gen(k1):
        x = random.normal(k1, (chunk, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    pv, pn = [], []
    for _ in range(8):
        k1, key = random.split(key)
        v, nn_ = gen(k1)
        pv.append(v)
        pn.append(nn_)
    vecs = jnp.concatenate(pv)
    norms = jnp.concatenate(pn)
    valid = jnp.ones((vecs.shape[0],), jnp.bool_)
    del pv, pn
    n = vecs.shape[0]
    kq, key = random.split(key)
    q = random.normal(kq, (BATCH, DIM), jnp.float32)

    def timed(step_fn, q0, *ops, its=ITERS, reps=REPS):
        @jax.jit
        def loop(qq, *o):
            def body(i, acc):
                qi = qq * (1.0 + acc * 1e-9)
                out = step_fn(qi, *o)
                return acc * 0.5 + out * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(q0, *ops)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(q0, *ops)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        to_ms = lambda t: max(t - 0.025, 1e-9) * 1e3 / its
        return to_ms(ts[0]), to_ms(ts[len(ts) // 2])

    rows = {}

    # phase 1 alone, both kernels
    def k_strided(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        s = segmax_scores_pallas(qp, vecs, w)
        return s[0, 0]

    def k_contig(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane_t(norms, valid, "cosine")
        s = segmax_scores_pallas_contig(qp, vecs, w)
        return s[0, 0]

    rows["kernel_strided"] = timed(k_strided, q, vecs, norms, valid)
    rows["kernel_contig"] = timed(k_contig, q, vecs, norms, valid)

    # phase 1 + selection (depend on seg_ids)
    def ks_iter(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane_t(norms, valid, "cosine")
        s = segmax_scores_pallas_contig(qp, vecs, w).T
        _, ids = _iterative_topk(s, K)
        return ids[0, 0].astype(jnp.float32)

    def ks_ver(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane_t(norms, valid, "cosine")
        s = segmax_scores_pallas_contig(qp, vecs, w).T
        _, ids = _verified_exact_topk(s, K)
        return ids[0, 0].astype(jnp.float32)

    rows["kernel_contig_sel_iter"] = timed(ks_iter, q, vecs, norms, valid)
    rows["kernel_contig_sel_verified"] = timed(ks_ver, q, vecs, norms, valid)

    # full engine, all four combos
    for layout in ("strided", "contig"):
        for select in ("iterative", "verified"):
            def full(qi, vecs, norms, valid, layout=layout, select=select):
                vals, _ = pallas_segmax_topk(qi, vecs, norms, valid, k=K,
                                             metric="cosine", layout=layout,
                                             select=select)
                return vals[0, 0]
            rows[f"full_{layout}_{select}"] = timed(full, q, vecs, norms,
                                                    valid)

    out = {"n": n, "dim": DIM, "batch": BATCH, "iters": ITERS,
           "backend": __import__("jax").default_backend(),
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SEGMAX_AB.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
