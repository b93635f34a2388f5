"""Two-level selection probe for the fused segmax exact engines.

Phase-2 selection was k iterative max-and-mask passes over the full
[B, N/SEG] segmax plane (~10x 16.7 MB of traffic at 1M) — the largest
phase-2 term (sel+gather measured 0.94 ms of the 3.95 ms budget).
_twolevel_topk folds the plane to [B, N/(SEG*32)] supersegment maxima,
selects there, and recovers the winning segments from the chosen
supersegments' children (see ops/segmax_pallas.py for the exactness
argument). This probe times the production engines under both selectors,
for the single-max and the top-2 kernels. Appends tag=sel2 rows to
bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench._harness import append_jsonl, gen_corpus, make_timed  # noqa: E402

DIM, K = 768, 10
ITERS = int(os.environ.get("AB_ITERS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  prepare_queries)
    from grape_vector_db_tpu.ops.segmax_pallas import (
        _twolevel_topk, make_weight_plane, pallas_segmax_topk,
        pallas_segmax2_topk, segmax_scores_pallas)

    vecs, norms, valid, key = gen_corpus(DIM)
    n = vecs.shape[0]
    kq, key = random.split(key)
    q128 = random.normal(kq, (128, DIM), jnp.float32)

    timed = make_timed(ITERS, REPS)

    def eng(fn, sel):
        def step(qi, vecs, norms, valid):
            vals, _ = fn(qi, vecs, norms, valid, k=K, metric="cosine",
                         select=sel)
            return vals[0, 0]
        return step

    def sel_only(selfn):
        def step(qi, vecs, norms, valid):
            qp = prepare_queries(qi, "cosine")
            w = make_weight_plane(norms, valid, "cosine")
            s = segmax_scores_pallas(qp, vecs, w)
            v, _ = selfn(s, K)
            return v[0, 0]
        return step

    rows = {}
    rows["top2_twolevel_b128"] = timed(eng(pallas_segmax2_topk, "twolevel"),
                                       q128, vecs, norms, valid)
    rows["cur_twolevel_b128"] = timed(eng(pallas_segmax_topk, "twolevel"),
                                      q128, vecs, norms, valid)
    rows["sel_only_iter_b128"] = timed(sel_only(_iterative_topk),
                                       q128, vecs, norms, valid)
    rows["sel_only_two_b128"] = timed(sel_only(_twolevel_topk),
                                      q128, vecs, norms, valid)

    out = {"tag": "sel2", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "exact_agree_onchip": None,
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    print(json.dumps(out, indent=2), flush=True)

    if os.environ.get("AB_SKIP_CHECK"):
        print(json.dumps(out), flush=True)
        append_jsonl("SEGMAX_AB.jsonl", out)
        return

    try:
        v_it, _ = jax.jit(lambda q: pallas_segmax_topk(
            q, vecs, norms, valid, k=K, metric="cosine",
            select="iterative"))(q128)
        v_t2, _ = jax.jit(lambda q: pallas_segmax2_topk(
            q, vecs, norms, valid, k=K, metric="cosine",
            select="twolevel"))(q128)
        out["exact_agree_onchip"] = bool(np.allclose(
            np.asarray(v_it), np.asarray(v_t2), rtol=1e-5, atol=1e-5))
    except Exception as e:
        out["exact_agree_onchip"] = f"check-failed: {e}"[:120]
    print(json.dumps({"exact_agree_onchip": out["exact_agree_onchip"]}),
          flush=True)
    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
