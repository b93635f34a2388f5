"""Top-4-per-segment vs top-2 exact engine A/B at 1M x 768.

The top-2 engine's phase-2 wall is the rescore row gather — per-ROW bound
(~38 ns/row/query), floor(k/2)=5 segments x 32 rows = 160 rows/query
(~0.78 ms at B=128, ~1.56 ms at B=256). The top-4 kernel returns ranks
1..3 as KNOWN candidates (value + member index, no gather) and provably
shrinks the rescore to floor(k/4)=2 segments = 64 rows. This probe times
both full pipelines at B=128/256 plus the top-4 kernel alone (is the
bigger VPU epilogue still hidden behind the corpus DMA?), and checks
on-chip value agreement. Appends tag=top4_ab to bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench._harness import append_jsonl, gen_corpus, make_timed  # noqa: E402

DIM, K = 768, 10
ITERS = int(os.environ.get("AB_ITERS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import random

    from grape_vector_db_tpu.ops.distance import prepare_queries
    from grape_vector_db_tpu.ops.segmax_pallas import (
        make_weight_plane, pallas_segmax2_topk, pallas_segmax4_topk,
        segmax4_scores_pallas)

    vecs, norms, valid, key = gen_corpus(DIM)
    n = vecs.shape[0]
    kq, key = random.split(key)
    q128 = random.normal(kq, (128, DIM), jnp.float32)
    q256 = jnp.concatenate([q128, q128 * 1.0001 + 0.001])

    timed = make_timed(ITERS, REPS)

    def eng(fn):
        def step(qi, vecs, norms, valid):
            vals, _ = fn(qi, vecs, norms, valid, k=K, metric="cosine",
                         select="twolevel")
            return vals[0, 0]
        return step

    def kernel_only(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        outs = segmax4_scores_pallas(qp, vecs, w)
        return outs[0][0, 0] + outs[6][0, 0]

    rows = {}
    rows["top4_b128"] = timed(eng(pallas_segmax4_topk), q128,
                              vecs, norms, valid)
    rows["top2_b128"] = timed(eng(pallas_segmax2_topk), q128,
                              vecs, norms, valid)
    rows["k4_kernel_b128"] = timed(kernel_only, q128, vecs, norms, valid)
    rows["top4_b256"] = timed(eng(pallas_segmax4_topk), q256,
                              vecs, norms, valid, its=ITERS // 2)
    rows["top2_b256"] = timed(eng(pallas_segmax2_topk), q256,
                              vecs, norms, valid, its=ITERS // 2)

    out = {"tag": "top4_ab", "n": n, "dim": DIM, "k": K, "iters": ITERS,
           "backend": jax.default_backend(), "values_agree_onchip": None,
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}

    try:
        # Corpus as jit OPERANDS, never closure captures: a captured 1.5 GB
        # array is baked into the HLO and re-uploaded through the relay.
        # Agreement = INDEX agreement + bf16-tolerant values: on-chip the
        # two engines score identical rows but with different accumulation
        # splits (kernel dot vs rescore einsum), so values jitter ~1e-4 rel
        # in bf16 (bench/top4_agree_diag.py: indices agree at every rank,
        # worst value delta 1.3e-3 rel). rtol=1e-5 was a false alarm.
        v2, i2 = jax.jit(lambda q, v, nn, va: pallas_segmax2_topk(
            q, v, nn, va, k=K, metric="cosine"))(q128, vecs, norms, valid)
        v4, i4 = jax.jit(lambda q, v, nn, va: pallas_segmax4_topk(
            q, v, nn, va, k=K, metric="cosine"))(q128, vecs, norms, valid)
        out["indices_agree_onchip"] = bool(
            np.array_equal(np.asarray(i2), np.asarray(i4)))
        out["values_agree_onchip"] = bool(np.allclose(
            np.asarray(v2), np.asarray(v4), rtol=3e-3, atol=1e-4))
    except Exception as e:
        out["values_agree_onchip"] = f"check-failed: {e}"[:120]
    print(json.dumps(out, indent=2), flush=True)
    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
