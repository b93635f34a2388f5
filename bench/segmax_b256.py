"""A/B the exact@1M engine at the THROUGHPUT batch (B=256).

B=256 measured 4.48 ms (batch row, eqfold top-2 + twolevel) against a
~2.4 ms ideal (max of the 2.07 ms corpus DMA and the ~2.0 ms MXU time at
256 queries), so something on top of the stream stops hiding at the bigger
batch. Candidates:

  top2_eqfold   — shipped engine (tiled-concat member recovery)
  top2_selfold  — index plane carried through the fold (~half the
                  member-recovery VPU traffic; a wash at B=128, but the
                  VPU term doubles with B while DMA does not)
  single_g320   — single-max kernel + gather all 32 members of the top-k
                  segments (no member recovery at all; was the fastest
                  full pipeline at B=128 in one run: 3.05 vs 3.10)
  kernel2_only  — top-2 kernel without phase 2 (kernel/phase-2 split)
  kernel1_only  — single-max kernel without phase 2

Appends tag=b256_ab to bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench._harness import append_jsonl, gen_corpus, make_timed  # noqa: E402

DIM, K = 768, 10
ITERS = int(os.environ.get("AB_ITERS", "16"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import random

    from grape_vector_db_tpu.ops.distance import prepare_queries
    from grape_vector_db_tpu.ops.segmax_pallas import (
        make_weight_plane,
        pallas_segmax2_topk,
        pallas_segmax_topk,
        segmax2_scores_pallas,
        segmax_scores_pallas,
    )

    vecs, norms, valid, key = gen_corpus(DIM)
    n = vecs.shape[0]
    kq, key = random.split(key)
    q256 = random.normal(kq, (256, DIM), jnp.float32)

    timed = make_timed(ITERS, REPS)
    rows = {}
    out = {"tag": "b256_ab", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "rows_ms_best_median": {}}

    def flush():
        out["rows_ms_best_median"] = {k_: [round(a, 3), round(b, 3)]
                                      for k_, (a, b) in rows.items()}
        print(json.dumps(out, indent=2), flush=True)

    def top2(impl):
        def step(qi, vecs, norms, valid):
            vals, _ = pallas_segmax2_topk(qi, vecs, norms, valid, k=K,
                                          metric="cosine", select="twolevel",
                                          impl=impl)
            return vals[0, 0]
        return step

    def single_g320(qi, vecs, norms, valid):
        vals, _ = pallas_segmax_topk(qi, vecs, norms, valid, k=K,
                                     metric="cosine", layout="strided",
                                     select="twolevel")
        return vals[0, 0]

    def kernel2_only(qi, vecs, norms, valid):
        q = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        m1, i1, m2 = segmax2_scores_pallas(q, vecs, w)
        return m1[0, 0] + m2[0, 0] + i1[0, 0]

    def kernel1_only(qi, vecs, norms, valid):
        q = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        return segmax_scores_pallas(q, vecs, w)[0, 0]

    for name, fn in [("kernel1_only_b256", kernel1_only),
                     ("kernel2_only_b256", kernel2_only),
                     ("top2_eqfold_b256", top2("eqfold")),
                     ("top2_selfold_b256", top2("selfold")),
                     ("single_g320_b256", single_g320)]:
        try:
            rows[name] = timed(fn, q256, vecs, norms, valid)
        except Exception:
            out[name + "_error"] = traceback.format_exc()[-400:]
        flush()

    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
