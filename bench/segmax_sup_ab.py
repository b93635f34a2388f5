"""Sup-output top-4 segmax vs plain top-4 exact engine A/B at 1M x 768.

After the r4 top-4 flip the measured phase-2 wall moved to the SELECTION
passes: each _twolevel_topk call starts with a [B, N/SEG] -> [B, nblocks]
reshape+reduce — a full extra HBM pass over a 16.7 MB plane per selection
(m1 and m2) that the kernel can emit for free behind the corpus DMA
(bench/SEGMAX_AB.jsonl tag=top4_ab: the expected 0.4 ms phase-2 win
shrank to 0.08 ms on exactly these passes). impl="sup" adds two
[B, nblocks] supersegment-maxima outputs to the kernel and starts both
selections from them. This probe times plain vs sup full pipelines at
B=128/256, the sup kernel alone (is the extra epilogue still DMA-hidden?),
and checks on-chip index agreement + bf16-tolerant value agreement
(indices are the cross-engine invariant; values jitter ~1e-3 rel with
accumulation order — CLAUDE.md, bench/top4_agree_diag.py). Appends
tag=sup_ab to bench/SEGMAX_AB.jsonl.
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
        make_weight_plane, pallas_segmax4_topk, segmax4_sup_scores_pallas)

    vecs, norms, valid, key = gen_corpus(DIM)
    n = vecs.shape[0]
    kq, key = random.split(key)
    q128 = random.normal(kq, (128, DIM), jnp.float32)
    q256 = jnp.concatenate([q128, q128 * 1.0001 + 0.001])

    timed = make_timed(ITERS, REPS)

    def eng(impl):
        def step(qi, vecs, norms, valid):
            vals, _ = pallas_segmax4_topk(qi, vecs, norms, valid, k=K,
                                          metric="cosine", select="twolevel",
                                          impl=impl)
            return vals[0, 0]
        return step

    def kernel_only(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        outs = segmax4_sup_scores_pallas(qp, vecs, w)
        return outs[0][0, 0] + outs[7][0, 0] + outs[8][0, 0]

    rows = {}
    rows["sup_b128"] = timed(eng("sup"), q128, vecs, norms, valid)
    rows["plain_b128"] = timed(eng("plain"), q128, vecs, norms, valid)
    rows["sup_kernel_b128"] = timed(kernel_only, q128, vecs, norms, valid)
    rows["sup_b256"] = timed(eng("sup"), q256, vecs, norms, valid,
                             its=ITERS // 2)
    rows["plain_b256"] = timed(eng("plain"), q256, vecs, norms, valid,
                               its=ITERS // 2)

    out = {"tag": "sup_ab", "n": n, "dim": DIM, "k": K, "iters": ITERS,
           "backend": jax.default_backend(),
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    try:
        vp, ip = jax.jit(lambda q, v, nn, va: pallas_segmax4_topk(
            q, v, nn, va, k=K, metric="cosine", impl="plain"))(
                q128, vecs, norms, valid)
        vs, is_ = jax.jit(lambda q, v, nn, va: pallas_segmax4_topk(
            q, v, nn, va, k=K, metric="cosine", impl="sup"))(
                q128, vecs, norms, valid)
        out["indices_agree_onchip"] = bool(
            np.array_equal(np.asarray(ip), np.asarray(is_)))
        out["values_agree_onchip"] = bool(np.allclose(
            np.asarray(vp), np.asarray(vs), rtol=3e-3, atol=1e-4))
    except Exception as e:  # pragma: no cover - relay flake diagnostics
        out["values_agree_onchip"] = f"check-failed: {e}"[:120]
    print(json.dumps(out, indent=2), flush=True)
    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
