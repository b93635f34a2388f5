"""A/B: top-2 segmax kernel member-recovery variants on the real chip.

eqfold  — tiled-concat + equality compare + min-fold (shipped)
selfold — member-index plane carried through the fold with where-selects
          (input-derived plane, not iota — tests whether the Mosaic
          iota-slice crash applies; ~half the member-recovery VPU work)

Prints timings as soon as they exist; a Mosaic crash on selfold is caught
and reported without losing the eqfold row. Appends tag=impl_ab rows to
bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

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

    from grape_vector_db_tpu.ops.segmax_pallas import pallas_segmax2_topk

    vecs, norms, valid, key = gen_corpus(DIM)
    n = vecs.shape[0]
    kq, key = random.split(key)
    q128 = random.normal(kq, (128, DIM), jnp.float32)

    timed = make_timed(ITERS, REPS)

    def eng(impl):
        def step(qi, vecs, norms, valid):
            vals, _ = pallas_segmax2_topk(qi, vecs, norms, valid, k=K,
                                          metric="cosine", select="twolevel",
                                          impl=impl)
            return vals[0, 0]
        return step

    rows = {}
    out = {"tag": "impl_ab", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "impls_agree_onchip": None,
           "rows_ms_best_median": {}}

    def flush():
        out["rows_ms_best_median"] = {k_: [round(a, 3), round(b, 3)]
                                      for k_, (a, b) in rows.items()}
        print(json.dumps(out, indent=2), flush=True)

    try:
        rows["selfold_b128"] = timed(eng("selfold"), q128, vecs, norms, valid)
    except Exception:
        out["selfold_error"] = traceback.format_exc()[-600:]
        print(out["selfold_error"], flush=True)
    flush()
    rows["eqfold_b128"] = timed(eng("eqfold"), q128, vecs, norms, valid)
    flush()

    if "selfold_b128" in rows:
        try:
            v_a, i_a = jax.jit(lambda q: pallas_segmax2_topk(
                q, vecs, norms, valid, k=K, metric="cosine",
                select="twolevel", impl="selfold"))(q128)
            v_b, i_b = jax.jit(lambda q: pallas_segmax2_topk(
                q, vecs, norms, valid, k=K, metric="cosine",
                select="twolevel", impl="eqfold"))(q128)
            out["impls_agree_onchip"] = bool(np.allclose(
                np.asarray(v_a), np.asarray(v_b), rtol=1e-5, atol=1e-5))
        except Exception as e:
            out["impls_agree_onchip"] = f"check-failed: {e}"[:120]
        flush()

    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
