"""Batch-scaling probe for the top-2 segmax exact engine.

The corpus read (1.6 GB bf16 at 1M x 768) lower-bounds every exact scan at
~2 ms regardless of batch, so per-query cost falls almost linearly with
batch size until VMEM or MXU time catches up. Times the production engine
at B=256 and B=512 (the b<=256 routing cap is bypassed by calling
pallas_segmax2_topk directly; raising the cap is the decision this probe
informs). Appends tag=batch rows to bench/SEGMAX_AB.jsonl.
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
    qbig = random.normal(kq, (512, DIM), jnp.float32)

    timed = make_timed(ITERS, REPS)

    def step(qi, vecs, norms, valid):
        vals, _ = pallas_segmax2_topk(qi, vecs, norms, valid, k=K,
                                      metric="cosine", select="twolevel")
        return vals[0, 0]

    rows = {}
    out = {"tag": "batch", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "rows_ms_best_median": {}}

    def flush():
        out["rows_ms_best_median"] = {
            k_: [round(a, 3), round(b, 3),
                 round(int(k_.split("b")[1]) / a * 1e3, 0)]
            for k_, (a, b) in rows.items()}
        print(json.dumps(out, indent=2), flush=True)

    for b in (256, 512):
        try:
            rows[f"top2_two_b{b}"] = timed(step, qbig[:b], vecs, norms, valid)
        except Exception:
            out[f"b{b}_error"] = traceback.format_exc()[-400:]
            print(out[f"b{b}_error"], flush=True)
        flush()

    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
