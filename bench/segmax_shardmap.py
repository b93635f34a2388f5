"""Validate + time the top-2 segmax engine INSIDE shard_map on real TPU.

Multi-chip hardware is not available here, so this runs the full SPMD
program (shard_map + all_gather merge, the exact code path a multi-chip
mesh executes) on a 1-device TPU mesh over a 1M-row shard — proving the
Mosaic kernel lowers and executes under shard_map with the mesh engine's
prepared-query calling convention, and that the merged result matches the
single-chip engine bit-for-bit. Appends tag=shardmap to SEGMAX_AB.jsonl.
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
    from jax import random
    from jax.sharding import Mesh

    from grape_vector_db_tpu.ops.distance import scored_topk
    from grape_vector_db_tpu.parallel.mesh import sharded_scored_topk

    vecs, norms, valid, key = gen_corpus(DIM)
    n = vecs.shape[0]
    kq, key = random.split(key)
    q128 = random.normal(kq, (128, DIM), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:1]), ("shard",))

    def sm(qi, vecs, norms, valid):
        vals, _ = sharded_scored_topk(qi, vecs, norms, valid, k=K,
                                      metric="cosine", chunk=131_072,
                                      mesh=mesh, mode="exact")
        return vals[0, 0]

    timed = make_timed(ITERS, REPS)
    rows = {"shardmap_top2_b128": timed(sm, q128, vecs, norms, valid)}

    out = {"tag": "shardmap", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "devices": 1,
           "matches_single_chip": None,
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    print(json.dumps(out, indent=2), flush=True)

    try:
        sv, si = sharded_scored_topk(q128, vecs, norms, valid, k=K,
                                     metric="cosine", chunk=131_072,
                                     mesh=mesh, mode="exact")
        dv, di = scored_topk(q128, vecs, norms, valid, k=K,
                             metric="cosine", chunk=131_072, mode="exact")
        out["matches_single_chip"] = bool(
            np.allclose(np.asarray(sv), np.asarray(dv), rtol=1e-5, atol=1e-5)
            and np.array_equal(np.asarray(si), np.asarray(di)))
    except Exception as e:
        out["matches_single_chip"] = f"check-failed: {e}"[:120]
    print(json.dumps({"matches_single_chip": out["matches_single_chip"]}),
          flush=True)
    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
