"""B=256 exact@1M diagnosis: where do 4.46 ms go?

Kernel-only (phase 1) times for the single-max and top-2 segmax kernels at
B=128/256, against the streaming roofline (~2.1 ms: 1.57 GB corpus read).
If the top-2 kernel at B=256 is well above the single-max kernel, the fold's
extra VPU work (4 ops/element vs 1) is the wall and a cheaper phase-1 +
k-segment phase-2 route wins at the throughput batch; if both sit near the
roofline, selection + gather own the gap. Appends tag=b256_diag to
bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, K = 768, 10
ITERS = int(os.environ.get("AB_ITERS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import prepare_queries
    from grape_vector_db_tpu.ops.segmax_pallas import (
        make_weight_plane,
        pallas_segmax2_topk,
        segmax2_scores_pallas,
        segmax_scores_pallas,
    )

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
    q256 = random.normal(kq, (256, DIM), jnp.float32)
    q128 = q256[:128]

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

    w = make_weight_plane(norms, valid, "cosine")
    rows = {}

    def k1_single(qi, vecs, w):
        qp = prepare_queries(qi, "cosine")
        s = segmax_scores_pallas(qp, vecs, w)
        return s[0, 0]

    def k1_top2(qi, vecs, w):
        qp = prepare_queries(qi, "cosine")
        m1, i1, m2 = segmax2_scores_pallas(qp, vecs, w)
        return m1[0, 0] + m2[0, 0] + i1[0, 0]

    def full_top2(qi, vecs, norms, valid):
        vals, _ = pallas_segmax2_topk(qi, vecs, norms, valid, k=K,
                                      metric="cosine")
        return vals[0, 0]

    rows["k1_single_b128"] = timed(k1_single, q128, vecs, w)
    rows["k1_single_b256"] = timed(k1_single, q256, vecs, w)
    rows["k1_top2_b128"] = timed(k1_top2, q128, vecs, w)
    rows["k1_top2_b256"] = timed(k1_top2, q256, vecs, w)
    rows["full_top2_b256"] = timed(full_top2, q256, vecs, norms, valid)

    out = {"tag": "b256_diag", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(),
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SEGMAX_AB.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
