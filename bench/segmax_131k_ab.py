"""Does the fused top-2 segmax kernel beat the iterative engine BELOW the
262k routing crossover? The crossover was measured against the XLA segmax
scan (CLAUDE.md: iterative 1.0 ms vs XLA-segmax 2.3 ms at 131k); the fused
Pallas kernel never got the A/B. At 131k x 768 its corpus DMA is ~0.26 ms
and selection shrinks to [B, 4096], so it should beat the iterative
engine's k selection passes over [B, 131072]. Rows at B=128 and B=256,
plus 65k and 32k to locate the true crossover. Appends tag=seg131k to
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
ITERS = int(os.environ.get("AB_ITERS", "64"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import scored_topk
    from grape_vector_db_tpu.ops.segmax_pallas import pallas_segmax2_topk

    key = random.PRNGKey(2)

    def gen(n):
        nonlocal key
        k1, key = random.split(key)
        x = random.normal(k1, (n, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

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

    def cur(qi, vecs, norms, valid):
        vals, _ = scored_topk(qi, vecs, norms, valid, k=K, metric="cosine",
                              chunk=min(65536, vecs.shape[0]), mode="exact")
        return vals[0, 0]

    def fused(qi, vecs, norms, valid):
        vals, _ = pallas_segmax2_topk(qi, vecs, norms, valid, k=K,
                                      metric="cosine")
        return vals[0, 0]

    rows = {}
    agree = {}
    for n in (131_072, 65_536, 32_768):
        vecs, norms = gen(n)
        valid = jnp.ones((n,), jnp.bool_)
        tag = f"{n // 1024}k"
        rows[f"iter_{tag}_b128"] = timed(cur, q128, vecs, norms, valid)
        rows[f"fused_{tag}_b128"] = timed(fused, q128, vecs, norms, valid)
        if n == 131_072:
            rows[f"iter_{tag}_b256"] = timed(cur, q256, vecs, norms, valid)
            rows[f"fused_{tag}_b256"] = timed(fused, q256, vecs, norms, valid)
        # exactness: identical result SETS on-chip. Values can differ by
        # ~1e-4 (f32 accumulation order: full-matrix dot vs 160-row rescore
        # einsum), so compare indices — measured identical on all rows.
        _, i_a = jax.jit(lambda q, v, nn, va: scored_topk(
            q, v, nn, va, k=K, metric="cosine",
            chunk=min(65536, v.shape[0]), mode="exact"))(q128, vecs, norms,
                                                         valid)
        _, i_b = jax.jit(lambda q, v, nn, va: pallas_segmax2_topk(
            q, v, nn, va, k=K, metric="cosine"))(q128, vecs, norms, valid)
        agree[tag] = sum(1 for a, b in zip(np.asarray(i_a), np.asarray(i_b))
                         if set(a.tolist()) != set(b.tolist()))
        del vecs, norms, valid

    out = {"tag": "seg131k", "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "values_agree": agree,
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SEGMAX_AB.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
