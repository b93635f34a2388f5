"""Consolidated exact@1M A/B: current k-segment engine vs the top-2
engine (segmax2), at serving batches 128 and 256, plus the raw 320-row
gather for diagnosis. One process, five jitted loops (relay-compile
friendly). Appends JSON lines (tag=top2_ab) to bench/SEGMAX_AB.jsonl.
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
REPS = int(os.environ.get("AB_REPS", "2"))
SEG = 32
CB = 4096


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  prepare_queries)
    from grape_vector_db_tpu.ops.segmax_pallas import (
        make_weight_plane, pallas_segmax_topk, pallas_segmax2_topk,
        segmax_scores_pallas)

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

    rows = {}

    def full_cur(qi, vecs, norms, valid):
        vals, _ = pallas_segmax_topk(qi, vecs, norms, valid, k=K,
                                     metric="cosine")
        return vals[0, 0]

    def full_top2(qi, vecs, norms, valid):
        vals, _ = pallas_segmax2_topk(qi, vecs, norms, valid, k=K,
                                      metric="cosine")
        return vals[0, 0]

    rows["cur_b128"] = timed(full_cur, q128, vecs, norms, valid)
    rows["top2_b128"] = timed(full_top2, q128, vecs, norms, valid)
    rows["top2_b256"] = timed(full_top2, q256, vecs, norms, valid)
    rows["cur_b256"] = timed(full_cur, q256, vecs, norms, valid)

    # diagnosis: the raw 320-scattered-row gather at B=128
    spb = CB // SEG
    m_ar = jnp.arange(SEG, dtype=jnp.int32)[None, None, :]

    def f_gather(qi, vecs, norms, valid):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        s = segmax_scores_pallas(qp, vecs, w)
        _, ids = _iterative_topk(s, K)
        blk = ids // spb
        j = ids % spb
        rows_ = (blk[:, :, None] * CB + j[:, :, None] + m_ar * spb
                 ).reshape(ids.shape[0], -1)
        cv = vecs[rows_]
        return cv.astype(jnp.float32).sum() * 1e-9

    rows["p2_gather320_b128"] = timed(f_gather, q128, vecs, norms, valid)

    # print + persist timings BEFORE the correctness check — a transient
    # relay failure there must not discard 30+ min of compile+measure
    out = {"tag": "top2_ab", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(), "values_agree_onchip": None,
           "rows_ms_best_median": {k_: [round(a, 3), round(b, 3)]
                                   for k_, (a, b) in rows.items()}}
    print(json.dumps(out, indent=2), flush=True)

    # correctness spot-check on-chip: top2 vs current, same values
    try:
        v_cur, _ = jax.jit(lambda q: pallas_segmax_topk(
            q, vecs, norms, valid, k=K, metric="cosine"))(q128)
        v_t2, _ = jax.jit(lambda q: pallas_segmax2_topk(
            q, vecs, norms, valid, k=K, metric="cosine"))(q128)
        out["values_agree_onchip"] = bool(np.allclose(
            np.asarray(v_cur), np.asarray(v_t2), rtol=1e-5, atol=1e-5))
    except Exception as e:  # relay hiccup — timings above still stand
        out["values_agree_onchip"] = f"check-failed: {e}"[:120]
    print(json.dumps({"values_agree_onchip": out["values_agree_onchip"]}),
          flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SEGMAX_AB.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
