"""Phase-2-only microbench for the top-2 segmax engine.

Times the post-kernel work (selection + candidate expansion + rescore +
merge) on synthetic m1/i1/m2 planes passed as jit operands — no Pallas,
XLA-only compiles, so variants are cheap to measure even on a congested
relay. Variants:

  p2_iter      — iterative selection on m1 (k) and m2 (k//2)    [shipped r2]
  p2_twolevel  — block-contiguous supersegment selection, child
                 pick via lax.top_k over [B, k*128]             [shipped r3]
  p2_two_iterchild — same but child pick via _iterative_topk
  p2_two_r3    — twolevel + rescore only k//3 segments (what a
                 top-3 kernel would allow; LOWER BOUND only — the
                 kernel would also pay more)

Appends tag=p2 rows to bench/SEGMAX_AB.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench._harness import append_jsonl  # noqa: E402

DIM, K = 768, 10
ITERS = int(os.environ.get("AB_ITERS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))
SEG = 32
CB = 4096


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import _iterative_topk
    from grape_vector_db_tpu.ops.segmax_pallas import _twolevel_topk

    n = 1_048_576
    num_seg = n // SEG
    b = 128
    key = random.PRNGKey(7)
    k1, k2, k3, k4, k5 = random.split(key, 5)
    vecs = random.normal(k1, (n, DIM), jnp.bfloat16)
    norms = jnp.abs(random.normal(k2, (n,), jnp.float32)) + 25.0
    valid = jnp.ones((n,), jnp.bool_)
    m1 = random.normal(k3, (b, num_seg), jnp.float32)
    m2 = m1 - jnp.abs(random.normal(k4, (b, num_seg), jnp.float32))
    i1f = jnp.floor(random.uniform(k5, (b, num_seg), jnp.float32) * SEG)
    q = random.normal(k2, (b, DIM), jnp.float32)

    def timed(step_fn, *ops, its=ITERS, reps=REPS):
        @jax.jit
        def loop(m1_, *o):
            def body(i, acc):
                mm = m1_ + acc * 1e-9
                out = step_fn(mm, *o)
                return acc * 0.5 + out * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(*ops)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(*ops)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        to_ms = lambda t: max(t - 0.025, 1e-9) * 1e3 / its
        return to_ms(ts[0]), to_ms(ts[len(ts) // 2])

    spb = CB // SEG

    def phase2(m1_, i1_, m2_, q_, vecs_, norms_, valid_, sel, r):
        kk = K
        v1, seg1 = sel(m1_, kk)
        mem1 = jnp.take_along_axis(i1_, seg1, axis=1).astype(jnp.int32)
        rows1 = ((seg1 // spb) * CB + seg1 % spb + mem1 * spb)
        v1 = jnp.minimum(v1, 1.0)
        _, seg2 = sel(m2_, r)
        blk = seg2 // spb
        j = seg2 % spb
        m = jnp.arange(SEG, dtype=jnp.int32)[None, None, :]
        rows2 = (blk[:, :, None] * CB + j[:, :, None] + m * spb
                 ).reshape(b, r * SEG)
        cvecs = vecs_[rows2]
        dots = jnp.einsum("bd,bcd->bc", q_.astype(vecs_.dtype), cvecs,
                          preferred_element_type=jnp.float32)
        cw = 1.0 / jnp.maximum(norms_[rows2], 1e-12)
        cw = jnp.where(valid_[rows2], cw, 0.0)
        rs = jnp.where(cw == 0.0, -jnp.inf, dots * cw)
        rs = jnp.minimum(rs, 1.0)
        dup = jnp.any(seg1[:, :, None] == seg2[:, None, :], axis=2)
        v1 = jnp.where(dup, -jnp.inf, v1)
        cand_vals = jnp.concatenate([v1, rs], axis=1)
        cand_rows = jnp.concatenate([rows1, rows2], axis=1)
        fvals, fpos = lax.top_k(cand_vals, kk)
        return fvals[0, 0]

    def two_iterchild(plane, kk, fan=128):
        bb, w = plane.shape
        ns = w // fan
        p3 = plane.reshape(bb, ns, fan)
        sup = p3.max(axis=-1)
        _, blks = _iterative_topk(sup, kk)
        cvals = jnp.take_along_axis(p3, blks[:, :, None], axis=1)
        cvals = cvals.reshape(bb, kk * fan)
        child = (blks[:, :, None] * fan
                 + jnp.arange(fan, dtype=jnp.int32)[None, None, :]
                 ).reshape(bb, kk * fan)
        tv, tp = _iterative_topk(cvals, kk)
        return tv, jnp.take_along_axis(child, tp, axis=1)

    ops = (i1f, m2, q, vecs, norms, valid)
    rows = {}
    rows["p2_iter"] = timed(
        lambda mm, *o: phase2(mm, *o, sel=_iterative_topk, r=K // 2), m1, *ops)
    rows["p2_twolevel"] = timed(
        lambda mm, *o: phase2(mm, *o, sel=_twolevel_topk, r=K // 2), m1, *ops)
    rows["p2_two_iterchild"] = timed(
        lambda mm, *o: phase2(mm, *o, sel=two_iterchild, r=K // 2), m1, *ops)
    rows["p2_two_r3"] = timed(
        lambda mm, *o: phase2(mm, *o, sel=_twolevel_topk, r=K // 3), m1, *ops)

    out = {"tag": "p2", "n": n, "dim": DIM, "iters": ITERS,
           "backend": jax.default_backend(),
           "rows_ms_best_median": {k_: [round(a, 3), round(bb, 3)]
                                   for k_, (a, bb) in rows.items()}}
    print(json.dumps(out, indent=2), flush=True)
    append_jsonl("SEGMAX_AB.jsonl", out)


if __name__ == "__main__":
    main()
