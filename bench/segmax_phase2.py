"""Phase-2 (rescore) breakdown + variant A/B for the exact@1M segmax engine.

Rows:
  gather_strided      vectors[rows] for strided membership (320 scattered
                      rows/query), force via sum
  gather_sorted       same rows, sorted per query before the gather
                      (locality; candidate order is irrelevant to top-k)
  gather_contig       slice-gather for contiguous membership (reshape view)
  phase2_full         gather + einsum + mask + top_k (strided rows)
  kernel_variants     contig kernel with interleave fold / jnp.max reduce
                      (phase 1 only) vs the shipped transposed-fold form

Appends one JSON line to bench/SEGMAX_AB.jsonl (tag=phase2).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, K, BATCH = 768, 10, 128
ITERS = int(os.environ.get("AB_ITERS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))
SEG = 32
CB = 4096


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from grape_vector_db_tpu.ops.distance import (_iterative_topk,
                                                  prepare_queries)
    from grape_vector_db_tpu.ops.segmax_pallas import (
        make_weight_plane, segmax_scores_pallas)

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
    q = random.normal(kq, (BATCH, DIM), jnp.float32)

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

    # shared prefix: kernel + selection -> seg_ids [B, K]
    def seg_ids_of(qi):
        qp = prepare_queries(qi, "cosine")
        w = make_weight_plane(norms, valid, "cosine")
        s = segmax_scores_pallas(qp, vecs, w)
        _, ids = _iterative_topk(s, K)
        return ids

    spb = CB // SEG
    m_ar = jnp.arange(SEG, dtype=jnp.int32)[None, None, :]

    def strided_rows(ids):
        blk = ids // spb
        j = ids % spb
        return (blk[:, :, None] * CB + j[:, :, None] + m_ar * spb
                ).reshape(ids.shape[0], -1)

    def f_gather(qi, vecs):
        ids = seg_ids_of(qi)
        rows_ = strided_rows(ids)
        cv = vecs[rows_]
        return cv.astype(jnp.float32).sum() * 1e-9

    def f_gather_sorted(qi, vecs):
        ids = seg_ids_of(qi)
        rows_ = jnp.sort(strided_rows(ids), axis=1)
        cv = vecs[rows_]
        return cv.astype(jnp.float32).sum() * 1e-9

    def f_gather_contig_view(qi, vecs):
        # same ids, but gather [SEG, D] slices via the reshaped view
        # (membership differs — timing-only comparison of the DMA pattern)
        ids = seg_ids_of(qi)
        cv = vecs.reshape(n // SEG, SEG, DIM)[ids]
        return cv.astype(jnp.float32).sum() * 1e-9

    def f_phase2_full(qi, vecs, norms, valid):
        ids = seg_ids_of(qi)
        rows_ = strided_rows(ids)
        cv = vecs[rows_]
        qp = prepare_queries(qi, "cosine")
        dots = jnp.einsum("bd,bcd->bc", qp.astype(vecs.dtype), cv,
                          preferred_element_type=jnp.float32)
        cw = 1.0 / jnp.maximum(norms[rows_], 1e-12)
        cw = jnp.where(valid[rows_], cw, 0.0)
        rs = jnp.where(cw == 0.0, -jnp.inf, dots * cw)
        fv, _ = lax.top_k(rs, K)
        return fv[0, 0]

    rows["p2_gather_strided"] = timed(f_gather, q, vecs)
    rows["p2_gather_sorted"] = timed(f_gather_sorted, q, vecs)
    rows["p2_gather_contig_view"] = timed(f_gather_contig_view, q, vecs)
    rows["p2_full_strided"] = timed(f_phase2_full, q, vecs, norms, valid)

    # ---- contig kernel variants (phase 1 only) ---------------------------

    cparams = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                   vmem_limit_bytes=48 * 1024 * 1024)

    def make_contig_call(kernel):
        def call(qp, vecs, w_t):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n // SEG, BATCH), jnp.float32),
                grid=(n // CB,),
                in_specs=[
                    pl.BlockSpec((BATCH, DIM), lambda i: (0, 0)),
                    pl.BlockSpec((CB, DIM), lambda i: (i, 0)),
                    pl.BlockSpec((CB, 8), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((CB // SEG, BATCH), lambda i: (i, 0)),
                compiler_params=cparams,
            )(qp, vecs, w_t)
        return call

    def k_interleave(q_vmem, vec_vmem, w_vmem, out_vmem):
        dots = jax.lax.dot_general(
            vec_vmem[...], q_vmem[...].astype(vec_vmem.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        w = w_vmem[:, 0:1]
        cur = jnp.where(w == 0.0, -jnp.inf, dots * w)
        nrows = cur.shape[0]
        while nrows > CB // SEG:
            cur = jnp.maximum(cur[0::2], cur[1::2])
            nrows //= 2
        out_vmem[...] = cur

    def k_maxreduce(q_vmem, vec_vmem, w_vmem, out_vmem):
        dots = jax.lax.dot_general(
            vec_vmem[...], q_vmem[...].astype(vec_vmem.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        w = w_vmem[:, 0:1]
        scores = jnp.where(w == 0.0, -jnp.inf, dots * w)
        out_vmem[...] = scores.reshape(CB // SEG, SEG, -1).max(axis=1)

    from grape_vector_db_tpu.ops.segmax_pallas import make_weight_plane_t

    for name, kern in (("k_contig_interleave", k_interleave),
                       ("k_contig_maxreduce", k_maxreduce)):
        call = make_contig_call(kern)

        def phase1(qi, vecs, norms, valid, call=call):
            qp = prepare_queries(qi, "cosine")
            w_t = make_weight_plane_t(norms, valid, "cosine")
            s = call(qp, vecs, w_t)
            return s[0, 0]

        try:
            rows[name] = timed(phase1, q, vecs, norms, valid)
        except Exception as e:  # lowering failure is a result too
            rows[name] = [None, str(e)[:120]]

    out = {"tag": "phase2", "n": n, "dim": DIM, "batch": BATCH,
           "iters": ITERS, "backend": jax.default_backend(),
           "rows_ms_best_median": {k_: (v if isinstance(v, list) else
                                        [round(v[0], 3), round(v[1], 3)])
                                   for k_, v in rows.items()}}
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SEGMAX_AB.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
