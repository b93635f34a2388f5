"""On-chip IVF-PQ sweep at 1M x 768 (VERDICT r2 item 2).

Measures the PQ recall-QPS frontier against the int8/bf16 engines on the
same clustered corpus bench.py's north-star rows use: residual PQ codes
(n_sub bytes/row), ADC scan over probed lists, optionally + int8-resident
rescore of the top candidates.

One (n_sub, nprobe, mode) combo per process invocation (each combo is a
fresh relay compile — keep each run inside the driver's timeout):

    python bench/sweep_pq.py                      # default 96/4/int8
    PQ_NSUB=192 PQ_NPROBE=16 PQ_MODE=none python bench/sweep_pq.py

Appends one JSON line per run to bench/SWEEP_PQ.jsonl.

Timing follows CLAUDE.md relay rules: ITERS inside one jitted fori loop
with loop-carried data dependence, one forced readback, ~25 ms relay
overhead subtracted.
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
SCALE = int(os.environ.get("BENCH_SCALE", "1"))
N_SUB = int(os.environ.get("PQ_NSUB", "96"))
NPROBE = int(os.environ.get("PQ_NPROBE", "4"))
MODE = os.environ.get("PQ_MODE", "int8")  # none | int8
RESCORE = int(os.environ.get("PQ_RESCORE", "256"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.index.ivf_pq import _ivfpq_topk
    from grape_vector_db_tpu.ops.distance import scored_topk
    from grape_vector_db_tpu.ops.kmeans import assign_clusters, kmeans
    from grape_vector_db_tpu.ops.pq import train_pq

    chunk1m = 131_072 // SCALE
    n1m = 8 * chunk1m
    nlist = max(4096 // SCALE, 8)
    ncent = max(16_384 // SCALE, 4)
    key = random.PRNGKey(1)
    kc, key = random.split(key)
    centers = random.normal(kc, (ncent, DIM), jnp.float32)

    @jax.jit
    def genc(k1, k2, cents):
        cid = random.randint(k2, (chunk1m,), 0, cents.shape[0])
        x = cents[cid] + 0.25 * random.normal(k1, (chunk1m, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    pv, pn = [], []
    for _ in range(8):
        k1, k2, key = random.split(key, 3)
        v, nn_ = genc(k1, k2, centers)
        pv.append(v)
        pn.append(nn_)
    cv1m = jnp.concatenate(pv)
    cn1m = jnp.concatenate(pn)
    del pv, pn

    sel = random.choice(key, n1m, shape=(max(65_536 // SCALE, nlist),),
                        replace=False)
    cents, _ = kmeans(cv1m[sel].astype(jnp.float32), k=nlist, iters=8, seed=0,
                      mode="spherical")
    assign = jnp.concatenate([
        assign_clusters(
            lax.dynamic_slice_in_dim(cv1m, i * chunk1m, chunk1m
                                     ).astype(jnp.float32),
            cents, mode="spherical")
        for i in range(8)
    ])
    counts = jnp.bincount(assign, length=nlist)
    cap1 = int(((int(np.asarray(counts.max())) + 127) // 128) * 128)

    # residual PQ codebooks on a sample
    sample = cv1m[sel].astype(jnp.float32)
    sample_res = sample - cents[assign_clusters(sample, cents,
                                                mode="spherical")]
    books = train_pq(sample_res, n_sub=N_SUB, nbits=8, iters=8, seed=0)

    # blockwise residual encode (full-corpus [N, S, 256] intermediates OOM)
    from grape_vector_db_tpu.ops.pq import encode_pq

    eb = 8192
    @jax.jit
    def encode_block(v, a, cents, books):
        res = v.astype(jnp.float32) - cents[a]
        return encode_pq(res, books)

    code_blocks = []
    for i in range(n1m // eb):
        v = lax.dynamic_slice_in_dim(cv1m, i * eb, eb)
        a = lax.dynamic_slice_in_dim(assign, i * eb, eb)
        code_blocks.append(encode_block(v, a, cents, books))
    codes_flat = jnp.concatenate(code_blocks)            # [N, S] u8
    del code_blocks

    # bucketed layout [L, cap, ...]
    @functools.partial(jax.jit, static_argnames=("cap_",))
    def layout(vecs, codes, norms, assign, counts, cap_):
        order = jnp.argsort(assign)
        a_sorted = assign[order]
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        pos = jnp.arange(n1m, dtype=jnp.int32) - starts[a_sorted]
        cd = jnp.zeros((nlist, cap_, N_SUB), jnp.uint8)
        iv = jnp.zeros((nlist, cap_, DIM), jnp.bfloat16)
        inr = jnp.zeros((nlist, cap_), jnp.float32)
        ival = jnp.zeros((nlist, cap_), jnp.bool_)
        cd = cd.at[a_sorted, pos].set(codes[order])
        iv = iv.at[a_sorted, pos].set(vecs[order])
        inr = inr.at[a_sorted, pos].set(norms[order])
        ival = ival.at[a_sorted, pos].set(True)
        return cd, iv, inr, ival

    cd, iv, inr, ival = layout(cv1m, codes_flat, cn1m, assign, counts, cap1)
    cd.block_until_ready()
    del codes_flat

    # int8 rescore plane (quantize the bucketed bf16 blockwise)
    codes8 = scales8 = None
    if MODE == "int8":
        lb = max(nlist // 8, 1)

        @jax.jit
        def quant_block(block):
            vf = block.astype(jnp.float32)
            s = jnp.max(jnp.abs(vf), axis=-1) / 127.0
            vi = jnp.clip(jnp.round(vf / jnp.maximum(s[..., None], 1e-12)),
                          -127, 127).astype(jnp.int8)
            return vi, s

        pc, ps = [], []
        for i in range(nlist // lb):
            vi, s = quant_block(lax.dynamic_slice_in_dim(iv, i * lb, lb))
            pc.append(vi)
            ps.append(s)
        codes8 = jnp.concatenate(pc)
        scales8 = jnp.concatenate(ps)
        del pc, ps

    # queries: corpus-drawn + noise (same protocol as bench.py north star)
    kq, key = random.split(key)
    take = (BATCH + nlist - 1) // nlist
    qc = (iv[:, :take, :].reshape(-1, DIM)[:BATCH].astype(jnp.float32)
          + 0.05 * random.normal(kq, (BATCH, DIM), jnp.float32))

    # exact oracle over the padded universe
    nn_tot = nlist * cap1

    @jax.jit
    def oracle(q, iv, inr, ival):
        ch = nn_tot // 16 if nn_tot % 16 == 0 and (nn_tot // 16) % 32 == 0 else nn_tot
        return scored_topk(q, iv.reshape(nn_tot, DIM), inr.reshape(nn_tot),
                           ival.reshape(nn_tot), k=K, metric="cosine",
                           chunk=ch, mode="exact")

    _, oi = oracle(qc, iv, inr, ival)
    oi = np.asarray(oi)

    rk = 0 if MODE == "none" else RESCORE
    rvecs = codes8 if MODE == "int8" else None
    rscales = scales8 if MODE == "int8" else None

    def step(q, cents, books, cd, rvecs_, rscales_, inr, ival):
        return _ivfpq_topk(q, cents, books, cd, rvecs_, rscales_, inr, ival,
                           nprobe=NPROBE, rescore_k=rk, k=K, metric="cosine",
                           residual=True)

    if MODE == "none":
        def step2(q, cents, books, cd, inr, ival):
            return step(q, cents, books, cd, None, None, inr, ival)
        operands = (cents, books, cd, inr, ival)
        stepper = step2
    else:
        operands = (cents, books, cd, rvecs, rscales, inr, ival)
        stepper = step

    # recall
    _, si = jax.jit(stepper)(qc, *operands)
    si = np.asarray(si)
    rec = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(si, oi)
    ]))

    # timing: fori with loop-carried dependence
    iters = 32 if SCALE == 1 else 2

    @jax.jit
    def loop(q, *ops):
        def body(i, acc):
            qq = q * (1.0 + acc * 1e-9)
            vals, _ = stepper(qq, *ops)
            return acc * 0.5 + vals[0, 0] * 1e-6
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    float(np.asarray(loop(qc, *operands)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(qc, *operands)))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - 0.025, 1e-9) * 1e3 / iters

    per_row = N_SUB + 4 + 1 + (DIM + 4 if MODE == "int8" else 0)
    rec_out = {
        "engine": "ivf_pq", "n": n1m, "dim": DIM, "nlist": nlist,
        "n_sub": N_SUB, "nprobe": NPROBE, "mode": MODE,
        "rescore": rk, "batch_ms": round(ms, 3),
        "qps": round(BATCH / ms * 1e3, 0), "recall_at_10": round(rec, 4),
        "bytes_per_row_resident": per_row,
        "list_cap": cap1,
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec_out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SWEEP_PQ.jsonl"), "a") as f:
        f.write(json.dumps(rec_out) + "\n")


if __name__ == "__main__":
    main()
