"""A/B: Pallas DMA IVF probe vs XLA gather probe, 1M clustered on-chip.

Also times the probe with random (off-manifold) queries to isolate the
query-dependent fixed cost observed in the round-2 sweep.

Appends rows to bench/SWEEP_R2.jsonl (stage "probe_ab").
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

OUT = os.environ.get("SWEEP_OUT", "bench/SWEEP_R2.jsonl")
DIM, K, B = 768, 10, 128
SCALE = int(os.environ.get("SWEEP_SCALE", "1"))


def log(stage: str, **kv) -> None:
    rec = {"stage": stage, **kv}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.index.ivf import _ivf_topk
    from grape_vector_db_tpu.ops.ivf_pallas import (
        ivf_pallas_supported,
        make_recip,
        pallas_ivf_topk,
    )
    from grape_vector_db_tpu.ops.kmeans import assign_clusters, kmeans

    interpret = not ivf_pallas_supported()
    print("backend:", jax.default_backend(), "interpret:", interpret,
          flush=True)

    n = 1_048_576 // SCALE
    nlist = 4096 // SCALE
    n_centers = 16_384 // SCALE
    chunk = min(131_072 // SCALE, n)
    key = random.PRNGKey(2)
    kc, key = random.split(key)
    centers = random.normal(kc, (n_centers, DIM), jnp.float32)

    @jax.jit
    def gen(k1, k2, cents):
        cid = random.randint(k2, (chunk,), 0, cents.shape[0])
        x = cents[cid] + 0.25 * random.normal(k1, (chunk, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    vparts, nparts = [], []
    for _ in range(n // chunk):
        k1, k2, key = random.split(key, 3)
        v, nn = gen(k1, k2, centers)
        vparts.append(v)
        nparts.append(nn)
    vecs_flat = jnp.concatenate(vparts)
    norms_flat = jnp.concatenate(nparts)
    del vparts, nparts

    sel = random.choice(key, n, shape=(65_536 // SCALE,), replace=False)
    cents, _ = kmeans(vecs_flat[sel].astype(jnp.float32), k=nlist, iters=8,
                      seed=0, mode="spherical")
    assign = jnp.concatenate([
        assign_clusters(
            lax.dynamic_slice_in_dim(vecs_flat, i * chunk, chunk
                                     ).astype(jnp.float32),
            cents, mode="spherical")
        for i in range(n // chunk)
    ])
    counts = jnp.bincount(assign, length=nlist)
    cap = int(((int(np.asarray(counts.max())) + 127) // 128) * 128)  # pallas lane alignment

    @functools.partial(jax.jit, static_argnames=("cap_",))
    def layout(vecs, norms, assign, counts, cap_):
        order = jnp.argsort(assign)
        a_sorted = assign[order]
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        pos = jnp.arange(n, dtype=jnp.int32) - starts[a_sorted]
        iv = jnp.zeros((nlist, cap_, DIM), jnp.bfloat16)
        inr = jnp.zeros((nlist, cap_), jnp.float32)
        ival = jnp.zeros((nlist, cap_), jnp.bool_)
        iv = iv.at[a_sorted, pos].set(vecs[order])
        inr = inr.at[a_sorted, pos].set(norms[order])
        ival = ival.at[a_sorted, pos].set(True)
        return iv, inr, ival

    iv, inr, ival = layout(vecs_flat, norms_flat, assign, counts, cap)
    iv.block_until_ready()
    vecs_flat.delete()
    norms_flat.delete()
    recip = make_recip(inr, ival)
    log("probe_ab_build", n=n, nlist=nlist, list_cap=cap)

    kq = random.PRNGKey(7)
    take = (B + nlist - 1) // nlist
    q_corpus = (iv[:, :take, :].reshape(-1, DIM)[:B].astype(jnp.float32)
                + 0.05 * random.normal(kq, (B, DIM), jnp.float32))
    q_random = random.normal(kq, (B, DIM), jnp.float32)

    def timed_fori(step_fn, q0, *operands, iters: int = 32) -> float:
        @jax.jit
        def loop(q, *ops):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                vals, _ = step_fn(qq, *ops)
                return acc * 0.5 + vals[0, 0] * 1e-6
            return lax.fori_loop(0, iters, body, jnp.float32(0))

        float(np.asarray(loop(q0, *operands)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(q0, *operands)))
            best = min(best, time.perf_counter() - t0)
        return max(best - 0.025, 1e-9) * 1e3 / iters

    for nprobe in (1, 4, 16):
        def step_xla(q, cents, iv, inr, ival, nprobe=nprobe):
            return _ivf_topk(q, cents, iv, inr, ival, k=K, nprobe=nprobe,
                             metric="cosine")

        def step_pallas(q, cents, iv, recip, nprobe=nprobe):
            return pallas_ivf_topk(q, cents, iv, recip, k=K, nprobe=nprobe,
                                   metric="cosine", interpret=interpret)

        for qname, q0 in (("corpus", q_corpus), ("random", q_random)):
            ms_x = timed_fori(step_xla, q0, cents, iv, inr, ival)
            ms_p = timed_fori(step_pallas, q0, cents, iv, recip)
            # correctness: same probe -> same winning slots
            _, sx = jax.jit(step_xla)(q0, cents, iv, inr, ival)
            _, sp = jax.jit(step_pallas)(q0, cents, iv, recip)
            agree = float(np.mean(np.asarray(sx) == np.asarray(sp)))
            log("probe_ab", nprobe=nprobe, queries=qname,
                xla_ms=round(ms_x, 3), xla_qps=round(B / ms_x * 1e3, 0),
                pallas_ms=round(ms_p, 3), pallas_qps=round(B / ms_p * 1e3, 0),
                slot_agreement=round(agree, 4))
    print("probe A/B done", flush=True)


if __name__ == "__main__":
    main()
