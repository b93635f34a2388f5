"""Round-2 TPU sweep: the 1M x 768 recall-QPS frontier (VERDICT r1 items 2/4/5/10).

Measures on one real chip, everything generated ON DEVICE (no multi-GB host
staging through the relay):

  S1  1M random   : flat bf16 exact(segmax)/approx A/B, int8+rescore scan,
                    IVF(nlist=4096) nprobe sweep (recall@10 + QPS)
  S2  1M clustered: IVF nprobe sweep on 1024-center data (the representative
                    real-embedding case)
  S3  4M clustered: IVF capacity configuration (>=4M rows/chip, measured)

Timing: ITERS iterations inside ONE jitted lax.fori_loop with loop-carried
data dependence (the CLAUDE.md honest-timing pattern) for every engine except
the 1M segmax exact scan — fori-wrapping that engine hangs the relay AOT
compile (round-1 finding), so exact@1M is timed by chained data-dependent
dispatches with the slope method and carries a dispatch-floor caveat.

Appends one JSON line per measurement to bench/SWEEP_R2.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

OUT = os.environ.get("SWEEP_OUT", "bench/SWEEP_R2.jsonl")
DIM, K, B = 768, 10, 128
# CPU smoke mode: scale every corpus down by this factor (sizes stay
# multiples of the generator chunk)
SCALE = int(os.environ.get("SWEEP_SCALE", "1"))
# Resumable stages: comma list among s1ivf,s1flat,s2,s3 (a crashed stage can
# be skipped on relaunch; results append to the same jsonl).
STAGES = set(os.environ.get("SWEEP_STAGES", "s1ivf,s1flat,s2,s3").split(","))


def log(stage: str, **kv) -> None:
    rec = {"stage": stage, **kv}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import scored_topk
    from grape_vector_db_tpu.ops.kmeans import assign_clusters, kmeans

    print("backend:", jax.default_backend(), flush=True)

    # ---------------------------------------------------------------- helpers

    def gen_corpus(n: int, kind: str, seed: int, n_centers: int = 1024,
                   noise: float = 0.25):
        """[N, D] bf16 corpus + [N] f32 norms, generated on device in chunks."""
        chunk = min(131_072 // SCALE, n)
        key = random.PRNGKey(seed)
        centers = None
        if kind == "clustered":
            kc, key = random.split(key)
            centers = random.normal(kc, (n_centers, DIM), jnp.float32)

        @jax.jit
        def one_random(k1):
            x = random.normal(k1, (chunk, DIM), jnp.float32)
            return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

        @jax.jit
        def one_clustered(k1, k2, cents):
            cid = random.randint(k2, (chunk,), 0, cents.shape[0])
            x = cents[cid] + noise * random.normal(k1, (chunk, DIM), jnp.float32)
            return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

        vparts, nparts = [], []
        for _ in range(n // chunk):
            k1, k2, key = random.split(key, 3)
            if kind == "random":
                v, nn = one_random(k1)
            else:
                v, nn = one_clustered(k1, k2, centers)
            vparts.append(v)
            nparts.append(nn)
        return jnp.concatenate(vparts), jnp.concatenate(nparts)

    def build_ivf(vecs, norms, nlist: int, sample: int = 65_536 // SCALE, seed: int = 0):
        """Device-side IVF layout build: kmeans -> assign -> sort -> bucketed
        [L, C, D]. Returns (centroids, ivf_vecs, ivf_norms, ivf_valid)."""
        n = vecs.shape[0]
        key = random.PRNGKey(seed)
        sel = random.choice(key, n, shape=(sample,), replace=False)
        t0 = time.perf_counter()
        cents, _ = kmeans(vecs[sel].astype(jnp.float32), k=nlist, iters=8,
                          seed=seed, mode="spherical")
        cents.block_until_ready()
        t_kmeans = time.perf_counter() - t0

        t0 = time.perf_counter()
        chunk = min(131_072 // SCALE, n)
        assign = jnp.concatenate([
            assign_clusters(
                lax.dynamic_slice_in_dim(vecs, i * chunk, chunk).astype(jnp.float32),
                cents, mode="spherical")
            for i in range(n // chunk)
        ])
        counts = jnp.bincount(assign, length=nlist)
        cmax = int(np.asarray(counts.max()))
        cap = ((cmax + 63) // 64) * 64

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

        iv, inr, ival = layout(vecs, norms, assign, counts, cap)
        iv.block_until_ready()
        t_layout = time.perf_counter() - t0
        log("ivf_build", nlist=nlist, n=n, list_cap=cap,
            kmeans_s=round(t_kmeans, 1), layout_s=round(t_layout, 1))
        return cents, iv, inr, ival

    def timed_fori(step_fn, q0, *operands, iters: int = 32) -> float:
        """Per-call ms: ITERS calls inside one jitted fori_loop, loop-carried
        data dependence, one host readback (bench.py::timed_mode pattern).

        Corpus arrays MUST be passed via *operands, not closed over —
        closure-captured device arrays get baked into the lowered HLO as
        multi-GB constants that the relay re-uploads on every compile."""

        @jax.jit
        def loop(q, *ops):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                vals, _ = step_fn(qq, *ops)
                return acc * 0.5 + vals[0, 0] * 1e-6
            return lax.fori_loop(0, iters, body, jnp.float32(0))

        float(np.asarray(loop(q0, *operands)))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(q0, *operands)))
            best = min(best, time.perf_counter() - t0)
        return max(best - 0.025, 1e-9) * 1e3 / iters  # ~25ms relay overhead

    def timed_chain(fn, q0, m: int = 24) -> float:
        """Slope of chained data-dependent dispatches — only for kernels that
        cannot live inside fori (segmax@1M). Floor-limited by the relay
        dispatch rate; treat as an upper bound on kernel time."""
        def chain(length: int) -> float:
            q = q0
            t0 = time.perf_counter()
            v = None
            for _ in range(length):
                v, _ = fn(q)
                q = q0 * (1.0 + v[0, 0] * 1e-9)
            float(np.asarray(v[0, 0]))
            return time.perf_counter() - t0

        chain(2)  # warm every shape in the chain
        t1 = min(chain(1) for _ in range(3))
        tm = min(chain(m) for _ in range(2))
        return (tm - t1) * 1e3 / (m - 1)

    def recall_at_k(got_idx: np.ndarray, want_idx: np.ndarray) -> float:
        hits = 0
        for g, w in zip(got_idx, want_idx):
            hits += len(set(g.tolist()) & set(w.tolist()))
        return hits / want_idx.size

    # ---------------------------------------------------------------- S1: 1M random

    def flat_and_int8(vecs, norms, tag: str):
        n = vecs.shape[0]
        valid = jnp.ones((n,), jnp.bool_)
        kq = random.PRNGKey(99)
        q0 = random.normal(kq, (B, DIM), jnp.float32)

        chunk = n // 8

        @functools.partial(jax.jit, static_argnames=("mode",))
        def f_mode(q, vecs, norms, valid, mode="exact"):
            return scored_topk(q, vecs, norms, valid, k=K, metric="cosine",
                               chunk=chunk, mode=mode)

        oracle_v, oracle_i = f_mode(q0, vecs, norms, valid, mode="exact")
        oracle_i = np.asarray(oracle_i)

        def step_approx(q, vecs, norms, valid):
            return scored_topk(q, vecs, norms, valid, k=K, metric="cosine",
                               chunk=chunk, mode="approx")

        ms_approx = timed_fori(step_approx, q0, vecs, norms, valid)
        av, ai = f_mode(q0, vecs, norms, valid, mode="approx")
        rec_approx = recall_at_k(np.asarray(ai), oracle_i)
        log(f"flat_approx_{tag}", n=n,
            approx_ms=round(ms_approx, 3),
            approx_qps=round(B / ms_approx * 1e3, 0),
            approx_recall=round(rec_approx, 4))

        # int8 symmetric per-row quantized scan + bf16 rescore
        @jax.jit
        def quantize(v):
            vf = v.astype(jnp.float32)
            s = jnp.max(jnp.abs(vf), axis=1, keepdims=True) / 127.0
            vi = jnp.clip(jnp.round(vf / jnp.maximum(s, 1e-12)), -127, 127
                          ).astype(jnp.int8)
            return vi, s[:, 0]

        parts_i, parts_s = [], []
        step = n // 8
        for i in range(8):
            vi, s = quantize(lax.dynamic_slice_in_dim(vecs, i * step, step))
            parts_i.append(vi)
            parts_s.append(s)
        vecs_i8 = jnp.concatenate(parts_i)
        scales = jnp.concatenate(parts_s)
        # per-row factor folds dequant scale and the cosine norm division
        factor = scales / jnp.maximum(norms, 1e-12)

        RESCORE = 64

        def step_int8(q, vecs_i8, factor, vecs, norms):
            qf = q / jnp.linalg.norm(q, axis=1, keepdims=True)
            qs = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0
            qi = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
            dots = lax.dot_general(qi, vecs_i8, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
            scores = dots.astype(jnp.float32) * factor[None, :] * qs
            cv, ci = lax.approx_max_k(scores, RESCORE, recall_target=0.95)
            cvecs = vecs[ci]
            cn = norms[ci]
            d2 = jnp.einsum("bd,brd->br", qf.astype(jnp.bfloat16), cvecs,
                            preferred_element_type=jnp.float32)
            rs = jnp.minimum(d2 / jnp.maximum(cn, 1e-12), 1.0)
            tv, tp = lax.top_k(rs, K)
            return tv, jnp.take_along_axis(ci, tp, axis=1)

        ms_i8 = timed_fori(step_int8, q0, vecs_i8, factor, vecs, norms)
        _, ii = jax.jit(step_int8)(q0, vecs_i8, factor, vecs, norms)
        rec_i8 = recall_at_k(np.asarray(ii), oracle_i)
        log(f"int8_{tag}", n=n, int8_ms=round(ms_i8, 3),
            int8_qps=round(B / ms_i8 * 1e3, 0), recall=round(rec_i8, 4))

        # exact segmax last: chained-dispatch upper bound (fori hangs its AOT)
        ms_exact = timed_chain(
            lambda q: f_mode(q, vecs, norms, valid, mode="exact"), q0)
        log(f"flat_exact_{tag}", n=n, exact_ms_upper=round(ms_exact, 3),
            exact_qps_lower=round(B / ms_exact * 1e3, 0))
        return q0

    def ivf_sweep(vecs, norms, tag: str, nlist: int, probes,
                  free_corpus: bool = False):
        n = vecs.shape[0]
        cents, iv, inr, ival = build_ivf(vecs, norms, nlist)
        if free_corpus:
            # the raw corpus is only needed for the build; freeing it makes
            # room for the probe gathers + oracle workspace
            vecs.delete()
            norms.delete()
        del vecs, norms
        cap = iv.shape[1]
        flatv = iv.reshape(nlist * cap, DIM)
        flatn = inr.reshape(nlist * cap)
        flatm = ival.reshape(nlist * cap)
        kq = random.PRNGKey(7)
        # corpus-drawn queries: real queries live near the data manifold;
        # pure-random queries are ~orthogonal to every cluster and reduce any
        # partitioned index to chance (measured: recall 0.15 on clustered
        # data with random queries vs >0.9 with corpus-drawn ones)
        take = (B + nlist - 1) // nlist
        assert bool(np.asarray(ival[:, :take].reshape(-1)[:B].all())), "unbalanced lists"
        q0 = (iv[:, :take, :].reshape(-1, DIM)[:B].astype(jnp.float32)
              + 0.05 * random.normal(kq, (B, DIM), jnp.float32))

        nn = nlist * cap
        chunk = nn // 8 if (nn // 8) % 32 == 0 and nn % 8 == 0 else nn

        @jax.jit
        def f_oracle(q, flatv, flatn, flatm):
            return scored_topk(q, flatv, flatn, flatm, k=K, metric="cosine",
                               chunk=chunk, mode="exact")

        _, oi = f_oracle(q0, flatv, flatn, flatm)
        oracle_i = np.asarray(oi)

        from grape_vector_db_tpu.index.ivf import _ivf_topk

        for nprobe in probes:
            def step_ivf(q, cents, iv, inr, ival, nprobe=nprobe):
                return _ivf_topk(q, cents, iv, inr, ival, k=K, nprobe=nprobe,
                                 metric="cosine")
            ms = timed_fori(step_ivf, q0, cents, iv, inr, ival)
            _, si = jax.jit(step_ivf)(q0, cents, iv, inr, ival)
            rec = recall_at_k(np.asarray(si), oracle_i)
            log(f"ivf_{tag}", n=n, nlist=nlist, list_cap=cap, nprobe=nprobe,
                ms=round(ms, 3), qps=round(B / ms * 1e3, 0),
                recall=round(rec, 4))
        return cents, iv, inr, ival

    # S1 --------------------------------------------------------------------
    print("=== S1: 1M random ===", flush=True)
    if STAGES & {"s1ivf", "s1flat"}:
        vecs, norms = gen_corpus(1_048_576 // SCALE, "random", seed=1)
        if "s1ivf" in STAGES:
            # nprobe=64 with list_cap~320 gathers a 4GB [B,P,C,D] intermediate
            # and OOMs the chip next to the 3.5GB corpus+ivf residents.
            ivf_sweep(vecs, norms, "1M_random", nlist=4096 // SCALE,
                      probes=(1, 2, 4, 8, 16, 32))
        if "s1flat" in STAGES:
            flat_and_int8(vecs, norms, "1M_random")
        del vecs, norms

    # S2 --------------------------------------------------------------------
    print("=== S2: 1M clustered ===", flush=True)
    if "s2" in STAGES:
        # 16k natural clusters (fine-grained, like real embedding corpora) so
        # 4096 kmeans lists each absorb ~4 of them and stay balanced — 1024
        # giant clusters skewed list_cap to 1152 (7.2GB padded) and OOM'd.
        vecs, norms = gen_corpus(1_048_576 // SCALE, "clustered", seed=2,
                                 n_centers=16384 // SCALE)
        ivf_sweep(vecs, norms, "1M_clustered", nlist=4096 // SCALE,
                  probes=(1, 2, 4, 8, 16), free_corpus=True)

    # S3 --------------------------------------------------------------------
    print("=== S3: 4M clustered capacity ===", flush=True)
    if "s3" not in STAGES:
        print("sweep done (s3 skipped)", flush=True)
        return
    # Streaming build: 4M bf16 corpus (6GB) + padded IVF layout (7GB+) do not
    # fit side by side with layout workspace; generate chunks, assign, and
    # scatter them straight into the bucketed arrays — the flat corpus never
    # exists on device.
    n4 = 4_194_304 // SCALE
    # nlist=8192 padded to cap 1088 = 13.7GB (list-size skew ~2.1x mean);
    # 4096 lists at mean 1024 pad proportionally less and fit
    nlist = 4096 // SCALE
    n_centers4 = 65536 // SCALE
    noise = 0.25
    chunk = min(131_072 // SCALE, n4)
    keyr = random.PRNGKey(3)
    kc, keyr = random.split(keyr)
    centers4 = random.normal(kc, (n_centers4, DIM), jnp.float32)

    @jax.jit
    def gen4(k1, k2, cents_):
        cid = random.randint(k2, (chunk,), 0, cents_.shape[0])
        x = cents_[cid] + noise * random.normal(k1, (chunk, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    # pass 1: sample + train
    k1, k2, keyr = random.split(keyr, 3)
    sample_v, _ = gen4(k1, k2, centers4)
    t0 = time.perf_counter()
    cents, _ = kmeans(sample_v.astype(jnp.float32), k=nlist, iters=8, seed=0,
                      mode="spherical")
    cents.block_until_ready()
    log("ivf4_train", nlist=nlist, kmeans_s=round(time.perf_counter() - t0, 1))

    # pass 2: regenerate chunks, assign, host-computed positions, scatter
    keyr = random.PRNGKey(3)
    kc, keyr = random.split(keyr)
    assigns = []
    chunks_meta = []
    for _ in range(n4 // chunk):
        k1, k2, keyr = random.split(keyr, 3)
        chunks_meta.append((k1, k2))
    t0 = time.perf_counter()
    for (k1, k2) in chunks_meta:
        v, _ = gen4(k1, k2, centers4)
        assigns.append(np.asarray(assign_clusters(v.astype(jnp.float32),
                                                  cents, mode="spherical")))
    assign_all = np.concatenate(assigns)
    counts = np.bincount(assign_all, minlength=nlist)
    cap = int(((counts.max() + 63) // 64) * 64)
    next_pos = np.zeros(nlist, dtype=np.int64)
    iv = jnp.zeros((nlist, cap, DIM), jnp.bfloat16)
    inr = jnp.zeros((nlist, cap), jnp.float32)
    ival = jnp.zeros((nlist, cap), jnp.bool_)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def scatter4(iv, inr, ival, lists, pos, v, nn):
        iv = iv.at[lists, pos].set(v)
        inr = inr.at[lists, pos].set(nn)
        ival = ival.at[lists, pos].set(True)
        return iv, inr, ival

    off = 0
    for (k1, k2) in chunks_meta:
        v, nn_ = gen4(k1, k2, centers4)
        a = assign_all[off:off + chunk]
        # vectorized within-chunk position assignment
        order = np.argsort(a, kind="stable")
        sorted_a = a[order]
        grp_start = np.searchsorted(sorted_a, np.arange(nlist))
        within = np.arange(chunk) - grp_start[sorted_a]
        pos = np.empty(chunk, dtype=np.int32)
        pos[order] = (next_pos[sorted_a] + within).astype(np.int32)
        next_pos += np.bincount(a, minlength=nlist)
        iv, inr, ival = scatter4(iv, inr, ival, jnp.asarray(a),
                                 jnp.asarray(pos), v, nn_)
        off += chunk
    iv.block_until_ready()
    centers4.delete()
    log("ivf_build", nlist=nlist, n=n4, list_cap=cap,
        kmeans_s=-1, layout_s=round(time.perf_counter() - t0, 1))
    kq = random.PRNGKey(11)
    take = (B + nlist - 1) // nlist
    assert bool(np.asarray(ival[:, :take].reshape(-1)[:B].all())), "unbalanced lists"
    q0 = (iv[:, :take, :].reshape(-1, DIM)[:B].astype(jnp.float32)
          + 0.05 * random.normal(kq, (B, DIM), jnp.float32))
    nn = nlist * cap
    chunk = nn // 16 if nn % 16 == 0 and (nn // 16) % 32 == 0 else nn

    # reshape INSIDE the jit: the eager reshape of the 10.5GB layout array
    # dispatches a copy (21GB transient -> OOM); in-jit it is a bitcast
    @jax.jit
    def f_oracle4(q, iv, inr, ival):
        return scored_topk(q, iv.reshape(nn, DIM), inr.reshape(nn),
                           ival.reshape(nn), k=K, metric="cosine",
                           chunk=chunk, mode="exact")

    _, oi = f_oracle4(q0, iv, inr, ival)
    oracle_i = np.asarray(oi)
    from grape_vector_db_tpu.index.ivf import _ivf_topk
    for nprobe in (4, 8, 16):
        def f_ivf4(q, cents, iv, inr, ival, nprobe=nprobe):
            return _ivf_topk(q, cents, iv, inr, ival, k=K, nprobe=nprobe,
                             metric="cosine")
        ms = timed_fori(f_ivf4, q0, cents, iv, inr, ival)
        _, si = jax.jit(f_ivf4)(q0, cents, iv, inr, ival)
        rec = recall_at_k(np.asarray(si), oracle_i)
        log("ivf_4M_clustered", n=4_194_304 // SCALE, nlist=nlist, list_cap=cap,
            nprobe=nprobe, ms=round(ms, 3), qps=round(B / ms * 1e3, 0),
            recall=round(rec, 4))

    print("sweep done", flush=True)


if __name__ == "__main__":
    main()
