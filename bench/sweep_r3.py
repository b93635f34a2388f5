"""Round-2 continuation sweep: int8 Pallas probe + capacity configs + flat A/B.

Stages (env SWEEP_STAGES, comma list; each is safe to run alone):

  flatab : 131k x 768 flat exact engine A/B — iterative max-and-mask vs
           segment-max two-phase (VERDICT r1 item 10: pin the faster engine).
  ab1m   : 1M clustered — bf16 Pallas probe vs int8 Pallas probe on the SAME
           layout (nprobe 1/4/16), recall vs the exact bf16 oracle, int8 both
           raw (capacity config) and with bf16 rescore (bandwidth config).
  cap4m  : 4.19M clustered bf16 — the Pallas probe on the r2 capacity config
           (the r2 table only measured the XLA gather probe there).
  cap8m  : 8.39M clustered int8-only — the ~2x-rows/chip capacity config
           (codes+factor ~9.3GB HBM), Pallas int8 probe QPS + recall vs the
           full-scan int8 oracle.

Timing: ITERS inside ONE jitted lax.fori_loop with loop-carried data
dependence (CLAUDE.md honest-timing). Appends JSON lines to
bench/SWEEP_R3.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("SWEEP_OUT", "bench/SWEEP_R3.jsonl")
DIM, K, B = 768, 10, 128
SCALE = int(os.environ.get("SWEEP_SCALE", "1"))
STAGES = set(os.environ.get("SWEEP_STAGES", "flatab,ab1m,cap4m,cap8m"
                            ).split(","))


def log(stage: str, **kv) -> None:
    rec = {"stage": stage, **kv}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import (
        _segmax_exact_topk, prepare_queries, scored_topk)
    from grape_vector_db_tpu.ops.ivf_pallas import (
        ivf_pallas_supported, make_factor, make_recip, pallas_ivf_topk,
        pallas_ivf_topk_int8)
    from grape_vector_db_tpu.ops.kmeans import assign_clusters, kmeans

    interpret = not ivf_pallas_supported()
    print("backend:", jax.default_backend(), "interpret:", interpret,
          flush=True)

    def timed_fori(step_fn, q0, *operands, iters: int = 32) -> float:
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
        return max(best - 0.025, 1e-9) * 1e3 / iters

    def recall_at_k(got_idx: np.ndarray, want_idx: np.ndarray) -> float:
        hits = 0
        for g, w in zip(got_idx, want_idx):
            hits += len(set(g.tolist()) & set(w.tolist()))
        return hits / want_idx.size

    @jax.jit
    def quantize_rows(v):
        """bf16 [.., C, D] -> (int8 codes, f32 scales) per row."""
        vf = v.astype(jnp.float32)
        s = jnp.max(jnp.abs(vf), axis=-1) / 127.0
        vi = jnp.clip(jnp.round(vf / jnp.maximum(s[..., None], 1e-12)),
                      -127, 127).astype(jnp.int8)
        return vi, s

    # ------------------------------------------------------------- flat A/B
    if "flatab" in STAGES:
        n = 131_072 // SCALE
        key = random.PRNGKey(5)
        vecs = random.normal(key, (n, DIM), jnp.float32).astype(jnp.bfloat16)
        norms = jnp.linalg.norm(vecs.astype(jnp.float32), axis=1)
        valid = jnp.ones((n,), jnp.bool_)
        q0 = random.normal(random.PRNGKey(6), (B, DIM), jnp.float32)

        def step_iter(q, vecs, norms, valid):
            # n <= 262144 routes scored_topk to the iterative engine
            return scored_topk(q, vecs, norms, valid, k=K, metric="cosine",
                               chunk=n, mode="exact")

        def step_segmax(q, vecs, norms, valid):
            qp = prepare_queries(q, "cosine")
            return _segmax_exact_topk(qp, vecs, norms, valid, K, "cosine", n)

        ms_i = timed_fori(step_iter, q0, vecs, norms, valid)
        ms_s = timed_fori(step_segmax, q0, vecs, norms, valid)
        _, ii = jax.jit(step_iter)(q0, vecs, norms, valid)
        _, si = jax.jit(step_segmax)(q0, vecs, norms, valid)
        agree = float(np.mean(np.asarray(ii) == np.asarray(si)))
        log("flat_ab_131k", n=n, iter_ms=round(ms_i, 3),
            iter_qps=round(B / ms_i * 1e3, 0), segmax_ms=round(ms_s, 3),
            segmax_qps=round(B / ms_s * 1e3, 0), slot_agreement=round(agree, 4))
        vecs.delete(); norms.delete()

    # --------------------------------------------------- shared IVF builders
    def build_clustered_layout(n, nlist, n_centers, seed, which="both"):
        """Streaming clustered corpus -> bucketed IVF layout on device.
        ``which``: "both" | "bf16" | "int8" — which storage planes to build
        (unbuilt planes return None; skipping one saves its HBM footprint).
        Returns (cents, iv, inr, ival, codes, scales)."""
        noise = 0.25
        chunk = min(131_072 // SCALE, n)
        keyr = random.PRNGKey(seed)
        kc, keyr = random.split(keyr)
        centers = random.normal(kc, (n_centers, DIM), jnp.float32)

        @jax.jit
        def gen(k1, k2, cents_):
            cid = random.randint(k2, (chunk,), 0, cents_.shape[0])
            x = cents_[cid] + noise * random.normal(k1, (chunk, DIM),
                                                    jnp.float32)
            return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

        chunks_meta = []
        for _ in range(n // chunk):
            k1, k2, keyr = random.split(keyr, 3)
            chunks_meta.append((k1, k2))

        # pass 1: train on the first chunk
        v0, _ = gen(*chunks_meta[0], centers)
        t0 = time.perf_counter()
        cents, _ = kmeans(v0.astype(jnp.float32), k=nlist, iters=8, seed=0,
                          mode="spherical")
        cents.block_until_ready()
        t_train = time.perf_counter() - t0
        v0.delete()

        # pass 2: assign all chunks (regenerated), derive cap
        t0 = time.perf_counter()
        assigns = []
        for (k1, k2) in chunks_meta:
            v, _ = gen(k1, k2, centers)
            assigns.append(np.asarray(assign_clusters(
                v.astype(jnp.float32), cents, mode="spherical")))
        assign_all = np.concatenate(assigns)
        counts = np.bincount(assign_all, minlength=nlist)
        cap = int(((counts.max() + 127) // 128) * 128)  # pallas alignment

        iv = (jnp.zeros((nlist, cap, DIM), jnp.bfloat16)
              if which in ("both", "bf16") else None)
        codes = (jnp.zeros((nlist, cap, DIM), jnp.int8)
                 if which in ("both", "int8") else None)
        scales = (jnp.zeros((nlist, cap), jnp.float32)
                  if which in ("both", "int8") else None)
        inr = jnp.zeros((nlist, cap), jnp.float32)
        ival = jnp.zeros((nlist, cap), jnp.bool_)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def scatter_all(codes, scales, inr, ival, lists, pos, v, nn):
            vi, s = quantize_rows(v)
            codes = codes.at[lists, pos].set(vi)
            scales = scales.at[lists, pos].set(s)
            inr = inr.at[lists, pos].set(nn)
            ival = ival.at[lists, pos].set(True)
            return codes, scales, inr, ival

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scatter_nv(inr, ival, lists, pos, nn):
            inr = inr.at[lists, pos].set(nn)
            ival = ival.at[lists, pos].set(True)
            return inr, ival

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scatter_v(iv, lists, pos, v):
            return iv.at[lists, pos].set(v)

        next_pos = np.zeros(nlist, dtype=np.int64)
        off = 0
        for (k1, k2) in chunks_meta:
            v, nn_ = gen(k1, k2, centers)
            a = assign_all[off:off + chunk]
            order = np.argsort(a, kind="stable")
            sorted_a = a[order]
            grp_start = np.searchsorted(sorted_a, np.arange(nlist))
            within = np.arange(chunk) - grp_start[sorted_a]
            pos = np.empty(chunk, dtype=np.int32)
            pos[order] = (next_pos[sorted_a] + within).astype(np.int32)
            next_pos += np.bincount(a, minlength=nlist)
            lists_d, pos_d = jnp.asarray(a), jnp.asarray(pos)
            if codes is not None:
                codes, scales, inr, ival = scatter_all(
                    codes, scales, inr, ival, lists_d, pos_d, v, nn_)
            else:
                inr, ival = scatter_nv(inr, ival, lists_d, pos_d, nn_)
            if iv is not None:
                iv = scatter_v(iv, lists_d, pos_d, v)
            off += chunk
        ival.block_until_ready()
        centers.delete()
        log("build", n=n, nlist=nlist, list_cap=cap, which=which,
            train_s=round(t_train, 1), layout_s=round(time.perf_counter() - t0, 1))
        return cents, iv, inr, ival, codes, scales

    def corpus_queries(src, nlist, take_from):
        """B queries drawn near the corpus (pure-random queries reduce any
        partitioned index to chance — r2 finding)."""
        kq = random.PRNGKey(7)
        take = (B + nlist - 1) // nlist
        q = (take_from[:, :take, :].reshape(-1, DIM)[:B].astype(jnp.float32)
             + 0.05 * random.normal(kq, (B, DIM), jnp.float32))
        return q

    # ------------------------------------------------------------------ ab1m
    if "ab1m" in STAGES:
        n, nlist = 1_048_576 // SCALE, 4096 // SCALE
        cents, iv, inr, ival, codes, scales = build_clustered_layout(
            n, nlist, n_centers=16_384 // SCALE, seed=2, which="both")
        cap = codes.shape[1]
        recip = make_recip(inr, ival)
        factor = make_factor(scales, inr, ival)
        q0 = corpus_queries(None, nlist, iv)

        # exact bf16 oracle over the flattened layout
        nn = nlist * cap
        chunk = nn // 8 if nn % 8 == 0 and (nn // 8) % 32 == 0 else nn

        @jax.jit
        def f_oracle(q, iv, inr, ival):
            return scored_topk(q, iv.reshape(nn, DIM), inr.reshape(nn),
                               ival.reshape(nn), k=K, metric="cosine",
                               chunk=chunk, mode="exact")

        _, oi = f_oracle(q0, iv, inr, ival)
        oracle_i = np.asarray(oi)

        for nprobe in (1, 4, 16):
            def step_bf16(q, cents, iv, recip, nprobe=nprobe):
                return pallas_ivf_topk(q, cents, iv, recip, k=K,
                                       nprobe=nprobe, metric="cosine",
                                       interpret=interpret)

            def step_i8(q, cents, codes, factor, nprobe=nprobe):
                return pallas_ivf_topk_int8(q, cents, codes, factor, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            interpret=interpret)

            def step_i8r(q, cents, codes, factor, iv, recip, nprobe=nprobe):
                return pallas_ivf_topk_int8(q, cents, codes, factor, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            rescore=64, vecs=iv, recip=recip,
                                            interpret=interpret)

            ms_b = timed_fori(step_bf16, q0, cents, iv, recip)
            ms_8 = timed_fori(step_i8, q0, cents, codes, factor)
            ms_8r = timed_fori(step_i8r, q0, cents, codes, factor, iv, recip)
            _, sb = jax.jit(step_bf16)(q0, cents, iv, recip)
            _, s8 = jax.jit(step_i8)(q0, cents, codes, factor)
            _, s8r = jax.jit(step_i8r)(q0, cents, codes, factor, iv, recip)
            log("int8_probe_ab_1M", n=n, nlist=nlist, list_cap=cap,
                nprobe=nprobe,
                bf16_ms=round(ms_b, 3), bf16_qps=round(B / ms_b * 1e3, 0),
                bf16_recall=round(recall_at_k(np.asarray(sb), oracle_i), 4),
                int8_ms=round(ms_8, 3), int8_qps=round(B / ms_8 * 1e3, 0),
                int8_recall=round(recall_at_k(np.asarray(s8), oracle_i), 4),
                int8_rescore_ms=round(ms_8r, 3),
                int8_rescore_qps=round(B / ms_8r * 1e3, 0),
                int8_rescore_recall=round(
                    recall_at_k(np.asarray(s8r), oracle_i), 4))

    # ---------------------------------------------------------------- ragged
    if "ragged" in STAGES:
        # Ragged block-DMA fetch A/B: lists average well under the padded
        # capacity (max-list sizing), so skipping blocks past each list's
        # high-water mark cuts DMA bytes by cap/avg_fill. The probe is
        # bandwidth-bound — QPS should scale with bytes saved.
        from grape_vector_db_tpu.ops.ivf_pallas import RB

        n, nlist = 1_048_576 // SCALE, 4096 // SCALE
        cents, iv, inr, ival, codes, scales = build_clustered_layout(
            n, nlist, n_centers=16_384 // SCALE, seed=2, which="both")
        cap = codes.shape[1]
        recip = make_recip(inr, ival)
        factor = make_factor(scales, inr, ival)
        q0 = corpus_queries(None, nlist, iv)
        counts = np.asarray(jnp.sum(ival, axis=1))   # packed from pos 0
        nblocks = jnp.asarray(np.ceil(counts / RB).astype(np.int32))
        log("ragged_layout", cap=cap, avg_fill=round(float(counts.mean()), 1),
            avg_blocks=round(float(np.ceil(counts / RB).mean()), 2),
            full_blocks=cap // RB)

        nn = nlist * cap
        chunk = nn // 8 if nn % 8 == 0 and (nn // 8) % 32 == 0 else nn

        @jax.jit
        def f_oracle(q, iv, inr, ival):
            return scored_topk(q, iv.reshape(nn, DIM), inr.reshape(nn),
                               ival.reshape(nn), k=K, metric="cosine",
                               chunk=chunk, mode="exact")

        _, oi = f_oracle(q0, iv, inr, ival)
        oracle_i = np.asarray(oi)

        for nprobe in (1, 4):
            for tag, nb in (("full", None), ("ragged", nblocks)):
                def step_b(q, cents, iv, recip, nprobe=nprobe, nb=nb):
                    return pallas_ivf_topk(q, cents, iv, recip, k=K,
                                           nprobe=nprobe, metric="cosine",
                                           nblocks=nb, interpret=interpret)

                def step_8(q, cents, codes, factor, nprobe=nprobe, nb=nb):
                    return pallas_ivf_topk_int8(q, cents, codes, factor, k=K,
                                                nprobe=nprobe, metric="cosine",
                                                nblocks=nb,
                                                interpret=interpret)

                ms_b = timed_fori(step_b, q0, cents, iv, recip)
                ms_8 = timed_fori(step_8, q0, cents, codes, factor)
                _, sb = jax.jit(step_b)(q0, cents, iv, recip)
                _, s8 = jax.jit(step_8)(q0, cents, codes, factor)
                log("ragged_ab_1M", nprobe=nprobe, fetch=tag,
                    bf16_ms=round(ms_b, 3),
                    bf16_qps=round(B / ms_b * 1e3, 0),
                    bf16_recall=round(recall_at_k(np.asarray(sb), oracle_i), 4),
                    int8_ms=round(ms_8, 3),
                    int8_qps=round(B / ms_8 * 1e3, 0),
                    int8_recall=round(recall_at_k(np.asarray(s8), oracle_i), 4))

    # --------------------------------------------------------------- resweep
    if "resweep" in STAGES:
        n, nlist = 1_048_576 // SCALE, 4096 // SCALE
        cents, iv, inr, ival, codes, scales = build_clustered_layout(
            n, nlist, n_centers=16_384 // SCALE, seed=2, which="both")
        cap = codes.shape[1]
        recip = make_recip(inr, ival)
        factor = make_factor(scales, inr, ival)
        q0 = corpus_queries(None, nlist, iv)
        nn = nlist * cap
        chunk = nn // 8 if nn % 8 == 0 and (nn // 8) % 32 == 0 else nn

        @jax.jit
        def f_oracle(q, iv, inr, ival):
            return scored_topk(q, iv.reshape(nn, DIM), inr.reshape(nn),
                               ival.reshape(nn), k=K, metric="cosine",
                               chunk=chunk, mode="exact")

        _, oi = f_oracle(q0, iv, inr, ival)
        oracle_i = np.asarray(oi)
        for nprobe in (1, 2):
            for r in (0, 16, 32, 64):
                def step(q, cents, codes, factor, iv, recip,
                         nprobe=nprobe, r=r):
                    return pallas_ivf_topk_int8(
                        q, cents, codes, factor, k=K, nprobe=nprobe,
                        metric="cosine", rescore=r,
                        vecs=iv if r else None, recip=recip if r else None,
                        interpret=interpret)
                ms = timed_fori(step, q0, cents, codes, factor, iv, recip)
                _, sp = jax.jit(step)(q0, cents, codes, factor, iv, recip)
                log("int8_rescore_knee_1M", n=n, nprobe=nprobe, rescore=r,
                    ms=round(ms, 3), qps=round(B / ms * 1e3, 0),
                    recall=round(recall_at_k(np.asarray(sp), oracle_i), 4))

    # ----------------------------------------------------------------- cap4m
    if "cap4m" in STAGES:
        n, nlist = 4_194_304 // SCALE, 4096 // SCALE
        cents, iv, inr, ival, codes, scales = build_clustered_layout(
            n, nlist, n_centers=65_536 // SCALE, seed=3, which="bf16")
        cap = iv.shape[1]
        recip = make_recip(inr, ival)
        q0 = corpus_queries(None, nlist, iv)
        nn = nlist * cap
        chunk = nn // 16 if nn % 16 == 0 and (nn // 16) % 32 == 0 else nn

        @jax.jit
        def f_oracle4(q, iv, inr, ival):
            return scored_topk(q, iv.reshape(nn, DIM), inr.reshape(nn),
                               ival.reshape(nn), k=K, metric="cosine",
                               chunk=chunk, mode="exact")

        _, oi = f_oracle4(q0, iv, inr, ival)
        oracle_i = np.asarray(oi)
        from grape_vector_db_tpu.ops.ivf_pallas import nblocks_from_counts

        nblk4 = nblocks_from_counts(jnp.sum(ival, axis=1))
        for nprobe in (1, 4, 8):
            def step_p(q, cents, iv, recip, nblk, nprobe=nprobe):
                return pallas_ivf_topk(q, cents, iv, recip, k=K,
                                       nprobe=nprobe, metric="cosine",
                                       nblocks=nblk, interpret=interpret)
            ms = timed_fori(step_p, q0, cents, iv, recip, nblk4)
            _, sp = jax.jit(step_p)(q0, cents, iv, recip, nblk4)
            log("pallas_4M_bf16_ragged", n=n, nlist=nlist, list_cap=cap,
                nprobe=nprobe, ms=round(ms, 3), qps=round(B / ms * 1e3, 0),
                recall=round(recall_at_k(np.asarray(sp), oracle_i), 4))

    # ----------------------------------------------------------------- cap8m
    if "cap8m" in STAGES:
        n, nlist = 8_388_608 // SCALE, 8192 // SCALE
        cents, iv, inr, ival, codes, scales = build_clustered_layout(
            n, nlist, n_centers=131_072 // SCALE, seed=4, which="int8")
        assert iv is None
        cap = codes.shape[1]
        factor = make_factor(scales, inr, ival)
        # corpus-drawn queries from dequantized codes (no bf16 plane exists)
        kq = random.PRNGKey(7)
        take = (B + nlist - 1) // nlist
        qsrc = (codes[:, :take, :].astype(jnp.float32)
                * scales[:, :take, None]).reshape(-1, DIM)[:B]
        q0 = qsrc + 0.05 * random.normal(kq, (B, DIM), jnp.float32)

        # int8 full-scan oracle: exact top-k over dequantized scores, chunked
        # over lists (each chunk: [B, lists_per, cap] scores -> top_k).
        lists_per = 512 // SCALE if nlist % (512 // SCALE) == 0 else nlist

        @jax.jit
        def f_oracle8(q, codes, factor):
            qp = prepare_queries(q, "cosine")
            nchunks = nlist // lists_per
            c3 = codes.reshape(nchunks, lists_per, cap, DIM)
            f3 = factor.reshape(nchunks, lists_per, 8, cap)

            def body(carry, xs):
                cc, ff = xs
                dots = jnp.einsum("bd,lcd->blc", qp.astype(jnp.bfloat16),
                                  cc.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
                sc = dots * ff[:, 0, :][None] + jnp.where(
                    ff[:, 0, :][None] == 0.0, -1e9, 0.0)
                v, i = lax.top_k(sc.reshape(B, lists_per * cap), K)
                return carry, (v, i)

            _, (vs, is_) = lax.scan(body, None, (c3, f3))
            offs = (jnp.arange(nchunks, dtype=jnp.int32)
                    * (lists_per * cap))[:, None, None]
            is_ = is_ + offs
            vs = jnp.moveaxis(vs, 0, 1).reshape(B, -1)
            is_ = jnp.moveaxis(is_, 0, 1).reshape(B, -1)
            fv, fp = lax.top_k(vs, K)
            return fv, jnp.take_along_axis(is_, fp, axis=1)

        _, oi = f_oracle8(q0, codes, factor)
        oracle_i = np.asarray(oi)

        from grape_vector_db_tpu.ops.ivf_pallas import nblocks_from_counts

        nblk8 = nblocks_from_counts(jnp.sum(ival, axis=1))
        for nprobe in (1, 4, 8):
            def step_8(q, cents, codes, factor, nblk, nprobe=nprobe):
                return pallas_ivf_topk_int8(q, cents, codes, factor, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            nblocks=nblk, interpret=interpret)
            ms = timed_fori(step_8, q0, cents, codes, factor, nblk8)
            _, sp = jax.jit(step_8)(q0, cents, codes, factor, nblk8)
            log("int8_8M_capacity_ragged", n=n, nlist=nlist, list_cap=cap,
                nprobe=nprobe, ms=round(ms, 3), qps=round(B / ms * 1e3, 0),
                recall_vs_int8_oracle=round(
                    recall_at_k(np.asarray(sp), oracle_i), 4),
                hbm_gb=round((codes.size + factor.size * 4 + inr.size * 4)
                             / 2**30, 2))

    print("sweep r3 done", flush=True)


if __name__ == "__main__":
    main()
