"""Int4 probe sweep: the packed-nibble rung of the HBM-bandwidth ladder.

Stages (env SWEEP_STAGES, comma list; each is safe to run alone):

  ab1m   : 1M clustered — int8 Pallas probe vs int4 Pallas probe on the SAME
           layout (nprobe 1/4), both raw and with bf16 rescore=64, ragged
           block-DMA fetch on, recall vs the exact bf16 oracle. The probe is
           DMA-bound, so int4's 384 B/row (half of int8) should approach 2x
           the int8 probe's QPS; the question is what the 4-bit rank noise
           costs and whether rescore recovers it.
  cap16m : 16.78M clustered int4-only — the ~4x-rows/chip capacity config
           (codes+factor ~9 GB HBM at D=768, 2x the int8 8.39M tier at FULL
           dimension, unlike the proj-384 tier), Pallas int4 probe QPS +
           recall vs the full-scan int4 oracle.
  cap16m_hard : the honest regime for the same 16.78M layout — held-out
           queries (fresh cluster samples) scored vs the bf16-EXACT
           full-dimension oracle streamed from the deterministic
           generator; reports recall@10 and top-64 containment (the
           host-rescore recall ceiling) at nprobe 1/4/8.

Timing: ITERS inside ONE jitted lax.fori_loop with loop-carried data
dependence (CLAUDE.md honest-timing). Appends JSON lines to
bench/SWEEP_INT4.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("SWEEP_OUT", "bench/SWEEP_INT4.jsonl")
DIM, K, B = 768, 10, 128
SCALE = int(os.environ.get("SWEEP_SCALE", "1"))
STAGES = set(os.environ.get("SWEEP_STAGES", "ab1m,cap16m").split(","))


def log(stage: str, **kv) -> None:
    rec = {"stage": stage, **kv}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import prepare_queries, scored_topk
    from grape_vector_db_tpu.ops.int4 import quantize_int4, unpack_int4
    from grape_vector_db_tpu.ops.ivf_pallas import (
        ivf_pallas_supported, make_factor, make_recip, nblocks_from_counts,
        pallas_ivf_topk_int4, pallas_ivf_topk_int8)
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
    def quantize_rows_i8(v):
        vf = v.astype(jnp.float32)
        s = jnp.max(jnp.abs(vf), axis=-1) / 127.0
        vi = jnp.clip(jnp.round(vf / jnp.maximum(s[..., None], 1e-12)),
                      -127, 127).astype(jnp.int8)
        return vi, s

    def build_clustered_layout(n, nlist, n_centers, seed, planes,
                               keep_gen: bool = False):
        """Streaming clustered corpus -> bucketed IVF layout on device.
        ``planes``: subset of {"bf16", "int8", "int4"} — which storage
        planes to build. Returns a dict of device arrays; with
        ``keep_gen`` it also carries the deterministic chunk generator
        (centers + PRNG keys) and the row->layout-slot map, so callers can
        re-stream the full-precision corpus for an exact oracle without it
        ever being chip-resident."""
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

        v0, _ = gen(*chunks_meta[0], centers)
        t0 = time.perf_counter()
        cents, _ = kmeans(v0.astype(jnp.float32), k=nlist, iters=8, seed=0,
                          mode="spherical")
        cents.block_until_ready()
        t_train = time.perf_counter() - t0
        v0.delete()

        t0 = time.perf_counter()
        assigns = []
        for (k1, k2) in chunks_meta:
            v, _ = gen(k1, k2, centers)
            assigns.append(np.asarray(assign_clusters(
                v.astype(jnp.float32), cents, mode="spherical")))
        assign_all = np.concatenate(assigns)
        counts = np.bincount(assign_all, minlength=nlist)
        cap = int(((counts.max() + 127) // 128) * 128)

        out = {
            "cents": cents,
            "inr": jnp.zeros((nlist, cap), jnp.float32),
            "ival": jnp.zeros((nlist, cap), jnp.bool_),
        }
        if "bf16" in planes:
            out["iv"] = jnp.zeros((nlist, cap, DIM), jnp.bfloat16)
        if "int8" in planes:
            out["codes8"] = jnp.zeros((nlist, cap, DIM), jnp.int8)
            out["scales8"] = jnp.zeros((nlist, cap), jnp.float32)
        if "int4" in planes:
            out["codes4"] = jnp.zeros((nlist, cap, DIM // 2), jnp.int8)
            out["scales4"] = jnp.zeros((nlist, cap), jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scat_nv(inr, ival, lists, pos, nn):
            return (inr.at[lists, pos].set(nn),
                    ival.at[lists, pos].set(True))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scat_v(iv, lists, pos, v):
            return iv.at[lists, pos].set(v)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scat_i8(codes, scales, lists, pos, v):
            vi, s = quantize_rows_i8(v)
            return (codes.at[lists, pos].set(vi),
                    scales.at[lists, pos].set(s))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scat_i4(codes, scales, lists, pos, v):
            vi, s = quantize_int4(v.astype(jnp.float32))
            return (codes.at[lists, pos].set(vi),
                    scales.at[lists, pos].set(s))

        next_pos = np.zeros(nlist, dtype=np.int64)
        rowmap = np.empty(n, dtype=np.int64) if keep_gen else None
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
            if rowmap is not None:
                rowmap[off:off + chunk] = a.astype(np.int64) * cap + pos
            lists_d, pos_d = jnp.asarray(a), jnp.asarray(pos)
            out["inr"], out["ival"] = scat_nv(out["inr"], out["ival"],
                                              lists_d, pos_d, nn_)
            if "iv" in out:
                out["iv"] = scat_v(out["iv"], lists_d, pos_d, v)
            if "codes8" in out:
                out["codes8"], out["scales8"] = scat_i8(
                    out["codes8"], out["scales8"], lists_d, pos_d, v)
            if "codes4" in out:
                out["codes4"], out["scales4"] = scat_i4(
                    out["codes4"], out["scales4"], lists_d, pos_d, v)
            off += chunk
        out["ival"].block_until_ready()
        if keep_gen:
            out["centers"] = centers
            out["chunks_meta"] = chunks_meta
            out["gen"] = gen
            out["rowmap"] = rowmap
            out["chunk"] = chunk
        else:
            centers.delete()
        log("build", n=n, nlist=nlist, list_cap=cap, planes=sorted(planes),
            train_s=round(t_train, 1),
            layout_s=round(time.perf_counter() - t0, 1))
        return out

    def corpus_queries_from(take_from_rows):
        kq = random.PRNGKey(7)
        q = (take_from_rows[:B].astype(jnp.float32)
             + 0.05 * random.normal(kq, (B, DIM), jnp.float32))
        return q

    # ------------------------------------------------------------------ ab1m
    if "ab1m" in STAGES:
        n, nlist = 1_048_576 // SCALE, 4096 // SCALE
        lay = build_clustered_layout(n, nlist, n_centers=16_384 // SCALE,
                                     seed=2, planes={"bf16", "int8", "int4"})
        cents, iv, inr, ival = lay["cents"], lay["iv"], lay["inr"], lay["ival"]
        codes8, scales8 = lay["codes8"], lay["scales8"]
        codes4, scales4 = lay["codes4"], lay["scales4"]
        cap = codes8.shape[1]
        recip = make_recip(inr, ival)
        factor8 = make_factor(scales8, inr, ival)
        factor4 = make_factor(scales4, inr, ival)
        nblk = nblocks_from_counts(jnp.sum(ival, axis=1))
        take = (B + nlist - 1) // nlist
        q0 = corpus_queries_from(iv[:, :take, :].reshape(-1, DIM))

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
            def step_8(q, cents, codes8, factor8, nblk, nprobe=nprobe):
                return pallas_ivf_topk_int8(q, cents, codes8, factor8, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            nblocks=nblk, interpret=interpret)

            def step_4(q, cents, codes4, factor4, nblk, nprobe=nprobe):
                return pallas_ivf_topk_int4(q, cents, codes4, factor4, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            nblocks=nblk, interpret=interpret)

            def step_4r(q, cents, codes4, factor4, iv, recip, nblk,
                        nprobe=nprobe):
                return pallas_ivf_topk_int4(q, cents, codes4, factor4, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            rescore=64, vecs=iv, recip=recip,
                                            nblocks=nblk, interpret=interpret)

            ms_8 = timed_fori(step_8, q0, cents, codes8, factor8, nblk)
            ms_4 = timed_fori(step_4, q0, cents, codes4, factor4, nblk)
            ms_4r = timed_fori(step_4r, q0, cents, codes4, factor4, iv,
                               recip, nblk)
            _, s8 = jax.jit(step_8)(q0, cents, codes8, factor8, nblk)
            _, s4 = jax.jit(step_4)(q0, cents, codes4, factor4, nblk)
            _, s4r = jax.jit(step_4r)(q0, cents, codes4, factor4, iv, recip,
                                      nblk)
            log("int4_probe_ab_1M", n=n, nlist=nlist, list_cap=cap,
                nprobe=nprobe,
                int8_ms=round(ms_8, 3), int8_qps=round(B / ms_8 * 1e3, 0),
                int8_recall=round(recall_at_k(np.asarray(s8), oracle_i), 4),
                int4_ms=round(ms_4, 3), int4_qps=round(B / ms_4 * 1e3, 0),
                int4_recall=round(recall_at_k(np.asarray(s4), oracle_i), 4),
                int4_rescore_ms=round(ms_4r, 3),
                int4_rescore_qps=round(B / ms_4r * 1e3, 0),
                int4_rescore_recall=round(
                    recall_at_k(np.asarray(s4r), oracle_i), 4))
        for a in (iv, inr, ival, codes8, scales8, codes4, scales4, recip,
                  factor8, factor4):
            a.delete()

    # ---------------------------------------------------------------- cap16m
    if "cap16m" in STAGES:
        n, nlist = 16_777_216 // SCALE, 16_384 // SCALE
        lay = build_clustered_layout(n, nlist, n_centers=262_144 // SCALE,
                                     seed=4, planes={"int4"})
        cents, inr, ival = lay["cents"], lay["inr"], lay["ival"]
        codes4, scales4 = lay["codes4"], lay["scales4"]
        cap = codes4.shape[1]
        factor4 = make_factor(scales4, inr, ival)
        nblk = nblocks_from_counts(jnp.sum(ival, axis=1))
        # corpus-drawn queries from dequantized nibbles (no bf16 plane)
        kq = random.PRNGKey(7)
        take = (B + nlist - 1) // nlist
        qsrc = (unpack_int4(codes4[:, :take, :]).astype(jnp.float32)
                * scales4[:, :take, None]).reshape(-1, DIM)[:B]
        q0 = qsrc + 0.05 * random.normal(kq, (B, DIM), jnp.float32)

        # int4 full-scan oracle: exact top-k over dequantized scores,
        # chunked over lists.
        lists_per = 256 // SCALE if nlist % (256 // SCALE) == 0 else nlist

        @jax.jit
        def f_oracle16(q, codes4, factor4):
            qp = prepare_queries(q, "cosine")
            nchunks = nlist // lists_per
            c3 = codes4.reshape(nchunks, lists_per, cap, DIM // 2)
            f3 = factor4.reshape(nchunks, lists_per, 8, cap)

            def body(carry, xs):
                cc, ff = xs
                cand = unpack_int4(cc).astype(jnp.bfloat16)
                dots = jnp.einsum("bd,lcd->blc", qp.astype(jnp.bfloat16),
                                  cand, preferred_element_type=jnp.float32)
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

        _, oi = f_oracle16(q0, codes4, factor4)
        oracle_i = np.asarray(oi)

        for nprobe in (1, 4, 8):
            def step_4(q, cents, codes4, factor4, nblk, nprobe=nprobe):
                return pallas_ivf_topk_int4(q, cents, codes4, factor4, k=K,
                                            nprobe=nprobe, metric="cosine",
                                            nblocks=nblk, interpret=interpret)
            ms = timed_fori(step_4, q0, cents, codes4, factor4, nblk)
            _, sp = jax.jit(step_4)(q0, cents, codes4, factor4, nblk)
            log("int4_16M_capacity_ragged", n=n, nlist=nlist, list_cap=cap,
                nprobe=nprobe, ms=round(ms, 3), qps=round(B / ms * 1e3, 0),
                recall_vs_int4_oracle=round(
                    recall_at_k(np.asarray(sp), oracle_i), 4),
                hbm_gb=round((codes4.size + factor4.size * 4
                              + inr.size * 4 + scales4.size * 4) / 2**30, 2))

    # ---------------------------------------------------------- cap16m_masked
    if "cap16m_masked" in STAGES:
        # Masked filtered search on the capacity tier (VERDICT r3 item 6):
        # the cell_mask plumbing reaches the int4 probe
        # (ivf_int4.py:147-159) and CPU tests prove exactness, but every
        # on-chip filtered-QPS number dated from the r2 bf16 probe. One row
        # each at ~1% and ~50% selectivity: QPS + (a) strict containment —
        # every returned id allowed — and (b) recall vs the MASKED int4
        # full-scan oracle at the same ranking arithmetic.
        n, nlist = 16_777_216 // SCALE, 16_384 // SCALE
        lay = build_clustered_layout(n, nlist, n_centers=262_144 // SCALE,
                                     seed=4, planes={"int4"})
        cents, inr, ival = lay["cents"], lay["inr"], lay["ival"]
        codes4, scales4 = lay["codes4"], lay["scales4"]
        cap = codes4.shape[1]
        factor4 = make_factor(scales4, inr, ival)
        nblk = nblocks_from_counts(jnp.sum(ival, axis=1))
        kq = random.PRNGKey(7)
        take = (B + nlist - 1) // nlist
        qsrc = (unpack_int4(codes4[:, :take, :]).astype(jnp.float32)
                * scales4[:, :take, None]).reshape(-1, DIM)[:B]
        q0 = qsrc + 0.05 * random.normal(kq, (B, DIM), jnp.float32)

        lists_per = 256 // SCALE if nlist % (256 // SCALE) == 0 else nlist

        @jax.jit
        def f_oracle16_masked(q, codes4, factor4, mask):
            qp = prepare_queries(q, "cosine")
            nchunks = nlist // lists_per
            c3 = codes4.reshape(nchunks, lists_per, cap, DIM // 2)
            f3 = factor4.reshape(nchunks, lists_per, 8, cap)
            m3 = mask.reshape(nchunks, lists_per, cap)

            def body(carry, xs):
                cc, ff, mm = xs
                cand = unpack_int4(cc).astype(jnp.bfloat16)
                dots = jnp.einsum("bd,lcd->blc", qp.astype(jnp.bfloat16),
                                  cand, preferred_element_type=jnp.float32)
                w = jnp.where(mm, ff[:, 0, :], 0.0)
                sc = dots * w[None] + jnp.where(w[None] == 0.0, -1e9, 0.0)
                v, i = lax.top_k(sc.reshape(B, lists_per * cap), K)
                return carry, (v, i)

            _, (vs, is_) = lax.scan(body, None, (c3, f3, m3))
            offs = (jnp.arange(nchunks, dtype=jnp.int32)
                    * (lists_per * cap))[:, None, None]
            is_ = is_ + offs
            vs = jnp.moveaxis(vs, 0, 1).reshape(B, -1)
            is_ = jnp.moveaxis(is_, 0, 1).reshape(B, -1)
            fv, fp = lax.top_k(vs, K)
            return fv, jnp.take_along_axis(is_, fp, axis=1)

        kmask = random.PRNGKey(21)
        for sel in (0.5, 0.01):
            k1, kmask = random.split(kmask)
            mask = jnp.logical_and(
                random.uniform(k1, ival.shape) < sel, ival)
            allowed_np = np.asarray(mask)
            _, omi = f_oracle16_masked(q0, codes4, factor4, mask)
            oracle_m = np.asarray(omi)

            for nprobe in (4, 8):
                def step_m(q, cents, codes4, factor4, mask, nblk,
                           nprobe=nprobe):
                    return pallas_ivf_topk_int4(
                        q, cents, codes4, factor4, k=K, nprobe=nprobe,
                        metric="cosine", nblocks=nblk, cell_mask=mask,
                        interpret=interpret)

                ms = timed_fori(step_m, q0, cents, codes4, factor4, mask,
                                nblk)
                _, sm = jax.jit(step_m)(q0, cents, codes4, factor4, mask,
                                        nblk)
                sm = np.asarray(sm)
                flat_allowed = allowed_np.reshape(-1)
                viol = int(sum(0 if flat_allowed[i] else 1
                               for row in sm for i in row.tolist()
                               if i >= 0))
                log("int4_16M_masked", n=n, nlist=nlist, selectivity=sel,
                    nprobe=nprobe, ms=round(ms, 3),
                    qps=round(B / ms * 1e3, 0),
                    disallowed_returned=viol,
                    recall_vs_masked_oracle=round(
                        recall_at_k(sm, oracle_m), 4))
        del lay, cents, inr, ival, codes4, scales4, factor4

    # ------------------------------------------------------------ cap16m_hard
    if "cap16m_hard" in STAGES:
        # The honest regime for the 16.78M tier: HELD-OUT queries (fresh
        # samples from the cluster distribution, not near-duplicates of
        # stored rows) scored against the bf16-EXACT full-dimension oracle,
        # streamed chunk-by-chunk from the deterministic generator (the fp
        # corpus is never chip-resident — it wouldn't fit). Charges int4
        # quantization + IVF reachability together. Also reports top-64
        # containment of the true top-10: the recall ceiling of the
        # host-tier exact rescore on this codes-only config.
        n, nlist = 16_777_216 // SCALE, 16_384 // SCALE
        lay = build_clustered_layout(n, nlist, n_centers=262_144 // SCALE,
                                     seed=4, planes={"int4"}, keep_gen=True)
        cents, inr, ival = lay["cents"], lay["inr"], lay["ival"]
        codes4, scales4 = lay["codes4"], lay["scales4"]
        cap = codes4.shape[1]
        factor4 = make_factor(scales4, inr, ival)
        nblk = nblocks_from_counts(jnp.sum(ival, axis=1))
        centers, chunks_meta = lay["centers"], lay["chunks_meta"]
        gen, rowmap, chunk = lay["gen"], lay["rowmap"], lay["chunk"]

        kq = random.PRNGKey(11)
        kc_, kn_ = random.split(kq)
        qcid = random.randint(kc_, (B,), 0, centers.shape[0])
        q_hard = (centers[qcid]
                  + 0.25 * random.normal(kn_, (B, DIM), jnp.float32))

        ones = jnp.ones((chunk,), jnp.bool_)

        @jax.jit
        def f_chunk_topk(q, v, nn):
            return scored_topk(q, v, nn, ones, k=K, metric="cosine",
                               chunk=chunk, mode="exact")

        t0 = time.perf_counter()
        all_v, all_i = [], []
        for ci, (k1, k2) in enumerate(chunks_meta):
            v, nn_ = gen(k1, k2, centers)
            cv, cidx = f_chunk_topk(q_hard, v, nn_)
            all_v.append(np.asarray(cv))
            all_i.append(np.asarray(cidx) + ci * chunk)
        vs = np.concatenate(all_v, axis=1)
        is_ = np.concatenate(all_i, axis=1)
        ordr = np.argsort(-vs, axis=1)[:, :K]
        oracle_flat = rowmap[np.take_along_axis(is_, ordr, axis=1)]
        print(f"streamed exact oracle over {len(chunks_meta)} chunks in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        for nprobe in (1, 4, 8):
            def step_k(q, cents, codes4, factor4, nblk, kk, nprobe=nprobe):
                return pallas_ivf_topk_int4(q, cents, codes4, factor4, k=kk,
                                            nprobe=nprobe, metric="cosine",
                                            nblocks=nblk,
                                            interpret=interpret)

            _, s10 = jax.jit(functools.partial(step_k, kk=K))(
                q_hard, cents, codes4, factor4, nblk)
            s10 = np.asarray(s10)

            def containment(kk: int) -> float:
                _, sk = jax.jit(functools.partial(step_k, kk=kk))(
                    q_hard, cents, codes4, factor4, nblk)
                sk = np.asarray(sk)
                return sum(
                    len(set(g.tolist()) & set(w.tolist()))
                    for g, w in zip(sk, oracle_flat)) / oracle_flat.size

            ms = timed_fori(
                functools.partial(step_k, kk=K), q_hard, cents, codes4,
                factor4, nblk) if nprobe == 4 else None
            log("int4_16M_hard_queries", n=n, nlist=nlist, list_cap=cap,
                nprobe=nprobe,
                recall_at_10_vs_exact_bf16=round(
                    recall_at_k(s10, oracle_flat), 4),
                top64_containment_of_true_top10=round(containment(64), 4),
                top256_containment_of_true_top10=round(containment(256), 4),
                **({"ms": round(ms, 3), "qps": round(B / ms * 1e3, 0)}
                   if ms is not None else {}))

    # ---------------------------------------------------- cap16m_exhaustive
    if "cap16m_exhaustive" in STAGES:
        # VERDICT r4 item 3: (a) the selectivity CURVE of the plain in-probe
        # mask — the measured points were 1.0 recall at 50% and 0.13 at 1%
        # with nothing between, so config.filter_exhaustive_below = 0.05 was
        # a guess; (b) the on-chip cost of exactness: the exhaustive masked
        # scan (ops/ivf_scan.py — one streaming corpus pass + k-list probe)
        # at low selectivity, recall vs the masked int4 oracle (must be 1.0
        # bar bf16 accumulation ties).
        from grape_vector_db_tpu.ops.ivf_scan import (default_chunk_lists,
            ivf_exhaustive_masked_topk)

        n, nlist = 16_777_216 // SCALE, 16_384 // SCALE
        lay = build_clustered_layout(n, nlist, n_centers=262_144 // SCALE,
                                     seed=4, planes={"int4"})
        cents, inr, ival = lay["cents"], lay["inr"], lay["ival"]
        codes4, scales4 = lay["codes4"], lay["scales4"]
        cap = codes4.shape[1]
        factor4 = make_factor(scales4, inr, ival)
        nblk = nblocks_from_counts(jnp.sum(ival, axis=1))
        kq = random.PRNGKey(7)
        take = (B + nlist - 1) // nlist
        qsrc = (unpack_int4(codes4[:, :take, :]).astype(jnp.float32)
                * scales4[:, :take, None]).reshape(-1, DIM)[:B]
        q0 = qsrc + 0.05 * random.normal(kq, (B, DIM), jnp.float32)

        lists_per = 256 // SCALE if nlist % (256 // SCALE) == 0 else nlist

        @jax.jit
        def f_oracle16_masked(q, codes4, factor4, mask):
            qp = prepare_queries(q, "cosine")
            nchunks = nlist // lists_per
            c3 = codes4.reshape(nchunks, lists_per, cap, DIM // 2)
            f3 = factor4.reshape(nchunks, lists_per, 8, cap)
            m3 = mask.reshape(nchunks, lists_per, cap)

            def body(carry, xs):
                cc, ff, mm = xs
                cand = unpack_int4(cc).astype(jnp.bfloat16)
                dots = jnp.einsum("bd,lcd->blc", qp.astype(jnp.bfloat16),
                                  cand, preferred_element_type=jnp.float32)
                w = jnp.where(mm, ff[:, 0, :], 0.0)
                sc = dots * w[None] + jnp.where(w[None] == 0.0, -1e9, 0.0)
                v, i = lax.top_k(sc.reshape(B, lists_per * cap), K)
                return carry, (v, i)

            _, (vs, is_) = lax.scan(body, None, (c3, f3, m3))
            offs = (jnp.arange(nchunks, dtype=jnp.int32)
                    * (lists_per * cap))[:, None, None]
            is_ = is_ + offs
            vs = jnp.moveaxis(vs, 0, 1).reshape(B, -1)
            is_ = jnp.moveaxis(is_, 0, 1).reshape(B, -1)
            fv, fp = lax.top_k(vs, K)
            return fv, jnp.take_along_axis(is_, fp, axis=1)

        cl = default_chunk_lists(nlist, cap)

        def step_exh(q, codes4, factor4, mask, nblk):
            return ivf_exhaustive_masked_topk(
                q, codes4, factor4, mask, k=K, metric="cosine", fmt="int4",
                chunk_lists=cl, use_kernel=not interpret,
                interpret=interpret, nblocks=nblk)

        kmask = random.PRNGKey(33)
        sels = tuple(float(s) for s in os.environ.get(
            "SWEEP_SELS", "0.25,0.10,0.05,0.02,0.01").split(","))
        for sel in sels:
            k1, kmask = random.split(kmask)
            mask = jnp.logical_and(random.uniform(k1, ival.shape) < sel, ival)
            _, omi = f_oracle16_masked(q0, codes4, factor4, mask)
            oracle_m = np.asarray(omi)

            row = {"n": n, "nlist": nlist, "selectivity": sel}
            # masked-probe recall points: TPU only (the interpreted Pallas
            # probe cannot finish a 65k-row dry-run on the 1-core host; the
            # masked probe itself is already exercised on-chip and in the
            # CPU suite at test scale)
            for nprobe in (() if interpret else (4, 8)):
                def step_m(q, cents, codes4, factor4, mask, nblk,
                           nprobe=nprobe):
                    return pallas_ivf_topk_int4(
                        q, cents, codes4, factor4, k=K, nprobe=nprobe,
                        metric="cosine", nblocks=nblk, cell_mask=mask,
                        interpret=interpret)

                _, sm = jax.jit(step_m)(q0, cents, codes4, factor4, mask,
                                        nblk)
                row[f"probe_recall_np{nprobe}"] = round(
                    recall_at_k(np.asarray(sm), oracle_m), 4)
            if sel in (sels[0], sels[-1]):
                # exactness cost: time the exhaustive scan (small-trip fori
                # — full-iteration wrapping of big XLA scans hung the relay
                # AOT once, 2-8 trips compile fine) and assert recall
                ms_e = timed_fori(step_exh, q0, codes4, factor4, mask, nblk,
                                  iters=8)
                _, se = jax.jit(step_exh)(q0, codes4, factor4, mask, nblk)
                row["exhaustive_ms"] = round(ms_e, 3)
                row["exhaustive_qps"] = round(B / ms_e * 1e3, 0)
                row["exhaustive_recall"] = round(
                    recall_at_k(np.asarray(se), oracle_m), 4)

            # compact tier: gather only the allowed rows (source dtype),
            # exact-scan those — cost ~ selectivity, not corpus size
            # (ops/ivf_scan.py ivf_compact_masked_topk; same HBM budget
            # the index routing uses)
            from grape_vector_db_tpu.ops.ivf_scan import (
                ivf_compact_masked_topk)
            from grape_vector_db_tpu.utils.buckets import next_bucket

            m_np = np.asarray(mask)
            r_allowed = int(m_np.sum())
            rp = next_bucket(max(r_allowed, 1), base=2048)
            row_bytes = DIM // 2
            if rp * row_bytes <= (1 << 30):
                cells_np = np.full(rp, -1, np.int32)
                cells_np[:r_allowed] = np.flatnonzero(
                    m_np.reshape(-1)).astype(np.int32)
                cells_d = jnp.asarray(cells_np)
                cr = min(131_072, rp)

                def step_c(q, codes4, factor4, cells):
                    # roll by a query-derived (loop-varying, value-zero in
                    # expectation-free way) shift so the row gather cannot
                    # hoist out of the timing loop: in production every
                    # dispatch re-gathers (TIMING TRAP note, CLAUDE.md)
                    shift = jnp.abs(q[0, 0] * 1e4).astype(jnp.int32) % rp
                    return ivf_compact_masked_topk(
                        q, codes4, factor4, jnp.roll(cells, shift),
                        k=K, metric="cosine", fmt="int4", chunk_rows=cr)

                def step_c_fixed(q, codes4, factor4, cells):
                    return ivf_compact_masked_topk(
                        q, codes4, factor4, cells,
                        k=K, metric="cosine", fmt="int4", chunk_rows=cr)

                ms_c = timed_fori(step_c, q0, codes4, factor4, cells_d,
                                  iters=32)
                # hoisted variant: the gather lifts out of the loop, so the
                # delta vs ms_c decomposes gather vs scan
                ms_cs = timed_fori(step_c_fixed, q0, codes4, factor4,
                                   cells_d, iters=32)
                _, sc_ = jax.jit(step_c_fixed)(q0, codes4, factor4, cells_d)
                row["compact_rows"] = rp
                row["compact_ms"] = round(ms_c, 3)
                row["compact_qps"] = round(B / ms_c * 1e3, 0)
                row["compact_scan_only_ms"] = round(ms_cs, 3)
                row["compact_recall"] = round(
                    recall_at_k(np.asarray(sc_), oracle_m), 4)
            log("int4_16M_selectivity_curve", **row)
        del lay, cents, inr, ival, codes4, scales4, factor4

    print("sweep int4 done", flush=True)


if __name__ == "__main__":
    main()
