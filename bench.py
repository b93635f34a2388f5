"""Headline benchmark: per-engine query-throughput matrix on the real chip.

Workloads (BASELINE.md configs): 100k x 768-d bf16 corpus, batched top-10
queries, one engine per row — flat exact / flat approx / int8 two-stage /
binary two-stage / IVF / IVF-PQ — plus 1M x 768 points for the engines that
matter at that scale (flat approx, int8, segmax exact). The reference's
read-path number is 42,018 QPS on CPU (docs/project-status-summary.md:21);
``vs_baseline`` is exact-flat queries/sec over that.

Timing: ITERS iterations inside one jitted ``lax.fori_loop`` with a
loop-carried data dependence (neither XLA nor the TPU relay can elide or
dedupe iterations); one host readback closes the measurement; corpus arrays
are passed as jit operands (closure capture would bake them into the HLO).
The 1M exact row runs the fused Pallas matmul+segmax engine and is fori-
timed like every other row (the r2 AOT hang was specific to wrapping the
XLA segmax scan at full trip counts).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "matrix",
...} where matrix holds the per-engine rows.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

BASELINE_READ_QPS = 42_018.0
DIM, K, BATCH = 768, 10, 128
# CPU smoke mode: divide corpus sizes (BENCH_SCALE=16 for the test suite)
SCALE = int(os.environ.get("BENCH_SCALE", "1"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.index import FlatDeviceIndex
    from grape_vector_db_tpu.ops.distance import scored_topk

    n, cap = 100_000 // SCALE, 131_072 // SCALE
    iters = 60 if SCALE == 1 else 4
    rng = np.random.default_rng(0)
    matrix: dict = {}

    # ---------------------------------------------------------------- helpers

    def timed_fori_reps(step_fn, q0, *operands, its: int = iters,
                        reps: int = 3):
        """(best_ms, median_ms) over ``reps`` timed loop executions — the
        sub-ms rows ride relay variance (documented 2-3x run-to-run), so
        the matrix records both the best draw and the median."""
        @jax.jit
        def loop(q, *ops):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                vals, _ = step_fn(qq, *ops)
                return acc * 0.5 + vals[0, 0] * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(q0, *operands)))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(q0, *operands)))
            times.append(time.perf_counter() - t0)
        times.sort()
        to_ms = lambda t: max(t - 0.025, 1e-9) * 1e3 / its
        return to_ms(times[0]), to_ms(times[len(times) // 2])

    def timed_fori(step_fn, q0, *operands, its: int = iters) -> float:
        return timed_fori_reps(step_fn, q0, *operands, its=its)[0]

    def recall_vs(oracle_ids, hits_rows) -> float:
        got = 0
        for want, row in zip(oracle_ids, hits_rows):
            ids = {h[0] for h in row}
            got += sum(1 for w in want if f"doc-{w}" in ids)
        return got / oracle_ids.size

    # ---------------------------------------------------------------- corpus

    idx = FlatDeviceIndex(dimension=DIM, metric="cosine",
                          storage_dtype="bfloat16", initial_capacity=cap)
    ids = [f"doc-{i}" for i in range(n)]
    vecs = rng.standard_normal((n, DIM), dtype=np.float32)
    for i in range(0, n, 8192):
        idx.add_batch(ids[i:i + 8192], vecs[i:i + 8192])

    queries = rng.standard_normal((BATCH, DIM), dtype=np.float32)
    q_dev = jnp.asarray(queries)

    # numpy oracle for recall columns (4 queries is enough for a sanity recall)
    qn = queries[:8] / np.linalg.norm(queries[:8], axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ vn.T), axis=1)[:, :K]

    # ---------------------------------------------------------------- ingest

    ibs = min(8192, n)
    nb = n // ibs
    stage_vecs = jnp.asarray(vecs[: nb * ibs].reshape(nb, ibs, DIM))
    stage_norms = jnp.linalg.norm(stage_vecs, axis=2)
    stage_slots = jnp.arange(nb * ibs, dtype=jnp.int32).reshape(nb, ibs)

    @jax.jit
    def ingest_loop(vectors, norms, valid, sv, sn, ss):
        def step(i, carry):
            vectors, norms, valid = carry
            vectors = vectors.at[ss[i]].set(sv[i].astype(vectors.dtype))
            norms = norms.at[ss[i]].set(sn[i])
            valid = valid.at[ss[i]].set(True)
            return (vectors, norms, valid)
        return lax.fori_loop(0, nb, step, (vectors, norms, valid))

    out = ingest_loop(idx.vectors, idx.norms, idx.valid, stage_vecs,
                      stage_norms, stage_slots)
    float(np.asarray(out[1][0]))  # compile + force
    t0 = time.perf_counter()
    out = ingest_loop(idx.vectors, idx.norms, idx.valid, stage_vecs,
                      stage_norms, stage_slots)
    float(np.asarray(out[1][0]))
    ingest_s = time.perf_counter() - t0
    matrix["ingest_100k"] = {
        "docs_per_s": round(nb * ibs / ingest_s, 0),
    }
    del stage_vecs, stage_norms, stage_slots, out

    # ------------------------------------------------- write path (full API)
    # End-to-end batch_add_documents: store + vector-index scatter + BM25
    # inverted index + filter columns (the reference's 13,240 write QPS was
    # its storage layer alone). Steady-state protocol: first batch warms jit
    # caches, GC paused, device queue drained inside the timed region.
    if SCALE == 1:
        import gc

        from grape_vector_db_tpu import Document, VectorDatabase
        from grape_vector_db_tpu.config import VectorDbConfig

        wcfg = VectorDbConfig(vector_dimension=DIM)
        wcfg.index.initial_capacity = cap
        wcfg.cache.enabled = False
        wdocs = [Document(id=f"w{i}", content=f"doc {i} topic{i % 7}",
                          vector=vecs[i]) for i in range(n)]
        wb = 4096

        def write_draw() -> float:
            wdb = VectorDatabase(config=wcfg)
            wdb.batch_add_documents(wdocs[:wb])  # warm jit caches
            gc.collect()
            gc.disable()
            try:
                t0 = time.perf_counter()
                for i in range(wb, n, wb):
                    wdb.batch_add_documents(wdocs[i:i + wb])
                jax.block_until_ready(getattr(wdb.index, "vectors", None))
                dt = time.perf_counter() - t0
            finally:
                gc.enable()
            wdb.close()
            return (n - wb) / dt

        # The relay's upload bandwidth swings run-to-run (observed 1.9k-39k
        # docs/s for identical code), so a single draw records tunnel
        # weather: take >= 2 draws, report best + median, score the median.
        wdraws = [write_draw()]
        wdraws.append(write_draw())
        if (n - wb) / wdraws[0] < 30.0:  # first draw fast -> afford a third
            wdraws.append(write_draw())
        w_med = float(np.median(wdraws))
        matrix["write_path_100k"] = {
            "docs_per_s": round(max(wdraws), 0),
            "docs_per_s_median": round(w_med, 0),
            "draws": [round(d, 0) for d in wdraws],
            "vs_write_baseline_13240": round(w_med / 13_240, 2),
            "note": "full batch_add_documents (store+index+BM25+filters); "
                    "best + median over draws (relay upload bandwidth "
                    "varies; embeddings ship as bf16 to halve the bytes) — "
                    "quiet-relay/co-located draws in bench/SERVING.jsonl",
        }
        del wdocs

    # ------------------------------------------------------------- flat modes

    def step_flat(q, vectors, norms, valid, mode):
        return scored_topk(q, vectors, norms, valid, k=K, metric="cosine",
                           mode=mode)

    for mode in ("exact", "approx"):
        def stepper(q, vectors, norms, valid, mode=mode):
            return step_flat(q, vectors, norms, valid, mode)
        ms = timed_fori(stepper, q_dev, idx.vectors, idx.norms, idx.valid)
        hits = idx.search_batch(queries[:8], K) if mode == "exact" else None
        row = {"batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0)}
        if mode == "exact":
            row["recall"] = round(recall_vs(oracle, hits), 3)
        matrix[f"flat_{mode}_100k"] = row
    # fail fast: the end-of-run assert once caught result corruption (TPU
    # denormal flush in the packed fetch) only after the full 8-minute run
    assert matrix["flat_exact_100k"]["recall"] >= 0.9, \
        f"flat exact recall corrupted: {matrix['flat_exact_100k']}"
    exact_qps = matrix["flat_exact_100k"]["qps"]

    # --------------------------------------------------------------- int8

    from grape_vector_db_tpu.index.int8 import Int8DeviceIndex
    from grape_vector_db_tpu.ops.int8 import int8_topk

    i8 = Int8DeviceIndex(dimension=DIM, metric="cosine",
                         storage_dtype="bfloat16", initial_capacity=cap)
    for i in range(0, n, 8192):
        i8.add_batch(ids[i:i + 8192], vecs[i:i + 8192])

    from grape_vector_db_tpu.index.binary import _rescore_topk

    r8 = i8._rescore_count(K)

    def step_int8(q, codes, factor, valid, vectors, norms):
        cvals, cand = int8_topk(q, codes, factor, valid, k=r8, chunk=cap)
        dist = jnp.where(jnp.isfinite(cvals), 0, 2**30).astype(jnp.int32)
        return _rescore_topk(q, vectors, norms, cand, dist, k=K,
                             metric="cosine")

    factor8 = i8.scales / jnp.maximum(i8.norms, 1e-12)
    ms = timed_fori(step_int8, q_dev, i8.codes, factor8, i8.valid,
                    i8.vectors, i8.norms)
    matrix["int8_100k"] = {
        "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
        "recall": round(recall_vs(oracle, i8.search_batch(queries[:8], K)), 3),
    }
    del i8, factor8

    # --------------------------------------------------------------- binary

    from grape_vector_db_tpu.index.binary import BinaryDeviceIndex
    from grape_vector_db_tpu.ops.hamming import asym_topk

    # r3 note: the pre-scan is now the MXU sign-bit matmul (0.11 ms at 131k —
    # the popcount form was 22 ms); what remains is the selection + rescore
    # gather, which scale with the rescore budget. On random data the
    # recall/QPS frontier is: rescore 512 -> 0.46, 1024 -> 0.58, 4096 ->
    # 0.83, 16384 -> 0.97 recall@10 — and the EXACT flat scan runs 0.83 ms
    # at recall 1.0, so two-stage BQ is dominated at HBM-resident scale even
    # with the scan at roofline. BQ's real role is the 32x capacity config
    # (keep_vectors=False); this row records the engine at its best-QPS
    # operating point with that honest position.
    bq = BinaryDeviceIndex(dimension=DIM, metric="cosine",
                           storage_dtype="bfloat16", initial_capacity=cap,
                           max_rescore=1024)
    for i in range(0, n, 8192):
        bq.add_batch(ids[i:i + 8192], vecs[i:i + 8192])
    rb = bq._rescore_count(K)

    def step_bin(q, codes, valid, vectors, norms):
        # full-axis selection measured faster than chunked at this k
        # (7.3 ms vs 10.1 ms total — chunking pays 8 per-chunk selections
        # plus a merge); the scan itself is sub-ms on the MXU. Prescan is
        # the product default: asymmetric dot(q_unit, sign(x)) — same
        # matmul as Hamming, +0.33 recall@10 at this budget on isotropic
        # data (bench/binary_asym_ab.py).
        pv, cand = asym_topk(q.astype(jnp.float32), codes, valid, k=rb,
                             chunk=cap)
        dists = jnp.where(jnp.isfinite(pv), 0, 1 << 30).astype(jnp.int32)
        return _rescore_topk(q, vectors, norms, cand, dists, k=K,
                             metric="cosine")

    ms = timed_fori(step_bin, q_dev, bq.codes, bq.valid, bq.vectors, bq.norms)
    matrix["binary_100k"] = {
        "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
        "recall": round(recall_vs(oracle, bq.search_batch(queries[:8], K)), 3),
        "note": "asym MXU prescan + rescore=1024; dominated by flat at this scale — BQ is the 32x capacity play (see docs)",
    }
    del bq

    # ----------------------------------------------------------------- ivf

    from grape_vector_db_tpu.index.ivf import IvfDeviceIndex, _ivf_topk

    # Measure the path the product actually runs: IvfDeviceIndex defaults to
    # the Pallas ragged-DMA probe (ivf.py:153 use_pallas=True); the XLA
    # gather probe is its fallback, not its behavior. Each row steps the same
    # kernel + operands the index's _main_topk uses.
    def make_step_ivf(index):
        if index._use_pallas:
            from grape_vector_db_tpu.ops.ivf_pallas import pallas_ivf_topk

            nblk = index._pallas_nblocks()
            interp_ = index._pallas_interpret

            def step(q, cents, iv, recip, nblk=nblk):
                return pallas_ivf_topk(q, cents, iv, recip, k=K, nprobe=16,
                                       metric="cosine", nblocks=nblk,
                                       interpret=interp_)
            return step, (index.centroids, index.vecs, index.recip)

        def step(q, cents, iv, inr, ival):
            return _ivf_topk(q, cents, iv, inr, ival, k=K, nprobe=16,
                             metric="cosine")
        return step, (index.centroids, index.vecs, index.norms, index.valid)

    # Representative row: clustered corpus + corpus-drawn queries — the
    # regime IVF exists for (VERDICT r2 item 6). The random-data point stays
    # below as a separately-labeled adversarial row.
    ncent100 = max(2048 // SCALE, 4)
    centers100 = rng.standard_normal((ncent100, DIM)).astype(np.float32)
    cid100 = rng.integers(0, ncent100, n)
    cvecs = (centers100[cid100]
             + 0.25 * rng.standard_normal((n, DIM))).astype(np.float32)
    ivf_c = IvfDeviceIndex(dimension=DIM, metric="cosine",
                           storage_dtype="bfloat16", initial_capacity=cap,
                           nlist=256 // SCALE or 4, nprobe=16,
                           train_size=50_000 // SCALE)
    for i in range(0, n, 8192):
        ivf_c.add_batch(ids[i:i + 8192], cvecs[i:i + 8192])
    cq100 = (cvecs[:: n // BATCH][:BATCH]
             + 0.05 * rng.standard_normal((BATCH, DIM))).astype(np.float32)
    cqn = cq100[:8] / np.linalg.norm(cq100[:8], axis=1, keepdims=True)
    cvn = cvecs / np.linalg.norm(cvecs, axis=1, keepdims=True)
    oracle_c = np.argsort(-(cqn @ cvn.T), axis=1)[:, :K]
    del cvn
    step_c, ops_c = make_step_ivf(ivf_c)
    ms = timed_fori(step_c, jnp.asarray(cq100), *ops_c)
    matrix["ivf_100k_nprobe16"] = {
        "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
        "recall": round(recall_vs(oracle_c,
                                  ivf_c.search_batch(cq100[:8], K)), 3),
        "note": "clustered corpus, corpus-drawn queries (representative); "
                + ("Pallas DMA probe (the product default)"
                   if ivf_c._use_pallas else "XLA gather probe"),
    }
    # Binary on the same clustered corpus: the regime where the two-stage
    # engine holds its 92%+ recall claim (docs/benchmarks.md "Binary
    # quantization" — the random-data binary_100k row above is the
    # adversarial floor where Hamming correlates weakly with cosine).
    # Budget 64 is tune_rescore's pick at target 0.95 AND 0.99 on this
    # corpus (self-recall sweep vs the exact oracle, index/binary.py) — the
    # rescore gather is per-row bound, so the tuned budget is 16x cheaper
    # than the adversarial row's 1024 at equal recall here. Fixed (not
    # tuned in-bench) to keep the jit shapes stable run-to-run.
    bq_c = BinaryDeviceIndex(dimension=DIM, metric="cosine",
                             storage_dtype="bfloat16", initial_capacity=cap,
                             max_rescore=64)
    for i in range(0, n, 8192):
        bq_c.add_batch(ids[i:i + 8192], cvecs[i:i + 8192])
    rb_c = bq_c._rescore_count(K)

    def step_bin_c(q, codes, valid, vectors, norms):
        pv, cand = asym_topk(q.astype(jnp.float32), codes, valid, k=rb_c,
                             chunk=cap)
        dists = jnp.where(jnp.isfinite(pv), 0, 1 << 30).astype(jnp.int32)
        return _rescore_topk(q, vectors, norms, cand, dists, k=K,
                             metric="cosine")

    ms = timed_fori(step_bin_c, jnp.asarray(cq100), bq_c.codes, bq_c.valid,
                    bq_c.vectors, bq_c.norms)
    matrix["binary_100k_clustered"] = {
        "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
        "recall": round(recall_vs(oracle_c,
                                  bq_c.search_batch(cq100[:8], K)), 3),
        "note": "representative regime (clustered, corpus-drawn queries); "
                "rescore budget 64 = tune_rescore's pick at target 0.99 "
                "(the adversarial binary_100k row needs 1024)",
    }
    del bq_c

    del ivf_c, cvecs, step_c, ops_c

    ivf = IvfDeviceIndex(dimension=DIM, metric="cosine",
                         storage_dtype="bfloat16", initial_capacity=cap,
                         nlist=256 // SCALE or 4, nprobe=16,
                         train_size=50_000 // SCALE)
    for i in range(0, n, 8192):
        ivf.add_batch(ids[i:i + 8192], vecs[i:i + 8192])
    step_r, ops_r = make_step_ivf(ivf)
    ms = timed_fori(step_r, q_dev, *ops_r)
    matrix["ivf_100k_random_adversarial"] = {
        "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
        "recall": round(recall_vs(oracle, ivf.search_batch(queries[:8], K)), 3),
        "note": "random data is IVF's worst case (kept as the honest adversarial point)",
    }
    del ivf, step_r, ops_r

    # ------------------------------------------------- 1M points (on-device)

    key = random.PRNGKey(1)
    chunk1m = 131_072 // SCALE
    parts_v, parts_n = [], []

    @jax.jit
    def gen(k1):
        x = random.normal(k1, (chunk1m, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    for _ in range(8):
        k1, key = random.split(key)
        v, nn_ = gen(k1)
        parts_v.append(v)
        parts_n.append(nn_)
    v1m = jnp.concatenate(parts_v)
    n1m = jnp.concatenate(parts_n)
    m1m = jnp.ones((v1m.shape[0],), jnp.bool_)
    del parts_v, parts_n

    def step_1m_approx(q, vectors, norms, valid):
        return scored_topk(q, vectors, norms, valid, k=K, metric="cosine",
                           chunk=chunk1m, mode="approx")

    ms = timed_fori(step_1m_approx, q_dev, v1m, n1m, m1m, its=24 if SCALE == 1 else 2)
    matrix["flat_approx_1M"] = {"batch_ms": round(ms, 3),
                                "qps": round(BATCH / ms * 1e3, 0)}

    from grape_vector_db_tpu.ops.int8 import quantize_int8

    parts_i, parts_s = [], []
    for i in range(8):
        vi, sc = quantize_int8(lax.dynamic_slice_in_dim(v1m, i * chunk1m,
                                                        chunk1m))
        parts_i.append(vi)
        parts_s.append(sc)
    c1m = jnp.concatenate(parts_i)
    f1m = jnp.concatenate(parts_s) / jnp.maximum(n1m, 1e-12)
    del parts_i, parts_s

    def step_1m_int8(q, codes, factor, valid, vectors, norms):
        cvals, cand = int8_topk(q, codes, factor, valid, k=64, chunk=chunk1m)
        dist = jnp.where(jnp.isfinite(cvals), 0, 2**30).astype(jnp.int32)
        return _rescore_topk(q, vectors, norms, cand, dist, k=K,
                             metric="cosine")

    ms = timed_fori(step_1m_int8, q_dev, c1m, f1m, m1m, v1m, n1m, its=24 if SCALE == 1 else 2)
    matrix["int8_1M"] = {"batch_ms": round(ms, 3),
                         "qps": round(BATCH / ms * 1e3, 0)}

    # exact 1M: the fused Pallas matmul+segmax engine (scored_topk routes to
    # it on TPU), measured in-loop like every other row. The r2 fori-AOT hang
    # applied to the XLA segmax scan; the fused kernel compiles fine at small
    # trip counts and this row uses the same its=32 shape as the engine's
    # validation run (compile-cache friendly).
    def step_1m_exact(q, vectors, norms, valid):
        return scored_topk(q, vectors, norms, valid, k=K, metric="cosine",
                           chunk=chunk1m, mode="exact")

    ms, ms_med = timed_fori_reps(step_1m_exact, q_dev, v1m, n1m, m1m,
                                 its=32 if SCALE == 1 else 2, reps=5)
    matrix["flat_exact_1M"] = {
        "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
        "batch_ms_median": round(ms_med, 3),
        "qps_median": round(BATCH / ms_med * 1e3, 0),
        "recall": 1.0,  # exact engine (segment-bound argument + parity tests)
        "note": "fused Pallas top-4 segmax, recall 1.0 by construction",
    }

    # Throughput-optimal batch for the same engine: the 1.6 GB corpus read
    # (~2 ms) dominates and amortizes across the batch, so doubling B nearly
    # halves per-query cost (the b<=256 VMEM-residency cap is the limit).
    q256_dev = jnp.concatenate([q_dev, q_dev * 1.0001 + 0.001])
    ms, ms_med = timed_fori_reps(step_1m_exact, q256_dev, v1m, n1m, m1m,
                                 its=16 if SCALE == 1 else 2, reps=5)
    matrix["flat_exact_1M_b256"] = {
        "batch_ms": round(ms, 3), "qps": round(256 / ms * 1e3, 0),
        "batch_ms_median": round(ms_med, 3),
        "qps_median": round(256 / ms_med * 1e3, 0),
        "note": "exact engine at the throughput batch (256 queries; top-4 "
                "segmax with the m2-restricted phase 2 — bench/SEGMAX_AB.jsonl "
                "tag=top4_ab)",
    }
    del v1m, n1m, m1m, c1m, f1m

    # ---------------------------------------- north star: IVF-Pallas @1M clustered

    from grape_vector_db_tpu.ops.ivf_pallas import (
        ivf_pallas_supported,
        make_recip,
        pallas_ivf_topk,
    )
    from grape_vector_db_tpu.ops.kmeans import assign_clusters, kmeans

    n1m = 8 * chunk1m
    nlist = max(4096 // SCALE, 8)
    ncent = max(16_384 // SCALE, 4)
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

    @functools.partial(jax.jit, static_argnames=("cap_",))
    def layout(vecs, norms, assign, counts, cap_):
        order = jnp.argsort(assign)
        a_sorted = assign[order]
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        pos = jnp.arange(n1m, dtype=jnp.int32) - starts[a_sorted]
        iv = jnp.zeros((nlist, cap_, DIM), jnp.bfloat16)
        inr = jnp.zeros((nlist, cap_), jnp.float32)
        ival = jnp.zeros((nlist, cap_), jnp.bool_)
        iv = iv.at[a_sorted, pos].set(vecs[order])
        inr = inr.at[a_sorted, pos].set(norms[order])
        ival = ival.at[a_sorted, pos].set(True)
        return iv, inr, ival

    iv, inr, ival = layout(cv1m, cn1m, assign, counts, cap1)
    iv.block_until_ready()
    cv1m.delete()
    cn1m.delete()
    recip = make_recip(inr, ival)
    interp = not ivf_pallas_supported()

    kq2, key = random.split(key)
    take = (BATCH + nlist - 1) // nlist
    qc = (iv[:, :take, :].reshape(-1, DIM)[:BATCH].astype(jnp.float32)
          + 0.05 * random.normal(kq2, (BATCH, DIM), jnp.float32))

    # ragged block fetch: only occupied RB-row blocks DMA (cap is sized to
    # the LARGEST list; average fill is ~40% of it, and the probe is
    # bandwidth-bound)
    from grape_vector_db_tpu.ops.ivf_pallas import nblocks_from_counts

    nblk = nblocks_from_counts(counts)

    def step_np(q, cents, iv, recip, nblk):
        return pallas_ivf_topk(q, cents, iv, recip, k=K, nprobe=1,
                               metric="cosine", nblocks=nblk,
                               interpret=interp)

    # sub-ms probes ride the relay constant hard: at its=32 a 0.07 ms kernel
    # is ~2 ms of loop against ~25 ms of subtracted overhead, and best/median
    # of 5 still swung 2-3x run-to-run (VERDICT r3 weak #3). its=128 puts
    # 9-40 ms of real work in every rep so the variance amortizes.
    its_np = 128 if SCALE == 1 else 1
    ms, ms_med = timed_fori_reps(step_np, qc, cents, iv, recip, nblk,
                                 its=its_np, reps=5)

    # recall vs the exact oracle over the same (padded) universe
    nn_tot = nlist * cap1

    @jax.jit
    def oracle_1m(q, iv, inr, ival):
        ch = nn_tot // 16 if nn_tot % 16 == 0 and (nn_tot // 16) % 32 == 0 else nn_tot
        return scored_topk(q, iv.reshape(nn_tot, DIM), inr.reshape(nn_tot),
                           ival.reshape(nn_tot), k=K, metric="cosine",
                           chunk=ch, mode="exact")

    _, oi = oracle_1m(qc, iv, inr, ival)
    _, si = jax.jit(step_np)(qc, cents, iv, recip, nblk)
    oi, si = np.asarray(oi), np.asarray(si)
    rec_np = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(si, oi)
    ])
    ns_qps = round(BATCH / ms * 1e3, 0)
    matrix["ivf_pallas_1M_clustered_nprobe1"] = {
        "batch_ms": round(ms, 3), "qps": ns_qps,
        "batch_ms_median": round(ms_med, 3),
        "qps_median": round(BATCH / ms_med * 1e3, 0),
        "recall": round(float(rec_np), 4),
        "note": "Pallas DMA probe; 16k-cluster corpus, corpus-drawn queries; best + median of 5 reps (relay variance)",
    }

    # int8 variant of the same probe: half the DMA bytes per list. Quantize
    # the layout in list-blocks (full-array f32 transient would be 8GB).
    from grape_vector_db_tpu.ops.ivf_pallas import (
        make_factor,
        pallas_ivf_topk_int8,
    )

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
    codes1m = jnp.concatenate(pc)
    factor1m = make_factor(jnp.concatenate(ps), inr, ival)
    del pc, ps

    def step_np8(q, cents, codes, factor, nblk):
        return pallas_ivf_topk_int8(q, cents, codes, factor, k=K, nprobe=1,
                                    metric="cosine", nblocks=nblk,
                                    interpret=interp)

    ms8, ms8_med = timed_fori_reps(step_np8, qc, cents, codes1m, factor1m,
                                   nblk, its=its_np, reps=5)
    _, s8 = jax.jit(step_np8)(qc, cents, codes1m, factor1m, nblk)
    rec_8 = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(np.asarray(s8), oi)
    ])
    matrix["ivf_int8_pallas_1M_clustered_nprobe1"] = {
        "batch_ms": round(ms8, 3), "qps": round(BATCH / ms8 * 1e3, 0),
        "batch_ms_median": round(ms8_med, 3),
        "qps_median": round(BATCH / ms8_med * 1e3, 0),
        "recall": round(float(rec_8), 4),
        "note": "int8-resident lists: half the DMA bytes (capacity config); best + median of 5 reps",
    }
    del codes1m, factor1m

    # int4 variant: packed nibbles, a QUARTER of the bf16 DMA bytes per list.
    # Raw row = capacity config (4-bit rank noise uncorrected); rescore row =
    # the product default for kind="ivf_int4" (bf16 shadow, top-64 exact).
    from grape_vector_db_tpu.ops.int4 import quantize_int4
    from grape_vector_db_tpu.ops.ivf_pallas import pallas_ivf_topk_int4

    @jax.jit
    def quant_block4(block):
        l, c, d = block.shape
        vi, s = quantize_int4(block.reshape(l * c, d).astype(jnp.float32))
        return vi.reshape(l, c, d // 2), s.reshape(l, c)

    pc, ps = [], []
    for i in range(nlist // lb):
        vi, s = quant_block4(lax.dynamic_slice_in_dim(iv, i * lb, lb))
        pc.append(vi)
        ps.append(s)
    codes4_1m = jnp.concatenate(pc)
    factor4_1m = make_factor(jnp.concatenate(ps), inr, ival)
    del pc, ps

    def step_np4(q, cents, codes, factor, nblk):
        return pallas_ivf_topk_int4(q, cents, codes, factor, k=K, nprobe=1,
                                    metric="cosine", nblocks=nblk,
                                    interpret=interp)

    def step_np4r(q, cents, codes, factor, iv, recip, nblk):
        return pallas_ivf_topk_int4(q, cents, codes, factor, k=K, nprobe=1,
                                    metric="cosine", rescore=64, vecs=iv,
                                    recip=recip, nblocks=nblk,
                                    interpret=interp)

    ms4, ms4_med = timed_fori_reps(step_np4, qc, cents, codes4_1m, factor4_1m,
                                   nblk, its=its_np, reps=5)
    _, s4 = jax.jit(step_np4)(qc, cents, codes4_1m, factor4_1m, nblk)
    rec_4 = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(np.asarray(s4), oi)
    ])
    matrix["ivf_int4_pallas_1M_clustered_nprobe1"] = {
        "batch_ms": round(ms4, 3), "qps": round(BATCH / ms4 * 1e3, 0),
        "batch_ms_median": round(ms4_med, 3),
        "qps_median": round(BATCH / ms4_med * 1e3, 0),
        "recall": round(float(rec_4), 4),
        "note": "int4-resident lists: quarter the DMA bytes (raw capacity config); best + median of 5 reps",
    }

    ms4r, ms4r_med = timed_fori_reps(step_np4r, qc, cents, codes4_1m,
                                     factor4_1m, iv, recip, nblk,
                                     its=its_np, reps=5)
    _, s4r = jax.jit(step_np4r)(qc, cents, codes4_1m, factor4_1m, iv, recip,
                                nblk)
    rec_4r = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(np.asarray(s4r), oi)
    ])
    matrix["ivf_int4_rescore_pallas_1M_clustered_nprobe1"] = {
        "batch_ms": round(ms4r, 3), "qps": round(BATCH / ms4r * 1e3, 0),
        "batch_ms_median": round(ms4r_med, 3),
        "qps_median": round(BATCH / ms4r_med * 1e3, 0),
        "recall": round(float(rec_4r), 4),
        "note": "int4 probe + top-64 bf16 rescore (kind=ivf_int4 product default); best + median of 5 reps",
    }
    del codes4_1m, factor4_1m
    del iv, inr, ival, recip

    # ------------------------------------------------------------ correctness

    hits = idx.search_batch(queries[:8], 100)
    for row, want in zip(hits, oracle):
        got_ids = {h[0] for h in row}
        overlap = sum(1 for w in want if f"doc-{w}" in got_ids)
        assert overlap >= int(0.9 * K), f"sanity recall too low: {overlap}/{K}"

    ns = matrix["ivf_pallas_1M_clustered_nprobe1"]
    ns8 = matrix["ivf_int8_pallas_1M_clustered_nprobe1"]
    result = {
        "metric": f"exact_cosine_top{K}_qps_{n // 1000}k_x_{DIM}d_bf16_batch{BATCH}",
        "value": exact_qps,
        "unit": "queries/s",
        "vs_baseline": round(exact_qps / BASELINE_READ_QPS, 3),
        "north_star_1M": {
            "qps": ns["qps"], "recall": ns["recall"],
            "vs_baseline": round(ns["qps"] / BASELINE_READ_QPS, 2),
            "engine": "ivf_pallas nlist=4096 nprobe=1, 1M x 768 bf16 clustered",
        },
        "north_star_1M_int8": {
            "qps": ns8["qps"], "recall": ns8["recall"],
            "vs_baseline": round(ns8["qps"] / BASELINE_READ_QPS, 2),
            "engine": "ivf_int8_pallas nlist=4096 nprobe=1 (capacity config)",
        },
        "matrix": matrix,
        "backend": jax.default_backend(),
    }
    # Full matrix first, compact summary LAST: the driver keeps only the
    # final ~2000 stdout chars, and in round 3 that cap cut the full-matrix
    # line mid-object, losing the headline/write rows from the permanent
    # record. The summary line is sized to survive the tail cap whole and
    # carries every headline number; the verbose matrix stays above for
    # humans and docs.
    print(json.dumps(result), flush=True)
    e1m = matrix.get("flat_exact_1M", {})
    e1m256 = matrix.get("flat_exact_1M_b256", {})
    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "flat_exact_1M": {kk_: e1m.get(kk_) for kk_ in
                          ("qps", "qps_median", "recall", "note")},
        "flat_exact_1M_b256": {kk_: e1m256.get(kk_) for kk_ in
                               ("qps", "qps_median")},
        "north_star_1M": {kk_: ns.get(kk_) for kk_ in
                          ("qps", "qps_median", "recall")},
        "north_star_1M_int8": {kk_: ns8.get(kk_) for kk_ in
                               ("qps", "qps_median", "recall")},
        "ivf_int4_raw": {kk_: matrix.get(
            "ivf_int4_pallas_1M_clustered_nprobe1", {}).get(kk_)
            for kk_ in ("qps", "qps_median", "recall")},
        "ivf_int4_rescore": {kk_: matrix.get(
            "ivf_int4_rescore_pallas_1M_clustered_nprobe1", {}).get(kk_)
            for kk_ in ("qps", "qps_median", "recall")},
        "write_path_docs_per_s": matrix.get(
            "write_path_100k", {}).get("docs_per_s"),
        "write_path_docs_per_s_median": matrix.get(
            "write_path_100k", {}).get("docs_per_s_median"),
        "write_path_vs_baseline": matrix.get(
            "write_path_100k", {}).get("vs_write_baseline_13240"),
        "ingest_docs_per_s": matrix.get("ingest_100k", {}).get("docs_per_s"),
        "backend": result["backend"],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
