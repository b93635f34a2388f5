"""Headline benchmark: cosine top-10 query throughput on the real chip.

Workload (BASELINE.md configs): 100k x 768-d corpus (bf16 on device), batched
queries, top-10. The reference's read-path number is 42,018 QPS on CPU
(docs/project-status-summary.md:21); ``vs_baseline`` is our queries/sec over
that — with the exact engine (recall 1.0), which is stronger than the
reference's ANN read path.

Timing method: the query kernel runs ITERS times inside one jitted
``lax.fori_loop`` with a loop-carried data dependence, so neither XLA nor the
TPU relay can elide or dedupe iterations; one host readback closes the
measurement. (Naive dispatch loops measure ~30x too fast through the relay.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_READ_QPS = 42_018.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from grape_vector_db_tpu.index import FlatDeviceIndex
    from grape_vector_db_tpu.ops.distance import scored_topk

    dim, n, k, batch = 768, 100_000, 10, 128
    cap = 131_072  # one capacity bucket: no growth recompiles
    iters = 60
    rng = np.random.default_rng(0)

    idx = FlatDeviceIndex(
        dimension=dim, metric="cosine", storage_dtype="bfloat16",
        initial_capacity=cap,
    )
    ids = [f"doc-{i}" for i in range(n)]
    vecs = rng.standard_normal((n, dim), dtype=np.float32)

    # Real ingest (also warms the scatter kernel + populates the index).
    for i in range(0, n, 8192):
        idx.add_batch(ids[i:i + 8192], vecs[i:i + 8192])

    # Device ingest throughput: loop the scatter kernel on-device over
    # pre-staged batches (host->device staging is measured separately — through
    # this harness's relay it is bandwidth-limited and not a TPU property).
    nb = n // 8192
    t0 = time.perf_counter()
    stage_vecs = jnp.asarray(vecs[: nb * 8192].reshape(nb, 8192, dim))
    stage_norms = jnp.linalg.norm(stage_vecs, axis=2)
    stage_slots = jnp.arange(nb * 8192, dtype=jnp.int32).reshape(nb, 8192)
    float(np.asarray(stage_norms[0, 0]))
    staging_s = time.perf_counter() - t0

    @jax.jit
    def ingest_loop(vectors, norms, valid, sv, sn, ss):
        def step(i, carry):
            vectors, norms, valid = carry
            vectors = vectors.at[ss[i]].set(sv[i].astype(vectors.dtype))
            norms = norms.at[ss[i]].set(sn[i])
            valid = valid.at[ss[i]].set(True)
            return (vectors, norms, valid)
        return lax.fori_loop(0, nb, step, (vectors, norms, valid))

    out = ingest_loop(idx.vectors, idx.norms, idx.valid, stage_vecs, stage_norms,
                      stage_slots)
    float(np.asarray(out[1][0]))  # compile + force
    t0 = time.perf_counter()
    out = ingest_loop(idx.vectors, idx.norms, idx.valid, stage_vecs, stage_norms,
                      stage_slots)
    float(np.asarray(out[1][0]))
    ingest_s = time.perf_counter() - t0

    queries = rng.standard_normal((batch, dim), dtype=np.float32)
    q_dev = jnp.asarray(queries)

    def timed_mode(mode: str) -> float:
        """Per-batch milliseconds for the given top-k engine."""

        @jax.jit
        def loop(q, vectors, norms, valid):
            def step(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                vals, _ = scored_topk(qq, vectors, norms, valid, k=k,
                                      metric="cosine", mode=mode)
                return acc * 0.5 + vals[0, 0] * 1e-6
            return lax.fori_loop(0, iters, step, jnp.float32(0))

        float(np.asarray(loop(q_dev, idx.vectors, idx.norms, idx.valid)))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(q_dev, idx.vectors, idx.norms, idx.valid)))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / iters

    exact_ms = timed_mode("exact")
    approx_ms = timed_mode("approx")
    exact_qps = batch / (exact_ms / 1e3)
    approx_qps = batch / (approx_ms / 1e3)

    # Synchronous end-to-end (host in / host out) single-batch latency.
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        idx.raw_topk(queries, k)
        lat.append((time.perf_counter() - t0) * 1e3)
    sync_ms = float(np.median(lat))

    # Correctness spot check: the f32 numpy oracle's global top-10 must appear
    # in the device's top-100 (rank tolerance absorbs bf16 near-tie swaps on
    # random gaussian data, where rank-10/11 score gaps are ~1e-4).
    qn = queries[:4] / np.linalg.norm(queries[:4], axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ vn.T), axis=1)[:, :k]
    hits = idx.search_batch(queries[:4], 100)
    for row, want in zip(hits, oracle):
        got_ids = {h[0] for h in row}
        overlap = sum(1 for w in want if f"doc-{w}" in got_ids)
        assert overlap >= int(0.9 * k), f"sanity recall too low: {overlap}/{k}"

    result = {
        "metric": f"exact_cosine_top{k}_qps_{n // 1000}k_x_{dim}d_bf16_batch{batch}",
        "value": round(exact_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(exact_qps / BASELINE_READ_QPS, 3),
        "exact_batch_ms": round(exact_ms, 3),
        "approx_qps": round(approx_qps, 1),
        "approx_batch_ms": round(approx_ms, 3),
        "sync_batch_ms": round(sync_ms, 1),
        "device_ingest_s": round(ingest_s, 3),
        "device_ingest_docs_per_s": round(nb * 8192 / ingest_s, 1),
        "staging_s": round(staging_s, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
