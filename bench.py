"""Headline benchmark: exact cosine top-10 query throughput on the real chip.

Workload (BASELINE.md configs): 100k x 768-d corpus (bf16 on device), batched
queries, top-10 exact scan (recall 1.0). The reference's read-path number is
42,018 QPS on CPU (docs/project-status-summary.md:21); ``vs_baseline`` is our
queries/sec over that.

Throughput is measured pipelined (dispatch a stream of query batches, sync at
the end) — the steady-state serving regime. Synchronous single-batch latency is
reported separately; note that on this harness the TPU sits behind a relay that
adds ~20-25 ms per blocking round trip, which bounds the sync number but not
the pipelined one.

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

    from grape_vector_db_tpu.index import FlatDeviceIndex
    from grape_vector_db_tpu.ops.distance import scored_topk

    dim, n, k, batch = 768, 100_000, 10, 128
    cap = 131_072  # pre-size to one capacity bucket: no growth recompiles
    rng = np.random.default_rng(0)

    idx = FlatDeviceIndex(
        dimension=dim, metric="cosine", storage_dtype="bfloat16",
        initial_capacity=cap,
    )
    ids = [f"doc-{i}" for i in range(n)]
    vecs = rng.standard_normal((n, dim), dtype=np.float32)

    # Warm ingest (compiles the scatter), then timed steady-state re-ingest.
    idx.add_batch(ids[:8192], vecs[:8192])
    idx.clear()
    t_ingest0 = time.perf_counter()
    for i in range(0, n, 8192):
        idx.add_batch(ids[i:i + 8192], vecs[i:i + 8192])
    jax.block_until_ready(idx.vectors)
    ingest_s = time.perf_counter() - t_ingest0

    queries = rng.standard_normal((batch, dim), dtype=np.float32)
    q_dev = jnp.asarray(queries)

    # Warm the search kernel.
    jax.block_until_ready(
        scored_topk(q_dev, idx.vectors, idx.norms, idx.valid, k=k,
                    metric="cosine", chunk=min(65536, cap))
    )

    # Pipelined throughput: dispatch a stream, sync once.
    iters = 200
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = scored_topk(q_dev, idx.vectors, idx.norms, idx.valid, k=k,
                          metric="cosine", chunk=min(65536, cap))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    qps = iters * batch / elapsed

    # Synchronous end-to-end (host in / host out) single-batch latency.
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        idx.raw_topk(queries, k)
        lat.append((time.perf_counter() - t0) * 1e3)
    sync_ms = float(np.median(lat))

    # Correctness spot check: the f32 numpy oracle's global top-10 must appear in
    # the device's top-100 (rank tolerance absorbs bf16 near-tie swaps on random
    # gaussian data, where rank-10/rank-11 score gaps are ~1e-4).
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
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_READ_QPS, 3),
        "pipelined_batch_ms": round(elapsed / iters * 1e3, 3),
        "sync_batch_ms": round(sync_ms, 1),
        "ingest_s": round(ingest_s, 2),
        "ingest_docs_per_s": round(n / ingest_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
