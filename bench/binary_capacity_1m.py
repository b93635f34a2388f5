"""Binary 32x capacity config end-to-end at 1M x 768 (VERDICT r3 item 7).

The pieces existed separately — codes-only residency (keep_vectors=False,
32x memory vs bf16), the asymmetric MXU prescan (ops/hamming.py asym_topk),
and the host-tier exact rescore (engine/planner._host_rescore_rows, the
generalization of the reference's quantization.rs:286-354 rescore) — but the
COMPOSED configuration that realizes the reference's 32x-compression promise
had no measured row. This drives it through the product objects:

  VectorDatabase(kind="binary", keep_vectors=False, max_rescore=64)
  -> batch_add_documents (1M ndarray-row docs; the store keeps the
     full-precision embeddings the host tier rescores from)
  -> index.search_batch (asym prescan + packed readback, the same call
     engine.vector_search makes) + engine._host_rescore_rows (the same
     host tier a host_rescore=64 SearchRequest rides)

Reports device-scan QPS, end-to-end (device + host rescore) QPS, recall@10
vs a float64 numpy oracle, and resident bytes/row. Clustered corpus +
corpus-drawn queries (the representative regime; the adversarial
random-data floor is bench.py's binary_100k row). Appends tag=binary_cap_1m
to bench/CAPACITY.jsonl.

Run: timeout 1200 python bench/binary_capacity_1m.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench._harness import append_jsonl  # noqa: E402

DIM = 768
N = int(os.environ.get("BCAP_N", str(1 << 20)))
NCENT = 16_384
BATCH = 128
K = 10
RESCORE = int(os.environ.get("BCAP_RESCORE", "64"))


def main() -> None:
    import jax

    from grape_vector_db_tpu import Document, VectorDatabase
    from grape_vector_db_tpu.config import VectorDbConfig

    rng = np.random.default_rng(5)
    t0 = time.perf_counter()
    centers = rng.standard_normal((NCENT, DIM)).astype(np.float32)
    cid = rng.integers(0, NCENT, N)
    vecs = (centers[cid] + 0.25 * rng.standard_normal((N, DIM))
            ).astype(np.float32)
    print(f"corpus OK ({time.perf_counter() - t0:.1f}s)", flush=True)

    cfg = VectorDbConfig(vector_dimension=DIM)
    cfg.index.kind = "binary"
    cfg.index.initial_capacity = N
    cfg.quantization.keep_vectors = False     # the 32x residency config
    cfg.query.host_rescore = RESCORE          # host exact tier width
    cfg.cache.enabled = False
    db = VectorDatabase(config=cfg)
    db.index.max_rescore = RESCORE            # device prescan budget

    docs = [Document(id=f"doc-{i}", content="", vector=vecs[i])
            for i in range(N)]
    wb = 8192
    db.batch_add_documents(docs[:wb])  # warm compiles
    gc.collect()
    gc.disable()
    t0 = time.perf_counter()
    for i in range(wb, N, wb):
        db.batch_add_documents(docs[i:i + wb])
    jax.block_until_ready(db.index.codes)
    ingest_s = time.perf_counter() - t0
    gc.enable()
    print(f"ingest OK ({ingest_s:.1f}s, "
          f"{(N - wb) / ingest_s:.0f} docs/s)", flush=True)

    # resident device bytes/row: packed sign codes (+ norms bookkeeping);
    # no bf16 shadow plane in this config
    idx = db.index
    code_bytes = idx.codes.size * idx.codes.dtype.itemsize
    bytes_per_row = code_bytes / idx.codes.shape[0]
    compression = DIM * 4 / bytes_per_row

    # corpus-drawn queries, slight perturbation (representative regime)
    qsets = [vecs[rng.integers(0, N, BATCH)] + 0.01 * rng.standard_normal(
        (BATCH, DIM)).astype(np.float32) for _ in range(12)]
    idx.search_batch(qsets[0], RESCORE)  # compile + warm

    # device tier: prescan + packed readback (the exact call the engine makes)
    t0 = time.perf_counter()
    for q in qsets:
        idx.search_batch(q, RESCORE)
    dev_s = time.perf_counter() - t0
    dev_qps = len(qsets) * BATCH / dev_s

    # end to end: device candidates + host exact rescore from the store
    t0 = time.perf_counter()
    rows_last = None
    for q in qsets:
        rows = idx.search_batch(q, RESCORE)
        rows_last = db.engine._host_rescore_rows(q, rows, K)
    e2e_s = time.perf_counter() - t0
    e2e_qps = len(qsets) * BATCH / e2e_s

    # recall@10 vs the float64 oracle on the last query set's first 8 rows
    q8 = qsets[-1][:8].astype(np.float64)
    qn = q8 / np.linalg.norm(q8, axis=1, keepdims=True)
    vn = vecs.astype(np.float64)
    vn_norm = np.linalg.norm(vn, axis=1, keepdims=True)
    scores = qn @ (vn / vn_norm).T
    oracle = np.argsort(-scores, axis=1)[:, :K]
    got = 0
    for want, row in zip(oracle, rows_last[:8]):
        ids = {h[0] for h in row}
        got += sum(1 for w in want if f"doc-{w}" in ids)
    recall = got / oracle.size

    out = {
        "tag": "binary_cap_1m", "n": N, "dim": DIM, "k": K,
        "backend": jax.default_backend(),
        "keep_vectors": False,
        "rescore_budget": RESCORE,
        "bytes_per_row_device": round(bytes_per_row, 1),
        "compression_vs_f32": round(compression, 1),
        "ingest_docs_per_s": round((N - wb) / ingest_s, 0),
        "device_scan_qps": round(dev_qps, 0),
        "e2e_qps_with_host_rescore": round(e2e_qps, 0),
        "recall_at_10": round(recall, 4),
    }
    print(json.dumps(out), flush=True)
    append_jsonl("CAPACITY.jsonl", out)


if __name__ == "__main__":
    main()
