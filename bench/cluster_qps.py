"""Sustained-load QPS for the distributed serving tier on one chip.

Measures the number the smoke test only proves correct: end-to-end
scatter-gather search throughput through the PRODUCTION path — client
threads -> ClusterNode.search (router, session gating) -> per-shard owners
-> each node's VectorDatabase -> device index -> packed readback — with the
3-node ClusterService sharing the chip over the in-process transport (two
TPU processes corrupt each other through the relay, CLAUDE.md).

This is a HOST+relay-bound number by design: it charges routing, session
bookkeeping, the micro-batching executor, and one relay round trip per
device launch. The raw device kernels run 10^5-10^6 QPS (bench.py); the
gap IS the serving-tier cost. Reference comparison: the 42,018 read-QPS
baseline was the reference's whole-database serving number (BASELINE.md).

Env: CQPS_THREADS (default 64), CQPS_SECONDS (default 10), CQPS_N corpus
rows (default 8192), CQPS_DIM (default 256), CQPS_WAIT_MS (micro-batch
window), CQPS_SESSION=0 to drop the session token from the load loop
(session-less searches additionally ride the coordinator-side leg packer:
one data_search_batch RPC per node per window instead of one RPC per
query), CQPS_COORD=0 to disable that packer for A/B. Appends one JSON
line to bench/SERVING.jsonl.

Run: timeout 570 python bench/cluster_qps.py
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = int(os.environ.get("CQPS_DIM", "256"))
N = int(os.environ.get("CQPS_N", "8192"))
THREADS = int(os.environ.get("CQPS_THREADS", "64"))
SECONDS = float(os.environ.get("CQPS_SECONDS", "10"))
OUT = os.environ.get("CQPS_OUT", "bench/SERVING.jsonl")


def main() -> None:
    import jax

    from grape_vector_db_tpu.config import VectorDbConfig
    from grape_vector_db_tpu.distributed.cluster_service import ClusterService
    from grape_vector_db_tpu.distributed.raft import RaftConfig
    from grape_vector_db_tpu.distributed.types import (
        ClusterConfig,
        ConsistencyLevel,
        SessionToken,
    )
    from grape_vector_db_tpu.types import Document

    ccfg = ClusterConfig(
        shard_count=8,
        replica_count=2,
        consistency=ConsistencyLevel.SESSION,
        election_timeout_ms=(150, 300),
        raft_heartbeat_ms=50.0,
    )
    dcfg = VectorDbConfig(vector_dimension=DIM)
    dcfg.index.initial_capacity = N
    dcfg.cache.enabled = False
    dcfg.device.micro_batch_wait_ms = float(
        os.environ.get("CQPS_WAIT_MS", dcfg.device.micro_batch_wait_ms))
    dcfg.device.coordinator_batch = os.environ.get("CQPS_COORD", "1") != "0"
    use_session = os.environ.get("CQPS_SESSION", "1") != "0"
    rcfg = RaftConfig(election_timeout_ms=(150, 300), heartbeat_ms=50.0,
                      tick_ms=10.0)

    t0 = time.perf_counter()
    svc = ClusterService([f"node-{i}" for i in range(3)], cluster_config=ccfg,
                         db_config=dcfg, raft_config=rcfg)
    svc.start()
    print(f"boot OK ({time.perf_counter() - t0:.1f}s)", flush=True)

    try:
        rng = np.random.default_rng(11)
        vecs = rng.standard_normal((N, DIM), dtype=np.float32)
        docs = [Document(id=f"doc-{i}", content=f"body {i}", vector=vecs[i])
                for i in range(N)]
        node = svc.any_node()
        session = SessionToken()
        t0 = time.perf_counter()
        for i in range(0, N, 512):
            node.upsert(docs[i:i + 512], session=session)
        print(f"upsert OK ({time.perf_counter() - t0:.1f}s)", flush=True)

        nodes = list(svc.nodes.values())
        qidx = rng.integers(0, N, 4096)

        load_session = session if use_session else None
        # warm every node's search path (jit compiles happen here, and the
        # session settles so no stale-shard retries during the window)
        for nd in nodes:
            for qi in qidx[:4]:
                nd.search(vecs[qi], k=10, session=load_session)
        print("warmup OK", flush=True)

        stop_at = [0.0]
        lat: list = []

        def worker(wid: int) -> int:
            nd = nodes[wid % len(nodes)]
            r = np.random.default_rng(wid)
            done = 0
            while time.perf_counter() < stop_at[0]:
                qi = int(qidx[int(r.integers(0, len(qidx)))])
                t = time.perf_counter()
                hits = nd.search(vecs[qi], k=10, session=load_session)
                lat.append(time.perf_counter() - t)
                if not hits:
                    raise SystemExit("empty result under load")
                done += 1
            return done

        with concurrent.futures.ThreadPoolExecutor(THREADS) as ex:
            stop_at[0] = time.perf_counter() + SECONDS
            t0 = time.perf_counter()
            counts = list(ex.map(worker, range(THREADS)))
            wall = time.perf_counter() - t0
        total = sum(counts)
        arr = np.asarray(sorted(lat))
        leg_rpcs = sum(lb.rpcs_sent for nd in nodes
                       for lb in nd._leg_batchers.values())
        legs = sum(lb.legs_packed for nd in nodes
                   for lb in nd._leg_batchers.values())
        rec = {
            "bench": "cluster_scatter_gather_qps",
            "nodes": 3, "shards": 8, "rf": 2, "threads": THREADS,
            "n": N, "dim": DIM, "seconds": round(wall, 1),
            "session": use_session,
            "coordinator_batch": dcfg.device.coordinator_batch,
            "leg_rpcs": leg_rpcs, "legs_packed": legs,
            "searches": total,
            "qps": round(total / wall, 0),
            "p50_ms": round(float(arr[int(0.50 * len(arr))]) * 1e3, 1),
            "p95_ms": round(float(arr[int(0.95 * len(arr))]) * 1e3, 1),
            "p99_ms": round(float(arr[int(0.99 * len(arr))]) * 1e3, 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    finally:
        svc.stop()


if __name__ == "__main__":
    main()
