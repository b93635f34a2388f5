"""On-chip smoke for the serving tier: a 3-node cluster on the real TPU.

The cluster suite runs on the forced-CPU platform; this is the one place the
PRODUCTION configuration — ClusterService over the in-process transport with
every node's VectorDatabase serving a real device index — is exercised on
the chip (single process: two TPU processes corrupt each other through the
relay). It drives:

  - boot + raft leadership + shard placement (3 nodes, 8 shards, RF=2),
  - shard-routed replicated upsert with a session token,
  - scatter-gather search with read-your-writes (self-match asserted),
  - a search from every node (routing, not just the write node),
  - delete visibility across the cluster,
  - cluster_health aggregation,

then the single-node gRPC serving path on the chip: a real socket server
whose micro-batching executor packs 32 concurrent client searches into
shared device launches (self-match asserted per thread), plus the wire-level
ef override and SQL-filtered search.

Run alone:  timeout 570 python bench/tpu_cluster_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, N, NQ = 256, 2048, 8


def main() -> None:
    from grape_vector_db_tpu.config import VectorDbConfig
    from grape_vector_db_tpu.distributed.cluster_service import ClusterService
    from grape_vector_db_tpu.distributed.raft import RaftConfig
    from grape_vector_db_tpu.distributed.types import (
        ClusterConfig,
        ConsistencyLevel,
        SessionToken,
    )
    from grape_vector_db_tpu.types import Document

    # Production-default heartbeat cadence (2 s, 3 misses to fail): on the
    # relay a first jit compile stalls the process for tens of seconds of
    # GIL-held transfer/compile work, and a sub-second heartbeat interval
    # (the CPU test settings) false-positives the failure detector during
    # that window — measured here: 0.5 s heartbeats marked a node failed
    # mid-compile. Deployment guidance: keep heartbeat_interval_s x
    # fail_after above the worst expected compile/GIL stall.
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
        print(f"upsert OK: {N} docs replicated RF=2 "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

        # scatter-gather with read-your-writes, from EVERY node
        qsel = rng.choice(N, NQ, replace=False)
        failures = []
        for nid, nd in svc.nodes.items():
            stale: list = []
            ok = 0
            for qi in qsel:
                hits = nd.search(vecs[qi], k=5, session=session,
                                 stale_out=stale)
                if hits and hits[0][0] == f"doc-{qi}":
                    ok += 1
            print(f"search via {nid}: self-match {ok}/{NQ} "
                  f"stale_shards={sorted(set(stale))}", flush=True)
            if ok < NQ or stale:
                failures.append(nid)

        # delete visibility
        victim = f"doc-{int(qsel[0])}"
        node.delete([victim], session=session)
        hits = svc.nodes["node-2"].search(vecs[qsel[0]], k=5, session=session)
        if any(h[0] == victim for h in hits):
            failures.append("delete-visibility")
        else:
            print("delete OK: removed doc absent cluster-wide", flush=True)

        # health, with a bounded recovery wait: a compile stall can cost a
        # node some heartbeats; the detector needs 2 consecutive hits to
        # re-mark it healthy
        deadline = time.monotonic() + 30
        while True:
            health = node.cluster_health()
            if (health.status == "healthy" and health.healthy_nodes == 3) \
                    or time.monotonic() > deadline:
                break
            time.sleep(1.0)
        print(f"health: {health.status}, healthy_nodes={health.healthy_nodes}",
              flush=True)
        if health.status != "healthy" or health.healthy_nodes != 3:
            failures.append("health")

        if failures:
            raise SystemExit(f"tpu_cluster_smoke FAILED: {failures}")
    finally:
        svc.stop()

    _grpc_stage()
    print("tpu_cluster_smoke: OK")


def _grpc_stage() -> None:
    import concurrent.futures

    from grape_vector_db_tpu import Document, VectorDatabase
    from grape_vector_db_tpu.config import VectorDbConfig
    from grape_vector_db_tpu.server.grpc_server import (
        VectorDbClient,
        build_grpc_server,
    )

    rng = np.random.default_rng(12)
    cfg = VectorDbConfig(vector_dimension=DIM)
    cfg.index.kind = "ivf"
    cfg.index.initial_capacity = N
    cfg.index.nlist = 16
    cfg.index.nprobe = 16
    cfg.cache.enabled = False
    cfg.device.auto_shard = False
    db = VectorDatabase(config=cfg)
    vecs = rng.standard_normal((N, DIM), dtype=np.float32)
    db.batch_add_documents([
        Document(id=f"doc-{i}", content=f"body {i}", vector=vecs[i],
                 metadata={"grp": int(i % 4)})
        for i in range(N)
    ])

    server, port, _ = build_grpc_server(db, port=0)
    server.start()
    client = VectorDbClient(f"127.0.0.1:{port}")
    failures = []
    try:
        # 32 concurrent searches: the micro-batcher must pack them into
        # shared device launches and return each caller ITS result
        qsel = rng.choice(N, 32, replace=False)

        def one(qi):
            r = client.search(vecs[qi].tolist(), limit=5)
            return bool(r.results) and r.results[0].id == f"doc-{qi}"

        with concurrent.futures.ThreadPoolExecutor(max_workers=32) as pool:
            oks = list(pool.map(one, qsel))
        print(f"grpc concurrent search: self-match {sum(oks)}/32 "
              f"(micro-batched)", flush=True)
        if sum(oks) < 32:
            failures.append("grpc-batched-search")

        # wire-level ef override (skips the batcher) + SQL filtered search
        r = client.search(vecs[qsel[0]].tolist(), limit=5, ef=1)
        if not (r.results and r.results[0].id == f"doc-{qsel[0]}"):
            failures.append("grpc-ef")
        want_grp = int(qsel[1] % 4)
        r = client.search(vecs[qsel[1]].tolist(), limit=5,
                          filter_sql=f"grp = {want_grp}", with_payload=True)
        if not (r.results and r.results[0].id == f"doc-{qsel[1]}"):
            failures.append("grpc-filter")
        else:
            print(f"grpc ef + SQL-filtered search OK", flush=True)
    finally:
        client.close()
        server.stop(grace=0)
        db.close()
    if failures:
        raise SystemExit(f"tpu_cluster_smoke grpc stage FAILED: {failures}")


if __name__ == "__main__":
    main()
