"""3-node cluster demo (mirrors the reference's cluster examples): boot,
replicated writes, scatter-gather search, kill a node, watch failover."""

import time

import numpy as np

from grape_vector_db_tpu.config import VectorDbConfig
from grape_vector_db_tpu.distributed.cluster_service import ClusterService
from grape_vector_db_tpu.distributed.types import ClusterConfig, ConsistencyLevel
from grape_vector_db_tpu.types import Document


def main() -> None:
    svc = ClusterService(
        ["alpha", "beta", "gamma"],
        cluster_config=ClusterConfig(
            shard_count=8, replica_count=2,
            consistency=ConsistencyLevel.SESSION,
            heartbeat_interval_s=0.3,
        ),
        db_config=VectorDbConfig(vector_dimension=64),
    )
    svc.start()
    print("leader:", svc.leader_node().node_id)

    rng = np.random.default_rng(0)
    docs = [Document(id=f"d{i}", content=f"doc {i}",
                     vector=rng.standard_normal(64).astype(np.float32).tolist())
            for i in range(200)]
    svc.upsert(docs)
    print("copies per node:", {n: svc.nodes[n].db.store.count() for n in svc.nodes})

    hits = svc.search(docs[42].vector, k=3)
    print("search:", hits[0])

    victim = next(n for n in svc.nodes if n != svc.leader_node().node_id)
    print("failing node:", victim)
    svc.sim.fail_node(victim)
    time.sleep(2.0)
    survivor = next(n for n in svc.nodes if n != victim)
    print("health:", svc.nodes[survivor].cluster_health())
    print("search after failure:", svc.nodes[survivor].search(docs[42].vector, k=1)[0])

    svc.sim.recover_node(victim)
    time.sleep(2.0)
    print("health after recovery:", svc.nodes[survivor].cluster_health())
    svc.stop()


if __name__ == "__main__":
    main()
