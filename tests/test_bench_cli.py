"""Benchmark suite, CLI drivers, and chaos engine tests."""

import json

import numpy as np
import pytest

from grape_vector_db_tpu.bench import BenchmarkConfig, BenchmarkSuite, ndcg_at_k
from grape_vector_db_tpu.cli import main as cli_main


def test_ndcg():
    assert ndcg_at_k(["a", "b", "c"], {"a", "b", "c"}, 3) == pytest.approx(1.0)
    assert ndcg_at_k(["x", "y"], {"a"}, 2) == 0.0
    # relevant doc at rank 2 vs rank 1
    assert ndcg_at_k(["x", "a"], {"a"}, 2) < ndcg_at_k(["a", "x"], {"a"}, 2)


@pytest.fixture(scope="module")
def small_suite():
    cfg = BenchmarkConfig(num_queries=30, dataset_size=300, dimension=24,
                          warmup_queries=5, num_clusters=10)
    s = BenchmarkSuite(cfg)
    s.build_dataset()
    return s


def test_suite_dense_metrics(small_suite):
    r = small_suite.run_dense()
    assert r.queries == 30
    assert r.precision_at_k > 0.8   # clustered data: dense search nails clusters
    assert r.ndcg_at_10 > 0.8
    assert r.p95_latency_ms >= r.p50_latency_ms
    assert r.qps > 0


def test_suite_fusion_comparison(small_suite):
    rows = small_suite.run_fusion_comparison()
    assert len(rows) == 8
    names = {r.name for r in rows}
    assert {"rrf_k60", "rrf_k30", "normalized", "learned", "adaptive"} <= names
    for r in rows:
        assert r.success_rate == 1.0
        assert 0.0 <= r.precision_at_k <= 1.0
    # hybrid fusion on clustered data should retrieve well
    rrf = next(r for r in rows if r.name == "rrf_k60")
    assert rrf.precision_at_k > 0.5


def test_suite_batched_path(small_suite):
    r = small_suite.run_batched_dense(batch=8)
    assert r.precision_at_k > 0.8
    assert r.extra["batch"] == 8.0


def test_cli_benchmark(capsys):
    cli_main(["benchmark", "--dim", "24"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["insert_docs"] == 1000 and out["search_qps"] > 0


def test_cli_concurrent_insert(capsys):
    cli_main(["concurrent-insert-test", "--dim", "16"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["target_met"] is True  # 50-doc batch < 1s (reference target)


def test_cli_storage_analysis(capsys):
    cli_main(["storage-analysis", "--dim", "16"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["with_vectors_bytes"] > 0


@pytest.mark.parametrize("consistency", ["SESSION", "STRONG"])
def test_chaos_engine(consistency):
    """SESSION drives the direct-replication write path (incl. the
    relinquish handoff that guards against stale-complete drops); STRONG
    drives the raft data-command path under the same fault schedule."""
    from grape_vector_db_tpu.testing.chaos import (
        ChaosEngine,
        ChaosExperiment,
        NetworkChaos,
        WorkloadConfig,
    )
    from grape_vector_db_tpu.distributed.types import ConsistencyLevel
    from tests.test_cluster import make_service

    svc = make_service(consistency=ConsistencyLevel[consistency])
    try:
        exp = ChaosExperiment(
            duration_s=4.0, node_failure_rate=0.2, recovery_time_s=0.8,
            tick_s=0.2,
            network=NetworkChaos(partition_probability=0.1),
            workload=WorkloadConfig(read_qps=30, write_qps=10, dimension=16),
        )
        for attempt in (0, 1):
            report = ChaosEngine(svc, exp).run()
            assert report.reads_total > 0 and report.writes_total > 0
            # data loss never gets a retry — an acked write missing from
            # every store post-heal is the bug class this suite exists for
            assert report.consistent_after_heal, report
            # availability is timing-sensitive (host CPU starvation makes
            # reads miss their window); one retry de-flakes a loaded box
            # without masking a persistent availability regression
            if report.read_availability > 0.5:
                break
            assert attempt == 0, report
    finally:
        svc.stop()


def test_cli_tune(capsys, tmp_path):
    """cli tune loads the data dir, runs VectorDatabase.tune, prints JSON."""
    from grape_vector_db_tpu import Document, VectorDatabase, VectorDbConfig

    cfg_file = tmp_path / "cfg.toml"
    cfg_file.write_text(
        "vector_dimension = 32\n"
        "[index]\nkind = \"binary\"\ninitial_capacity = 256\n"
        "[device]\nstorage_dtype = \"float32\"\n"
    )
    cfg = VectorDbConfig(vector_dimension=32)
    cfg.index.kind = "binary"
    cfg.index.initial_capacity = 256
    cfg.device.storage_dtype = "float32"
    db = VectorDatabase(path=str(tmp_path / "data"), config=cfg)
    db.batch_add_documents([
        Document(id=f"d{i}", content=f"doc body {i} topic{i % 7}")
        for i in range(150)
    ])
    db.flush()
    db.close()

    cli_main(["tune", "--data-dir", str(tmp_path / "data"),
              "--config", str(cfg_file), "--target-recall", "0.9", "--k", "5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "binary"
    assert out["rescore_budget"] >= 64
    assert out["documents"] == 150
