"""Graph ANN tests: NN-descent build quality, beam-search recall vs exact,
incremental insert via fresh region, delete, rebuild."""

import numpy as np
import pytest
import jax.numpy as jnp

from grape_vector_db_tpu.index import FlatDeviceIndex
from grape_vector_db_tpu.index.graph import GraphDeviceIndex
from grape_vector_db_tpu.ops.graph import beam_search, build_knn_graph


def test_nn_descent_builds_true_knn(rng):
    """Production build config (degree 2m, join sample 8) must recover the true
    m-NN graph on hard random-gaussian data."""
    n, d, m = 1000, 32, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    norms = np.linalg.norm(vecs, axis=1).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    nb = build_knn_graph(jnp.asarray(vecs), jnp.asarray(norms), jnp.asarray(valid),
                         m=2 * m, rounds=12, nn_sample=8)
    # oracle: true top-m cosine neighbors must appear in the 2m-degree lists
    vn = vecs / norms[:, None]
    scores = vn @ vn.T
    np.fill_diagonal(scores, -np.inf)
    oracle = np.argsort(-scores, axis=1)[:, :m]
    recall = np.mean([
        len(set(nb[i]) & set(oracle[i])) / m for i in range(n)
    ])
    assert recall >= 0.9, f"nn-descent graph recall {recall}"


def test_beam_search_recall(rng):
    n, d, k = 4000, 48, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = GraphDeviceIndex(d, storage_dtype="float32", initial_capacity=4096,
                           m=16, ef_search=128)
    flat = FlatDeviceIndex(d, storage_dtype="float32", initial_capacity=4096)
    ids = [f"p{i}" for i in range(n)]
    idx.add_batch(ids, vecs)
    flat.add_batch(ids, vecs)
    idx.optimize()
    assert idx.is_built

    qs = rng.standard_normal((16, d)).astype(np.float32)
    got = idx.search_batch(qs, k)
    want = flat.search_batch(qs, k)
    recall = np.mean([
        len({h[0] for h in g} & {h[0] for h in w}) / k for g, w in zip(got, want)
    ])
    assert recall >= 0.85, f"beam search recall {recall}"
    # scores of shared hits must agree with exact scores
    for g, w in zip(got, want):
        wmap = dict(w)
        for i, s in g:
            if i in wmap:
                assert abs(s - wmap[i]) < 1e-4


def test_graph_incremental_fresh_region(rng):
    d = 16
    idx = GraphDeviceIndex(d, storage_dtype="float32", m=8, ef_search=64)
    vecs = rng.standard_normal((600, d)).astype(np.float32)
    idx.add_batch([f"a{i}" for i in range(500)], vecs[:500])
    assert idx.is_built  # auto-built at 256 threshold
    builds_before = idx.builds
    # small insert lands in the fresh region, still searchable exactly
    idx.add_batch([f"b{i}" for i in range(20)], vecs[500:520])
    assert idx.get_stats().extra["fresh"] == 20
    hits = idx.search_batch(vecs[510:511], 3)[0]
    assert hits[0][0] == "b10"
    # graph hits still work
    hits = idx.search_batch(vecs[100:101], 3)[0]
    assert hits[0][0] == "a100"
    assert idx.builds == builds_before


def test_graph_rebuild_absorbs_fresh(rng):
    d = 16
    idx = GraphDeviceIndex(d, storage_dtype="float32", m=8, ef_search=64,
                           rebuild_ratio=0.1)
    vecs = rng.standard_normal((400, d)).astype(np.float32)
    idx.add_batch([f"a{i}" for i in range(300)], vecs[:300])
    idx.add_batch([f"b{i}" for i in range(100)], vecs[300:400])  # > 10% -> rebuild
    assert idx.get_stats().extra["fresh"] == 0
    assert idx.builds >= 2
    hits = idx.search_batch(vecs[350:351], 3)[0]
    assert hits[0][0] == "b50"


def test_graph_delete_tombstones(rng):
    d = 16
    idx = GraphDeviceIndex(d, storage_dtype="float32", m=8, ef_search=64)
    vecs = rng.standard_normal((400, d)).astype(np.float32)
    ids = [f"p{i}" for i in range(400)]
    idx.add_batch(ids, vecs)
    idx.optimize()
    assert idx.remove_batch(["p7"]) == 1
    hits = idx.search_batch(vecs[7:8], 5)[0]
    assert all(h[0] != "p7" for h in hits)
    assert len(idx) == 399


def test_graph_upsert_after_build(rng):
    d = 16
    idx = GraphDeviceIndex(d, storage_dtype="float32", m=8, ef_search=64)
    vecs = rng.standard_normal((300, d)).astype(np.float32)
    idx.add_batch([f"p{i}" for i in range(300)], vecs)
    idx.optimize()
    newv = rng.standard_normal(d).astype(np.float32)
    idx.add_batch(["p5"], newv[None])  # overwrite an id post-build
    assert len(idx) == 300
    hits = idx.search_batch(newv[None], 1)[0]
    assert hits[0][0] == "p5"
    np.testing.assert_allclose(idx.get_vector("p5"), newv, rtol=1e-5)


def test_beam_tiny_graph_small_k(rng):
    """Regression: pool smaller than the expand width must not crash, and slot
    0 must remain reachable despite pool padding."""
    d = 16
    idx = GraphDeviceIndex(d, storage_dtype="float32", m=4, ef_search=16,
                           n_entries=4, expand=8)
    vecs = rng.standard_normal((6, d)).astype(np.float32)
    idx.add_batch([f"t{i}" for i in range(6)], vecs)
    idx.optimize()
    assert idx.is_built
    hits = idx.search_batch(vecs[0:1], 2)[0]  # slot 0's own vector
    assert hits and hits[0][0] == "t0"


def test_beam_slot_zero_reachable(rng):
    """Node in graph slot 0 must be findable (padding uses -1, not 0)."""
    d = 24
    idx = GraphDeviceIndex(d, storage_dtype="float32", m=8, ef_search=64,
                           n_entries=16)
    vecs = rng.standard_normal((500, d)).astype(np.float32)
    ids = [f"z{i}" for i in range(500)]
    idx.add_batch(ids, vecs)
    idx.optimize()
    hits = idx.search_batch(vecs[0:1], 5)[0]
    assert hits[0][0] == "z0", hits[:3]
