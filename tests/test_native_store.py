"""Native C++ KV engine tests: CRUD, crash recovery (torn tail + corrupt frame),
compaction, DocumentStore parity, backup interop with the Python store."""

import os

import numpy as np
import pytest

from grape_vector_db_tpu.storage.native import (
    NativeDocumentStore,
    NativeKV,
    native_available,
)
from grape_vector_db_tpu.types import DocumentRecord

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ build failed")


def test_kv_crud(tmp_path):
    kv = NativeKV(str(tmp_path / "t.db"))
    kv.put(b"a", b"1")
    kv.put(b"b", b"22")
    assert kv.get(b"a") == b"1"
    assert kv.get(b"missing") is None
    kv.put(b"a", b"111")  # overwrite
    assert kv.get(b"a") == b"111"
    assert kv.count() == 2
    assert kv.delete(b"a")
    assert not kv.delete(b"a")
    assert kv.get(b"a") is None
    assert sorted(kv.keys()) == [b"b"]
    kv.close()


def test_kv_reopen_persists(tmp_path):
    p = str(tmp_path / "t.db")
    kv = NativeKV(p)
    for i in range(100):
        kv.put(f"k{i}".encode(), f"v{i}".encode() * 10)
    kv.delete(b"k5")
    kv.flush()
    kv.close()
    kv2 = NativeKV(p)
    assert kv2.count() == 99
    assert kv2.get(b"k7") == b"v7" * 10
    assert kv2.get(b"k5") is None
    kv2.close()


def test_kv_torn_tail_recovery(tmp_path):
    p = str(tmp_path / "t.db")
    kv = NativeKV(p)
    kv.put(b"good", b"value")
    kv.flush()
    kv.close()
    with open(p, "ab") as f:
        f.write(b"\x10\x00\x00\x00\x20\x00\x00\x00partial")  # torn frame
    kv2 = NativeKV(p)
    assert kv2.get(b"good") == b"value"
    assert kv2.count() == 1
    # the store stays writable after truncating the torn tail
    kv2.put(b"after", b"crash")
    kv2.close()
    kv3 = NativeKV(p)
    assert kv3.get(b"after") == b"crash"
    kv3.close()


def test_kv_compaction_reclaims(tmp_path):
    p = str(tmp_path / "t.db")
    kv = NativeKV(p)
    for i in range(50):
        kv.put(b"same", b"x" * 1000)  # 49 dead versions
    assert kv.dead_bytes > 40_000
    size_before = os.path.getsize(p)
    kv.compact()
    kv.flush()
    assert kv.dead_bytes == 0
    assert os.path.getsize(p) < size_before / 10
    assert kv.get(b"same") == b"x" * 1000
    kv.close()


def mkrec(i, dim=8):
    return DocumentRecord(
        id=f"doc-{i}", content=f"content {i}",
        embedding=list(np.arange(dim, dtype=np.float32) + i),
        metadata={"rank": i},
    )


def test_native_document_store(tmp_path):
    s = NativeDocumentStore(str(tmp_path / "nds"))
    s.batch_insert([mkrec(i) for i in range(30)])
    assert s.count() == 30
    rec = s.get("doc-4")
    assert rec.content == "content 4"
    np.testing.assert_allclose(rec.embedding, mkrec(4).embedding)
    assert s.batch_delete(["doc-4", "nope"]) == 1
    s.put_kv("raft_state_x", b"\x01\x02")
    assert s.get_kv("raft_state_x") == b"\x01\x02"
    assert dict(s.iter_kv_prefix("raft_"))["raft_state_x"] == b"\x01\x02"
    # store-level search parity methods work through the base class
    hits = s.vector_search(mkrec(7).embedding, limit=3)
    assert hits[0].id == "doc-7"
    s.close()


def test_native_backup_restorable_by_python_store(tmp_path):
    from grape_vector_db_tpu.storage import MemoryDocumentStore

    s = NativeDocumentStore(str(tmp_path / "nds"))
    s.batch_insert([mkrec(i) for i in range(10)])
    bak = str(tmp_path / "b.gvdb")
    info = s.create_backup(bak)
    assert info["count"] == 10
    mem = MemoryDocumentStore()
    mem.restore_backup(bak)
    assert mem.count() == 10
    assert mem.get("doc-3").content == "content 3"
    s.close()


def test_native_behind_vector_database(tmp_path):
    from grape_vector_db_tpu import Document, SearchRequest, VectorDatabase, VectorDbConfig

    cfg = VectorDbConfig(vector_dimension=16)
    cfg.device.storage_dtype = "float32"
    cfg.index.initial_capacity = 128
    store = NativeDocumentStore(str(tmp_path / "ndb"))
    db = VectorDatabase(config=cfg, store=store)
    rng = np.random.default_rng(0)
    docs = [Document(id=f"n{i}", content=f"c{i}",
                     vector=rng.standard_normal(16).astype(np.float32).tolist())
            for i in range(40)]
    db.batch_add_documents(docs)
    hits = db.vector_search(SearchRequest(vector=docs[8].vector, limit=3))
    assert hits[0].id == "n8"
    db.close()
    # reopen from native storage rebuilds the index
    store2 = NativeDocumentStore(str(tmp_path / "ndb"))
    db2 = VectorDatabase(config=cfg, store=store2)
    hits = db2.vector_search(SearchRequest(vector=docs[8].vector, limit=1))
    assert hits[0].id == "n8"
    db2.close()
