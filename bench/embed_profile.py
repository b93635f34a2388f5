"""Phase decomposition of the embed-at-ingest write path (roadmap r4 #2).

The end-to-end target is the reference's write headline (13,240 docs/s,
BASELINE.md) with TEXT in — i.e. native featurizer + MXU projection +
the full ingest pipeline. This script answers "where do the milliseconds
go" on a 1-core host driving the TPU relay:

  feat       : host featurization alone (gvdb_hash_features + memo)
  embed      : embed_array total (featurize + upload + dispatch + readback)
  put/get    : raw relay transfer cost for the batch's actual byte volumes
  vec_ingest : batch_add_documents with vectors already attached
               (the 43.3k docs/s path — store + BM25 + filter + scatter)
  txt_ingest : batch_add_documents with text only (provider="device")

txt_ingest - vec_ingest - embed ~= integration overhead (d.vector rows,
dim checks, re-stack). Appends tag=embed_profile to bench/SERVING.jsonl.

Run: timeout 900 python bench/embed_profile.py
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
WB = 4096
NB = 4  # timed batches per phase


def texts_for(n: int, base: int = 0):
    return [f"document number {i} body content about topic{i % 50} "
            f"and theme{i % 13} with detail {i}" for i in range(base, base + n)]


def main() -> None:
    import jax

    from grape_vector_db_tpu.config import VectorDbConfig
    from grape_vector_db_tpu.db import VectorDatabase
    from grape_vector_db_tpu.services.device_embedder import DeviceHashEmbedder
    from grape_vector_db_tpu.types import Document

    out = {"tag": "embed_profile", "backend": jax.default_backend(),
           "wb": WB, "dim": DIM}

    emb = DeviceHashEmbedder(dim=DIM)
    all_texts = texts_for(WB * (NB + 1))

    # -- featurize only (warm the memo on batch 0, time the rest) -----------
    emb._featurize(all_texts[:WB])
    t0 = time.perf_counter()
    for b in range(1, NB + 1):
        idx, val = emb._featurize(all_texts[b * WB:(b + 1) * WB])
    feat_s = (time.perf_counter() - t0) / NB
    out["feat_ms_per_batch"] = round(feat_s * 1e3, 1)
    out["feat_texts_per_s"] = round(WB / feat_s, 0)

    # -- raw relay transfer for this batch's byte volumes -------------------
    # upload: idx int32 + val f32 [WB, 256]; readback: [WB, DIM] f32
    iv = np.zeros((WB, idx.shape[1]), np.int32)
    vv = np.zeros((WB, idx.shape[1]), np.float32)
    ev = np.zeros((WB, DIM), np.float32)
    jax.block_until_ready(jax.device_put(iv))  # warm path
    t0 = time.perf_counter()
    for _ in range(NB):
        h = (jax.device_put(iv), jax.device_put(vv))
        jax.block_until_ready(h)
    out["put_idxval_ms"] = round((time.perf_counter() - t0) / NB * 1e3, 1)
    dev_e = jax.block_until_ready(jax.device_put(ev))
    t0 = time.perf_counter()
    for _ in range(NB):
        np.asarray(dev_e)
    out["get_emb_ms"] = round((time.perf_counter() - t0) / NB * 1e3, 1)
    t0 = time.perf_counter()
    for _ in range(NB):
        jax.block_until_ready(jax.device_put(ev))
    out["put_emb_ms"] = round((time.perf_counter() - t0) / NB * 1e3, 1)

    # -- embed_array end-to-end ---------------------------------------------
    emb.embed_array(all_texts[:WB])  # compile + warm
    t0 = time.perf_counter()
    for b in range(1, NB + 1):
        emb.embed_array(all_texts[b * WB:(b + 1) * WB])
    embed_s = (time.perf_counter() - t0) / NB
    out["embed_ms_per_batch"] = round(embed_s * 1e3, 1)
    out["embed_texts_per_s"] = round(WB / embed_s, 0)

    # -- vector-attached ingest (the 43.3k path) ----------------------------
    n = WB * (NB + 1)
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    cfg = VectorDbConfig(vector_dimension=DIM)
    cfg.index.initial_capacity = n
    cfg.cache.enabled = False
    db = VectorDatabase(config=cfg)
    vt = texts_for(n)
    docs = [Document(id=f"v{i}", content=vt[i], vector=vecs[i])
            for i in range(n)]
    db.batch_add_documents(docs[:WB])  # warm compiles
    gc.disable()
    t0 = time.perf_counter()
    for b in range(1, NB + 1):
        db.batch_add_documents(docs[b * WB:(b + 1) * WB])
    jax.block_until_ready(getattr(db.index, "vectors", None))
    vec_s = (time.perf_counter() - t0) / NB
    gc.enable()
    out["vec_ingest_ms_per_batch"] = round(vec_s * 1e3, 1)
    out["vec_ingest_docs_per_s"] = round(WB / vec_s, 0)
    del db, docs
    gc.collect()

    # -- text-only ingest through provider="device" -------------------------
    ecfg = VectorDbConfig(vector_dimension=DIM)
    ecfg.index.initial_capacity = n
    ecfg.cache.enabled = False
    ecfg.embedding.provider = "device"
    dbe = VectorDatabase(config=ecfg)
    edocs = [Document(id=f"e{i}", content=vt[i]) for i in range(n)]
    dbe.batch_add_documents(edocs[:WB])
    gc.disable()
    t0 = time.perf_counter()
    for b in range(1, NB + 1):
        dbe.batch_add_documents(edocs[b * WB:(b + 1) * WB])
    jax.block_until_ready(getattr(dbe.index, "vectors", None))
    txt_s = (time.perf_counter() - t0) / NB
    gc.enable()
    out["txt_ingest_ms_per_batch"] = round(txt_s * 1e3, 1)
    out["txt_ingest_docs_per_s"] = round(WB / txt_s, 0)
    out["integration_ms"] = round((txt_s - vec_s - embed_s) * 1e3, 1)

    print(json.dumps(out), flush=True)
    append_jsonl("SERVING.jsonl", out)


if __name__ == "__main__":
    main()
