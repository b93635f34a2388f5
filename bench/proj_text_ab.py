"""Does the proj capacity tier survive TEXT-like embeddings?

The proj-384 tiers were measured on synthetic decaying-spectrum gaussians
(recall 0.73-0.99) and are known to collapse on isotropic gaussians (~0.5,
docs/benchmarks.md). Real users bring embeddings of text. Offline (zero
egress, no model weights cached) the closest realistic family we can
manufacture is the on-device hash embedder over Zipfian topic text: token
statistics follow a power law, topic mixtures create cluster structure,
and shared tokens create correlated directions — none of which a gaussian
has. This measures, at 131k x 768:

  1. the uncentered spectrum of the embedding family (energy@384 fraction),
  2. projection-only recall@10 (exact scan in proj-R space vs exact in
     full space) for R in {512, 384, 192} — isolates the PCA loss,
  3. the PRODUCT ivf_int8_proj end-to-end recall (projection + int8 +
     nprobe + placement charged together).

Queries are held-out documents from the same topic process (never indexed).
Appends JSON lines to bench/PROJ_TEXT.jsonl.

Run: timeout 570 python bench/proj_text_ab.py   (TPU or CPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("PROJ_TEXT_OUT", "bench/PROJ_TEXT.jsonl")
N = int(os.environ.get("PROJ_TEXT_N", str(131_072)))
DIM, K, B = 768, 10, 128
VOCAB, TOPICS, DOC_LEN = 50_000, 512, 48


def log(**kv) -> None:
    print(json.dumps(kv), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kv) + "\n")


def make_texts(n: int, seed: int) -> list:
    """Zipfian vocabulary, per-topic token biases: each doc samples a topic,
    then DOC_LEN tokens from a mixture of the global Zipf tail and the
    topic's preferred tokens."""
    rng = np.random.default_rng(seed)
    # global Zipf ranks (shared function words)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / np.sum(1.0 / ranks)
    # each topic prefers 64 mid-frequency tokens
    topic_tokens = rng.integers(100, VOCAB, (TOPICS, 64))
    topics = rng.integers(0, TOPICS, n)
    texts = []
    for i in range(n):
        tt = topic_tokens[topics[i]]
        n_topic = DOC_LEN // 2
        toks = np.concatenate([
            tt[rng.integers(0, 64, n_topic)],
            rng.choice(VOCAB, DOC_LEN - n_topic, p=zipf_p),
        ])
        texts.append(" ".join(f"w{t}" for t in toks))
    return texts


def exact_topk_np(qn: np.ndarray, xn: np.ndarray, k: int) -> np.ndarray:
    s = qn @ xn.T
    return np.argsort(-s, axis=1)[:, :k]


def recall(got: np.ndarray, want: np.ndarray) -> float:
    return sum(len(set(g.tolist()) & set(w.tolist()))
               for g, w in zip(got, want)) / want.size


def main() -> None:
    import jax
    import jax.numpy as jnp

    from grape_vector_db_tpu.index.ivf_proj import (ProjectedInt8IvfIndex,
                                                    _fit_projection)
    from grape_vector_db_tpu.services.device_embedder import DeviceHashEmbedder

    t0 = time.perf_counter()
    texts = make_texts(N + B, seed=3)
    emb = DeviceHashEmbedder(dim=DIM, buckets=32_768, seed=0)
    X = np.empty((N + B, DIM), dtype=np.float32)
    for i in range(0, N + B, 8192):
        X[i:i + 8192] = emb.embed_array(texts[i:i + 8192])
    corpus, queries = X[:N], X[N:]
    print(f"embedded {N + B} texts in {time.perf_counter() - t0:.1f}s",
          flush=True)

    xn = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True),
                             1e-12)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True),
                              1e-12)
    oracle = exact_topk_np(qn, xn, K)

    # 1. spectrum
    sample = xn[np.random.default_rng(0).choice(N, 16_384, replace=False)]
    ev = np.linalg.eigvalsh(sample.T @ sample)[::-1]
    energy = np.cumsum(ev) / np.sum(ev)
    log(stage="spectrum", n=N, backend=jax.default_backend(),
        energy_at_128=round(float(energy[127]), 4),
        energy_at_192=round(float(energy[191]), 4),
        energy_at_384=round(float(energy[383]), 4),
        energy_at_512=round(float(energy[511]), 4))

    # 2. projection-only recall (exact in proj space)
    for r in (512, 384, 192):
        P = np.asarray(_fit_projection(jnp.asarray(sample), r))
        xp = xn @ P
        qp = qn @ P
        got = exact_topk_np(qp, xp, K)
        log(stage="proj_only", r=r, recall_at_10=round(recall(got, oracle), 4))

    # 3. product index end-to-end: R and nprobe are the two levers
    ids = [f"d{i}" for i in range(N)]
    for r in (384, 512):
        idx = ProjectedInt8IvfIndex(
            dimension=DIM, proj_dim=r, metric="cosine",
            storage_dtype="bfloat16", initial_capacity=N,
            nlist=512, nprobe=8, train_size=65_536)
        t0 = time.perf_counter()
        for i in range(0, N, 8192):
            idx.add_batch(ids[i:i + 8192], corpus[i:i + 8192])
        build_s = time.perf_counter() - t0
        for nprobe in (8, 32):
            hits = idx.search_batch(queries, K, nprobe=nprobe)
            got = np.asarray([
                [int(h[0][1:]) for h in row] + [-1] * (K - len(row))
                for row in hits])
            log(stage="ivf_int8_proj_e2e", r=r, nlist=512, nprobe=nprobe,
                build_s=round(build_s, 1),
                recall_at_10=round(recall(got, oracle), 4))
        del idx


if __name__ == "__main__":
    main()
