"""On-chip smoke test: every index kind's PUBLIC search path, recall-asserted.

The CPU test suite cannot catch TPU-only result corruption — the hardware
flushes f32 denormals to zero (which silently zeroed every slot id when the
packed result fetch carried ints in f32 lanes), approx_max_k and Pallas
kernels only lower on the real backend, and the relay can misbehave under
load. This script is the cheap canary: it builds every single-device index
kind through the product factory (db.build_index), ingests a small corpus
through add_batch, searches through search_batch (the full device -> packed
fetch -> id-mapping path a user hits), and asserts:

  - self-match: querying with an exact corpus vector returns that doc at
    rank 1 (catches slot/id corruption for every engine, exact or not);
  - top-10 recall vs a numpy oracle for the exact-ish engines;
  - masked filtered search (the planner's compile_mask -> in-kernel mask
    path) returns only allowed docs, self-match intact;
  - the per-request ef override (SearchParams.ef -> nprobe) on IVF kinds;
  - the sharded product kinds over a 1-device mesh (the shard_map + Pallas
    + all_gather program on the real backend);
  - delete + upsert: removed docs vanish from results, re-added docs with
    new vectors self-match again (the scatter-invalidate / slot-reuse path —
    the PAD_SLOT phantom-write bug class lives here);
  - the codes-only binary capacity config (keep_vectors=False, 32x memory).

Run it alone (never concurrently with another TPU process) after any change
to kernels, fetch, or index plumbing:  timeout 570 python bench/tpu_smoke.py
Exits 0 printing one OK line per kind; raises on the first failure.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, N, NQ, K = 256, 4096, 16, 10

# kind -> (min self-match@1 of NQ, min top-10 oracle recall or None).
# Recall floors are vs an f32 numpy oracle while storage is bf16, so even
# "exact" engines sit near 0.99, not 1.0 (bf16 rounding swaps near-ties).
KINDS = {
    "flat": (NQ, 0.95),
    "int8": (NQ, 0.9),
    "binary": (NQ - 1, None),
    "ivf": (NQ, 0.95),          # nprobe == nlist: exhaustive probe
    "ivf_int8": (NQ, 0.85),
    "ivf_int4": (NQ, 0.85),    # packed nibbles + bf16 rescore (bandwidth cfg)
    "ivf_int8_proj": (NQ - 2, None),
    "ivf_int4_proj": (NQ - 2, None),
    "ivf_pq": (NQ - 2, None),
    "pq": (NQ - 2, None),
    # graph's NN-descent bulk build takes minutes at N=4096 — too slow for a
    # canary; opt in with SMOKE_GRAPH=1
    **({"graph": (NQ - 2, None)} if __import__("os").environ.get("SMOKE_GRAPH")
       else {}),
    # the sharded product kinds run the shard_map program on a 1-device mesh
    "sharded_flat": (NQ, 0.95),
    "sharded_ivf": (NQ, 0.95),
    "sharded_ivf_int8": (NQ, 0.85),
    "sharded_ivf_int4": (NQ, 0.85),
    # 32x capacity config: Hamming-only ranking, no bf16 plane resident
    "binary_codes_only": (NQ, None),
}


def main() -> None:
    from grape_vector_db_tpu.config import VectorDbConfig
    from grape_vector_db_tpu.db import build_index

    rng = np.random.default_rng(3)
    ncent = 64
    centers = rng.standard_normal((ncent, DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, ncent, N)]
            + 0.3 * rng.standard_normal((N, DIM))).astype(np.float32)
    ids = [f"doc-{i}" for i in range(N)]
    qsel = rng.choice(N, NQ, replace=False)
    queries = vecs[qsel]

    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    oracle = np.argsort(-(vn[qsel] @ vn.T), axis=1)[:, :K]

    only = os.environ.get("SMOKE_KINDS")
    kinds = {k: v for k, v in KINDS.items()
             if only is None or k in only.split(",")}
    failures = []
    for kind, (min_self, min_recall) in kinds.items():
        cfg = VectorDbConfig(vector_dimension=DIM)
        cfg.index.kind = kind
        if kind == "binary_codes_only":
            cfg.index.kind = "binary"
            cfg.quantization.keep_vectors = False
        cfg.index.initial_capacity = N
        cfg.index.nlist = 16
        cfg.index.nprobe = 16
        cfg.index.proj_dim = 128
        cfg.device.auto_shard = False
        t0 = time.perf_counter()
        idx = build_index(cfg)
        for i in range(0, N, 1024):
            idx.add_batch(ids[i:i + 1024], vecs[i:i + 1024])
        hits = idx.search_batch(queries, K)
        selfmatch = sum(1 for qi, row in zip(qsel, hits)
                        if row and row[0][0] == f"doc-{qi}")
        rec = None
        if min_recall is not None:
            got = 0
            for want, row in zip(oracle, hits):
                have = {h[0] for h in row}
                got += sum(1 for w in want if f"doc-{w}" in have)
            rec = got / oracle.size
        extra = ""
        ok_extra = True
        if getattr(idx, "supports_mask", False):
            # masked filtered search: allow only the first N//8 docs; the
            # planner compiles exactly this mask for SQL-filtered queries
            allowed = {f"doc-{i}" for i in range(N // 8)}
            mask = idx.compile_mask(allowed)
            mh = idx.search_batch(vecs[:8], K, mask=mask)
            m_ok = sum(1 for j, row in enumerate(mh)
                       if row and all(h[0] in allowed for h in row)
                       and row[0][0] == f"doc-{j}")
            ok_extra &= m_ok >= 7
            extra += f"  masked {m_ok}/8"
        if getattr(idx, "supports_exhaustive_mask", False):
            # exactness tier (r5): a LOW-selectivity filter (1.56% allowed)
            # through the streaming exhaustive masked scan — the regime
            # where the in-probe mask measured recall 0.13 at 16.78M. Every
            # returned id must be allowed (the contract that regressed in
            # r4), rows must fill to k, and containment vs the f32 masked
            # oracle meets a per-family floor (quantized kinds rank over
            # codes without a rescore plane in this path, so int8/int4 get
            # rank-noise allowances; proj kinds scan a projected space and
            # only assert the filter contract).
            allowed_rows = np.arange(0, N, 64)
            allowed_ids = {f"doc-{int(i)}" for i in allowed_rows}
            emask = idx.compile_mask(allowed_ids)
            ehits = idx.search_batch(vecs[:8], K, mask=emask,
                                     exhaustive=True)
            qn8 = vn[:8] @ vn[allowed_rows].T
            cont, all_allowed, filled = 0.0, True, True
            for i, row in enumerate(ehits):
                got_ids = {h[0] for h in row}
                all_allowed &= got_ids <= allowed_ids
                filled &= len(row) == K
                want = {f"doc-{int(allowed_rows[j])}"
                        for j in np.argsort(-qn8[i])[:K]}
                cont += len(got_ids & want) / K
            cont /= 8
            floor = (0.9 if kind in ("ivf", "sharded_ivf") else
                     None if "proj" in kind else
                     0.5 if "int4" in kind else 0.7)
            ok_extra &= all_allowed and filled and (
                floor is None or cont >= floor)
            extra += f"  exact-filter cont {cont:.2f}"
        if "ivf" in kind:
            # per-request ef override (SearchParams.ef -> nprobe): a member
            # query's own list is its nearest centroid, so nprobe=1 must
            # still self-match
            eh = idx.search_batch(queries[:8], K, nprobe=1)
            e_ok = sum(1 for qi, row in zip(qsel[:8], eh)
                       if row and row[0][0] == f"doc-{qi}")
            ok_extra &= e_ok >= 6
            extra += f"  ef1 {e_ok}/8"
        # delete + upsert: scatter-invalidate then slot-reuse re-add
        victims = [f"doc-{int(qi)}" for qi in qsel[:4]]
        idx.remove_batch(victims)
        dh = idx.search_batch(queries[:4], K)
        d_ok = sum(1 for v, row in zip(victims, dh)
                   if all(h[0] != v for h in row))
        idx.add_batch(victims, vecs[qsel[:4]])
        rh = idx.search_batch(queries[:4], K)
        r_ok = sum(1 for v, row in zip(victims, rh)
                   if row and row[0][0] == v)
        ok_extra &= d_ok == 4 and r_ok >= 3
        extra += f"  del {d_ok}/4 re-add {r_ok}/4"
        dt = time.perf_counter() - t0
        line = (f"{kind:16s} self-match {selfmatch}/{NQ}"
                + (f"  recall@10 {rec:.3f}" if rec is not None else "")
                + extra + f"  ({dt:.1f}s)")
        ok = (selfmatch >= min_self and (rec is None or rec >= min_recall)
              and ok_extra)
        print(("OK  " if ok else "FAIL ") + line, flush=True)
        if not ok:
            failures.append(kind)
        del idx

    cross_engine_index_agreement(failures)

    if failures:
        raise SystemExit(f"tpu_smoke FAILED for: {failures}")
    print("tpu_smoke: all kinds OK")


def cross_engine_index_agreement(failures: list) -> None:
    """All four exact top-k engines must return the SAME INDICES at every
    rank on the same corpus. Cross-engine VALUE jitter is expected (bf16
    accumulation order, up to ~1.3e-3 rel — bench/top4_agree_diag.py), so
    this compares indices only; an index mismatch means an engine regressed.
    Canary form of the r4 diag, so engine drift is caught here and not
    first seen in a bench (VERDICT r4 item 8). Calls the engines directly —
    the production router only picks the segmax engines above 131k rows,
    which is too much corpus for a canary upload."""
    import jax.numpy as jnp

    from grape_vector_db_tpu.ops.distance import (_segmax_exact_topk,
        prepare_queries, scored_topk)
    from grape_vector_db_tpu.ops.segmax_pallas import (pallas_segmax2_topk,
        pallas_segmax4_topk, segmax_pallas_supported)

    n2, d2, b2, k2 = 32768, 256, 16, 10
    rng = np.random.default_rng(7)
    vecs_f = rng.standard_normal((n2, d2)).astype(np.float32)
    vecs = jnp.asarray(vecs_f, dtype=jnp.bfloat16)
    norms = jnp.linalg.norm(jnp.asarray(vecs_f), axis=1)
    valid = jnp.ones((n2,), dtype=bool)
    q = jnp.asarray(vecs_f[:b2] + 0.01 * rng.standard_normal(
        (b2, d2)).astype(np.float32))

    engines = {
        "iterative": lambda: scored_topk(q, vecs, norms, valid, k=k2,
                                         metric="cosine", mode="exact"),
        "xla_segmax": lambda: _segmax_exact_topk(
            prepare_queries(q, "cosine"), vecs, norms, valid, k2,
            "cosine", n2),
    }
    if segmax_pallas_supported():
        engines["top2"] = lambda: pallas_segmax2_topk(
            q, vecs, norms, valid, k=k2, metric="cosine")
        engines["top4"] = lambda: pallas_segmax4_topk(
            q, vecs, norms, valid, k=k2, metric="cosine")
    got = {name: tuple(np.asarray(x) for x in fn())
           for name, fn in engines.items()}
    base_name = "iterative"
    base_v, base_i = got[base_name]
    # Per-rank index equality is too strict: at 256-d, adjacent ranks sit
    # within bf16 accumulation jitter and engines legally swap them
    # (measured on-chip: swaps at dv <= 2e-4, sets identical — the same
    # ~1.3e-3 jitter as bench/top4_agree_diag.py). Drift detection =
    # identical per-row SETS, and any per-rank index difference must be a
    # near-tie (both engines' values within the jitter tolerance).
    bad = []
    for name, (vv, ii) in got.items():
        set_ok = all(set(ii[r]) == set(base_i[r])
                     for r in range(ii.shape[0]))
        mism = ii != base_i
        tie_ok = bool(np.all(np.abs(vv[mism] - base_v[mism]) <= 3e-3))
        if not (set_ok and tie_ok):
            bad.append(name)
    line = f"cross-engine index agreement ({', '.join(got)})"
    if bad:
        print(f"FAIL {line}: {bad} disagree with {base_name}", flush=True)
        failures.append("cross_engine_agreement")
    else:
        print(f"OK   {line}", flush=True)


if __name__ == "__main__":
    main()
