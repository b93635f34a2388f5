"""16M-rows-on-one-chip capacity benchmark: projected int8 IVF (VERDICT r2
item 2 — the >8.39M rows/chip tier).

Engine: PCA projection 768 -> R=384 + int8-resident IVF lists + the ragged
block-DMA Pallas probe (ops/ivf_pallas.py) at 384 lanes. Resident bytes/row
~= 384 (codes) + 4 (scale) + 4 (norm) + 32 (factor plane) ~= 424 B — ~2x the
rows/chip of 768-d int8, ~3.6x bf16.

Build is streamed (the full-precision corpus never resides on chip):
  pass 1  generate clustered blocks (deterministic PRNG), fit projection +
          spherical k-means on a 512k sample (chunked k-means), take TOP-2
          nearest lists per row
  place   host-side capacity-constrained placement: first-choice list while
          it has room, else second choice, else drop — k-means list-size
          skew otherwise forces a cap sized to the LARGEST list (first
          attempt: fill 0.25 -> 28 GiB of padding -> OOM); second-choice
          spill bounds cap near the MEAN fill at a tiny recall cost (the
          row sits in an adjacent probed list)
  pass 2  regenerate blocks, project, quantize, scatter at the placed
          (list, pos); simultaneously fold each full-precision block into a
          running EXACT top-10 for the query batch — the oracle is exact
          over all 16M rows at full 768-d precision, so recall charges
          projection + int8 + nprobe + placement loss together.

Corpus: clustered with a j^-0.5 decaying spectrum (embedding-like energy
concentration — the regime a projection tier is FOR; the isotropic
adversarial case is covered in tests/test_ivf_int8.py).

Env: CAP_BLOCKS (default 128 -> 16.78M rows), CAP_NPROBE (default 2),
CAP_CODES=int8|int4 (packed-nibble lists: half the code bytes again —
~169 B/row at R=256; needs R % 256 == 0 for the Pallas probe),
CAP_R (projection width). Every run also reports the host-rescore
containment recalls (`recall_at_10_after_host_rescore_C{64,256}`): the
fraction of exact-oracle rows present in the probe's top-C candidate set —
with `query.host_rescore=C` the product re-ranks those C exactly from the
document store, so containment IS the served recall@10 of the capacity
config. Appends one JSON line to bench/CAPACITY.jsonl.
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, K, BATCH = 768, 10, 128
R = int(os.environ.get("CAP_R", "384"))
CODES = os.environ.get("CAP_CODES", "int8")
BLK = int(os.environ.get("CAP_BLK", "131072"))
NBLOCKS = int(os.environ.get("CAP_BLOCKS", "128"))
NPROBE = int(os.environ.get("CAP_NPROBE", "2"))
NLIST = int(os.environ.get("CAP_NLIST", "16384"))
PAD_SLOT = 1 << 30  # never -1: JAX wraps negative scatter indices pre-drop


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.ivf_pallas import (
        ivf_pallas_supported, make_factor, nblocks_from_counts,
        pallas_ivf_topk_int4, pallas_ivf_topk_int8)
    from grape_vector_db_tpu.ops.kmeans import kmeans

    if CODES == "int4":
        assert R % 256 == 0, f"int4 Pallas probe needs R%256==0, got {R}"

    n_total = NBLOCKS * BLK
    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)

    # Generator-width note (measured): 65k micro-centers made k-means cell
    # sizes MORE uneven (18.6% dropped at cap=1.45x mean) than 16k centers
    # (5.4% at 1.6x) — the skew is k-means Voronoi imbalance, not the
    # generator; the cap multiplier is the operative lever.
    ncent = 16_384
    key = random.PRNGKey(7)
    kc, key = random.split(key)
    centers = random.normal(kc, (ncent, DIM), jnp.float32)
    spec = jnp.asarray((1.0 + np.arange(DIM)) ** -0.5, jnp.float32)

    @jax.jit
    def gen_block(k1, k2, cents):
        cid = random.randint(k2, (BLK,), 0, cents.shape[0])
        x = (cents[cid] + 0.25 * random.normal(k1, (BLK, DIM), jnp.float32))
        x = x * spec[None, :]
        return x.astype(jnp.bfloat16)

    block_keys = []
    for _ in range(NBLOCKS):
        k1, k2, key = random.split(key, 3)
        block_keys.append((k1, k2))

    # ---- projection + centroids ------------------------------------------
    sample = gen_block(*block_keys[0], centers)[:65_536].astype(jnp.float32)
    cov = lax.dot_general(sample, sample, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    _, evecs = jnp.linalg.eigh(cov)
    proj = evecs[:, ::-1][:, :R]                     # [D, R]
    del sample, cov, evecs
    log("projection fitted")
    train_blocks = min(8, NBLOCKS)
    psample = jnp.concatenate([
        (gen_block(*block_keys[i], centers).astype(jnp.float32) @ proj)
        for i in range(train_blocks)
    ])
    # kmeans requires n % chunk == 0 (it raises otherwise); gcd keeps the
    # chunked scan for any CAP_BLK override, falling back to unchunked only
    # when no usable divisor exists (tiny/odd samples, where [N, K] fits).
    kchunk = math.gcd(psample.shape[0], 8192)
    cents, _ = kmeans(psample, k=NLIST, iters=12, seed=0, mode="spherical",
                      chunk=kchunk if kchunk >= 1024 else None)
    cents.block_until_ready()
    del psample
    log(f"k-means done (nlist={NLIST}, sample={train_blocks * BLK})")

    # ---- pass 1: top-C nearest lists per row ------------------------------
    NCHOICE = int(os.environ.get("CAP_NCHOICE", "8"))

    @jax.jit
    def assignc_block(k1, k2, cents_full, proj, cents):
        x = gen_block(k1, k2, cents_full).astype(jnp.float32) @ proj
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = lax.dot_general(x, cents, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
        _, topc = lax.top_k(sims, NCHOICE)
        return topc.astype(jnp.int32)                # [BLK, NCHOICE]

    topc_np = []
    for k1, k2 in block_keys:
        topc_np.append(np.asarray(assignc_block(k1, k2, centers, proj, cents)))
    log(f"pass 1 done (top-{NCHOICE} assignments)")

    # ---- host placement: capacity-constrained first/second choice ---------
    mean_fill = n_total / NLIST
    cap = int(os.environ.get(
        "CAP_TARGET", ((int(mean_fill * 1.45) + 127) // 128) * 128))

    def block_rank(a):
        """Per-list arrival rank within one block (vectorized)."""
        order = np.argsort(a, kind="stable")
        a_s = a[order]
        idx = np.arange(len(a), dtype=np.int64)
        new = np.ones(len(a), bool)
        new[1:] = a_s[1:] != a_s[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = np.empty(len(a), np.int64)
        rank[order] = idx - seg_start
        return rank

    fill = np.zeros(NLIST, np.int64)
    placed_list, placed_pos = [], []
    spilled = dropped = 0
    for tc in topc_np:
        blk_n = tc.shape[0]
        lst = np.full(blk_n, -1, np.int64)
        pos = np.zeros(blk_n, np.int64)
        used = np.zeros(NLIST, np.int64)  # placed this block
        for c in range(NCHOICE):
            un = np.nonzero(lst < 0)[0]
            if un.size == 0:
                break
            a_c = tc[un, c].astype(np.int64)
            r = block_rank(a_c)
            keep = r < (cap - fill[a_c] - used[a_c])
            tgt = un[keep]
            a_k = a_c[keep]
            pos[tgt] = fill[a_k] + used[a_k] + r[keep]
            lst[tgt] = a_k
            used += np.bincount(a_k, minlength=NLIST)
            if c > 0:
                spilled += int(keep.sum())
        dropped += int((lst < 0).sum())
        fill += used
        placed_list.append(np.where(lst >= 0, lst, PAD_SLOT).astype(np.int64))
        placed_pos.append(np.where(lst >= 0, pos, PAD_SLOT).astype(np.int64))
    assert int(fill.max()) <= cap
    log(f"placement done: cap={cap} fill={n_total / (NLIST * cap):.2f} "
        f"spilled={spilled} ({spilled / n_total:.2%}) "
        f"dropped={dropped} ({dropped / n_total:.2%})")

    # ---- allocate resident planes ----------------------------------------
    code_w = R // 2 if CODES == "int4" else R
    codes = jnp.zeros((NLIST, cap, code_w), jnp.int8)
    scales = jnp.zeros((NLIST, cap), jnp.float32)
    norms = jnp.zeros((NLIST, cap), jnp.float32)
    valid = jnp.zeros((NLIST, cap), jnp.bool_)
    resident_gb = (NLIST * cap * (code_w + 4 + 4 + 1)
                   + NLIST * 8 * cap * 4) / 2**30
    log(f"planes allocated: {resident_gb:.2f} GiB resident (incl. factor)")

    # ---- pass 2: scatter + streamed exact oracle --------------------------
    kq, key = random.split(key)
    qblock = gen_block(*block_keys[0], centers).astype(jnp.float32)
    queries = qblock[:: BLK // BATCH][:BATCH] + 0.02 * (
        random.normal(kq, (BATCH, DIM), jnp.float32) * spec[None, :])
    del qblock

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def scatter_block(codes, scales, norms, valid, k1, k2, cents_full, proj,
                      lst, pos, ov, oi, q, blk_off):
        xf = gen_block(k1, k2, cents_full).astype(jnp.float32)
        # exact full-dim oracle fold for this block
        s = (q @ xf.T) / jnp.maximum(
            jnp.linalg.norm(q, axis=1, keepdims=True)
            * jnp.linalg.norm(xf, axis=1)[None, :], 1e-12)
        bv, bi = lax.top_k(s, K)
        mv = jnp.concatenate([ov, bv], axis=1)
        mi = jnp.concatenate([oi, bi + blk_off], axis=1)
        mvals, mpos = lax.top_k(mv, K)
        ov, oi = mvals, jnp.take_along_axis(mi, mpos, axis=1)
        # project + quantize + scatter at host-placed (list, pos)
        xp = xf @ proj
        nrm = jnp.linalg.norm(xp, axis=1)
        if CODES == "int4":
            sc = jnp.max(jnp.abs(xp), axis=1) / 7.0
            qv = jnp.clip(jnp.round(xp / jnp.maximum(sc[:, None], 1e-12)),
                          -8, 7)
            u = (qv + 8.0).astype(jnp.uint8)      # offset-binary nibbles
            xi = lax.bitcast_convert_type(
                jnp.bitwise_or(u[:, : R // 2],
                               jnp.left_shift(u[:, R // 2:], 4)), jnp.int8)
        else:
            sc = jnp.max(jnp.abs(xp), axis=1) / 127.0
            xi = jnp.clip(jnp.round(xp / jnp.maximum(sc[:, None], 1e-12)),
                          -127, 127).astype(jnp.int8)
        codes = codes.at[lst, pos].set(xi, mode="drop")
        scales = scales.at[lst, pos].set(sc, mode="drop")
        norms = norms.at[lst, pos].set(nrm, mode="drop")
        valid = valid.at[lst, pos].set(True, mode="drop")
        return codes, scales, norms, valid, ov, oi

    ov = jnp.full((BATCH, K), -jnp.inf, jnp.float32)
    oi = jnp.zeros((BATCH, K), jnp.int32)
    t0 = time.perf_counter()
    for i, (k1, k2) in enumerate(block_keys):
        codes, scales, norms, valid, ov, oi = scatter_block(
            codes, scales, norms, valid, k1, k2, centers, proj,
            jnp.asarray(placed_list[i]), jnp.asarray(placed_pos[i]),
            ov, oi, queries, jnp.int32(i * BLK))
    valid.block_until_ready()
    ingest_s = time.perf_counter() - t0
    log(f"pass 2 done: {n_total} rows ingested in {ingest_s:.1f}s "
        f"({n_total / ingest_s / 1e6:.2f}M rows/s)")
    oracle_slots = np.asarray(oi)  # global row ids [B, K]

    factor = make_factor(scales, norms, valid)
    del scales
    nblk = nblocks_from_counts(jnp.asarray(fill.astype(np.int32)))
    interp = not ivf_pallas_supported()

    # oracle global row id -> engine (list, pos) straight from the placement
    want_cells = {}
    for g in set(int(x) for x in oracle_slots.ravel()):
        b, j = divmod(g, BLK)
        l_, p_ = int(placed_list[b][j]), int(placed_pos[b][j])
        if l_ < NLIST:
            want_cells[g] = (l_, p_)
        # dropped rows stay unmapped — charged against recall

    qp = queries @ proj  # the engine searches in projected space
    probe_fn = (pallas_ivf_topk_int4 if CODES == "int4"
                else pallas_ivf_topk_int8)
    nprobes = [int(x) for x in
               os.environ.get("CAP_NPROBES", str(NPROBE)).split(",")]
    for nprobe in nprobes:
        def step(q, cents, codes, factor, nblk, nprobe=nprobe, k=K):
            return probe_fn(q, cents, codes, factor, k=k,
                            nprobe=nprobe, metric="cosine",
                            rescore=0, vecs=None, recip=None,
                            nblocks=nblk, interpret=interp)

        _, si = jax.jit(functools.partial(step, k=K))(
            qp, cents, codes, factor, nblk)
        si = np.asarray(si)  # engine slots: list * cap + pos
        got_cells = [{(int(s) // cap, int(s) % cap) for s in row}
                     for row in si]

        # host-rescore containment: with query.host_rescore=C the product
        # re-ranks the probe's top-C exactly from the document store, so
        # served recall@10 == fraction of oracle rows inside the top-C set
        rescore_recall = {}
        for cwidth in (64, 256):
            _, sc_ = jax.jit(functools.partial(step, k=cwidth))(
                qp, cents, codes, factor, nblk)
            sc_ = np.asarray(sc_)
            hits_c = denom_c = 0
            for orow, srow in zip(oracle_slots, sc_):
                cells = {(int(s) // cap, int(s) % cap) for s in srow}
                for g in orow:
                    cell = want_cells.get(int(g))
                    if cell is None:
                        continue
                    denom_c += 1
                    hits_c += cell in cells
            rescore_recall[cwidth] = (
                hits_c / (len(oracle_slots) * K),      # raw (drops charged)
                hits_c / max(denom_c, 1))              # reachable
        # raw recall charges dropped oracle rows; reachable recall is
        # conditional on the oracle row having been placed at all
        hits_raw = hits_reach = denom_reach = 0
        for orow, grow in zip(oracle_slots, got_cells):
            for g in orow:
                cell = want_cells.get(int(g))
                if cell is None:
                    continue
                denom_reach += 1
                if cell in grow:
                    hits_raw += 1
                    hits_reach += 1
        rec = hits_raw / (len(oracle_slots) * K)
        rec_reach = hits_reach / max(denom_reach, 1)
        log(f"nprobe={nprobe}: recall@10 raw={rec:.4f} "
            f"reachable={rec_reach:.4f}")

        iters = 32

        @jax.jit
        def loop(q, cents, codes, factor, nblk):
            def body(i, acc):
                qq = q * (1.0 + acc * 1e-9)
                vals, _ = step(qq, cents, codes, factor, nblk)
                return acc * 0.5 + vals[0, 0] * 1e-6
            return lax.fori_loop(0, iters, body, jnp.float32(0))

        float(np.asarray(loop(qp, cents, codes, factor, nblk)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(qp, cents, codes, factor, nblk)))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - 0.025, 1e-9) * 1e3 / iters

        out = {
            "engine": f"ivf_{CODES}_proj", "n": n_total, "dim": DIM,
            "proj_dim": R, "nlist": NLIST, "nprobe": nprobe, "list_cap": cap,
            "resident_gib": round(resident_gb, 2),
            "bytes_per_row_resident": code_w + 4 + 4 + 1 + 32,
            "ingest_rows_per_s": round(n_total / ingest_s, 0),
            "spilled_rows": spilled, "dropped_rows": dropped,
            "batch_ms": round(ms, 3), "qps": round(BATCH / ms * 1e3, 0),
            "recall_at_10_exact_fulldim_oracle": round(rec, 4),
            "recall_at_10_reachable": round(rec_reach, 4),
            **{f"recall_at_10_after_host_rescore_C{c}": round(v[0], 4)
               for c, v in rescore_recall.items()},
            **{f"recall_at_10_after_host_rescore_C{c}_reachable":
               round(v[1], 4) for c, v in rescore_recall.items()},
            "backend": jax.default_backend(),
        }
        print(json.dumps(out), flush=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "CAPACITY.jsonl"), "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
