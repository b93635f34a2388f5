"""Asymmetric binary prescan A/B: dot(q, sign(x)) vs Hamming(sign(q), sign(x)).

binary_profile2/3 established the two-stage binary engine's wall: the
[B, R]-row rescore gather is per-ROW bound (~38 ns/row regardless of row
bytes or gather formulation), so QPS is set by the rescore budget R alone.
The only way to a better frontier is a better PRESCAN: rank candidates by
the real-valued query against the decoded signs — dot(q, sign(x)) — which
is the SAME MXU matmul as the Hamming form (dot(sign(q), sign(x))) but
keeps the query's magnitude information (asymmetric quantized search, the
binary analog of ADC). Same scan cost, strictly more informative scores:
the question is how much rescore budget it buys back.

Measures on 131k x 768 (random = adversarial AND clustered = representative):
  recall@10 after exact rescore at R in {64, 256, 1024} for both prescans
  recall@10 with NO rescore (prescan-only ranking; the codes-only capacity
  config's regime) for both
  scan+selection time for both (should be identical — same matmul)

Run: timeout 2400 python bench/binary_asym_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, DIM, N, ITERS, K = 128, 768, 131_072, 20, 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.index.binary import _rescore_topk
    from grape_vector_db_tpu.ops.hamming import (_unpack_signs, hamming_topk,
                                                 pack_bits)

    rng = np.random.default_rng(0)

    def build(kind):
        if kind == "random":
            vecs = rng.standard_normal((N, DIM)).astype(np.float32)
            qs = rng.standard_normal((B, DIM)).astype(np.float32)
        else:
            ncent = 2048
            cents = rng.standard_normal((ncent, DIM)).astype(np.float32)
            cid = rng.integers(0, ncent, N)
            vecs = (cents[cid]
                    + 0.25 * rng.standard_normal((N, DIM))).astype(np.float32)
            qs = (vecs[:: N // B][:B]
                  + 0.05 * rng.standard_normal((B, DIM))).astype(np.float32)
        qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        oracle = np.argsort(-(qn @ vn.T), axis=1)[:, :K]
        return vecs, qs, oracle

    def asym_topk(q, codes, valid, r):
        """dot(q_unit, sign(x)) descending top-r; scores f32."""
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        xs = _unpack_signs(codes)                      # [N, D] ±1 bf16
        dots = lax.dot_general(qn.astype(jnp.bfloat16), xs,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
        dots = jnp.where(valid[None, :], dots, -jnp.inf)
        vals, idxs = lax.approx_max_k(dots, r, recall_target=0.95)
        return vals, idxs.astype(jnp.int32)

    results = {}
    for kind in ("random", "clustered"):
        vecs_np, qs_np, oracle = build(kind)
        vecs_f = jnp.asarray(vecs_np)
        vectors = vecs_f.astype(jnp.bfloat16)
        norms = jnp.linalg.norm(vecs_f, axis=1)
        codes = pack_bits(vecs_f, 0.0)
        valid = jnp.ones((N,), jnp.bool_)
        q = jnp.asarray(qs_np)
        row = {}

        def recall(idx_rows):
            got = np.asarray(idx_rows)
            return float(np.mean([
                len(set(g[:K].tolist()) & set(o.tolist())) / K
                for g, o in zip(got, oracle)]))

        # prescan-only ranking (capacity / codes-only regime)
        dh, ih = hamming_topk(pack_bits(q, 0.0), codes, valid, k=K,
                              chunk=N, impl="mxu")
        row["hamming_only_recall"] = round(recall(ih), 4)
        _, ia = asym_topk(q, codes, valid, K)
        row["asym_only_recall"] = round(recall(ia), 4)

        # two-stage recall at budgets
        for r in (64, 256, 1024):
            dh, ch = hamming_topk(pack_bits(q, 0.0), codes, valid, k=r,
                                  chunk=N, impl="mxu")
            _, ih2 = _rescore_topk(q, vectors, norms, ch, dh, k=K,
                                   metric="cosine")
            row[f"hamming_r{r}_recall"] = round(recall(ih2), 4)

            va, ca = asym_topk(q, codes, valid, r)
            fake_d = jnp.where(jnp.isfinite(va), 0, 2**30).astype(jnp.int32)
            _, ia2 = _rescore_topk(q, vectors, norms, ca, fake_d, k=K,
                                   metric="cosine")
            row[f"asym_r{r}_recall"] = round(recall(ia2), 4)

        results[kind] = row
        print(json.dumps({"corpus": kind, **row}), flush=True)

    # timing: identical matmul, but confirm (selection included), r=256
    def timed(fn, *ops, its=ITERS):
        @jax.jit
        def loop(qq, *rest):
            def body(i, acc):
                qp = qq * (1.0 + acc * 1e-9)
                out = fn(qp, *rest)
                leaf = out[0][0, 0]
                return acc * 0.5 + leaf.astype(jnp.float32) * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(loop(*ops)))
        return max(time.perf_counter() - t0 - 0.025, 1e-9) * 1e3 / its

    def ham_step(qq, codes, valid):
        qc = pack_bits(qq, 0.0)
        d, i = hamming_topk(qc, codes, valid, k=256, chunk=N, impl="mxu")
        return d.astype(jnp.float32), i

    def asym_step(qq, codes, valid):
        return asym_topk(qq, codes, valid, 256)

    t = {"hamming_scan_sel_ms": round(timed(ham_step, q, codes, valid), 3),
         "asym_scan_sel_ms": round(timed(asym_step, q, codes, valid), 3)}
    print(json.dumps({"stage": "binary_asym_ab", "n": N, **t,
                      **{f"{k}.{kk}": vv for k, r in results.items()
                         for kk, vv in r.items()}}), flush=True)


if __name__ == "__main__":
    main()
