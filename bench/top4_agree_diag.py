"""On-chip value-agreement diagnosis: top-4 vs top-2 vs XLA exact at 1M.

bench/segmax_top4_ab.py reported values_agree_onchip=false (B=128, k=10)
while interpret-mode parity on CPU is green — so one of the two Pallas
engines diverges only under Mosaic lowering. This pins down WHICH engine,
WHERE (rank positions), and by HOW MUCH, comparing both against the
XLA-scan exact engine (_segmax_exact_topk) as the referee.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench._harness import gen_corpus  # noqa: E402

DIM, K, B = 768, 10, int(os.environ.get("DIAG_B", "128"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import random

    from grape_vector_db_tpu.ops.distance import _segmax_exact_topk
    from grape_vector_db_tpu.ops.segmax_pallas import (
        pallas_segmax2_topk, pallas_segmax4_topk)

    vecs, norms, valid, key = gen_corpus(DIM)
    kq, key = random.split(key)
    q = random.normal(kq, (B, DIM), jnp.float32)

    def run(fn, **kw):
        v, i = jax.jit(lambda q, v_, n_, va: fn(
            q, v_, n_, va, k=K, metric="cosine", **kw))(q, vecs, norms, valid)
        return np.asarray(v), np.asarray(i)

    v2, i2 = run(pallas_segmax2_topk)
    v4, i4 = run(pallas_segmax4_topk)

    from grape_vector_db_tpu.ops.distance import prepare_queries

    vx, ix = jax.jit(lambda q, v_, n_, va: _segmax_exact_topk(
        prepare_queries(q, "cosine"), v_, n_, va, K, "cosine", 131_072)
    )(q, vecs, norms, valid)
    vx, ix = np.asarray(vx), np.asarray(ix)

    def report(name, va, vb, ia, ib):
        d = np.abs(va - vb)
        bad = d > 1e-5 + 1e-5 * np.abs(vb)
        nbad = int(bad.sum())
        # index agreement: positionwise + set-overlap (ties can permute)
        pos = float(np.mean(ia == ib))
        setov = float(np.mean([len(set(x) & set(y)) / len(x)
                               for x, y in zip(ia.tolist(), ib.tolist())]))
        reld = float(np.max(d / np.maximum(np.abs(vb), 1e-9)))
        print(f"{name}: mismatched values {nbad}/{va.size} "
              f"(max rel {reld:.2e}); idx positionwise {pos:.4f}, "
              f"set-overlap {setov:.4f}", flush=True)
        if nbad:
            rows, cols = np.nonzero(bad)
            print("  by rank:", np.bincount(cols, minlength=K).tolist())
            j = np.argmax(d)
            r, c = np.unravel_index(j, d.shape)
            print(f"  worst q={r} rank={c}: {va[r, c]:.6f} vs {vb[r, c]:.6f}"
                  f" (idx {ia[r, c]} vs {ib[r, c]})")
            # show the full rows around the worst mismatch
            print("  a:", np.round(va[r], 6).tolist())
            print("  b:", np.round(vb[r], 6).tolist())
            print("  ai:", ia[r].tolist())
            print("  bi:", ib[r].tolist())

    report("top2 vs xla", v2, vx, i2, ix)
    report("top4 vs xla", v4, vx, i4, ix)
    report("top4 vs top2", v4, v2, i4, i2)


if __name__ == "__main__":
    main()
