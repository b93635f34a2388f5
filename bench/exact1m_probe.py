"""Probe: honest exact@1M timing (VERDICT r2 item 5).

The 1M segmax exact engine's AOT compile hung the relay (>25 min) when
wrapped in a full-iteration ``lax.fori_loop`` (r1 finding). This probes
small-trip-count fori wrappers (2/4/8 iterations) with a hard wall-clock
guard: if fori(T) compiles, the per-batch time is (loop_time - overhead)/T
with the relay round-trip amortized T-fold; chained dispatches remain the
fallback.

Run stages separately (each its own process so a hung compile can be killed
without losing earlier results):
    EXACT1M_TRIP=2 python bench/exact1m_probe.py
Appends JSON lines to bench/EXACT1M.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, K, BATCH = 768, 10, 128
TRIP = int(os.environ.get("EXACT1M_TRIP", "4"))
SCALE = int(os.environ.get("BENCH_SCALE", "1"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grape_vector_db_tpu.ops.distance import scored_topk

    chunk1m = 131_072 // SCALE
    key = random.PRNGKey(1)

    @jax.jit
    def gen(k1):
        x = random.normal(k1, (chunk1m, DIM), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    pv, pn = [], []
    for _ in range(8):
        k1, key = random.split(key)
        v, nn_ = gen(k1)
        pv.append(v)
        pn.append(nn_)
    v1m = jnp.concatenate(pv)
    n1m = jnp.concatenate(pn)
    m1m = jnp.ones((v1m.shape[0],), jnp.bool_)
    del pv, pn
    kq, key = random.split(key)
    q = random.normal(kq, (BATCH, DIM), jnp.float32)

    def step(qq, vectors, norms, valid):
        return scored_topk(qq, vectors, norms, valid, k=K, metric="cosine",
                           chunk=chunk1m, mode="exact")

    t_compile0 = time.perf_counter()

    @jax.jit
    def loop(qq, vectors, norms, valid):
        def body(i, acc):
            q2 = qq * (1.0 + acc * 1e-9)
            vals, _ = step(q2, vectors, norms, valid)
            return acc * 0.5 + vals[0, 0] * 1e-6
        return lax.fori_loop(0, TRIP, body, jnp.float32(0))

    float(np.asarray(loop(q, v1m, n1m, m1m)))   # compile + warm
    compile_s = time.perf_counter() - t_compile0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(loop(q, v1m, n1m, m1m)))
        times.append(time.perf_counter() - t0)
    times.sort()
    ms = max(times[0] - 0.025, 1e-9) * 1e3 / TRIP
    ms_med = max(times[len(times) // 2] - 0.025, 1e-9) * 1e3 / TRIP

    out = {
        "stage": f"exact1m_fori{TRIP}",
        "n": int(v1m.shape[0]), "trip": TRIP,
        "compile_s": round(compile_s, 1),
        "batch_ms": round(ms, 3), "batch_ms_median": round(ms_med, 3),
        "qps": round(BATCH / ms * 1e3, 0),
        "qps_median": round(BATCH / ms_med * 1e3, 0),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "EXACT1M.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
