"""Shared probe-bench harness: corpus generation, honest fori-loop timing,
and JSONL appending.

The timing discipline lives HERE so every probe stays honest by
construction (CLAUDE.md): ITERS iterations inside one jitted
``lax.fori_loop`` with a loop-carried data dependence (the relay dedupes
repeated identical dispatches and ``block_until_ready`` can lie), one
host readback to close the measurement, and ~25 ms of relay overhead
subtracted from the wall time.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Tuple

import numpy as np

RELAY_OVERHEAD_S = 0.025


def gen_corpus(dim: int, chunk: int = 131_072, chunks: int = 8, seed: int = 1):
    """(vectors bf16 [chunks*chunk, dim], norms f32, valid bool, key) —
    generated on device in chunk-sized jitted steps."""
    import jax
    import jax.numpy as jnp
    from jax import random

    key = random.PRNGKey(seed)

    @jax.jit
    def gen(k1):
        x = random.normal(k1, (chunk, dim), jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    pv, pn = [], []
    for _ in range(chunks):
        k1, key = random.split(key)
        v, nn_ = gen(k1)
        pv.append(v)
        pn.append(nn_)
    vecs = jnp.concatenate(pv)
    norms = jnp.concatenate(pn)
    valid = jnp.ones((vecs.shape[0],), jnp.bool_)
    return vecs, norms, valid, key


def make_timed(iters: int, reps: int) -> Callable[..., Tuple[float, float]]:
    """Returns timed(step_fn, q0, *ops) -> (best_ms, median_ms) per
    iteration. step_fn(q_perturbed, *ops) must return a f32 scalar that
    depends on its inputs (the loop carries it into the next iteration's
    query perturbation so nothing can be elided or deduped)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def timed(step_fn, q0, *ops, its: int = iters, rep: int = reps):
        @jax.jit
        def loop(qq, *o):
            def body(i, acc):
                qi = qq * (1.0 + acc * 1e-9)
                out = step_fn(qi, *o)
                return acc * 0.5 + out * 1e-6
            return lax.fori_loop(0, its, body, jnp.float32(0))

        float(np.asarray(loop(q0, *ops)))        # compile + warm
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(np.asarray(loop(q0, *ops)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        to_ms = lambda t: max(t - RELAY_OVERHEAD_S, 1e-9) * 1e3 / its
        return to_ms(ts[0]), to_ms(ts[len(ts) // 2])

    return timed


def append_jsonl(filename: str, obj: dict) -> None:
    """Append one JSON line to bench/<filename>."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), filename)
    with open(path, "a") as f:
        f.write(json.dumps(obj) + "\n")
