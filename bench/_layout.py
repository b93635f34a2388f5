"""Shared streaming clustered-corpus -> bucketed IVF layout builder.

Extracted from bench/sweep_int4.py's build_clustered_layout so other
benches (bench/tune_cap16m.py) can build the SAME 16.78M int4 capacity
layout (same recipe, same seeds => same corpus) without duplicating the
streaming scatter logic. The corpus is never host-resident: chunks are
generated on device from deterministic PRNG keys, assigned, quantized and
scattered into fixed-capacity lists; with ``keep_gen`` the generator
(centers + keys + row->slot map) is returned so callers can re-stream the
full-precision rows for exact oracles or host-rescore stores.

Reference parity: this is bench tooling for the capacity tier measured in
docs/benchmarks.md (the reference's equivalent corpus rigs live in its
benches; index.rs:620-640 is the IVF being modeled).
"""

from __future__ import annotations

import functools
import time

import numpy as np


def build_clustered_layout(n, nlist, n_centers, seed, planes, dim=768,
                           keep_gen: bool = False, noise: float = 0.25,
                           chunk: int | None = None, log=None):
    """Streaming clustered corpus -> bucketed IVF layout on device.

    ``planes``: subset of {"bf16", "int8", "int4"} — which storage planes
    to build. Returns a dict of device arrays; with ``keep_gen`` it also
    carries the deterministic chunk generator (centers + PRNG keys) and the
    row->layout-slot map (``rowmap[r] = lst * cap + pos``), so callers can
    re-stream the full-precision corpus without it ever being chip-resident.
    """
    import jax
    import jax.numpy as jnp
    from jax import random

    from grape_vector_db_tpu.ops.int4 import quantize_int4
    from grape_vector_db_tpu.ops.int8 import quantize_int8 as quantize_rows_i8
    from grape_vector_db_tpu.ops.kmeans import assign_clusters, kmeans

    if chunk is None:
        chunk = min(131_072, n)
    keyr = random.PRNGKey(seed)
    kc, keyr = random.split(keyr)
    centers = random.normal(kc, (n_centers, dim), jnp.float32)

    @jax.jit
    def gen(k1, k2, cents_):
        cid = random.randint(k2, (chunk,), 0, cents_.shape[0])
        x = cents_[cid] + noise * random.normal(k1, (chunk, dim),
                                                jnp.float32)
        return x.astype(jnp.bfloat16), jnp.linalg.norm(x, axis=1)

    chunks_meta = []
    for _ in range(n // chunk):
        k1, k2, keyr = random.split(keyr, 3)
        chunks_meta.append((k1, k2))

    v0, _ = gen(*chunks_meta[0], centers)
    t0 = time.perf_counter()
    cents, _ = kmeans(v0.astype(jnp.float32), k=nlist, iters=8, seed=0,
                      mode="spherical")
    cents.block_until_ready()
    t_train = time.perf_counter() - t0
    v0.delete()

    t0 = time.perf_counter()
    assigns = []
    for (k1, k2) in chunks_meta:
        v, _ = gen(k1, k2, centers)
        assigns.append(np.asarray(assign_clusters(
            v.astype(jnp.float32), cents, mode="spherical")))
    assign_all = np.concatenate(assigns)
    counts = np.bincount(assign_all, minlength=nlist)
    cap = int(((counts.max() + 127) // 128) * 128)

    out = {
        "cents": cents,
        "inr": jnp.zeros((nlist, cap), jnp.float32),
        "ival": jnp.zeros((nlist, cap), jnp.bool_),
    }
    if "bf16" in planes:
        out["iv"] = jnp.zeros((nlist, cap, dim), jnp.bfloat16)
    if "int8" in planes:
        out["codes8"] = jnp.zeros((nlist, cap, dim), jnp.int8)
        out["scales8"] = jnp.zeros((nlist, cap), jnp.float32)
    if "int4" in planes:
        out["codes4"] = jnp.zeros((nlist, cap, dim // 2), jnp.int8)
        out["scales4"] = jnp.zeros((nlist, cap), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scat_nv(inr, ival, lists, pos, nn):
        return (inr.at[lists, pos].set(nn),
                ival.at[lists, pos].set(True))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scat_v(iv, lists, pos, v):
        return iv.at[lists, pos].set(v)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scat_i8(codes, scales, lists, pos, v):
        vi, s = quantize_rows_i8(v)
        return (codes.at[lists, pos].set(vi),
                scales.at[lists, pos].set(s))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scat_i4(codes, scales, lists, pos, v):
        vi, s = quantize_int4(v.astype(jnp.float32))
        return (codes.at[lists, pos].set(vi),
                scales.at[lists, pos].set(s))

    next_pos = np.zeros(nlist, dtype=np.int64)
    rowmap = np.empty(n, dtype=np.int64) if keep_gen else None
    off = 0
    for (k1, k2) in chunks_meta:
        v, nn_ = gen(k1, k2, centers)
        a = assign_all[off:off + chunk]
        order = np.argsort(a, kind="stable")
        sorted_a = a[order]
        grp_start = np.searchsorted(sorted_a, np.arange(nlist))
        within = np.arange(chunk) - grp_start[sorted_a]
        pos = np.empty(chunk, dtype=np.int32)
        pos[order] = (next_pos[sorted_a] + within).astype(np.int32)
        next_pos += np.bincount(a, minlength=nlist)
        if rowmap is not None:
            rowmap[off:off + chunk] = a.astype(np.int64) * cap + pos
        lists_d, pos_d = jnp.asarray(a), jnp.asarray(pos)
        out["inr"], out["ival"] = scat_nv(out["inr"], out["ival"],
                                          lists_d, pos_d, nn_)
        if "iv" in out:
            out["iv"] = scat_v(out["iv"], lists_d, pos_d, v)
        if "codes8" in out:
            out["codes8"], out["scales8"] = scat_i8(
                out["codes8"], out["scales8"], lists_d, pos_d, v)
        if "codes4" in out:
            out["codes4"], out["scales4"] = scat_i4(
                out["codes4"], out["scales4"], lists_d, pos_d, v)
        off += chunk
    out["ival"].block_until_ready()
    out["counts"] = counts
    if keep_gen:
        out["centers"] = centers
        out["chunks_meta"] = chunks_meta
        out["gen"] = gen
        out["rowmap"] = rowmap
        out["chunk"] = chunk
    else:
        centers.delete()
    if log is not None:
        log("build", n=n, nlist=nlist, list_cap=cap, planes=sorted(planes),
            train_s=round(t_train, 1),
            layout_s=round(time.perf_counter() - t0, 1))
    return out
