"""IvfPqDeviceIndex — IVF partitioning + PQ codes + exact rescore.

Completes the reference's ``FaissIndexType::IvfPq{nlist, m, nbits}``
(index.rs:313-327) for real: stage 1 probes top-nprobe k-means lists, stage 2
scores the probed cells with asymmetric-distance lookups over uint8 PQ codes
(S bytes per candidate instead of 2*D — the probe gather reads dim*2/S x less
HBM), stage 3 rescores the best candidates exactly against the resident
full-precision vectors.

PQ here is non-residual (global codebooks shared across lists); the exact
rescore stage absorbs the quantization error, so recall is governed by
nprobe x rescore_k rather than code fidelity.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from grape_vector_db_tpu.index.base import SearchHit
from grape_vector_db_tpu.index.ivf import IvfDeviceIndex
from grape_vector_db_tpu.ops.distance import prepare_queries
from grape_vector_db_tpu.ops.pq import encode_pq, train_pq
from grape_vector_db_tpu.utils.buckets import next_bucket, pad_rows

__all__ = ["IvfPqDeviceIndex"]


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_cell_codes(codes, list_ids, positions, new_codes):
    return codes.at[list_ids, positions].set(new_codes, mode="drop")


@functools.partial(
    jax.jit, static_argnames=("nprobe", "rescore_k", "k", "metric")
)
def _ivfpq_topk(
    queries,     # [B, D] f32
    centroids,   # [L, D] f32
    codebooks,   # [S, 256, dsub] f32
    codes,       # [L, C, S] uint8
    vecs,        # [L, C, D] storage dtype (for the exact rescore)
    norms,       # [L, C] f32
    valid,       # [L, C] bool
    nprobe: int,
    rescore_k: int,
    k: int,
    metric: str,
):
    b, d = queries.shape
    l, c, s = codes.shape
    q = prepare_queries(queries, metric)

    # stage 1: probe lists
    cq = lax.dot_general(q, centroids, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    if metric == "euclidean":
        c2 = jnp.sum(centroids * centroids, axis=-1)[None, :]
        cq = -(jnp.sum(q * q, axis=-1, keepdims=True) - 2 * cq + c2)
    _, probe = lax.top_k(cq, min(nprobe, l))                 # [B, P]
    p = probe.shape[1]

    # stage 2: ADC over probed cells
    dsub = codebooks.shape[2]
    q_subs = q.reshape(b, s, dsub)
    lut = jnp.einsum("bsd,skd->bsk", q_subs, codebooks,
                     preferred_element_type=jnp.float32)     # [B, S, 256]
    cand_codes = codes[probe].reshape(b, p * c, s)           # [B, P*C, S]
    cand_norms = norms[probe].reshape(b, p * c)
    cand_valid = valid[probe].reshape(b, p * c)

    def sub_step(acc, sub):
        s_i, col = sub                                       # col [B, P*C]
        acc = acc + jnp.take_along_axis(lut[:, s_i, :], col, axis=1)
        return acc, None

    cols = jnp.moveaxis(cand_codes.astype(jnp.int32), 2, 0)  # [S, B, P*C]
    acc0 = jnp.zeros((b, p * c), jnp.float32)
    dots, _ = lax.scan(sub_step, acc0,
                       (jnp.arange(s, dtype=jnp.int32), cols))
    if metric == "cosine":
        qn = jnp.linalg.norm(q, axis=1, keepdims=True)
        scores = dots / jnp.maximum(cand_norms * qn, 1e-12)
    elif metric == "dot":
        scores = dots
    else:
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        scores = -(q_sq - 2.0 * dots + cand_norms * cand_norms)
    scores = jnp.where(cand_valid, scores, -jnp.inf)

    rk = min(rescore_k, p * c)
    if rk > 16:
        avals, apos = lax.approx_max_k(scores, rk, recall_target=0.95)
    else:
        avals, apos = lax.top_k(scores, rk)

    # map candidate positions back to (list, pos) -> global slot = list*C + pos
    pos_in_cell = jax.lax.broadcasted_iota(jnp.int32, (b, p, c), 2).reshape(b, p * c)
    gslot = (jnp.repeat(probe, c, axis=1) * c + pos_in_cell)  # [B, P*C]
    cand_slot = jnp.take_along_axis(gslot, apos, axis=1)      # [B, rk]

    # stage 3: exact rescore of the rk winners
    lst = cand_slot // c
    pos = cand_slot % c
    rvecs = vecs[lst, pos]                                   # [B, rk, D]
    rnorms = norms[lst, pos]
    precision = (
        lax.Precision.HIGHEST if vecs.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    rdots = jnp.einsum("bd,brd->br", q.astype(vecs.dtype), rvecs,
                       preferred_element_type=jnp.float32, precision=precision)
    if metric == "cosine":
        rscores = jnp.minimum(rdots / jnp.maximum(rnorms, 1e-12), 1.0)
    elif metric == "dot":
        rscores = rdots
    else:
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        rscores = -(q_sq - 2.0 * rdots + rnorms * rnorms)
    rscores = jnp.where(jnp.isfinite(avals), rscores, -jnp.inf)
    kk = min(k, rk)
    fvals, fpos = lax.top_k(rscores, kk)
    fslots = jnp.take_along_axis(cand_slot, fpos, axis=1)
    if kk < k:
        fvals = jnp.pad(fvals, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        fslots = jnp.pad(fslots, ((0, 0), (0, k - kk)))
    return fvals, fslots


class IvfPqDeviceIndex(IvfDeviceIndex):
    kind = "ivf_pq"

    def __init__(self, *args, n_sub: Optional[int] = None, nbits: int = 8,
                 rescore_k: int = 256, **kwargs):
        self._n_sub_arg = n_sub
        self.nbits = nbits
        self.rescore_k = rescore_k
        self.codebooks: Optional[jax.Array] = None
        # The trained search path is the fused ADC scan (_ivfpq_topk), which
        # never touches the parent's Pallas DMA probe — inheriting
        # use_pallas=True would allocate and scatter-maintain the [L, 8, cap]
        # recip plane (32 bytes/cell of HBM) for a kernel this index never
        # runs.
        kwargs.setdefault("use_pallas", False)
        super().__init__(*args, **kwargs)
        self.n_sub = n_sub if n_sub is not None else max(1, self._dim // 8)
        if self._dim % self.n_sub:
            raise ValueError(f"dim {self._dim} not divisible by n_sub {self.n_sub}")
        self.codes = jnp.zeros((self.nlist, self.list_cap, self.n_sub),
                               dtype=jnp.uint8)

    def _alloc(self, cap: int) -> None:
        super()._alloc(cap)
        if getattr(self, "n_sub", None):
            self.codes = jnp.zeros((self.nlist, cap, self.n_sub), dtype=jnp.uint8)

    def train(self, sample: np.ndarray, seed: int = 0) -> None:
        super().train(sample, seed=seed)
        sample = np.asarray(sample, dtype=np.float32)
        if sample.shape[0] > 65536:
            sel = np.random.default_rng(seed).choice(sample.shape[0], 65536,
                                                     replace=False)
            sample = sample[sel]
        self.codebooks = train_pq(jnp.asarray(sample), n_sub=self.n_sub,
                                  nbits=self.nbits, seed=seed)

    def _post_scatter(self, list_ids, positions, vecs) -> None:
        if self.codebooks is None:
            return
        self.codes = _scatter_cell_codes(
            self.codes, list_ids, positions, encode_pq(vecs, self.codebooks)
        )

    def search_batch(self, queries: np.ndarray, k: int,
                     mask=None) -> List[List[SearchHit]]:
        queries = np.asarray(queries, dtype=np.float32)
        b = queries.shape[0]
        if b == 0 or len(self) == 0:
            return [[] for _ in range(b)]
        with self._lock:
            if self.centroids is None or self.codebooks is None:
                return super().search_batch(queries, k, mask=mask)  # exact fallback
            bb = next_bucket(b, base=8)
            qp = pad_rows(queries, bb)
            rk = next_bucket(max(self.rescore_k, k), base=64)
            # Filter mask ANDs into cell validity before the ADC scan — both
            # the code pre-scan and the exact rescore see only allowed rows.
            valid = self.valid if mask is None else jnp.logical_and(
                self.valid, jnp.asarray(mask[0]))
            vals, slots = _ivfpq_topk(
                jnp.asarray(qp), self.centroids, self.codebooks, self.codes,
                self.vecs, self.norms, valid,
                nprobe=self.nprobe, rescore_k=rk, k=k, metric=self.metric,
            )
            vals, slots = np.asarray(vals)[:b], np.asarray(slots)[:b]
            if len(self._overflow):
                o_vals, o_idx = self._overflow.raw_topk(
                    qp, k, mask=None if mask is None else mask[1])
                o_hits = self._overflow.hits_from_slots(o_vals[:b], o_idx[:b])
            else:
                o_hits = [[] for _ in range(b)]
        out: List[List[SearchHit]] = []
        for row_v, row_s, extra in zip(vals, slots, o_hits):
            hits: List[SearchHit] = []
            for v, s_ in zip(row_v, row_s):
                if not np.isfinite(v):
                    continue
                id_ = self._cell_to_id.get(int(s_))
                if id_ is not None:
                    hits.append((id_, float(v)))
            hits.extend(extra)
            hits.sort(key=lambda h: -h[1])
            seen = set()
            uniq = []
            for h in hits:
                if h[0] not in seen:
                    seen.add(h[0])
                    uniq.append(h)
            out.append(uniq[:k])
        return out

    def get_stats(self):
        stats = super().get_stats()
        stats.kind = self.kind
        stats.extra["n_sub"] = float(self.n_sub)
        stats.extra["rescore_k"] = float(self.rescore_k)
        return stats
