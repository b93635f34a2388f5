"""IvfPqDeviceIndex — IVF partitioning + PQ codes + configurable rescore.

Completes the reference's ``FaissIndexType::IvfPq{nlist, m, nbits}``
(index.rs:313-327) for real: stage 1 probes top-nprobe k-means lists, stage 2
scores the probed cells with asymmetric-distance lookups over uint8 PQ codes
(S bytes per candidate instead of 2*D — the probe gather reads dim*2/S x less
HBM), stage 3 rescores the best candidates against a resident plane.

Two orthogonal knobs beyond the reference:

- ``residual`` (default True): encode x - centroid(list) instead of x — the
  classic FAISS IVF-PQ refinement. The centroid dot already computed by the
  stage-1 probe is added back at scan time (q.x = q.c_l + q.r), so residual
  coding costs nothing at search and roughly halves quantization error on
  clustered corpora.
- ``resident``: which plane backs the stage-3 rescore.
    * "bf16"  — full-precision shadow (default; memory = bf16 IVF + codes).
    * "int8"  — int8 shadow: half the rescore-plane HBM, near-exact ranking.
    * "none"  — codes-only capacity config: ~S+9 bytes/row total. Ranking is
      pure ADC; get_vector/get_all reconstruct rows by decoding codes (the
      same contract as ivf_int8's capacity config). This is the >16M rows/chip
      tier (96 B/row at 768-d PQ96 vs 1536 B bf16).
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
from grape_vector_db_tpu.index.ivf_int8 import _nv_scatter
from grape_vector_db_tpu.ops.distance import prepare_queries
from grape_vector_db_tpu.ops.int8 import quantize_int8
from grape_vector_db_tpu.ops.pq import encode_pq, train_pq
from grape_vector_db_tpu.utils.buckets import next_bucket, pad_rows
from grape_vector_db_tpu.utils.fetch import fetch_scores_slots

__all__ = ["IvfPqDeviceIndex"]


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_cell_codes(codes, list_ids, positions, new_codes):
    return codes.at[list_ids, positions].set(new_codes, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _i8_cell_scatter(codes8, scales8, list_ids, positions, new_vecs):
    vi, sc = quantize_int8(new_vecs)
    codes8 = codes8.at[list_ids, positions].set(vi, mode="drop")
    scales8 = scales8.at[list_ids, positions].set(sc, mode="drop")
    return codes8, scales8


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "rescore_k", "k", "metric", "residual"),
)
def _ivfpq_topk(
    queries,     # [B, D] f32
    centroids,   # [L, D] f32
    codebooks,   # [S, 256, dsub] f32
    codes,       # [L, C, S] uint8
    rvecs,       # rescore plane: [L, C, D] bf16 / int8, or None (ADC-only)
    rscales,     # [L, C] f32 int8 dequant scales (int8 plane only) or None
    norms,       # [L, C] f32
    valid,       # [L, C] bool
    nprobe: int,
    rescore_k: int,
    k: int,
    metric: str,
    residual: bool,
):
    b, d = queries.shape
    l, c, s = codes.shape
    q = prepare_queries(queries, metric)

    # stage 1: probe lists
    cq = lax.dot_general(q, centroids, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    if metric == "euclidean":
        c2 = jnp.sum(centroids * centroids, axis=-1)[None, :]
        cq_aff = -(jnp.sum(q * q, axis=-1, keepdims=True) - 2 * cq + c2)
    else:
        cq_aff = cq
    _, probe = lax.top_k(cq_aff, min(nprobe, l))             # [B, P]
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
    if residual:
        # q.x = q.centroid_l + q.residual — the centroid term is stage 1's
        # cq, gathered at the probed lists and broadcast over their cells.
        cqp = jnp.take_along_axis(cq, probe, axis=1)         # [B, P]
        dots = dots + jnp.repeat(cqp, c, axis=1)
    if metric == "cosine":
        qn = jnp.linalg.norm(q, axis=1, keepdims=True)
        scores = dots / jnp.maximum(cand_norms * qn, 1e-12)
    elif metric == "dot":
        scores = dots
    else:
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        scores = -(q_sq - 2.0 * dots + cand_norms * cand_norms)
    scores = jnp.where(cand_valid, scores, -jnp.inf)

    # candidate positions -> global slot = list * C + pos
    pos_in_cell = jax.lax.broadcasted_iota(jnp.int32, (b, p, c), 2).reshape(b, p * c)
    gslot = (jnp.repeat(probe, c, axis=1) * c + pos_in_cell)  # [B, P*C]

    if rescore_k <= 0 or rvecs is None:
        # ADC-only capacity config: ranking IS the ADC scores. Selection via
        # the fast exact engines (ops/distance._select_topk) — lax.top_k over
        # the long nprobe*cap axis is the documented 25-ms TPU pathology.
        from grape_vector_db_tpu.ops.distance import _select_topk

        kk = min(k, p * c)
        fvals, fpos = _select_topk(scores, kk, "exact", 0.99)
        fslots = jnp.take_along_axis(gslot, fpos, axis=1)
        if kk < k:
            fvals = jnp.pad(fvals, ((0, 0), (0, k - kk)),
                            constant_values=-jnp.inf)
            fslots = jnp.pad(fslots, ((0, 0), (0, k - kk)))
        return fvals, fslots

    rk = min(rescore_k, p * c)
    if rk > 16:
        avals, apos = lax.approx_max_k(scores, rk, recall_target=0.95)
    else:
        avals, apos = lax.top_k(scores, rk)
    cand_slot = jnp.take_along_axis(gslot, apos, axis=1)      # [B, rk]

    # stage 3: rescore the rk winners against the resident plane
    lst = cand_slot // c
    pos = cand_slot % c
    rrows = rvecs[lst, pos]                                   # [B, rk, D]
    rnorms = norms[lst, pos]
    if rvecs.dtype == jnp.int8:
        rdots = jnp.einsum("bd,brd->br", q.astype(jnp.bfloat16),
                           rrows.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        rdots = rdots * rscales[lst, pos]
    else:
        precision = (
            lax.Precision.HIGHEST if rvecs.dtype == jnp.float32
            else lax.Precision.DEFAULT
        )
        rdots = jnp.einsum("bd,brd->br", q.astype(rvecs.dtype), rrows,
                           preferred_element_type=jnp.float32,
                           precision=precision)
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
    # PQ codes need the ADC arithmetic, not the shared bf16/int8/int4 scan.
    supports_exhaustive_mask = False

    def __init__(self, *args, n_sub: Optional[int] = None, nbits: int = 8,
                 rescore_k: int = 256, residual: bool = True,
                 resident: str = "bf16", **kwargs):
        if resident not in ("bf16", "int8", "none"):
            raise ValueError(f"resident must be bf16|int8|none, got {resident}")
        self._n_sub_arg = n_sub
        self.nbits = nbits
        self.rescore_k = rescore_k
        self.residual = bool(residual)
        self.resident = resident
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

    # -- storage seams ----------------------------------------------------------

    def _auto_train_threshold(self) -> int:
        # codebooks need 2^nbits rows; until then inserts buffer in the
        # exact overflow region (capacity configs have no bf16 fallback)
        return max(self.nlist * 4, 2 ** self.nbits)

    def optimize(self) -> None:
        # Guard BEFORE the parent's clear(): a capacity-config retrain with
        # too few rows would otherwise raise mid-optimize with the index
        # already wiped.
        if self.resident != "bf16" and len(self) < 2 ** self.nbits:
            return
        super().optimize()

    def _alloc(self, cap: int) -> None:
        l, d = self.nlist, self._dim
        if self.resident == "bf16":
            super()._alloc(cap)
            self.codes8 = None
            self.scales8 = None
        else:
            self.vecs = None
            self.norms = jnp.zeros((l, cap), dtype=jnp.float32)
            self.valid = jnp.zeros((l, cap), dtype=jnp.bool_)
            self.recip = None
            if self.resident == "int8":
                self.codes8 = jnp.zeros((l, cap, d), dtype=jnp.int8)
                self.scales8 = jnp.zeros((l, cap), dtype=jnp.float32)
            else:
                self.codes8 = None
                self.scales8 = None
        if getattr(self, "n_sub", None):
            self.codes = jnp.zeros((l, cap, self.n_sub), dtype=jnp.uint8)

    def _scatter_rows(self, lists_p, pos_p, vecs_p, norms_p) -> None:
        if self.resident == "bf16":
            super()._scatter_rows(lists_p, pos_p, vecs_p, norms_p)
        else:
            self.norms, self.valid = _nv_scatter(
                self.norms, self.valid, lists_p, pos_p, norms_p)
            if self.resident == "int8":
                self.codes8, self.scales8 = _i8_cell_scatter(
                    self.codes8, self.scales8, lists_p, pos_p, vecs_p)

    def train(self, sample: np.ndarray, seed: int = 0) -> None:
        sample = np.asarray(sample, dtype=np.float32)
        # Size validation BEFORE any state changes: raising after
        # super().train() would leave centroids set with codebooks None —
        # a state whose capacity-config search has no plane to fall back on.
        if sample.shape[0] < 2 ** self.nbits and self.resident != "bf16":
            raise ValueError(
                f"{2 ** self.nbits} training vectors required for "
                f"{self.nbits}-bit PQ (resident={self.resident})")
        super().train(sample, seed=seed)
        if sample.shape[0] < 2 ** self.nbits:
            # bf16 config: too few rows to fit 2^nbits codewords — stay on
            # the parent's exact IVF probe (codebooks None => search_batch
            # falls back). optimize() after the corpus grows retrains and
            # encodes everything (clear + train + re-place).
            self.codebooks = None
            return
        if sample.shape[0] > 65536:
            sel = np.random.default_rng(seed).choice(sample.shape[0], 65536,
                                                     replace=False)
            sample = sample[sel]
        enc_in = jnp.asarray(sample)
        if self.residual:
            # codebooks model the residual distribution (FAISS IVF-PQ form)
            from grape_vector_db_tpu.ops.kmeans import assign_clusters

            assign = assign_clusters(enc_in, self.centroids,
                                     mode=self._kmeans_mode)
            enc_in = enc_in - self.centroids[assign]
        self.codebooks = train_pq(enc_in, n_sub=self.n_sub,
                                  nbits=self.nbits, seed=seed)

    def _post_scatter(self, list_ids, positions, vecs) -> None:
        if self.codebooks is None:
            return
        if self.residual:
            # PAD_SLOT list ids gather out of bounds — jnp clamps, and the
            # scatter drops those rows anyway.
            vecs = vecs - self.centroids[jnp.minimum(list_ids,
                                                     self.nlist - 1)]
        self.codes = _scatter_cell_codes(
            self.codes, list_ids, positions, encode_pq(vecs, self.codebooks)
        )

    # -- host reads (capacity configs reconstruct) ------------------------------

    def _host_rows(self) -> np.ndarray:
        if self.resident == "bf16":
            return super()._host_rows()
        if self.resident == "int8":
            return (np.asarray(self.codes8, dtype=np.float32)
                    * np.asarray(self.scales8)[:, :, None])
        cb = np.asarray(self.codebooks)                    # [S, K, dsub]
        codes = np.asarray(self.codes)                     # [L, C, S]
        l, c, s = codes.shape
        dec = cb[np.arange(s)[None, None, :], codes]       # [L, C, S, dsub]
        dec = dec.reshape(l, c, self._dim)
        if self.residual:
            dec = dec + np.asarray(self.centroids)[:, None, :]
        return dec.astype(np.float32)

    def _host_row(self, lst: int, pos: int) -> np.ndarray:
        if self.resident == "bf16":
            return super()._host_row(lst, pos)
        if self.resident == "int8":
            return (np.asarray(self.codes8[lst, pos], dtype=np.float32)
                    * float(self.scales8[lst, pos]))
        cb = np.asarray(self.codebooks)
        code = np.asarray(self.codes[lst, pos])            # [S]
        dec = cb[np.arange(len(code)), code].reshape(self._dim)
        if self.residual:
            dec = dec + np.asarray(self.centroids[lst])
        return dec.astype(np.float32)

    # -- search -----------------------------------------------------------------

    def search_batch(self, queries: np.ndarray, k: int,
                     mask=None, nprobe=None) -> List[List[SearchHit]]:
        queries = np.asarray(queries, dtype=np.float32)
        b = queries.shape[0]
        if b == 0 or len(self) == 0:
            return [[] for _ in range(b)]
        with self._lock:
            if self.centroids is None or self.codebooks is None:
                return super().search_batch(queries, k, mask=mask,
                                            nprobe=nprobe)  # exact fallback
            bb = next_bucket(b, base=8)
            qp = pad_rows(queries, bb)
            if self.resident == "none":
                rk = 0
                rvecs, rscales = None, None
            else:
                rk = next_bucket(max(self.rescore_k, k), base=64)
                rvecs = self.vecs if self.resident == "bf16" else self.codes8
                rscales = self.scales8
            # Filter mask ANDs into cell validity before the ADC scan — both
            # the code pre-scan and the rescore see only allowed rows.
            valid = self.valid if mask is None else jnp.logical_and(
                self.valid, jnp.asarray(mask[0]))
            vals, slots = _ivfpq_topk(
                jnp.asarray(qp), self.centroids, self.codebooks, self.codes,
                rvecs, rscales, self.norms, valid,
                nprobe=min(nprobe or self.nprobe, self.nlist),
                rescore_k=rk, k=k, metric=self.metric,
                residual=self.residual,
            )
            vals, slots = fetch_scores_slots(vals, slots)
            vals, slots = vals[:b], slots[:b]
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
        per_row = self.n_sub + 4 + 1  # PQ codes + norm + valid
        if self.resident == "bf16":
            per_row += self.storage_dtype.itemsize * self._dim
        elif self.resident == "int8":
            per_row += self._dim + 4
        stats.memory_usage_mb = self.nlist * self.list_cap * per_row / 1e6
        stats.extra["n_sub"] = float(self.n_sub)
        stats.extra["rescore_k"] = float(self.rescore_k)
        stats.extra["residual"] = float(self.residual)
        return stats
