"""Int4IvfDeviceIndex — IVF partitioning over packed-int4-resident lists.

The next rung of the bandwidth/capacity ladder above `index/ivf_int8.py`:
packed nibbles store 0.5 byte/dim (384 B/row at D=768 — a QUARTER of bf16,
half of int8), so the DMA-bound Pallas probe (ops/ivf_pallas.py) streams
probed lists ~2x faster than the int8 probe and the chip holds ~2x more
rows than the int8 capacity config (~4x bf16).

Two configurations (mirroring ivf_int8):

- **bandwidth** (``keep_bf16=True``, default): int4 codes + bf16 shadow.
  The probe scores packed nibbles, then the top ``rescore`` candidates are
  exactly rescored against bf16 rows (the reference's two-stage shape,
  quantization.rs:151-193) — near-exact ranking at the fastest probe.
- **capacity** (``keep_bf16=False``): int4 codes only — ~4x rows/chip vs
  bf16. Scores are asymmetric bf16-query x dequantized-nibble dots; 4-bit
  rank noise is the recall price (measure before choosing this tier).

Packing is split-plane (ops/int4.py): byte j of a row holds dim j (low
nibble) and dim j + D/2 (high nibble), so the kernel unpacks with two
elementwise ops and never needs the lane interleave Mosaic cannot lower.

Reference parity: extends FaissIndexType::IvfFlat with a quantized tier the
reference never had (its IVF linear-scanned anyway, index.rs:620-640).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from grape_vector_db_tpu.index.ivf_int8 import Int8IvfDeviceIndex
from grape_vector_db_tpu.ops.distance import prepare_queries
from grape_vector_db_tpu.ops.int4 import quantize_int4, unpack_int4
from grape_vector_db_tpu.ops.ivf_pallas import finalize_probe_topk

__all__ = ["Int4IvfDeviceIndex"]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("metric",))
def _int4_cell_scatter(codes, scales, factor, lists, pos, new_vecs, new_norms,
                       metric: str):
    """Quantize rows (per-row symmetric int4, ops/int4.py split-plane
    packing) and scatter packed codes + scale + factor planes at
    (list, pos)."""
    vi, s = quantize_int4(new_vecs)
    codes = codes.at[lists, pos].set(vi, mode="drop")
    scales = scales.at[lists, pos].set(s, mode="drop")
    if metric == "cosine":
        f = s / jnp.maximum(new_norms, 1e-12)
    else:
        f = s
    factor = factor.at[lists, :, pos].set(
        jnp.broadcast_to(f[:, None], (f.shape[0], 8)), mode="drop")
    return codes, scales, factor


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric",
                                             "rescore"))
def _ivf_int4_topk(
    queries,     # [B, D] f32 raw
    centroids,   # [L, D] f32
    codes,       # [L, C, D/2] int8 packed nibbles
    factor,      # [L, 8, C] f32 masked scale/norm (0 = invalid)
    vecs,        # [L, C, D] bf16 shadow or None (capacity config)
    norms,       # [L, C] f32 (rescore) or None
    cell_mask,   # [L, C] bool or None
    k: int,
    nprobe: int,
    metric: str,
    rescore: int,
):
    """XLA fallback probe (CPU tests / non-TPU backends): same contract as
    ops/ivf_pallas.pallas_ivf_topk_int4."""
    b, d = queries.shape
    l, c, _ = codes.shape
    q = prepare_queries(queries, metric)

    cq = lax.dot_general(q, centroids, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    _, probe = lax.top_k(cq, min(nprobe, l))                    # [B, P]

    cand = unpack_int4(codes[probe]).astype(jnp.bfloat16)       # [B, P, C, D]
    f = factor[probe, 0]                                        # [B, P, C]
    dots = jnp.einsum("bd,bpcd->bpc", q.astype(jnp.bfloat16), cand,
                      preferred_element_type=jnp.float32)
    scores = dots * f + jnp.where(f == 0.0, -1e9, 0.0)

    def weight(rl, rp):
        # norms are NOT zeroed on delete; fold current validity explicitly
        # so the rescore guard (w > 0) drops cells deleted since scatter.
        cn = norms[rl, rp]
        live = factor[rl, 0, rp] > 0
        if metric == "cosine":
            w = 1.0 / jnp.maximum(cn, 1e-12)
        else:
            w = jnp.ones_like(cn)
        return jnp.where(live & (cn > 0), w, 0.0)

    return finalize_probe_topk(
        q, probe, scores, k, metric, cell_mask=cell_mask,
        rescore=rescore, vecs=vecs,
        weight_fn=None if vecs is None else weight,
    )


class Int4IvfDeviceIndex(Int8IvfDeviceIndex):
    kind = "ivf_int4"
    # the kernel DMAs [C, D/2] packed blocks: D/2 must stay 128-lane-aligned
    _pallas_dim_align = 256

    # -- storage seams --------------------------------------------------------

    def _alloc_codes(self, cap: int) -> None:
        if self._dim % 2:
            raise ValueError(f"ivf_int4 needs an even dim, got {self._dim}")
        # int8-typed (bit pattern of the unsigned packed nibbles): a uint8
        # corpus would force a materialized bitcast copy inside every probe
        # dispatch (ops/int4.py module docstring).
        self.codes = jnp.zeros((self.nlist, cap, self._dim // 2),
                               dtype=jnp.int8)

    def _scatter_codes(self, lists_p, pos_p, vecs_p, norms_p) -> None:
        self.codes, self.scales, self.factor = _int4_cell_scatter(
            self.codes, self.scales, self.factor, lists_p, pos_p, vecs_p,
            norms_p, metric=self.metric)

    def _host_rows(self) -> np.ndarray:
        if self.keep_bf16:
            return super(Int8IvfDeviceIndex, self)._host_rows()
        lev = np.asarray(unpack_int4(self.codes), dtype=np.float32)
        return lev * np.asarray(self.scales)[:, :, None]

    def _host_row(self, lst: int, pos: int) -> np.ndarray:
        if self.keep_bf16:
            return super(Int8IvfDeviceIndex, self)._host_row(lst, pos)
        lev = np.asarray(unpack_int4(self.codes[lst, pos]), dtype=np.float32)
        return lev * float(self.scales[lst, pos])

    # -- search ----------------------------------------------------------------

    def _scan_planes(self):
        return self.codes, self.factor, "int4"

    def _main_topk(self, qp: np.ndarray, k: int, mask, nprobe=None):
        nprobe = min(nprobe or self.nprobe, self.nlist)
        cm = None if mask is None else jnp.asarray(mask[0])
        r = self._rescore_count(k)
        if self._use_pallas:
            from grape_vector_db_tpu.ops.ivf_pallas import pallas_ivf_topk_int4

            return pallas_ivf_topk_int4(
                jnp.asarray(qp), self.centroids, self.codes, self.factor,
                k=k, nprobe=nprobe, metric=self.metric, rescore=r,
                vecs=self.vecs if r else None,
                recip=self.recip if r else None,
                interpret=self._pallas_interpret, cell_mask=cm,
                nblocks=self._pallas_nblocks(),
            )
        return _ivf_int4_topk(
            jnp.asarray(qp), self.centroids, self.codes, self.factor,
            self.vecs if r else None, self.norms if r else None, cm,
            k=k, nprobe=nprobe, metric=self.metric, rescore=r,
        )

    # -- introspection -----------------------------------------------------------

    def get_stats(self):
        stats = super().get_stats()
        stats.kind = self.kind
        per_row = self._dim // 2 + 4 * 2 + 8 * 4  # packed + scale/norm + factor
        if self.keep_bf16:
            per_row += self.storage_dtype.itemsize * self._dim
        stats.memory_usage_mb = self.nlist * self.list_cap * per_row / 1e6
        return stats
