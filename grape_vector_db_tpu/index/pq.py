"""PqDeviceIndex — product-quantized ADC scan + exact rescore.

Completes the reference's IVF-PQ intent (FaissIndexType::IvfPq{nlist,m,nbits},
index.rs:313-327 — whose PQ training existed but whose search ignored it).
Structure mirrors BinaryDeviceIndex: full-precision vectors stay resident for
exact rescoring; the pre-scan runs over uint8 PQ codes (dim*2/S x less HBM
traffic than the bf16 scan; the capacity play is storing ONLY codes for cold
shards — a follow-up knob).

Codebooks train on the first big-enough batch (or call train()); codes for
vectors inserted before training are backfilled at train time.
"""

from __future__ import annotations

import functools
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grape_vector_db_tpu.index.flat import FlatDeviceIndex, _scatter_set
from grape_vector_db_tpu.ops.pq import adc_topk, encode_pq, train_pq
from grape_vector_db_tpu.utils.buckets import next_bucket
from grape_vector_db_tpu.utils.fetch import fetch_scores_slots

__all__ = ["PqDeviceIndex"]

_INVALID = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_codes(codes, slots, new_codes):
    return codes.at[slots].set(new_codes, mode="drop")


@functools.partial(jax.jit, static_argnames=("new_cap",))
def _grow_codes(codes, new_cap: int):
    return jnp.pad(codes, ((0, new_cap - codes.shape[0]), (0, 0)))


class PqDeviceIndex(FlatDeviceIndex):
    kind = "pq"

    def __init__(
        self,
        dimension: int,
        metric: str = "cosine",
        storage_dtype: str = "bfloat16",
        initial_capacity: int = 4096,
        growth_factor: int = 2,
        n_sub: Optional[int] = None,
        nbits: int = 8,
        rescore_ratio: float = 0.05,
        max_rescore: int = 4096,
        train_threshold: int = 1024,
        search_mode: str = "exact",
        recall_target: float = 0.99,
        device: Optional[jax.Device] = None,
    ):
        if n_sub is None:
            n_sub = max(1, dimension // 8)  # 8 dims per subspace default
        if dimension % n_sub:
            raise ValueError(f"dimension {dimension} not divisible by n_sub {n_sub}")
        self.n_sub = n_sub
        self.nbits = nbits
        self.rescore_ratio = rescore_ratio
        self.max_rescore = max_rescore
        self.train_threshold = max(train_threshold, 2 ** nbits)
        self.codebooks: Optional[jax.Array] = None
        super().__init__(
            dimension, metric=metric, storage_dtype=storage_dtype,
            initial_capacity=initial_capacity, growth_factor=growth_factor,
            search_mode=search_mode, recall_target=recall_target, device=device,
        )

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    # -- storage hooks -----------------------------------------------------------

    def _alloc_extra(self, capacity: int) -> None:
        self.codes = self._put(jnp.zeros((capacity, self.n_sub), dtype=jnp.uint8))

    def _grow_extra(self, new_cap: int) -> None:
        self.codes = _grow_codes(self.codes, new_cap=new_cap)

    def _write(self, slots, vecs, norms) -> None:
        self.vectors, self.norms, self.valid = _scatter_set(
            self.vectors, self.norms, self.valid, slots, vecs, norms
        )
        if self.codebooks is not None:
            self.codes = _scatter_codes(self.codes, slots,
                                        encode_pq(vecs, self.codebooks))
        elif len(self) >= self.train_threshold:
            self.train()

    # -- training ------------------------------------------------------------------

    def train(self, sample: Optional[np.ndarray] = None, seed: int = 0) -> None:
        if sample is None:
            _, sample = self.get_all()
        sample = np.asarray(sample, dtype=np.float32)
        if sample.shape[0] < 2 ** self.nbits:
            raise ValueError("not enough vectors to train PQ codebooks")
        if sample.shape[0] > 65536:
            sel = np.random.default_rng(seed).choice(sample.shape[0], 65536,
                                                     replace=False)
            sample = sample[sel]
        self.codebooks = train_pq(jnp.asarray(sample), n_sub=self.n_sub,
                                  nbits=self.nbits, seed=seed)
        # backfill codes for everything already resident
        ids, vecs = self.get_all()
        if ids:
            slots = np.asarray([self._id_to_slot[i] for i in ids], dtype=np.int32)
            self.codes = _scatter_codes(
                self.codes, jnp.asarray(slots),
                encode_pq(jnp.asarray(vecs), self.codebooks),
            )

    def optimize(self) -> None:
        """Retrain codebooks on the current corpus."""
        if len(self) >= 2 ** self.nbits:
            self.train()

    # -- search ----------------------------------------------------------------------

    def _rescore_count(self, k: int) -> int:
        want = max(k, int(self.rescore_ratio * len(self)))
        want = min(want, self.max_rescore, max(self.capacity, 1))
        return next_bucket(max(want, k), base=64)

    def raw_topk(self, queries: np.ndarray, k: int,
                 mask: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
        if self.codebooks is None:
            return super().raw_topk(queries, k, mask=mask)  # exact until trained
        with self._lock:
            r = self._rescore_count(k)
            q = jnp.asarray(queries, dtype=jnp.float32)
            chunk = min(65536, self.capacity)
            # Filter mask folds into the ADC pre-scan validity (two-stage
            # filtered search, same contract as BinaryDeviceIndex).
            valid = self.valid if mask is None else jnp.logical_and(
                self.valid, jnp.asarray(mask))
            vals, cand = adc_topk(q, self.codebooks, self.codes, self.norms,
                                  valid, k=r, chunk=chunk)
            from grape_vector_db_tpu.index.binary import _rescore_topk

            dist_proxy = jnp.where(jnp.isfinite(vals), 0, 2**30).astype(jnp.int32)
            fvals, fidx = _rescore_topk(
                q, self.vectors, self.norms, cand, dist_proxy, k=k,
                metric=self.metric,
            )
            return fetch_scores_slots(fvals, fidx)

    def get_stats(self):
        stats = super().get_stats()
        stats.kind = self.kind
        stats.is_built = self.is_trained
        stats.extra["n_sub"] = float(self.n_sub)
        stats.extra["code_bytes_per_vec"] = float(self.n_sub)
        stats.extra["rescore_k"] = float(self._rescore_count(10))
        return stats
