"""Top-k merge utilities — the device-side analog of the reference's
"sort all ScoredPoint by score desc, truncate(limit)" shard merge (shard.rs:777-784).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["merge_topk", "take_topk"]


def merge_topk(
    vals_a: jax.Array, idx_a: jax.Array,
    vals_b: jax.Array, idx_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-source top-k lists ([B, ka], [B, kb]) into a global top-k.

    This is the single-collective shard merge: each shard produces a local top-k,
    an all_gather concatenates them, and this picks the global winners.
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idxs = jnp.concatenate([idx_a, idx_b], axis=-1)
    return take_topk(vals, idxs, k)


def take_topk(vals: jax.Array, idxs: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k of (vals, idxs) along the last axis, keeping idxs aligned."""
    k = min(k, vals.shape[-1])
    tv, tp = lax.top_k(vals, k)
    ti = jnp.take_along_axis(idxs, tp, axis=-1)
    return tv, ti
