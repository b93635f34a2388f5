"""Single-round-trip device->host fetch for (scores, slots) result pairs.

Every search path ends by pulling a float score plane and an integer slot
plane off the device. `np.asarray` per array is one BLOCKING transfer each —
through the TPU relay that is ~25 ms per call, so the single-query latency
paid the relay twice (the reference's equivalent cost is a sled read,
storage.rs:296-339; ours is the wire). Packing the pair into one plane
(bitcast the int lanes to f32, concatenate — one async jitted dispatch) and
reading back once halves the blocking round trips; the host splits and
bitcasts back for free (same-width dtype views copy nothing).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["fetch_scores_slots"]


@jax.jit
def _pack(vals, idxs):
    return jnp.concatenate(
        [vals.astype(jnp.float32),
         lax.bitcast_convert_type(idxs.astype(jnp.int32), jnp.float32)],
        axis=-1,
    )


def fetch_scores_slots(vals, idxs) -> Tuple[np.ndarray, np.ndarray]:
    """(device [..., k] scores, device [..., k] int slots) -> host numpy pair
    via ONE blocking transfer. Shapes must match on the minor axis."""
    k = vals.shape[-1]
    out = np.asarray(_pack(vals, idxs))
    return out[..., :k], out[..., k:].view(np.int32)
