"""Wavefront compaction + material-sorted shading queues.

The north-star wavefront optimizations (BASELINE.json): stream-compact
live rays between bounces and sort shading work by shader/material key so
each SBT dispatch touches a dense, coherent queue instead of a masked full
wavefront.  XLA requires static shapes, so "compaction" here is
*permutation*: live rays are moved to the front (stable), the count rides
along, and downstream stages simply process a prefix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compact_mask(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable front-compaction permutation for a bool mask.

    Returns (perm [N] i32, count []) where perm lists indices of True
    entries first (in order), then the False entries.  Gathering any ray
    array by `perm` yields the compacted layout.
    """
    n = mask.shape[0]
    # cumsum + scatter, NOT argsort: a radix sort on a 2M-ray wave
    # costs ~100+ ms on the axon backend (the measured ~212 ms
    # argsort+gather compaction BASELINE.md rejected); the prefix-sum
    # construction is a few ms.  Stability falls out of the scan:
    # live entry i lands at (#live before i), dead entry i at
    # n_live + (#dead before i).
    if n == 0:
        return jnp.zeros(0, jnp.int32), jnp.int32(0)
    idx = jnp.arange(n, dtype=jnp.int32)
    c_live = jnp.cumsum(mask.astype(jnp.int32)).astype(jnp.int32)
    n_live = c_live[-1]
    pos = jnp.where(mask, c_live - 1, n_live + (idx - c_live))
    perm = jnp.zeros(n, jnp.int32).at[pos].set(idx)
    return perm, n_live


def sort_by_key(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Material/shader-key sort permutation (stable).

    Returns (perm, sorted_keys).  The wavefront analog of the reference's
    SBT switch (shader.cl:574-605): after permutation, rays with the same
    hit-shader key are contiguous, so masked dispatch touches dense runs.
    """
    perm = jnp.argsort(keys, stable=True).astype(jnp.int32)
    return perm, keys[perm]


def apply_perm(tree, perm: jnp.ndarray):
    """Gather every array leaf of a pytree by the permutation."""
    return jax.tree_util.tree_map(lambda x: x[perm], tree)


def invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse permutation (scatter results back to pixel order)."""
    n = perm.shape[0]
    return jnp.zeros(n, perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype))


def segment_bounds(sorted_keys: jnp.ndarray, n_keys: int) -> jnp.ndarray:
    """Start offsets of each key segment in a sorted key array.

    Returns [n_keys + 1] i32 with segment k spanning
    [bounds[k], bounds[k+1]).  n_keys must be a static upper bound.
    """
    ks = jnp.arange(n_keys + 1, dtype=sorted_keys.dtype)
    return jnp.searchsorted(sorted_keys, ks, side="left").astype(jnp.int32)
