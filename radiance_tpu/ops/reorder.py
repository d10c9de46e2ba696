"""Cheap in-jit ray reordering: stable bucket (counting) sort.

The wavefront literature's ray-reordering step (PAPERS.md) — group a
scattered secondary wave (bounce/shadow) into traversal-coherent
packets — was rejected in round 2 as a full `argsort` (+gather) costing
~212 ms per 2M-ray wave on this backend (BASELINE.md).  This module is
the cheap replacement VERDICT r3 asked for: a *stable counting sort*
over a handful of buckets, built from one cumsum per bucket plus one
scatter — a few ms, not hundreds.

Why so few buckets is enough: secondary waves arrive in pixel order,
and pixel adjacency is already the best origin grouping (bench.py
presort note).  What kills packet traversal is *mixing*: (a) dead
lanes — ~78% of this bench's secondary rays have no live path — spread
one-per-packet so every packet still walks, and (b) direction-octant
mixing, which breaks the near-child-first walk order and doubles the
interval frusta.  Both are fixed by an 9-bucket stable sort with key

    key = live ? direction_octant(d) : 8

Stability keeps pixel order *within* each bucket, so origin coherence
survives; all dead rays collapse into trailing all-dead packets, which
the live-mask kernels retire in ~one node step (packet_trace._kernel
masked=True: a packet whose every lane is dead opens nothing and
escapes the root immediately).

Reference behavior note: the reference has no analog — each OpenCL
work-item walks its own ray regardless of coherence
(radiance/shader/radiance.cl:41-108); reordering is a packet-machine
(TPU) requirement, not a feature parity item.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bucket_perm(keys: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    """Stable counting-sort permutation for small integer keys.

    Returns perm [N] i32 with keys[perm] sorted ascending and equal
    keys in original order.  Cost: n_buckets cumsums + one scatter
    (vs a full radix argsort's ~100+ ms on 2M rays, BASELINE.md).
    n_buckets must be a static Python int; keys must be in
    [0, n_buckets).
    """
    n = keys.shape[0]
    i32 = jnp.int32
    if n == 0:
        return jnp.zeros(0, i32)
    idx = jnp.arange(n, dtype=i32)
    ranks = jnp.zeros(n, i32)
    cnts = []
    for b in range(n_buckets):
        m = keys == b
        c = jnp.cumsum(m.astype(i32))
        ranks = jnp.where(m, c - 1, ranks)
        cnts.append(c[-1])
    cnts = jnp.stack(cnts)
    offs = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(cnts)[:-1].astype(i32)])
    pos = offs[jnp.clip(keys, 0, n_buckets - 1)] + ranks
    return jnp.zeros(n, i32).at[pos].set(idx)


def invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse permutation (scatter sorted results back)."""
    n = perm.shape[0]
    return jnp.zeros(n, perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype))


def octant_key(direction: jnp.ndarray,
               live: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Bucket key: direction octant 0-7 for live rays, 8 for dead.

    direction may be [N, 3] or a (dx, dy, dz) row tuple.
    """
    i32 = jnp.int32
    if isinstance(direction, (tuple, list)):
        dx, dy, dz = direction
    else:
        dx, dy, dz = (direction[:, 0], direction[:, 1], direction[:, 2])
    key = ((dx < 0).astype(i32) + 2 * (dy < 0).astype(i32)
           + 4 * (dz < 0).astype(i32))
    if live is not None:
        key = jnp.where(live, key, jnp.int32(8))
    return key


def coherence_perm(direction, live=None) -> Tuple[jnp.ndarray,
                                                  jnp.ndarray]:
    """(perm, inv) sorting live rays into direction-octant groups (dead
    rays last), stable so pixel-order origin coherence survives."""
    perm = bucket_perm(octant_key(direction, live),
                       9 if live is not None else 8)
    return perm, invert_perm(perm)


def apply_perm_rows(rows, perm):
    """Gather each component row of a rays-as-rows tuple."""
    return tuple(r[perm] for r in rows)
