"""Bucket (counting) sort ray reordering (ops/reorder.py).

The cheap replacement for the rejected ~212 ms argsort compaction
(BASELINE.md): stable 9-bucket sort keyed on (live, direction octant).
Correctness bar: exact permutation semantics (vs a NumPy stable-sort
oracle) and end-to-end equality of a masked packet trace run sorted +
unsorted (reference contract: results are per-ray and order-free,
radiance/shader/radiance.cl:41-108 walks rays independently).
"""

import numpy as np
import jax.numpy as jnp

from radiance_tpu.ops import reorder

from test_packet_trace import _single_instance_scene
from radiance_tpu.ops import packet_trace, traversal
from radiance_tpu.ops.intersect import FLT_MAX


def test_bucket_perm_matches_stable_sort():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 9, 4096).astype(np.int32)
    perm = np.asarray(reorder.bucket_perm(jnp.asarray(keys), 9))
    ref = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, ref)


def test_bucket_perm_empty_and_single_bucket():
    assert reorder.bucket_perm(jnp.zeros(0, jnp.int32), 4).shape == (0,)
    keys = jnp.zeros(257, jnp.int32)
    perm = np.asarray(reorder.bucket_perm(keys, 4))
    np.testing.assert_array_equal(perm, np.arange(257))


def test_coherence_perm_groups_and_stability():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((2048, 3)).astype(np.float32)
    live = rng.random(2048) > 0.7
    perm, inv = reorder.coherence_perm(jnp.asarray(d),
                                       jnp.asarray(live))
    perm, inv = np.asarray(perm), np.asarray(inv)
    key = np.asarray(reorder.octant_key(jnp.asarray(d),
                                        jnp.asarray(live)))
    ks = key[perm]
    assert (np.diff(ks) >= 0).all()          # grouped ascending
    # dead rays are all at the tail
    n_live = int(live.sum())
    assert (key[perm[:n_live]] < 8).all()
    assert (key[perm[n_live:]] == 8).all()
    # stability: within a bucket, original order preserved
    for b in range(9):
        sel = perm[ks == b]
        assert (np.diff(sel) > 0).all()
    # inverse works
    np.testing.assert_array_equal(perm[inv], np.arange(2048))


def test_masked_packet_trace_sorted_matches_unsorted():
    ds = _single_instance_scene(n_tris=300, seed=5)
    n = 2 * packet_trace.PACKET
    rng = np.random.default_rng(2)
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    live = rng.random(n) > 0.6
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    lv = jnp.asarray(live)

    ref = packet_trace.trace_rays_packet(
        ds, o_j, d_j, jnp.float32(1e-3), jnp.float32(1e3),
        live=lv, interpret=True)
    perm, inv = reorder.coherence_perm(d_j, lv)
    rec = packet_trace.trace_rays_packet(
        ds, o_j[perm], d_j[perm], jnp.float32(1e-3), jnp.float32(1e3),
        live=lv[perm], interpret=True)
    t_s = np.asarray(rec.t)[np.asarray(inv)]
    t_r = np.asarray(ref.t)
    # identical hit sets; t equal (same kernel arithmetic per ray --
    # packet grouping only affects traversal ORDER, not acceptance)
    np.testing.assert_array_equal(t_s < FLT_MAX, t_r < FLT_MAX)
    np.testing.assert_allclose(t_s[t_s < FLT_MAX], t_r[t_r < FLT_MAX],
                               rtol=1e-6, atol=1e-6)
    # dead lanes report miss
    assert (t_s[~live] == FLT_MAX).all()
    # sorted hits also agree with the XLA oracle on live lanes
    orc = traversal.trace_rays(ds, o_j, d_j, 1e-3, 1e3)
    t_o = np.asarray(orc.t)
    agree = ((t_s < FLT_MAX) == (t_o < FLT_MAX))[live].mean()
    assert agree == 1.0
