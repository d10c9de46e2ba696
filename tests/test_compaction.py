"""Wavefront compaction utilities."""

import numpy as np
import jax.numpy as jnp

from radiance_tpu.ops import compaction


def test_compact_mask_stable():
    mask = jnp.asarray(np.array([0, 1, 1, 0, 1, 0, 0, 1], bool))
    perm, count = compaction.compact_mask(mask)
    assert int(count) == 4
    assert np.asarray(perm)[:4].tolist() == [1, 2, 4, 7]  # stable order
    data = jnp.arange(8) * 10
    compacted = data[perm]
    assert np.asarray(compacted)[:4].tolist() == [10, 20, 40, 70]


def test_sort_by_key_and_segments():
    keys = jnp.asarray(np.array([2, 0, 1, 2, 0, 1, 1], np.int32))
    perm, sk = compaction.sort_by_key(keys)
    assert np.asarray(sk).tolist() == [0, 0, 1, 1, 1, 2, 2]
    bounds = compaction.segment_bounds(sk, 3)
    assert np.asarray(bounds).tolist() == [0, 2, 5, 7]
    # stable within key: first 0 comes from index 1 then 4
    assert np.asarray(perm)[:2].tolist() == [1, 4]


def test_invert_perm_roundtrip():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 5, 64, dtype=np.int32))
    perm, _ = compaction.sort_by_key(keys)
    inv = compaction.invert_perm(perm)
    data = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    back = data[perm][inv]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(data))
