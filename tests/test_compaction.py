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


def test_traced_wavefront_matches_plain_trace():
    """The engine's compacted trace must be lane-for-lane identical to a
    plain full-wavefront trace on live lanes, and report misses on dead
    lanes (the RMSE-0 contract for wiring compaction into the engine)."""
    import numpy as np
    from radiance_tpu.api import accel
    from radiance_tpu.core import types
    from radiance_tpu.engine.pathtracer import _traced_wavefront
    from radiance_tpu.ops import traversal
    from radiance_tpu.ops.intersect import FLT_MAX

    rng = np.random.default_rng(21)
    c = rng.uniform(-4, 4, (200, 3)).astype(np.float32)
    v = np.concatenate([
        c, c + rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32),
        c + rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)])
    tris = np.stack([np.arange(200), np.arange(200) + 200,
                     np.arange(200) + 400], 1).astype(np.uint32)
    blas = accel.BuildBottomAccelStruct(types.Mesh(v.astype(np.float32), tris))
    inst = types.Instance(np.eye(4, dtype=np.float32), 0, 0, blas)
    ds = accel.BuildTopAccelStruct([inst]).device_scene()

    o = rng.uniform(-6, 6, (333, 3)).astype(np.float32)
    d = rng.normal(size=(333, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    alive = jnp.asarray(rng.uniform(size=333) < 0.6)

    plain = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    compacted = _traced_wavefront(ds, o, d, 1e-3, 1e3, alive)

    am = np.asarray(alive)
    for field in ("t", "prim", "slot", "b1", "b2"):
        np.testing.assert_array_equal(
            np.asarray(getattr(compacted, field))[am],
            np.asarray(getattr(plain, field))[am], err_msg=field)
    assert np.all(np.asarray(compacted.t)[~am] == FLT_MAX)
    assert np.all(np.asarray(compacted.prim)[~am] == -1)
