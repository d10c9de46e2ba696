"""Animated-transform TLAS refit tests."""

import numpy as np
import jax.numpy as jnp

from radiance_tpu.api import accel
from radiance_tpu.core import types
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX

from test_bvh import random_mesh


def test_refit_moves_instances():
    rng = np.random.default_rng(0)
    mesh = random_mesh(rng, 120, spread=1.5)
    blas = accel.BuildBottomAccelStruct(mesh)
    t1 = np.eye(4, dtype=np.float32)
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, 3] = [10, 0, 0]
    instances = [types.Instance(t1, 0, 0, blas),
                 types.Instance(t2, 0, 1, blas)]
    tlas = accel.BuildTopAccelStruct(instances)
    scene = tlas.device_scene()

    # probe ray hitting instance 0 at origin
    o = jnp.asarray(np.array([[0, 0, 30]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1.0]], np.float32))
    h0 = traversal.trace_rays(scene, o, d, 1e-3, 1e3)
    assert bool(h0.hit[0])

    # move instance 0 away, instance 1 into the probe path
    m1 = np.eye(4, dtype=np.float32)
    m1[:3, 3] = [50, 50, 0]
    m2 = np.eye(4, dtype=np.float32)  # now at origin
    scene2 = tlas.refit(np.stack([m1, m2]))

    h1 = traversal.trace_rays(scene2, o, d, 1e-3, 1e3)
    assert bool(h1.hit[0])
    slot = int(h1.slot[0])
    assert int(np.asarray(scene2.inst_id)[slot]) == 1  # the other instance now
    # original position of instance 1 no longer occupied
    o2 = jnp.asarray(np.array([[10, 0, 30]], np.float32))
    h2 = traversal.trace_rays(scene2, o2, d, 1e-3, 1e3)
    assert not bool(h2.hit[0])

    # refit result matches a from-scratch build with the same transforms
    fresh = accel.BuildTopAccelStruct([
        types.Instance(m1, 0, 0, blas), types.Instance(m2, 0, 1, blas)])
    fs = fresh.device_scene()
    hf = traversal.trace_rays(fs, o, d, 1e-3, 1e3)
    np.testing.assert_allclose(float(h1.t[0]), float(hf.t[0]), rtol=1e-6)

    # serialized blob reflects the refit (checkpoint of animated state)
    from radiance_tpu.bvh import serialize
    parsed = serialize.parse_tlas(tlas.blob)
    by_id = {int(r["instanceID"]): r for r in parsed.instances}
    np.testing.assert_allclose(by_id[0]["transform"], m1)


def test_refit_many_frames_consistent():
    rng = np.random.default_rng(1)
    mesh = random_mesh(rng, 60, spread=1.0)
    blas = accel.BuildBottomAccelStruct(mesh)
    instances = [types.Instance(np.eye(4, dtype=np.float32), 0, i, blas)
                 for i in range(5)]
    for i, inst in enumerate(instances):
        inst.transform[0, 3] = 4.0 * i
    tlas = accel.BuildTopAccelStruct(instances)
    scene = tlas.device_scene()
    cap = tlas.tlas_capacity

    for frame in range(3):
        tfs = []
        for i in range(5):
            m = np.eye(4, dtype=np.float32)
            m[0, 3] = 4.0 * i
            m[1, 3] = float(frame)  # march upward
            tfs.append(m)
        scene = tlas.refit(np.stack(tfs))
        o = jnp.asarray(np.array([[8.0, frame, 30.0]], np.float32))
        d = jnp.asarray(np.array([[0, 0, -1.0]], np.float32))
        h = traversal.trace_rays(scene, o, d, 1e-3, 1e3)
        assert bool(h.hit[0]), f"frame {frame}"
        # node array prefix stayed within capacity; BLAS block untouched
        assert scene.node_packed.shape[0] == tlas.device_scene().node_packed.shape[0]
