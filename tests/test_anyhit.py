"""Custom any-hit shader semantics (reference: radiance.cl:90-102).

The reference calls a user callAnyHit per candidate hit with a `cont`
flag; this suite covers the wavefront equivalents: ignore-hit (alpha
test), terminate-on-accept, and the SBT-keyed dispatch.
"""

import numpy as np
import jax.numpy as jnp

from radiance_tpu.api import accel
from radiance_tpu.api.sbt import ShaderBindingTable
from radiance_tpu.core import types
from radiance_tpu.engine import shaders as builtin_shaders
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX


def stacked_quads(n=10):
    """n parallel triangles at z = 1..n, all covering the +z axis ray.

    primID k sits at z = k + 1, so hit order equals prim order.
    """
    verts = []
    for k in range(n):
        z = float(k + 1)
        verts += [[-2, -2, z], [4, -2, z], [-2, 4, z]]
    verts = np.asarray(verts, np.float32)
    tris = np.arange(n * 3, dtype=np.uint32).reshape(-1, 3)
    mesh = types.Mesh(vertices=verts, triangles=tris)
    blas = accel.BuildBottomAccelStruct(mesh)
    inst = types.Instance(np.eye(4, dtype=np.float32), sbt_offset=0,
                          custom_instance_id=0, bottom_accel_struct=blas)
    return accel.BuildTopAccelStruct([inst]).device_scene()


def axis_rays(m=4):
    o = np.zeros((m, 3), np.float32)
    d = np.tile([0.0, 0.0, 1.0], (m, 1)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_ignore_hit_alpha_test():
    """An any-hit that rejects even prims: closest hit must be prim 1
    (z=2), not prim 0 (z=1) -- inexpressible without custom any-hit."""
    ds = stacked_quads()
    o, d = axis_rays()

    def reject_even(cand):
        accept = (cand.prim % 2) == 1
        return accept, jnp.zeros_like(accept)

    plain = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    np.testing.assert_allclose(np.asarray(plain.t), 1.0, rtol=1e-6)
    assert np.all(np.asarray(plain.prim) == 0)

    filtered = traversal.trace_rays(ds, o, d, 1e-3, 1e3,
                                    any_hit_program=reject_even)
    np.testing.assert_allclose(np.asarray(filtered.t), 2.0, rtol=1e-6)
    assert np.all(np.asarray(filtered.prim) == 1)
    np.testing.assert_allclose(np.asarray(filtered.b1),
                               np.asarray(plain.b1), atol=1e-6)


def test_reject_all_is_miss():
    ds = stacked_quads()
    o, d = axis_rays()

    def reject_all(cand):
        z = jnp.zeros_like(cand.valid)
        return z, z

    rec = traversal.trace_rays(ds, o, d, 1e-3, 1e3,
                               any_hit_program=reject_all)
    assert not np.asarray(rec.hit).any()
    assert np.all(np.asarray(rec.prim) == -1)


def test_terminate_stops_walk_with_valid_hit():
    """Accept-all + terminate: the ray stops at its first visited leaf;
    the recorded hit must be real (one of the stacked prims)."""
    ds = stacked_quads()
    o, d = axis_rays()

    def term_all(cand):
        a = jnp.ones_like(cand.valid)
        return a, a

    rec = traversal.trace_rays(ds, o, d, 1e-3, 1e3, any_hit_program=term_all)
    t = np.asarray(rec.t)
    assert (t < FLT_MAX).all()
    prim = np.asarray(rec.prim)
    np.testing.assert_allclose(t, prim.astype(np.float32) + 1.0, rtol=1e-6)
    # matches the dedicated occlusion mode on hit/miss
    occ = traversal.trace_rays(ds, o, d, 1e-3, 1e3, any_hit_terminate=True)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(occ.hit))


def test_sbt_keyed_dispatch():
    """make_any_hit_program routes by instanceSBTOffset + record offset
    (shader.cl:574-583) and skips canonical terminate-on-first."""
    def alpha(cand, res):
        accept = (cand.prim % 2) == 1
        return accept, jnp.zeros_like(accept)

    records = [
        {"raygen": "rg", "closestHit": "", "anyHit": "", "miss": ""},
        {"raygen": "", "closestHit": "", "anyHit": "alpha", "miss": ""},
        {"raygen": "", "closestHit": "", "anyHit": "anyShadow", "miss": ""},
    ]
    sbt = ShaderBindingTable.from_json(
        records, {"alpha": alpha, "anyShadow": builtin_shaders.any_shadow,
                  "rg": lambda *a: None})

    # offset 1 reaches the custom alpha shader -> real program
    prog = sbt.make_any_hit_program(1, {})
    assert prog is not None
    ds = stacked_quads()
    o, d = axis_rays()
    rec = traversal.trace_rays(ds, o, d, 1e-3, 1e3, any_hit_program=prog)
    # instance sbt_offset = 0, record offset 1 -> key 1 -> alpha applies
    np.testing.assert_allclose(np.asarray(rec.t), 2.0, rtol=1e-6)

    # a record offset reaching only the canonical anyShadow -> None
    only_canon = ShaderBindingTable.from_json(
        [{"raygen": "", "closestHit": "", "anyHit": "anyShadow",
          "miss": ""}],
        {"anyShadow": builtin_shaders.any_shadow})
    assert only_canon.make_any_hit_program(0, {}) is None


def test_anyhit_multi_instance_key():
    """Two instances with different SBT offsets: the program applies only
    where the key matches."""
    verts = np.asarray([[-2, -2, 1], [4, -2, 1], [-2, 4, 1]], np.float32)
    tris = np.asarray([[0, 1, 2]], np.uint32)
    blas = accel.BuildBottomAccelStruct(types.Mesh(verts, tris))
    m2 = np.eye(4, dtype=np.float32)
    m2[0, 3] = 10.0  # shifted +x
    insts = [
        types.Instance(np.eye(4, dtype=np.float32), 0, 0, blas),
        types.Instance(m2, 1, 1, blas),  # sbt_offset 1
    ]
    ds = accel.BuildTopAccelStruct(insts).device_scene()

    def reject_key1(cand, res):
        z = jnp.zeros_like(cand.valid)
        return z, z

    sbt = ShaderBindingTable.from_json(
        [{"raygen": "", "closestHit": "", "anyHit": "", "miss": ""},
         {"raygen": "", "closestHit": "", "anyHit": "rej", "miss": ""}],
        {"rej": reject_key1})
    prog = sbt.make_any_hit_program(0, {})
    assert prog is not None

    o = jnp.asarray(np.array([[0, 0, 0], [10, 0, 0]], np.float32))
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (2, 1)).astype(np.float32))
    rec = traversal.trace_rays(ds, o, d, 1e-3, 1e3, any_hit_program=prog)
    hit = np.asarray(rec.hit)
    assert hit[0] and not hit[1]  # key 0 accepted, key 1 rejected
