#!/usr/bin/env python
"""Verification drive: library boundary on the real backend, stream2
compiled-TPU correctness vs the XLA oracle, degenerate rays, PCG3D
canary, and the graft entry compile check."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())

import stream2
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX
from test_packet_trace import _single_instance_scene
from test_traversal import gen_rays

ds = _single_instance_scene(n_tris=900, seed=3)
n = 2048
ij = np.arange(n)
xs = (ij % 64) / 64.0 - 0.5
ys = (ij // 64) / 32.0 - 0.5
o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e3)
rec = stream2.trace_rays_stream2(ds, jnp.asarray(o), jnp.asarray(d),
                                 1e-3, 1e3)
t_ref, t_got = np.asarray(ref.t), np.asarray(rec.t)
agree = ((t_ref < FLT_MAX) == (t_got < FLT_MAX)).mean()
both = (t_ref < FLT_MAX) & (t_got < FLT_MAX)
print("TPU coherent: agree=%.4f maxterr=%.2e"
      % (agree, np.abs(t_got[both] - t_ref[both]).max()))

rng = np.random.default_rng(7)
o2, d2 = gen_rays(rng, 1024, spread=8.0)
ref2 = traversal.trace_rays(ds, jnp.asarray(o2), jnp.asarray(d2),
                            1e-3, 1e3)
rec2 = stream2.trace_rays_stream2(ds, jnp.asarray(o2), jnp.asarray(d2),
                                  1e-3, 1e3)
t_ref, t_got = np.asarray(ref2.t), np.asarray(rec2.t)
agree2 = ((t_ref < FLT_MAX) == (t_got < FLT_MAX)).mean()
print("TPU random: agree=%.4f" % agree2)

od = np.zeros((1024, 3), np.float32)
rec3 = stream2.trace_rays_stream2(ds, jnp.asarray(od), jnp.asarray(od),
                                  1e-3, 1e3)
print("zero-dir all-miss:", bool((np.asarray(rec3.t) == FLT_MAX).all()))

from radiance_tpu.core import math as rmath
v = np.asarray(rmath.pcg3d(jnp.asarray([[1, 2, 3]], jnp.uint32)))


def pcg3d_np(v):
    v = (v.astype(np.uint64) * 1664525 + 1013904223) & 0xFFFFFFFF
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = (x + y * z) & 0xFFFFFFFF
    y = (y + z * x) & 0xFFFFFFFF
    z = (z + x * y) & 0xFFFFFFFF
    x ^= x >> 16
    y ^= y >> 16
    z ^= z >> 16
    x = (x + y * z) & 0xFFFFFFFF
    y = (y + z * x) & 0xFFFFFFFF
    z = (z + x * y) & 0xFFFFFFFF
    return np.stack([x, y, z], -1)


exp = pcg3d_np(np.asarray([[1, 2, 3]], np.uint32))
print("pcg3d bit-exact:", bool((v == exp).all()))

sys.path.insert(0, "/root/repo")
import importlib
ge = importlib.import_module("__graft_entry__")
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print("graft entry compiled:", jax.tree_util.tree_leaves(out)[0].shape)
print("VERIFY OK")
