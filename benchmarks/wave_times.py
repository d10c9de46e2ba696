"""Dev probe: per-wave times of the hybrid bench (stream3 primary
vs gen-1 packet kernel on each wave shape).  Source of the numbers
behind bench.py's wave routing."""
import sys, os, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np, jax, jax.numpy as jnp
import bench as B
from radiance_tpu.ops import packet_trace, stream3
from radiance_tpu.core import math as rmath

scene = B.build_or_load_scene()
n = B.WIDTH * B.HEIGHT
from phase_ledger import bench_rays
o0, d0 = bench_rays()
o, d = jnp.asarray(o0), jnp.asarray(d0)
light = jnp.asarray(np.tile([0.26726124, 0.8017837, 0.5345225], (n, 1)).astype(np.float32))
rows0 = tuple(o[:, k] for k in range(3)) + tuple(d[:, k] for k in range(3))
FLT_MAX = np.float32(3.402823466e38)

tr3 = stream3.build_tracer(scene, check=False, check_every_wave=False, precision="f32")
closest = packet_trace.build_tracer(scene, any_hit=False)
anyhit = packet_trace.build_tracer(scene, any_hit=True)

@jax.jit
def bounce(o, d, t1):
    hit = t1 < FLT_MAX
    hp = o + t1[:, None] * d
    nrm = rmath.normalize(o - hp, eps=1e-6)
    d2 = rmath.reflect(-d, nrm)
    o2 = jnp.where(hit[:, None], hp + nrm * 1e-3, o)
    return o2, d2

def tm(f, label, iters=3):
    r = f(); float(jnp.sum(r[::65536]))
    t0 = time.time()
    for _ in range(iters):
        r = f(); float(jnp.sum(r[::65536]))
    print(f"{label}: {(time.time()-t0)/iters*1e3:.0f} ms", flush=True)
    return r

t1 = tm(lambda: tr3(rows0, None, 1e-3, 1e4).t, "t1 stream3")
o2, d2 = jax.block_until_ready(bounce(o, d, t1))
t2 = tm(lambda: closest(o2, d2, jnp.float32(1e-3), jnp.float32(1e4)).t, "t2 gen1")
t3 = tm(lambda: anyhit(o2, light, jnp.float32(1e-3), jnp.float32(1e4)).t, "t3 gen1 anyhit")
t1b = tm(lambda: closest(o, d, jnp.float32(1e-3), jnp.float32(1e4)).t, "t1 gen1 (ref)")
