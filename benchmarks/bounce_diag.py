"""Dev probe: stream3 diagnostics (flags/caps/words/steps) on the
bench primary wave and its mirror-bounce wave -- the measurement that
routed incoherent waves to the gen-1 kernel."""
import sys, os, time, functools
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np, jax, jax.numpy as jnp
import bench
from phase_ledger import bench_rays, timed
from radiance_tpu.ops import stream3 as s3
from radiance_tpu.ops.stream3 import leaf_tables

scene = bench.build_or_load_scene()
o0, d0 = bench_rays()
n = o0.shape[0]
rows_w = tuple(jnp.asarray(o0[:, k]) for k in range(3)) + tuple(jnp.asarray(d0[:, k]) for k in range(3))
tstart, _ = leaf_tables(scene.knode_f, scene.kleaf.shape[0])
j_run = jax.jit(functools.partial(s3._run, precision="f32",
                                  interpret=False, with_diag=True))
t0 = time.time()
rec, diag = jax.block_until_ready(j_run(rows_w, 1e-3, 1e4, scene.knode_f,
    scene.kleaf, scene.kprim, scene.ktri_geo, scene.inst_inv[0], tstart))
print(f"primary wave: {time.time()-t0:.1f}s (incl compile)", flush=True)
print("primary diag:", {k: int(np.asarray(v).sum()) for k, v in diag.items()})

# mirror bounce (same math as bench run_bench_stream3.bounce_rows)
FLT_MAX = np.float32(3.402823466e38)
t1 = rec.t
ox, oy, oz, dx, dy, dz = rows_w
hit = t1 < FLT_MAX
hx, hy, hz = ox + t1*dx, oy + t1*dy, oz + t1*dz
nx, ny, nz = ox-hx, oy-hy, oz-hz
nl = 1.0/jnp.sqrt(jnp.maximum(nx*nx+ny*ny+nz*nz, 1e-12))
nx, ny, nz = nx*nl, ny*nl, nz*nl
dn = dx*nx+dy*ny+dz*nz
rows2 = (jnp.where(hit, hx+nx*1e-3, ox), jnp.where(hit, hy+ny*1e-3, oy),
         jnp.where(hit, hz+nz*1e-3, oz), dx-2*dn*nx, dy-2*dn*ny, dz-2*dn*nz)
rows2 = jax.block_until_ready(rows2)
t0 = time.time()
rec2, diag2 = jax.block_until_ready(j_run(rows2, 1e-3, 1e4, scene.knode_f,
    scene.kleaf, scene.kprim, scene.ktri_geo, scene.inst_inv[0], tstart))
print(f"bounce wave: {time.time()-t0:.1f}s", flush=True)
print("bounce diag:", {k: int(np.asarray(v).sum()) for k, v in diag2.items()})
d2 = diag2
print("flagged pkts:", int(np.asarray(d2['pkt_flag']).sum()), "/ 2032")
