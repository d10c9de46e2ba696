#!/usr/bin/env python
"""Dev probe: decompose the per-grid-step cost of a streamed Pallas
kernel into {bare step, +input DMA, +matmul f32 HIGHEST, +matmul bf16,
+VPU Moller-Trumbore-equivalent ops}.

Usage: python benchmarks/step_overhead.py [P] [packet]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128
LANES = 4 * T
FLUSH = 32
_FMAX = 3.4028235e38


def _kern(lim_ref, x_ref, w_ref, out_ref, acc_ref, *, packet, mode):
    f32, i32 = jnp.float32, jnp.int32
    i = pl.program_id(0)
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]

    @pl.when(i % FLUSH == 0)
    def _():
        acc_ref[:, 0:1] = jnp.full((packet, 1), _FMAX, f32)
        acc_ref[:, 1:2] = jnp.full((packet, 1), -1.0, f32)

    if mode == "empty":
        pass
    elif mode == "dma":
        # touch one element of the streamed block so the DMA cannot be
        # optimised away, but do no real compute
        acc_ref[0, 2:3] = w_ref[0, 0:1, 0].astype(f32)
    elif mode in ("mm_f32", "mm_bf16"):
        x = x_ref[:]
        if mode == "mm_bf16":
            m = jnp.dot(x.astype(jnp.bfloat16),
                        w_ref[0].astype(jnp.bfloat16),
                        preferred_element_type=f32)
        else:
            m = jnp.dot(x, w_ref[0], preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)
        s0 = m[:, 0 * T:1 * T]
        s1 = m[:, 1 * T:2 * T]
        s2 = m[:, 2 * T:3 * T]
        num = m[:, 3 * T:4 * T]
        ssum = s0 + s1 + s2
        b0 = jax.lax.bitcast_convert_type(s0, i32)
        b1_ = jax.lax.bitcast_convert_type(s1, i32)
        b2_ = jax.lax.bitcast_convert_type(s2, i32)
        inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
        t = -num / ssum
        ok = inside & (t > tmin) & (t < tmax)
        tt = jnp.where(ok, t, _FMAX)
        lanes_t = jax.lax.broadcasted_iota(i32, (packet, T), 1)
        pr = jnp.min(tt, axis=1, keepdims=True)
        match = tt == pr
        jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1, keepdims=True)
        tri = (i * T + jmin).astype(f32)
        cur = acc_ref[:, 0:1]
        imp = pr < cur
        acc_ref[:, 0:1] = jnp.where(imp, pr, cur)
        cur2 = acc_ref[:, 1:2]
        acc_ref[:, 1:2] = jnp.where(imp, tri, cur2)
    elif mode == "mt":
        # Moller-Trumbore on the VPU: per-ray columns x per-tri rows.
        # w rows: 0-2 v0, 3-5 e1, 6-8 e2 (broadcast down rays).
        def rrow(k):           # per-ray scalar column [packet, 1]
            return x_ref[:, k:k + 1]

        def trow(k):           # per-tri row [1, T]
            return w_ref[0, k:k + 1, 0:T]

        dx, dy, dz = rrow(0), rrow(1), rrow(2)
        ox_, oy_, oz_ = rrow(6), rrow(7), rrow(8)
        v0x, v0y, v0z = trow(0), trow(1), trow(2)
        e1x, e1y, e1z = trow(3), trow(4), trow(5)
        e2x, e2y, e2z = trow(6), trow(7), trow(8)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / det
        tx = ox_ - v0x
        ty = oy_ - v0y
        tz = oz_ - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (t > tmin) & (t < tmax)
        tt = jnp.where(ok, t, _FMAX)
        lanes_t = jax.lax.broadcasted_iota(i32, (packet, T), 1)
        pr = jnp.min(tt, axis=1, keepdims=True)
        match = tt == pr
        jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1, keepdims=True)
        tri = (i * T + jmin).astype(f32)
        cur = acc_ref[:, 0:1]
        imp = pr < cur
        acc_ref[:, 0:1] = jnp.where(imp, pr, cur)
        cur2 = acc_ref[:, 1:2]
        acc_ref[:, 1:2] = jnp.where(imp, tri, cur2)

    @pl.when(i % FLUSH == FLUSH - 1)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


def run(mode, P, packet, lim, feats, w):
    wrows, wlanes = w.shape[1], w.shape[2]
    fn = pl.pallas_call(
        functools.partial(_kern, packet=packet, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(P,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((packet, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wrows, wlanes), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, packet, 8),
                                   lambda i: (i // FLUSH, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((packet, 8), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((P // FLUSH, packet, 8),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False,
    )
    jf = jax.jit(fn)

    def once():
        return float(jnp.sum(jf(lim, feats, w)[:, ::64, 0]))

    once()
    t0 = time.time()
    for _ in range(3):
        once()
    dt = (time.time() - t0) / 3
    print(f"{mode}: {dt*1e3:.1f} ms total, {dt/P*1e6:.2f} us/step")


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    packet = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(P, 16, LANES)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(packet, 16)).astype(np.float32))
    lim = jnp.asarray([[1e-3, 1e4]], jnp.float32)
    for mode in ("empty", "dma", "mm_f32", "mm_bf16", "mt"):
        run(mode, P, packet, lim, feats, w)
    # mt with a narrow 12-row leaf block (what a dedicated layout ships)
    w12 = jnp.asarray(rng.normal(size=(P, 16, 128)).astype(np.float32))
    print("-- narrow [16,128] w blocks (T=128 tris as rows layout) --")
    for mode in ("dma", "mt"):
        run(mode, P, packet, lim, feats, w12)


if __name__ == "__main__":
    main()
