#!/usr/bin/env python
"""Dev probe: Mosaic primitive support + cost for the v6 stream design.

 (a) dynamic-index scalar SMEM stores (per-emission pair append);
 (b) dynamic-sublane vector read-modify-write on a VMEM scratch row
     (per-pair best-t accumulation without flush-on-switch);
 (c) XLA gather/scatter cost at 2M-element wave scale (octant sort);
 (d) dot precision DEFAULT vs HIGHEST cost on the phase-2 matmul shape.
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

from phase_ledger import timed


def probe_a():
    """Scalar SMEM append at dynamic indices."""
    def kern(x_ref, o_ref):
        def body(i, cnt):
            v = x_ref[0, i]
            nc = jnp.where(v > 0, cnt + 1, cnt)

            @pl.when(v > 0)
            def _():
                o_ref[0, cnt] = v
            return nc
        cnt = jax.lax.fori_loop(0, 128, body, jnp.int32(0))
        o_ref[0, 127] = cnt

    x = jnp.asarray((np.arange(128) % 3 == 0).astype(np.int32)
                    * (np.arange(128) + 5), jnp.int32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((1, 128), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 128), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(x.reshape(1, 128))
    got = np.asarray(out)[0]
    exp = np.asarray(x)[np.asarray(x) > 0]
    ok = (got[:len(exp)] == exp).all() and got[127] == len(exp)
    print(f"a) scalar SMEM dynamic append: {'OK' if ok else 'FAIL'} "
          f"(cnt={got[127]}, expect {len(exp)})")


def probe_b():
    """Vector RMW at dynamic sublane on VMEM scratch."""
    def kern(idx_ref, x_ref, o_ref, acc):
        acc[:, :] = jnp.full((64, 128), 1e30, jnp.float32)

        def body(i, _):
            r = idx_ref[0, i]
            row = acc[pl.ds(r, 1), :]
            acc[pl.ds(r, 1), :] = jnp.minimum(row, x_ref[pl.ds(i, 1), :])
            return 0
        jax.lax.fori_loop(0, 512, body, 0)
        o_ref[:, :] = acc[:, :]

    rng = np.random.default_rng(0)
    idx = rng.integers(0, 64, 512).astype(np.int32)
    x = rng.random((512, 128)).astype(np.float32)
    f = jax.jit(lambda i_, x_: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((1, 512), memory_space=pltpu.SMEM),
                  pl.BlockSpec((512, 128), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32)],
    )(i_, x_))
    out = f(jnp.asarray(idx).reshape(1, 512), jnp.asarray(x))
    exp = np.full((64, 128), 1e30, np.float32)
    for i in range(512):
        exp[idx[i]] = np.minimum(exp[idx[i]], x[i])
    ok = np.array_equal(np.asarray(out), exp)
    dt, _ = timed(f, jnp.asarray(idx).reshape(1, 512), jnp.asarray(x),
                  iters=5)
    print(f"b) dynamic-sublane RMW: {'OK' if ok else 'FAIL'}  "
          f"({dt/512*1e9:.0f} ns/RMW)")


def probe_c():
    """2M-element gather + scatter cost (octant sort machinery)."""
    n = 2 * 1024 * 1024
    rng = np.random.default_rng(1)
    perm = rng.permutation(n).astype(np.int32)
    xs = [jnp.asarray(rng.random(n).astype(np.float32)) for _ in range(6)]
    p = jnp.asarray(perm)

    @jax.jit
    def gath(p_, *a):
        return tuple(x[p_] for x in a)
    dt, _ = timed(gath, p, *xs, iters=3)
    print(f"c) gather 6x[2M] f32: {dt*1e3:.1f} ms")

    @jax.jit
    def okt(d_):
        o = (d_ < 0).astype(jnp.int32)
        return o
    key = (np.asarray(xs[0]) < 0.33).astype(np.int32) \
        + (np.asarray(xs[1]) < 0.5).astype(np.int32) * 2 \
        + (np.asarray(xs[2]) < 0.66).astype(np.int32) * 4
    k = jnp.asarray(key)

    @jax.jit
    def stable_part(k_):
        # radix over 8 buckets via 8 cumsums
        pos = jnp.zeros_like(k_)
        off = jnp.int32(0)
        outs = jnp.zeros_like(k_)
        for b in range(8):
            m = (k_ == b)
            c = jnp.cumsum(m.astype(jnp.int32))
            pos = jnp.where(m, off + c - 1, pos)
            off = off + c[-1]
        return pos
    dt, pos = timed(stable_part, k, iters=3)
    print(f"c) octant rank (8 cumsums over 2M): {dt*1e3:.1f} ms")

    @jax.jit
    def scat(pos_, x):
        return jnp.zeros_like(x).at[pos_].set(x)
    dt, _ = timed(scat, pos, xs[0], iters=3)
    print(f"c) scatter [2M] f32: {dt*1e3:.1f} ms")


def probe_d():
    """Phase-2 matmul shape cost by precision."""
    x = jnp.asarray(np.random.default_rng(0).random((128, 16)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).random((16, 512)),
                    jnp.float32)

    for prec in ("HIGHEST", "DEFAULT", "bf16"):
        def kern(x_ref, w_ref, o_ref, *, prec=prec):
            acc = jnp.zeros((128, 512), jnp.float32)

            def body(i, acc):
                if prec == "bf16":
                    m = jax.lax.dot(
                        x_ref[:, :].astype(jnp.bfloat16),
                        w_ref[:, :].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                else:
                    m = jax.lax.dot(
                        x_ref[:, :], w_ref[:, :],
                        preferred_element_type=jnp.float32,
                        precision=getattr(jax.lax.Precision, prec,
                                          jax.lax.Precision.DEFAULT))
                return acc + m
            acc = jax.lax.fori_loop(0, 1000, body, acc)
            o_ref[:, :] = acc

        f = jax.jit(lambda x_, w_: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((128, 16), memory_space=pltpu.VMEM),
                      pl.BlockSpec((16, 512), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 512), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32),
        )(x_, w_))
        dt, out = timed(f, x, w, iters=3)
        ref = np.asarray(x) @ np.asarray(w) * 1000
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        print(f"d) [128,16]@[16,512] {prec:8s}: {dt/1000*1e9:6.0f} ns/mm "
              f"relerr={err:.2e}")


if __name__ == "__main__":
    for p in (probe_a, probe_b, probe_c, probe_d):
        try:
            p()
        except Exception as e:
            print(f"{p.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
