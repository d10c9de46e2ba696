#!/usr/bin/env python
"""Dev probe round 2: fast formulations for the v6 primitives.

 (b2) RMW at dynamic LEADING index of 3D VMEM scratch [64,1,128]
      (vs the 139us/RMW dynamic-sublane disaster on 2D);
 (b3) same but accumulate [8,128] tiles (one vreg row per block);
 (d2) isolated matmul cost: scratch-accumulated, no giant carry.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phase_ledger import timed

N_RMW = 4096


def probe_b2():
    def kern(idx_ref, x_ref, o_ref, acc):
        acc[:, :, :] = jnp.full((64, 1, 128), 1e30, jnp.float32)

        def body(i, _):
            r = idx_ref[0, i]
            row = acc[pl.ds(r, 1), 0, :]
            acc[pl.ds(r, 1), 0, :] = jnp.minimum(
                row, x_ref[pl.ds(i % 512, 1), :])
            return 0
        jax.lax.fori_loop(0, N_RMW, body, 0)
        o_ref[:, :] = acc[:, 0, :]

    rng = np.random.default_rng(0)
    idx = rng.integers(0, 64, N_RMW).astype(np.int32)
    x = rng.random((512, 128)).astype(np.float32)
    f = jax.jit(lambda i_, x_: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((1, N_RMW), memory_space=pltpu.SMEM),
                  pl.BlockSpec((512, 128), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, 1, 128), jnp.float32)],
    )(i_, x_))
    out = f(jnp.asarray(idx).reshape(1, N_RMW), jnp.asarray(x))
    exp = np.full((64, 128), 1e30, np.float32)
    for i in range(N_RMW):
        exp[idx[i]] = np.minimum(exp[idx[i]], x[i % 512])
    ok = np.array_equal(np.asarray(out), exp)
    dt, _ = timed(f, jnp.asarray(idx).reshape(1, N_RMW),
                  jnp.asarray(x), iters=5)
    print(f"b2) leading-dim 3D RMW: {'OK' if ok else 'FAIL'}  "
          f"({dt/N_RMW*1e9:.0f} ns/RMW)")


def probe_d2():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 16)), jnp.float32)
    w = jnp.asarray(rng.random((1000, 16, 512)), jnp.float32)

    for prec in ("HIGHEST", "DEFAULT", "bf16"):
        def kern(x_ref, w_ref, o_ref, acc, *, prec=prec):
            acc[:, :] = jnp.zeros((128, 128), jnp.float32)

            def body(i, _):
                wt = w_ref[i]
                if prec == "bf16":
                    m = jax.lax.dot(
                        x_ref[:, :].astype(jnp.bfloat16),
                        wt.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                else:
                    m = jax.lax.dot(
                        x_ref[:, :], wt,
                        preferred_element_type=jnp.float32,
                        precision=getattr(jax.lax.Precision, prec,
                                          jax.lax.Precision.DEFAULT))
                # cheap per-pair reduction, like the real kernel's
                # min-combine: [128,512] -> [128,128] via 4-way min
                r = jnp.minimum(jnp.minimum(m[:, 0:128], m[:, 128:256]),
                                jnp.minimum(m[:, 256:384],
                                            m[:, 384:512]))
                acc[:, :] = jnp.minimum(acc[:, :], r)
                return 0
            jax.lax.fori_loop(0, 1000, body, 0)
            o_ref[:, :] = acc[:, :]

        f = jax.jit(lambda x_, w_: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((128, 16), memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((128, 128), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        )(x_, w_))
        try:
            dt, out = timed(f, x, w, iters=3)
            print(f"d2) [128,16]@[16,512] {prec:8s}: "
                  f"{dt/1000*1e9:6.0f} ns/pair-mm")
        except Exception as e:
            print(f"d2) {prec} FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    probe_b2()
    probe_d2()
