#!/usr/bin/env python
"""Dev probe: phase-2 matmul orientation cost on TPU.

The pair intersection needs m[b,j] = sum_k x[k,b] W[k,j] with
x [16, BLK=128] (transposed ray features) and W [16, 512].  Variants:

  v4     x pre-materialized [128, 16]; dot(x, W)           (baseline)
  c00    dot_general(x [16,128], W, contract dim0/dim0)    (v5's form)
  wt     W stored pre-transposed [512,16]; dot(Wt, xt)  -> [512,128]
  slotT  one per-slot transpose [16,1024]->[1024,16] via identity
         dot_general, then v4 form on static slices

Each runs 1000 pair-matmuls + a 2-op epilogue, reports ns/pair.
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

NIT = 1000


def make(variant, prec):
    px = dict(preferred_element_type=jnp.float32)
    if prec == "HIGHEST":
        px["precision"] = jax.lax.Precision.HIGHEST

    def kern(xt_ref, xm_ref, w_ref, wt_ref, o_ref, acc, xs):
        acc[:, :] = jnp.zeros((128, 128), jnp.float32)
        if variant == "slotT":
            ident = jnp.eye(16, dtype=jnp.float32)
            xs[:, :] = jax.lax.dot_general(
                xt_ref[:, :], ident, (((0,), (0,)), ((), ())), **px)

        def body(i, _):
            blk = i % 8
            if variant == "v4":
                x = xm_ref[pl.ds(blk * 128, 128), :]
                m = jax.lax.dot_general(
                    x, w_ref[:, :], (((1,), (0,)), ((), ())), **px)
                r = jnp.minimum(m[:, 0:128], m[:, 128:256])
            elif variant == "c00":
                x = xt_ref[:, pl.ds(blk * 128, 128)]
                m = jax.lax.dot_general(
                    x, w_ref[:, :], (((0,), (0,)), ((), ())), **px)
                r = jnp.minimum(m[:, 0:128], m[:, 128:256])
            elif variant == "wt":
                x = xt_ref[:, pl.ds(blk * 128, 128)]
                m = jax.lax.dot_general(
                    wt_ref[:, :], x, (((1,), (0,)), ((), ())), **px)
                r = jnp.minimum(m[0:128, :], m[128:256, :])
            else:  # slotT
                x = xs[pl.ds(blk * 128, 128), :]
                m = jax.lax.dot_general(
                    x, w_ref[:, :], (((1,), (0,)), ((), ())), **px)
                r = jnp.minimum(m[:, 0:128], m[:, 128:256])
            acc[:, :] = jnp.minimum(acc[:, :], r)
            return 0
        jax.lax.fori_loop(0, NIT, body, 0)
        o_ref[:, :] = acc[:, :]

    return kern


def main():
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.random((16, 1024)), jnp.float32)
    xm = jnp.asarray(rng.random((1024, 16)), jnp.float32)
    w = jnp.asarray(rng.random((16, 512)), jnp.float32)
    wt = jnp.asarray(rng.random((512, 16)), jnp.float32)
    for prec in ("DEFAULT", "HIGHEST"):
        for variant in ("v4", "c00", "wt", "slotT"):
            f = jax.jit(lambda a, b, c, d, v=variant, p=prec:
                        pl.pallas_call(
                make(v, p),
                in_specs=[
                    pl.BlockSpec((16, 1024), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1024, 16), memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, 512), memory_space=pltpu.VMEM),
                    pl.BlockSpec((512, 16), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((128, 128),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32),
                                pltpu.VMEM((1024, 16), jnp.float32)],
            )(a, b, c, d))
            try:
                dt, _ = timed(f, xt, xm, w, wt, iters=3)
                print(f"{prec:8s} {variant:6s}: {dt/NIT*1e9:6.0f} ns/pair-mm")
            except Exception as e:
                print(f"{prec:8s} {variant:6s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
