#!/usr/bin/env python
"""Dev probe: isolate WHY the pair-matmul loop measured 38-63us/iter.

Ablations (all DEFAULT precision, [128,16]@[16,512], 1000 iters):
  static    x slice at a STATIC offset, acc RMW
  dyn       x slice at dynamic (i%8)*128 sublane offset, acc RMW
  dyn_smem  offset read from an SMEM table, acc RMW
  noacc     dynamic slice, result reduced into a tiny running min
            via sublane-8 tile (breaks the wide RMW chain)
  nomm      dynamic slice + acc RMW but NO matmul (epilogue on x only)
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


def make(variant):
    def kern(off_ref, xm_ref, w_ref, o_ref, acc):
        acc[:, :] = jnp.zeros((128, 128), jnp.float32)

        def body(i, carry):
            if variant == "static":
                x = xm_ref[0:128, :]
            elif variant == "dyn_smem":
                x = xm_ref[pl.ds(off_ref[0, i % 128], 128), :]
            else:
                x = xm_ref[pl.ds((i % 8) * 128, 128), :]
            if variant == "nomm":
                r = jnp.broadcast_to(x[:, 0:1], (128, 128)) * 2.0
            else:
                m = jax.lax.dot_general(
                    x, w_ref[:, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                r = jnp.minimum(m[:, 0:128], m[:, 128:256])
            if variant == "noacc":
                return jnp.minimum(carry, jnp.min(r))
            acc[:, :] = jnp.minimum(acc[:, :], r)
            return carry
        nit = off_ref[0, 0] * 0 + NIT  # dynamic bound: defeat full unroll
        c = jax.lax.fori_loop(0, nit, body, jnp.float32(1e30))
        o_ref[0:1, 0:1] = jnp.full((1, 1), c, jnp.float32)
        o_ref[1:2, 0:2] = acc[0:1, 0:2]

    return kern


def main():
    rng = np.random.default_rng(0)
    xm = jnp.asarray(rng.random((1024, 16)), jnp.float32)
    w = jnp.asarray(rng.random((16, 512)), jnp.float32)
    off = jnp.asarray((rng.integers(0, 8, 128) * 128).astype(np.int32)
                      ).reshape(1, 128)
    for variant in ("static", "dyn", "dyn_smem", "noacc", "nomm"):
        f = jax.jit(lambda o_, a, b, v=variant: pl.pallas_call(
            make(v),
            in_specs=[
                pl.BlockSpec((1, 128), memory_space=pltpu.SMEM),
                pl.BlockSpec((1024, 16), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 512), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, 128), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        )(o_, a, b))
        try:
            dt, _ = timed(f, off, xm, w, iters=3)
            print(f"{variant:9s}: {dt/NIT*1e9:6.0f} ns/iter")
        except Exception as e:
            print(f"{variant:9s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
