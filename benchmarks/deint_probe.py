#!/usr/bin/env python
"""Dev probe: de-interleave [N,3] -> rows [3,N] via a permutation
matmul on the MXU vs XLA transpose.  Checks exactness and speed, plus
folding the 3x3 object transform into the same matmul."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from phase_ledger import timed

N = 1920 * 1088  # bench wave padded


def perm_matrix(m3=None):
    """[384, 384] P: X.reshape(-1,384) @ P de-interleaves stride-3
    triples into [x(128) | y(128) | z(128)] column blocks; with m3,
    also applies the 3x3 transform (out component k = sum_j m3[k,j]*in_j)."""
    P = np.zeros((384, 384), np.float32)
    for l in range(128):          # element within the 128-triple row
        for k in range(3):        # output component
            for j in range(3):    # input component
                w = (1.0 if (m3 is None and j == k)
                     else (0.0 if m3 is None else m3[k, j]))
                if w:
                    P[3 * l + j, k * 128 + l] = w
    return jnp.asarray(P)


def via_mxu(x, P):
    y = jax.lax.dot_general(x.reshape(-1, 384), P,
                            (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    return y.reshape(-1, 3, 128).transpose(1, 0, 2).reshape(3, -1)


def via_t(x):
    return x.T + 0.0


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32) * 50)
    P = perm_matrix()
    f = jax.jit(via_mxu)
    g = jax.jit(via_t)
    r1 = np.asarray(f(x, P))
    r2 = np.asarray(g(x))
    print("exact:", (r1 == r2).all())
    dt, _ = timed(f, x, P, iters=5)
    print(f"mxu de-interleave: {dt*1e3:.2f} ms")
    dt, _ = timed(g, x, iters=3)
    print(f"xla transpose:     {dt*1e3:.2f} ms")

    m3 = np.asarray(rng.standard_normal((3, 3)), np.float32)
    Pm = perm_matrix(m3)
    r3 = np.asarray(f(x, Pm))
    ref = m3 @ r2
    err = np.abs(r3 - ref).max() / np.abs(ref).max()
    print(f"with 3x3 transform: rel err {err:.2e}")

    # no-transpose variant: keep [nrow, 3, 128] layout
    def via_mxu_nt(x, P):
        return jax.lax.dot_general(x.reshape(-1, 384), P,
                                   (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)
    f2 = jax.jit(via_mxu_nt)
    dt, _ = timed(f2, x, P, iters=5)
    print(f"mxu (no row transpose): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
