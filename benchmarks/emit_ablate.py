#!/usr/bin/env python
"""Dev probe: per-step cost ablation of the v5 emit walk.

Variants (cumulative unless noted):
  sweep   -- 8 dynamic node loads + concat + scalar esc-advance only
             (preorder sweep, no frustum math, no emission)
  test    -- + packet interval-frustum test and data-dependent next
  refine  -- + (8,8) per-block refine tiles + code build
  store   -- + event store at running count (full kernel)

Each reports ns/iteration measured over the bench scene's node table
with a fixed iteration count, so variants are comparable.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from radiance_tpu.config import vmem_limit_bytes as _vmem_limit
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FMAX = 3.4028235e38
G = int(os.environ.get("ABLATE_G", "8"))
EMAX = 512
STEPS = 300


def kernel(lim_ref, pkt_ref, bscal_ref, nodef_ref, meta_ref,
           ev_s, ptr_s, *, mode: str):
    f32, i32 = jnp.float32, jnp.int32
    tmax = lim_ref[0, 1]
    pk = pkt_ref[:, :]
    sgn = pk[:, 0:3]
    olo = pk[:, 3:6]
    ohi = pk[:, 6:9]
    ilo = pk[:, 9:12]
    ihi = pk[:, 12:15]
    mixed = sgn == 0.0
    base = [pkt_ref[w, 15].astype(i32) for w in range(G)]
    bs = bscal_ref[:, :]
    bsgn = [bs[:, k].reshape(G, 8) for k in range(3)]
    bolo = [bs[:, 3 + k].reshape(G, 8) for k in range(3)]
    bohi = [bs[:, 6 + k].reshape(G, 8) for k in range(3)]
    bilo = [bs[:, 9 + k].reshape(G, 8) for k in range(3)]
    bihi = [bs[:, 12 + k].reshape(G, 8) for k in range(3)]
    bmixed = [s == 0.0 for s in bsgn]

    def step(carry):
        idxs, ecnt, steps = carry
        rows = [base[w] + jnp.maximum(idxs[w], 0) for w in range(G)]
        tile = jnp.concatenate(
            [nodef_ref[pl.ds(rows[w], 1), :] for w in range(G)], axis=0)
        a_f = tile[:, 8:9]
        esc = tile[:, 9:10]
        ntri = tile[:, 10:11]
        is_leaf = ntri > 0.0

        if mode == "sweep":
            nxt = esc
            emit = is_leaf
        else:
            tn = jnp.zeros((G, 1), f32)
            tf = jnp.full((G, 1), tmax, f32)
            for k in range(3):
                bmn = tile[:, k:k + 1]
                bmx = tile[:, 3 + k:4 + k]
                sk = sgn[:, k:k + 1]
                m0 = sk * bmn
                m1 = sk * bmx
                near = jnp.minimum(m0, m1)
                far = jnp.maximum(m0, m1)
                lo = near - ohi[:, k:k + 1]
                hi = far - olo[:, k:k + 1]
                tnk = lo * jnp.where(lo >= 0.0, ilo[:, k:k + 1],
                                     ihi[:, k:k + 1])
                tfk = hi * jnp.where(hi >= 0.0, ihi[:, k:k + 1],
                                     ilo[:, k:k + 1])
                mk = mixed[:, k:k + 1]
                tn = jnp.maximum(tn, jnp.where(mk, 0.0, tnk))
                tf = jnp.minimum(tf, jnp.where(mk, _FMAX, tfk))
            box_hit = (tf >= tn) & (tn < tmax)
            emit = is_leaf & box_hit
            nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_f, esc))

        if mode in ("refine", "store"):
            tn_b = jnp.zeros((G, 8), f32)
            tf_b = jnp.full((G, 8), _FMAX, f32)
            for k in range(3):
                bmn = jnp.broadcast_to(tile[:, k:k + 1], (G, 8))
                bmx = jnp.broadcast_to(tile[:, 3 + k:4 + k], (G, 8))
                m0 = bsgn[k] * bmn
                m1 = bsgn[k] * bmx
                near = jnp.minimum(m0, m1)
                far = jnp.maximum(m0, m1)
                lo = near - bohi[k]
                hi = far - bolo[k]
                tnk = lo * jnp.where(lo >= 0.0, bilo[k], bihi[k])
                tfk = hi * jnp.where(hi >= 0.0, bihi[k], bilo[k])
                tn_b = jnp.maximum(tn_b, jnp.where(bmixed[k], 0.0, tnk))
                tf_b = jnp.minimum(tf_b, jnp.where(bmixed[k], _FMAX, tfk))
            tn_b = jnp.maximum(tn_b, 0.0)
            tf_b = jnp.minimum(tf_b, tmax)
            keep = (tf_b >= tn_b) & (tn_b < tmax)
            tq = jnp.clip(
                (jax.lax.bitcast_convert_type(tn_b, i32) >> 18), 0, 511)
            bcode = ((tq << 1) | keep.astype(i32)).astype(f32)
        if mode == "store":
            ev = jnp.concatenate(
                [bcode, a_f, emit.astype(f32), jnp.zeros((G, 6), f32)],
                axis=1)
            ev_s[pl.ds(ecnt % EMAX, 1), :, :] = ev.reshape(1, G, 16)

        # scalar round-trip for the next indices
        ptr_s[:, 0:2] = jnp.concatenate([nxt, emit.astype(f32)], axis=1)
        new_idxs = tuple(ptr_s[w, 0].astype(i32) for w in range(G))
        any_emit = ptr_s[0, 1]
        for w in range(1, G):
            any_emit = jnp.maximum(any_emit, ptr_s[w, 1])
        return (new_idxs, ecnt + any_emit.astype(i32), steps + 1)

    def cond(carry):
        _, _, steps = carry
        return steps < STEPS

    init = (tuple(jnp.int32(0) for _ in range(G)), jnp.int32(0),
            jnp.int32(0))
    idxs_f, ecnt_f, steps_f = jax.lax.while_loop(cond, step, init)
    meta_ref[0, 0, :] = jnp.full((128,), ecnt_f, jnp.int32)
    meta_ref[0, 1, :] = jnp.full((128,), idxs_f[0], jnp.int32)


def run(mode, lim, pkt, blk, nodef, ngrp):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ngrp,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * 8, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((EMAX + 1, G, 16), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((ngrp, 8, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(112)),
    )(lim, pkt, blk, nodef)


def main():
    import bench
    from phase_ledger import bench_rays, timed
    import stream2 as s2

    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)
    rows, feats_t, pkt, blk, lim = jax.block_until_ready(jax.jit(
        s2._stage_prep)(jnp.asarray(o0), jnp.asarray(d0), tmin, tmax,
                        nodef, inv0))
    ngrp = pkt.shape[0] // G
    for mode in ("sweep", "test", "refine", "store"):
        f = jax.jit(functools.partial(run, mode), static_argnums=(4,))
        dt, _ = timed(f, lim, pkt, blk, nodef, ngrp, iters=3)
        iters = ngrp * STEPS
        print(f"{mode:7s}: {dt*1e3:7.1f} ms  {dt/iters*1e9:7.0f} ns/iter "
              f"({iters} iters)")


if __name__ == "__main__":
    main()
