"""Two-level BVH traversal, vectorized over ray wavefronts.

TPU-native redesign of the reference's per-ray stack walk
(reference: radiance/shader/radiance.cl:41-192).  Instead of per-ray stacks
(which would cost a [N, depth] scatter per push on a vector machine), the
BVH is *threaded*: every node carries a precomputed escape index, so each
ray's traversal state is three int32 registers:

  tidx    -- current TLAS node (-1 after the TLAS root subtree is done)
  inst_j  -- position within the current TLAS instance leaf (-1 = none)
  bidx    -- current BLAS node (-1 = not inside a BLAS)

plus object-space ray registers set once per instance entry (the reference
inverts the instance matrix per visit in-shader, radiance.cl:164-169; we
gather a precomputed inverse).  The left-first threaded order visits nodes
in exactly the same order as the reference's push-right/pop-left stack
(radiance.cl:66-67, 136-137), so any-hit early termination semantics match.

One `lax.while_loop` iteration advances every ray by one step: a BLAS node
visit (AABB test or an 8-wide bundled Möller-Trumbore), a TLAS node visit
(AABB test against the world ray), or an instance-leaf advance (transform
the ray into the next instance's object space and jump to its BLAS root).
The loop exits when every ray has escaped the TLAS root (or terminated via
any-hit).  All memory access is gathers from the flat SoA scene arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from radiance_tpu import config
from radiance_tpu.bvh.device import DeviceScene, KIND_INNER
from radiance_tpu.core import math as rmath
from radiance_tpu.ops.intersect import FLT_MAX, intersect_aabb, intersect_triangle


@struct.dataclass
class HitRecord:
    """Closest-hit result (reference: radiance.cl HitData, :8-18).

    t:    hit distance (FLT_MAX on miss); identical in world and object
          space because the instance transform is affine in the ray param.
    prim: primitiveIndex = primID of the hit triangle within its mesh
    slot: index into the DeviceScene instance arrays (NOT gl_InstanceID --
          fetch scene.inst_id[slot] for that); -1 on miss
    b1, b2: barycentrics of v1/v2 (w0 = 1 - b1 - b2, radiance.cl:244-246)
    """
    t: jnp.ndarray
    prim: jnp.ndarray
    slot: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray

    @property
    def hit(self):
        return self.t < FLT_MAX


def trace_rays(scene: DeviceScene,
               origin: jnp.ndarray,
               direction: jnp.ndarray,
               tmin,
               tmax,
               any_hit_terminate: bool = False) -> HitRecord:
    """Trace a wavefront of N rays against the two-level scene.

    origin/direction: [N, 3] float32 (direction need not be normalized; the
    reference's traceRay also accepts unnormalized directions).
    tmin/tmax: scalar accept window -- a hit is recorded iff
    tmin < t < tmax and t improves the current best (radiance.cl:90-91).
    any_hit_terminate: occlusion-query mode -- stop a ray at its first
    accepted hit (the reference's anyShadow cont=false, shader.cl:567-572).
    """
    n = origin.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    w = scene.bundle_prim.shape[1]
    lanes = jnp.arange(w, dtype=i32)
    rows = jnp.arange(n)

    world_o = origin.astype(f32)
    world_d = direction.astype(f32)
    world_inv = 1.0 / world_d
    tmin = f32(tmin)
    tmax = f32(tmax)

    state = dict(
        tidx=jnp.zeros(n, i32),
        inst_j=jnp.full(n, -1, i32),
        bidx=jnp.full(n, -1, i32),
        pending=jnp.zeros(n, i32),
        cur_o=world_o,
        cur_d=world_d,
        cur_inv=world_inv,
        t=jnp.full(n, FLT_MAX, f32),
        prim=jnp.full(n, -1, i32),
        slot=jnp.full(n, -1, i32),
        b1=jnp.zeros(n, f32),
        b2=jnp.zeros(n, f32),
        done=jnp.zeros(n, bool),
    )

    def alive(s):
        return (~s["done"]) & ((s["bidx"] >= 0) | (s["inst_j"] >= 0) | (s["tidx"] >= 0))

    def cond(s):
        return jnp.any(alive(s))

    def body(s):
        act = ~s["done"]
        in_blas = act & (s["bidx"] >= 0)
        in_leaf = act & (~in_blas) & (s["inst_j"] >= 0)
        in_tlas = act & (~in_blas) & (~in_leaf) & (s["tidx"] >= 0)

        clip = jnp.minimum(s["t"], tmax)

        # ---------------- BLAS step ----------------
        nb = jnp.where(in_blas, s["bidx"], 0)
        b_min = scene.node_min[nb]
        b_max = scene.node_max[nb]
        b_kind = scene.node_kind[nb]
        b_a = scene.node_a[nb]
        b_b = scene.node_b[nb]
        b_esc = scene.node_esc[nb]
        b_inner = b_kind == KIND_INNER

        box_hit = intersect_aabb(s["cur_o"], s["cur_inv"], b_min, b_max, t_clip=clip)

        is_tri_leaf = in_blas & (~b_inner)
        bundle = jnp.where(is_tri_leaf, b_a, 0)
        v0 = scene.bundle_v0[bundle]
        e1 = scene.bundle_e1[bundle]
        e2 = scene.bundle_e2[bundle]
        pid = scene.bundle_prim[bundle]
        valid, tt, tb1, tb2 = intersect_triangle(
            s["cur_o"][:, None, :], s["cur_d"][:, None, :], v0, e1, e2)
        ok = (
            valid
            & (lanes[None, :] < b_b[:, None])
            & (tt > tmin) & (tt < tmax)
            & (tt < s["t"][:, None])
            & is_tri_leaf[:, None]
        )
        tm = jnp.where(ok, tt, FLT_MAX)
        j = jnp.argmin(tm, axis=1)
        tj = tm[rows, j]
        improved = tj < s["t"]  # implies ok at lane j

        t_new = jnp.where(improved, tj, s["t"])
        prim_new = jnp.where(improved, pid[rows, j], s["prim"])
        slot_new = jnp.where(improved, s["pending"], s["slot"])
        b1_new = jnp.where(improved, tb1[rows, j], s["b1"])
        b2_new = jnp.where(improved, tb2[rows, j], s["b2"])
        done_new = s["done"] | (improved & any_hit_terminate)

        bidx_new = jnp.where(
            in_blas, jnp.where(b_inner & box_hit, b_a, b_esc), s["bidx"])

        # ------------- TLAS node fetch (shared by leaf + tlas steps) -------------
        tn = jnp.where(in_leaf | in_tlas, s["tidx"], 0)
        t_min_n = scene.node_min[tn]
        t_max_n = scene.node_max[tn]
        t_kind = scene.node_kind[tn]
        t_a = scene.node_a[tn]
        t_b = scene.node_b[tn]
        t_esc = scene.node_esc[tn]

        # ---------------- instance-leaf advance ----------------
        entering = in_leaf & (s["inst_j"] < t_b)
        exiting = in_leaf & (~entering)
        slot_idx = jnp.where(entering, t_a + s["inst_j"], 0)
        inv = scene.inst_inv[slot_idx]
        o_l = rmath.mat4_transform_point(inv, world_o)
        d_l = rmath.mat4_transform_dir(inv, world_d)
        em = entering[:, None]
        cur_o_new = jnp.where(em, o_l, s["cur_o"])
        cur_d_new = jnp.where(em, d_l, s["cur_d"])
        cur_inv_new = jnp.where(em, 1.0 / d_l, s["cur_inv"])
        pending_new = jnp.where(entering, slot_idx, s["pending"])
        bidx_new = jnp.where(entering, scene.inst_blas_root[slot_idx], bidx_new)
        inst_j_new = jnp.where(
            entering, s["inst_j"] + 1, jnp.where(exiting, -1, s["inst_j"]))
        tidx_new = jnp.where(exiting, t_esc, s["tidx"])

        # ---------------- TLAS step ----------------
        t_inner = t_kind == KIND_INNER
        t_box_hit = intersect_aabb(world_o, world_inv, t_min_n, t_max_n, t_clip=clip)
        tidx_new = jnp.where(
            in_tlas & t_inner,
            jnp.where(t_box_hit, t_a, t_esc),
            tidx_new)
        # TLAS leaf visit: begin iterating its instances (tidx stays put)
        inst_j_new = jnp.where(in_tlas & (~t_inner), 0, inst_j_new)

        return dict(
            tidx=tidx_new, inst_j=inst_j_new, bidx=bidx_new,
            pending=pending_new,
            cur_o=cur_o_new, cur_d=cur_d_new, cur_inv=cur_inv_new,
            t=t_new, prim=prim_new, slot=slot_new, b1=b1_new, b2=b2_new,
            done=done_new,
        )

    out = jax.lax.while_loop(cond, body, state)
    return HitRecord(t=out["t"], prim=out["prim"], slot=out["slot"],
                     b1=out["b1"], b2=out["b2"])
