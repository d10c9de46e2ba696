#!/usr/bin/env python
"""On-chip LBVH failure localizer (chain_r5 ANIM: the deforming
in-jit LBVH rebuild traced ~0% hits on TPU while the identical
pipeline agrees exactly with the SAH reference on CPU at every scale).

Splits build-vs-trace in one run:

  stage 1 (CPU subprocess): build the LBVH arrays for fixed inputs
    with the SAME code, dump npz + a brute-force oracle t for a ray
    probe set.
  stage 2 (this process, real backend): build the same scene in-jit,
    byte-compare every array against the CPU build, then trace BOTH
    scenes (TPU-built and CPU-built-loaded) on the device against the
    oracle.

Verdicts printed as single lines:
  build_match   -- TPU in-jit build arrays == CPU build arrays
  trace_tpu_built / trace_cpu_built -- device-walk agreement vs oracle
If build_match is false, the TPU build is the bug; if build matches
but trace fails on both, the device walk is; if only tpu_built fails,
the interaction.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NPZ = "/tmp/lbvh_probe_cpu.npz"
N_TRIS = int(os.environ.get("LBVH_PROBE_TRIS", "64000"))
N_RAYS = 4096


def inputs():
    rng = np.random.default_rng(3)
    centers = rng.uniform(-20, 20, size=(N_TRIS, 3)).astype(np.float32)
    offs = rng.normal(scale=0.25, size=(N_TRIS, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    tris = np.arange(N_TRIS * 3, dtype=np.int32).reshape(-1, 3)
    ro = rng.uniform(-6, 6, size=(N_RAYS, 3)).astype(np.float32)
    tgt = rng.uniform(-20, 20, size=(N_RAYS, 3)).astype(np.float32)
    rd = tgt - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return verts, tris, ro, rd.astype(np.float32)


def oracle_t(verts, tris, ro, rd):
    """Brute-force Moeller-Trumbore closest t (NumPy, chunked)."""
    v0 = verts[tris[:, 0]]
    e1 = verts[tris[:, 1]] - v0
    e2 = verts[tris[:, 2]] - v0
    best = np.full(len(ro), np.float32(3.402823466e38))
    CH = 256
    for s in range(0, len(ro), CH):
        o = ro[s:s + CH, None, :]
        d = rd[s:s + CH, None, :]
        p = np.cross(d, e2[None])
        det = np.sum(p * e1[None], axis=-1)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
        tv = o - v0[None]
        u = np.sum(tv * p, axis=-1) * inv
        q = np.cross(tv, e1[None])
        w = np.sum(d * q, axis=-1) * inv
        t = np.sum(e2[None] * q, axis=-1) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (w >= 0)
              & (u + w <= 1) & (t > 1e-3) & (t < 1e4))
        t = np.where(ok, t, np.float32(3.402823466e38))
        best[s:s + CH] = t.min(axis=1)
    return best


def scene_fields(scn):
    import jax
    flat, _ = jax.tree_util.tree_flatten(
        {k: getattr(scn, k) for k in (
            "node_min", "node_max", "node_meta", "node_esc",
            "bundle_v0x", "bundle_prim")
         if hasattr(scn, k)})
    return flat


def build_arrays():
    """Build the LBVH scene; return (scene, dict of host arrays)."""
    import jax.numpy as jnp
    from radiance_tpu.bvh import lbvh
    verts, tris, _, _ = inputs()
    scn = lbvh.lbvh_scene(jnp.asarray(verts), jnp.asarray(tris))
    import dataclasses
    out = {}
    for f in dataclasses.fields(scn):
        v = getattr(scn, f.name)
        if v is not None and hasattr(v, "shape") and not isinstance(
                v, (bool, int, float)):
            out[f.name] = np.asarray(v)
    return scn, out


def main_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    verts, tris, ro, rd = inputs()
    _, arrs = build_arrays()
    np.savez(NPZ, __oracle_t=oracle_t(verts, tris, ro, rd), **arrs)
    print("cpu stage done", flush=True)


def main_tpu():
    sub = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-stage"],
        capture_output=True, text=True, timeout=1800)
    if "cpu stage done" not in sub.stdout:
        print("CPU STAGE FAILED", sub.stdout[-500:], sub.stderr[-800:])
        return 1
    ref = dict(np.load(NPZ))
    t_ref = ref.pop("__oracle_t")

    import jax
    import jax.numpy as jnp
    import dataclasses
    from radiance_tpu.bvh.device import DeviceScene
    from radiance_tpu.ops import traversal

    verts, tris, ro, rd = inputs()
    scn_tpu, arrs_tpu = build_arrays()

    bad = []
    for k, a in ref.items():
        b = arrs_tpu.get(k)
        if b is None or a.shape != b.shape:
            bad.append((k, "shape"))
            continue
        if a.dtype.kind == "f":
            av = a.view(np.uint32) if a.dtype == np.float32 else a
            bv = b.view(np.uint32) if b.dtype == np.float32 else b
            n = int((av != bv).sum())
        else:
            av, bv = a, b
            n = int((a != b).sum())
        if n:
            bad.append((k, n))
            # localize: per-lane counts for 2D arrays + hex samples
            if a.ndim == 2:
                lanes = (av != bv).sum(axis=0)
                print(f"#   {k} per-lane diffs: {list(lanes)}",
                      flush=True)
            idx = np.argwhere(av != bv)[:6]
            for ix in idx:
                print(f"#   {k}{tuple(ix)}: cpu "
                      f"{int(av[tuple(ix)]):#010x} tpu "
                      f"{int(bv[tuple(ix)]):#010x}", flush=True)
    print(f"build_match: {not bad} {bad[:8]}", flush=True)

    # trace both scenes on device
    kw = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in ref.items()}
    # non-array fields copied from the TPU-built scene
    for f in dataclasses.fields(DeviceScene):
        if f.name not in kw:
            kw[f.name] = getattr(scn_tpu, f.name)
    scn_cpu = DeviceScene(**kw)

    jt = jax.jit(lambda s, o, d: traversal.trace_rays(
        s, o, d, 1e-3, 1e4).t)
    o = jnp.asarray(ro)
    d = jnp.asarray(rd)
    def report(tag, t):
        hit_ref = t_ref < 1e30
        hit_got = t < 1e30
        agree = float((hit_ref == hit_got).mean())
        both = hit_ref & hit_got
        rmse = (float(np.sqrt(np.mean((t[both] - t_ref[both]) ** 2)))
                if both.any() else -1.0)
        print(f"trace_{tag}: agree {agree:.4f} hits_ref "
              f"{int(hit_ref.sum())} hits_got {int(hit_got.sum())} "
              f"rmse {rmse:.5f}", flush=True)

    # NEVER device-trace a corrupt BVH: broken escape pointers walk
    # forever and fault the worker (observed chain_r5 ANIMP)
    targets = [("cpu_built", scn_cpu)]
    if not bad:
        targets.insert(0, ("tpu_built", scn_tpu))
    else:
        print("# skipping tpu_built trace (corrupt build)", flush=True)
    for tag, scn in targets:
        report(tag, np.asarray(jax.block_until_ready(jt(scn, o, d))))

    # the failing bench composition: build + trace FUSED in one jitted
    # program (XLA may fold/fuse across the bitcast-packed node rows)
    if not bad:
        from radiance_tpu.bvh import lbvh
        vs, ts_, _, _ = inputs()

        @jax.jit
        def fused(v, o, d):
            scn = lbvh.lbvh_scene(v, jnp.asarray(ts_))
            return traversal.trace_rays(scn, o, d, 1e-3, 1e4).t

        report("fused_build_trace", np.asarray(jax.block_until_ready(
            fused(jnp.asarray(vs), o, d))))
    return 0


if __name__ == "__main__":
    if "--cpu-stage" in sys.argv:
        main_cpu()
    else:
        sys.exit(main_tpu())
