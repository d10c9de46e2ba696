"""Smoke test for ops/stream3 (v6): interpret mode on CPU vs the XLA
traversal oracle.  Coherent tile rays (pure packets), random rays
(mixed packets -> octant sub-walk slots), and a degenerate near-axis
packet (step-cap flag path)."""
import os
import sys

_CPU = os.environ.get("SMOKE_CPU", "1") == "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np
import jax

if _CPU:
    # the axon plugin ignores JAX_PLATFORMS; config update is required
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from radiance_tpu.ops import stream3, traversal
from radiance_tpu.ops.intersect import FLT_MAX
from test_packet_trace import _single_instance_scene
from test_traversal import gen_rays


def report(name, ref, rec, flag=None):
    t_ref, t_got = np.asarray(ref.t), np.asarray(rec.t)
    if flag is not None:
        ok_rays = ~np.repeat(np.asarray(flag) > 0, stream3.PKT
                             )[:len(t_ref)]
        t_ref, t_got = t_ref[ok_rays], t_got[ok_rays]
        pr = np.asarray(ref.prim)[ok_rays]
        pg = np.asarray(rec.prim)[ok_rays]
    else:
        pr, pg = np.asarray(ref.prim), np.asarray(rec.prim)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    agree = (hr == hg).mean() if len(t_ref) else 1.0
    both = hr & hg
    terr = np.abs(t_got[both] - t_ref[both]).max() if both.any() else 0.0
    pm = (pg[both] == pr[both]).mean() if both.any() else 1.0
    print(f"{name}: rays={len(t_ref)} hit_agree={agree:.4f} "
          f"hits_ref={hr.sum()} hits_got={hg.sum()} "
          f"max_terr={terr:.2e} prim_match={pm:.4f}")
    return agree


def run_diag(ds, o, d, tmin=1e-3, tmax=1e3):
    rows_w = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream3._run(
        rows_w, tmin, tmax, ds.knode_f, ds.kleaf, ds.kprim,
        ds.ktri_geo, ds.inst_inv[0], tstart,
        precision="f32", interpret=True,
        treelet=os.environ.get("SMOKE_TREELET", "0") == "1",
        with_diag=True)
    return rec, diag


def main():
    ds = _single_instance_scene(n_tris=900, seed=3)
    assert stream3.supports(ds)

    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    rec, diag = run_diag(ds, o, d)
    flag = diag["pkt_flag"][:n // stream3.PKT]
    print("  diag:", {k: int(np.asarray(v).sum()) for k, v in
                      diag.items()})
    a1 = report("coherent", ref, rec, flag)

    rng = np.random.default_rng(7)
    o2, d2 = gen_rays(rng, 1024, spread=8.0)
    ref2 = traversal.trace_rays(ds, jnp.asarray(o2), jnp.asarray(d2),
                                1e-3, 1e3)
    rec2, diag2 = run_diag(ds, o2, d2)
    flag2 = diag2["pkt_flag"][:1]
    print("  diag:", {k: int(np.asarray(v).sum()) for k, v in
                      diag2.items()})
    a2 = report("random", ref2, rec2, flag2)

    ok = a1 == 1.0 and a2 == 1.0
    print("OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
