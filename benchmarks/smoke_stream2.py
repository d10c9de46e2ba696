"""Smoke test for benchmarks/stream2 (v5, demoted from ops/): interpret mode on CPU vs the XLA
traversal oracle, on a small single-instance scene, coherent tile rays
(sign-pure packets) then random rays (mixed packets)."""
import os, sys
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
import stream2
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX
from test_packet_trace import _single_instance_scene
from test_traversal import gen_rays


def report(name, ref, rec, diag=None):
    t_ref, t_got = np.asarray(ref.t), np.asarray(rec.t)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    agree = (hr == hg).mean()
    both = hr & hg
    terr = np.abs(t_got[both] - t_ref[both]).max() if both.any() else 0.0
    pm = (np.asarray(rec.prim)[both] == np.asarray(ref.prim)[both]).mean() \
        if both.any() else 1.0
    print(f"{name}: hit_agree={agree:.4f} hits_ref={hr.sum()} "
          f"hits_got={hg.sum()} max_terr={terr:.2e} prim_match={pm:.4f}")
    if diag is not None:
        print("  diag:", {k: (int(np.asarray(v)) if np.asarray(v).ndim == 0
                              else np.asarray(v).sum())
                          for k, v in diag.items() if k not in ("counts",)})
    return agree


def main():
    ds = _single_instance_scene(n_tris=900, seed=3)
    assert stream2.supports(ds)

    # coherent tile rays, 2048 (= 2 packets)
    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e3)
    tst, aabb = stream2.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream2._run(
        jnp.asarray(o), jnp.asarray(d), 1e-3, 1e3, ds.knode_f, ds.kleaf,
        ds.kprim, ds.ktri_geo, ds.inst_inv[0], tst, aabb,
        any_hit=False, precision="f32", interpret=True, with_diag=True)
    a1 = report("coherent", ref, rec, diag)

    # random rays (mixed packets)
    rng = np.random.default_rng(7)
    o2, d2 = gen_rays(rng, 1024, spread=8.0)
    ref2 = traversal.trace_rays(ds, jnp.asarray(o2), jnp.asarray(d2),
                                1e-3, 1e3)
    rec2, diag2 = stream2._run(
        jnp.asarray(o2), jnp.asarray(d2), 1e-3, 1e3, ds.knode_f, ds.kleaf,
        ds.kprim, ds.ktri_geo, ds.inst_inv[0], tst, aabb,
        any_hit=False, precision="f32", interpret=True, with_diag=True)
    a2 = report("random", ref2, rec2, diag2)
    ok = a1 == 1.0 and a2 == 1.0
    print("OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
