import functools, hashlib, os, sys
import numpy as np
import jax, jax.numpy as jnp

def main(tag="bench"):
    import bench
    from benchmarks import stream_trace

    scene = bench.build_or_load_scene()
    W, H = bench.WIDTH, bench.HEIGHT
    n = W * H
    ts = 32
    px = np.arange(n, dtype=np.int64) % W
    py = np.arange(n, dtype=np.int64) // W
    tile = (py // ts) * (W // ts) + (px // ts)
    order = np.argsort(tile * (ts * ts) + (py % ts) * ts + (px % ts))
    xs = px[order] / W - 0.5
    ys = py[order] / H - 0.5
    o = np.zeros((n, 3), np.float32); o[:, 2] = 140.0
    d = np.stack([xs * 1.2, ys * 0.7, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o); d = jnp.asarray(d)

    tstart, aabb = stream_trace.leaf_tables(scene.knode_f, scene.kleaf.shape[0])
    jr = jax.jit(functools.partial(
        stream_trace._run, any_hit=False, precision="f32",
        interpret=False, raw=False, with_diag=True))
    low = jr.lower(o, d, jnp.float32(1e-3), jnp.float32(1e4),
                   scene.knode_f, scene.kleaf, scene.kprim,
                   scene.ktri_geo, scene.inst_inv[0], tstart, aabb)
    txt = low.as_text()
    h = hashlib.sha256(txt.encode()).hexdigest()
    open(f"/tmp/hlo_{tag}.txt", "w").write(txt)
    print(tag, "hlo sha256:", h, "len:", len(txt))
if __name__ == "__main__":
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
