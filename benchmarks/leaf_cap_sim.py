#!/usr/bin/env python
"""Offline probe: price the kernel-leaf collapse cap (KERNEL_MAX_TRIS).

The ceiling analysis (docs/raystream-design.md) rejected re-PACKING the
existing 128-cap tree into T=64 matmuls (same candidates, double leaf
count).  This probe prices the different lever: re-COLLAPSING the SAH
tree at a smaller cap, which tightens leaf bounds and so shrinks the
candidate-triangle set each ray must test, at the price of a deeper
walk (more emit iterations) and more, cheaper, phase-2 pairs.

It rebuilds the bench scene's kernel tables at the requested cap and
replays the bench waves through walk_sim3's production-prep + NumPy
walk.  Interpretation happens offline:

  isect_model_us ~= pairs * (FIXED + NTILES * PER_TILE)
    where NTILES = 4*cap/128 MXU N-tiles per pair matmul; calibrated
    from the measured 0.61 us/pair at cap 128 (4 tiles).

Usage: python benchmarks/leaf_cap_sim.py <cap> [npk_sample] [wave...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    cap = int(sys.argv[1])
    rest = sys.argv[2:]

    from radiance_tpu.bvh import kernel_pack
    kernel_pack.KERNEL_MAX_TRIS = cap
    kernel_pack.KERNEL_LEAF_LANES = 4 * cap
    # smaller caps roughly double the collapsed node count per halving;
    # lift the VMEM-budget gate so the tables build at all (whether the
    # bigger node table still fits VMEM is a separate, on-chip question)
    kernel_pack.KERNEL_MAX_NODES = 500_000

    import numpy as np
    import walk_sim3

    # wrap the report to prepend leaf stats once
    import bench
    scene = bench.build_or_load_scene()
    km = np.asarray(scene.knode_i) if hasattr(scene, "knode_i") else None
    nodef = np.asarray(scene.knode_f)
    ntri = nodef[:, 10]
    nk8 = nodef.shape[0]
    leaf_rows = ntri > 0
    # the 8 octant threadings replicate every leaf; count one octant
    one = slice(0, nk8 // 8)
    lt = ntri[one][leaf_rows[one]]
    print(f"# cap={cap} nodes/octant={nk8 // 8} kernel_leaves={lt.size} "
          f"mean_tris={lt.mean():.1f} nodef_bytes={nodef.nbytes}",
          file=sys.stderr, flush=True)
    print(f'{{"cap": {cap}, "nodes_per_octant": {nk8 // 8}, '
          f'"leaves": {lt.size}, "mean_tris": {lt.mean():.2f}, '
          f'"nodef_mb": {nodef.nbytes / 1e6:.1f}}}', flush=True)

    bench.build_or_load_scene = lambda: scene  # don't build twice
    sys.argv = [sys.argv[0]] + rest
    walk_sim3.main()


if __name__ == "__main__":
    main()
