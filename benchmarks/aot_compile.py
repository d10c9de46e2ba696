#!/usr/bin/env python
"""Local AOT (compile-only) harness for the stream3 Pallas kernels.

The axon tunnel compiles kernels on the REMOTE side, and a hung Mosaic
compile wedges the shared device queue for hours (see
docs/raystream-design.md and BASELINE.md).  This harness compiles the
same pallas_calls against a LOCAL `v5e` compile-only PJRT topology
(libtpu is in the image), so compile hangs/failures are observed
under a local `timeout` with ZERO device risk.

Usage:
  python benchmarks/aot_compile.py emit          # production emit walk
  python benchmarks/aot_compile.py emit-treelet  # the treelet variant
  python benchmarks/aot_compile.py isect         # phase-2 pair kernel
  python benchmarks/aot_compile.py all

Each target runs in-process (callers wrap in `timeout`); prints
COMPILED <target> <seconds> on success.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from radiance_tpu.bvh import kernel_pack
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding


@functools.lru_cache()
def v5e_device():
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    return topo.devices[0]


def aot_compile(fn, *args):
    """Lower fn(*args) for one v5e chip and run the full XLA+Mosaic
    compile locally.  Returns seconds."""
    dev = v5e_device()
    shard = SingleDeviceSharding(dev)
    sds = tuple(jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
                for a in args)
    t0 = time.time()
    lowered = jax.jit(fn, out_shardings=shard).trace(*sds).lower(
        lowering_platforms=("tpu",))
    lowered.compile()
    return time.time() - t0


def emit_args(nslot=64, nk=2048):
    """Production-shaped _stage_emit inputs (bench scene: nslot bigger,
    nk ~ 8 * octant rows; shapes here keep compile representative)."""
    from radiance_tpu.ops import stream3 as s3
    rng = np.random.default_rng(0)
    lim = np.asarray([[1e-3, 1e4]], np.float32)
    scal = rng.standard_normal((nslot, 16)).astype(np.float32)
    smeta = np.zeros((nslot, 8), np.int32)
    smeta[:, 0] = np.arange(nslot) % (nslot // 2)
    smeta[:, 1] = 1
    bscal = rng.standard_normal(((nslot // 2) * 32, 16)).astype(np.float32)
    nodef = rng.standard_normal((nk, 16)).astype(np.float32)
    return lim, scal, smeta, bscal, nodef


def compile_emit(treelet: bool):
    from radiance_tpu.ops import stream3 as s3
    lim, scal, smeta, bscal, nodef = emit_args()

    def fn(lim, scal, smeta, bscal, nodef):
        return s3._stage_emit(lim, scal, smeta, bscal, nodef,
                              interpret=False, treelet=treelet)

    return aot_compile(fn, lim, scal, smeta, bscal, nodef)


def compile_isect():
    from radiance_tpu.ops import stream3 as s3
    nslot = 64
    npk = 32
    rng = np.random.default_rng(0)
    words = np.zeros((nslot, s3.PCAP), np.int32)
    emeta = np.zeros((nslot, 8), np.int32)
    slot_pkt = np.arange(nslot, dtype=np.int32) % npk
    feats = rng.standard_normal((npk * s3.PKT, 16)).astype(np.float32)
    lim = np.asarray([[1e-3, 1e4]], np.float32)
    nleaf = 512
    kleaf = rng.standard_normal((nleaf, 16, kernel_pack.KERNEL_LEAF_LANES)).astype(np.float32)

    def fn(words, emeta, slot_pkt, feats, lim, kleaf):
        return s3._stage_isect(words, emeta, slot_pkt, feats, lim,
                               kleaf, precision="default",
                               interpret=False, orient="major")

    return aot_compile(fn, words, emeta, slot_pkt, feats, lim, kleaf)


def compile_isect_lean():
    from radiance_tpu.ops import stream3 as s3
    nslot = 64
    npk = 32
    rng = np.random.default_rng(0)
    words = np.zeros((nslot, s3.PCAP), np.int32)
    emeta = np.zeros((nslot, 8), np.int32)
    slot_pkt = np.arange(nslot, dtype=np.int32) % npk
    feats = rng.standard_normal((npk * s3.PKT, 16)).astype(np.float32)
    lim = np.asarray([[1e-3, 1e4]], np.float32)
    nleaf = 512
    kleaf = rng.standard_normal(
        (nleaf, 16, kernel_pack.KERNEL_LEAF_LANES)).astype(np.float32)

    def fn(words, emeta, slot_pkt, feats, lim, kleaf):
        return s3._stage_isect(words, emeta, slot_pkt, feats, lim,
                               kleaf, precision="default",
                               interpret=False, orient="major",
                               lean=True)

    return aot_compile(fn, words, emeta, slot_pkt, feats, lim, kleaf)


def compile_isect_occl():
    from radiance_tpu.ops import stream3 as s3
    nslot = 64
    npk = 32
    rng = np.random.default_rng(0)
    words = np.zeros((nslot, s3.PCAP), np.int32)
    emeta = np.zeros((nslot, 8), np.int32)
    slot_pkt = np.arange(nslot, dtype=np.int32) % npk
    feats = rng.standard_normal((npk * s3.PKT, 16)).astype(np.float32)
    lim = np.asarray([[1e-3, 1e4]], np.float32)
    nleaf = 512
    kleaf = rng.standard_normal((nleaf, 16, kernel_pack.KERNEL_LEAF_LANES)).astype(np.float32)

    def fn(words, emeta, slot_pkt, feats, lim, kleaf):
        return s3._stage_isect(words, emeta, slot_pkt, feats, lim,
                               kleaf, precision="default",
                               interpret=False, orient="major",
                               occl=True)

    return aot_compile(fn, words, emeta, slot_pkt, feats, lim, kleaf)


def compile_refine():
    from radiance_tpu.ops import stream3 as s3
    rng = np.random.default_rng(0)
    nslot, npk, nl = 64, 32, 512
    words = np.zeros((nslot, s3.PCAP), np.int32)
    emeta = np.zeros((nslot, 8), np.int32)
    slot_pkt = (np.arange(nslot) % npk).astype(np.int32)
    feats_t = rng.standard_normal((16, npk * s3.PKT)).astype(np.float32)
    lim = np.asarray([[1e-3, 1e4]], np.float32)
    aabb8 = rng.standard_normal((nl, 8)).astype(np.float32)

    def fn(words, emeta, slot_pkt, feats_t, aabb8, lim):
        return s3._stage_refine_exact(words, emeta, slot_pkt, feats_t,
                                      aabb8, lim, interpret=False)

    return aot_compile(fn, words, emeta, slot_pkt, feats_t, aabb8, lim)


def compile_emit_ws(treelet: bool = False):
    from radiance_tpu.ops import stream3 as s3
    lim, scal, smeta, bscal, nodef = emit_args()

    def fn(lim, scal, smeta, bscal, nodef):
        return s3._stage_emit_ws(lim, scal, smeta, bscal, nodef,
                                 interpret=False, treelet=treelet)

    return aot_compile(fn, lim, scal, smeta, bscal, nodef)


def compile_tlas_native():
    """TLAS-native multi shapes (trace_rows_tlas): the same three
    kernels, but at the native slot regime -- nslot ~ 2 * npk (4064 on
    the 64-instance 1080p bench wave), per-SLOT feature blocks, a
    concatenated ~188k-row nodef, and a ~12k-leaf flat table.  Compiles
    all three stages; returns total seconds."""
    from radiance_tpu.ops import stream3 as s3
    rng = np.random.default_rng(0)
    nslot = 512                  # slot regime scaled for harness RAM;
    nk = 188000                  # nodef/bscal/aabb at REAL bench size
    nleaf = 12000
    lim = np.asarray([[1e-3, 1e4]], np.float32)
    scal = rng.standard_normal((nslot, 16)).astype(np.float32)
    smeta = np.zeros((nslot, 8), np.int32)
    smeta[:, 0] = np.arange(nslot)          # per-slot bscal groups
    smeta[:, 1] = 1
    smeta[:, 2] = rng.integers(0, nk - 64, nslot)
    bscal = rng.standard_normal((nslot * 32, 16)).astype(np.float32)
    nodef = rng.standard_normal((nk, 16)).astype(np.float32)

    def fn_emit(lim, scal, smeta, bscal, nodef):
        return s3._stage_emit(lim, scal, smeta, bscal, nodef,
                              interpret=False, treelet=False)

    total = aot_compile(fn_emit, lim, scal, smeta, bscal, nodef)

    words = np.zeros((nslot, s3.PCAP), np.int32)
    emeta = np.zeros((nslot, 8), np.int32)
    slot_pkt = np.arange(nslot, dtype=np.int32)     # identity: feats
    feats_t = rng.standard_normal(                  # are per-SLOT
        (16, nslot * s3.PKT)).astype(np.float32)
    nlp = ((nleaf + 7) // 8) * 8
    aabb8 = rng.standard_normal((nlp, 8)).astype(np.float32)

    def fn_refine(words, emeta, slot_pkt, feats_t, aabb8, lim):
        return s3._stage_refine_exact(words, emeta, slot_pkt, feats_t,
                                      aabb8, lim, interpret=False)

    total += aot_compile(fn_refine, words, emeta, slot_pkt, feats_t,
                         aabb8, lim)

    feats = rng.standard_normal(
        (nslot * s3.PKT, 16)).astype(np.float32)
    kleaf = rng.standard_normal((64, 16, kernel_pack.KERNEL_LEAF_LANES)).astype(np.float32)

    def fn_isect(words, emeta, slot_pkt, feats, lim, kleaf):
        return s3._stage_isect(words, emeta, slot_pkt, feats, lim,
                               kleaf, precision="default",
                               interpret=False, orient="major")

    total += aot_compile(fn_isect, words, emeta, slot_pkt, feats, lim,
                         kleaf)
    return total


def compile_packet(masked: bool, any_hit: bool):
    """Gen-1 packet kernel (ops/packet_trace._run) incl. the live-mask
    variant -- the G1LIVE bench config compiles these fresh on the
    remote Mosaic (round-3's G1LIVE step wedged the device; this local
    precheck is the chain's compile-risk gate for it)."""
    from radiance_tpu.ops import packet_trace as pk
    rng = np.random.default_rng(0)
    n = 4 * pk.PACKET
    o = rng.standard_normal((n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nk_local = 256
    nodef = rng.standard_normal((8 * nk_local, 16)).astype(np.float32)
    nleaf = 128
    kleaf = rng.standard_normal(
        (nleaf, 16, kernel_pack.KERNEL_LEAF_LANES)).astype(np.float32)
    kprim = np.arange(nleaf * pk.T, dtype=np.int32)
    ktri_geo = rng.standard_normal((nleaf * pk.T, 9)).astype(np.float32)
    inv0 = np.eye(4, dtype=np.float32)
    live = (rng.random(n) > 0.5)

    def fn(o, d, nodef, kleaf, kprim, ktri_geo, inv0, *lv):
        return pk._run(o, d, 1e-3, 1e4, nodef, kleaf, kprim, ktri_geo,
                       inv0, any_hit=any_hit, interpret=False,
                       live=lv[0] if lv else None)

    args = (o, d, nodef, kleaf, kprim, ktri_geo, inv0)
    if masked:
        args = args + (live,)
    return aot_compile(fn, *args)


def compile_prep(masked: bool):
    """Single-pass prep-scalars kernel (stream3._oscal_kernel): the
    round-5 prep diet candidate (RADIANCE_PREP_KERNEL=1)."""
    from radiance_tpu.ops import stream3
    rng = np.random.default_rng(0)
    npk = 16
    n = npk * stream3.PKT
    rows = tuple(rng.standard_normal(n).astype(np.float32)
                 for _ in range(6))
    live = rng.random(n) > 0.3

    def fn(*args):
        if masked:
            rows_, lv = args[:6], args[6]
        else:
            rows_, lv = args, None
        return stream3._octant_scalars_kernel(rows_, lv, npk,
                                              interpret=False)

    args = rows + ((live,) if masked else ())
    return aot_compile(fn, *args)


TARGETS = {
    "prep": lambda: compile_prep(False),
    "prep-live": lambda: compile_prep(True),
    "emit": lambda: compile_emit(False),
    "emit-treelet": lambda: compile_emit(True),
    "emit-ws": compile_emit_ws,
    "emit-ws-treelet": lambda: compile_emit_ws(True),
    "isect": compile_isect,
    "isect-lean": compile_isect_lean,
    "isect-occl": compile_isect_occl,
    "refine": compile_refine,
    "tlas": compile_tlas_native,
    "packet": lambda: compile_packet(False, False),
    "packet-live": lambda: compile_packet(True, False),
    "packet-occl-live": lambda: compile_packet(True, True),
}


def main():
    names = sys.argv[1:] or ["emit"]
    if names == ["all"]:
        names = list(TARGETS)
    for name in names:
        dt = TARGETS[name]()
        print(f"COMPILED {name} {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
