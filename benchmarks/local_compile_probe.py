#!/usr/bin/env python
"""Probe: can the axon backend run kernels compiled CLIENT-side?

PALLAS_AXON_REMOTE_COMPILE=1 (the env default) compiles XLA+Mosaic on
the REMOTE side of the tunnel, where a hung Mosaic compile wedges the
shared device for hours (the treelet kernel did exactly that twice).
The flag is env-driven; with it unset the client compiles with the
LOCAL jaxlib/libtpu -- whose Mosaic compiles the treelet kernel fine
(benchmarks/aot_compile.py, 3.9 s).

This script runs, each in its own subprocess with a hard timeout:
  1. a tiny matmul with remote compile OFF       (runtime compat)
  2. a tiny Pallas kernel with remote compile OFF (Mosaic compat)
  3. the production emit walk on a small wave, remote compile OFF,
     result compared against interpret mode       (numerics)

Safe by construction: local compiles cannot wedge the device; a
subprocess timeout here means the RUN (not compile) failed, which a
fresh health probe distinguishes.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEP1 = """
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
v = float(jnp.sum(x @ x))
assert v == 256.0 * 256 * 256, v
print("STEP1_OK", v)
"""

STEP2 = """
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + 1.0

x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
y = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2 + 1)
print("STEP2_OK")
"""

STEP3 = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tests")
import numpy as np, jax, jax.numpy as jnp
from radiance_tpu.ops import stream3
from test_packet_trace import _single_instance_scene

ds = _single_instance_scene(n_tris=900, seed=3)
n = 2 * stream3.PKT
ij = np.arange(n)
xs = (ij % 64) / 64.0 - 0.5
ys = (ij // 64) / 32.0 - 0.5
o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
rec = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                 interpret=False)
ref = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                 interpret=True)
t_ref = np.asarray(ref.t); t_got = np.asarray(rec.t)
h = t_ref < 1e30
assert ((t_got < 1e30) == h).all()
np.testing.assert_allclose(t_got[h], t_ref[h], rtol=2e-3, atol=1e-4)
print("STEP3_OK")
"""


def run(tag, code, timeout):
    env = dict(os.environ)
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           timeout=timeout, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        print(f"{tag}: TIMEOUT ({timeout}s)")
        return False
    ok = f"{tag}_OK" in r.stdout
    print(f"{tag}: {'OK' if ok else 'FAIL'}")
    if not ok:
        print(r.stdout[-400:])
        print(r.stderr[-1500:])
    return ok


def main():
    if not run("STEP1", STEP1, 300):
        return 1
    if not run("STEP2", STEP2, 300):
        return 1
    if not run("STEP3", STEP3 % {"repo": REPO}, 900):
        return 1
    print("local-compile path fully functional; treelet unblocked")
    return 0


if __name__ == "__main__":
    sys.exit(main())
