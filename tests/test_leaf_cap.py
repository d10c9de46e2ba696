"""RADIANCE_LEAF_CAP: the kernel-leaf collapse cap is an import-time
knob (every kernel derives its leaf-matrix block shapes from it), so
parity under a non-default cap is checked in a SUBPROCESS that sets the
env before importing radiance_tpu.

Offline pricing (benchmarks/leaf_cap_sim.py): cap 64 = -26% pair-kernel
tile work / +20% emit iterations vs the default 128 -- whether that
trade pays depends on the measured fixed-vs-tile cost split, hence a
knob rather than a new default.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROC = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from radiance_tpu.bvh import kernel_pack
assert kernel_pack.KERNEL_MAX_TRIS == {cap}, kernel_pack.KERNEL_MAX_TRIS
assert kernel_pack.KERNEL_LEAF_LANES == 4 * {cap}

from radiance_tpu.ops import stream3, traversal
from radiance_tpu.ops.intersect import FLT_MAX
from test_packet_trace import _single_instance_scene
from test_traversal import gen_rays

ds = _single_instance_scene(n_tris=700, seed=4)
assert stream3.supports(ds)
rng = np.random.default_rng(2)
o, d = gen_rays(rng, 512, spread=8.0)
o, d = jnp.asarray(o), jnp.asarray(d)

ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
rows = stream3.rows_from_aos(o, d)
got = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3, interpret=True)

t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
np.testing.assert_array_equal(hit_ref, hit_got)
both = hit_ref & hit_got
np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3, atol=1e-4)
np.testing.assert_array_equal(np.asarray(ref.prim)[both],
                              np.asarray(got.prim)[both])
print("leaf-cap parity OK")
"""


def _run(cap):
    env = dict(os.environ, RADIANCE_LEAF_CAP=str(cap),
               JAX_PLATFORMS="cpu")
    code = _SUBPROC.format(repo=REPO, tests=os.path.join(REPO, "tests"),
                           cap=cap)
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)


@pytest.mark.parametrize("cap", [64])
@pytest.mark.slow
def test_leaf_cap_parity(cap):
    r = _run(cap)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "leaf-cap parity OK" in r.stdout


def test_leaf_cap_rejects_unaligned():
    env = dict(os.environ, RADIANCE_LEAF_CAP="48", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r}); "
         "import radiance_tpu.bvh.kernel_pack"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "RADIANCE_LEAF_CAP" in r.stderr
