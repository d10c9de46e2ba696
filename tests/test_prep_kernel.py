"""Single-pass Pallas prep-scalars kernel (_oscal_kernel) vs the XLA
broadcast formulation (interpret mode on CPU).

The kernel mirrors _stage_prep's octant block and _interval_scalars
exactly (same inits, same select order), so interpret-mode results
must be BIT-identical; an end-to-end trace under RADIANCE_PREP_KERNEL=1
must match the legacy prep hit-for-hit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiance_tpu.ops import stream3, traversal
from radiance_tpu.ops.intersect import FLT_MAX

from test_traversal import gen_rays
from test_packet_trace import _single_instance_scene


def _rows(n, seed, axis_zero=False):
    rng = np.random.default_rng(seed)
    o, d = gen_rays(rng, n, spread=6.0)
    if axis_zero:
        # exact zero direction components exercise the sgn==0 /
        # clamped-1/|d| paths
        d[: n // 4, 0] = 0.0
        d[n // 4: n // 2, 2] = 0.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return tuple(jnp.asarray(v) for v in
                 (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]))


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("axis_zero", [False, True])
def test_octant_scalars_kernel_bit_equal(monkeypatch, masked, axis_zero):
    n = 2 * stream3.PKT
    rows = _rows(n, seed=5, axis_zero=axis_zero)
    live = None
    if masked:
        rng = np.random.default_rng(9)
        live = jnp.asarray(rng.random(n) < 0.6)
    npk = n // stream3.PKT

    monkeypatch.delenv("RADIANCE_PREP_KERNEL", raising=False)
    cand_x, pres_x, full_x = stream3._octant_scalars(
        rows, live, npk, interpret=True)
    monkeypatch.setenv("RADIANCE_PREP_KERNEL", "1")
    cand_k, pres_k, full_k = stream3._octant_scalars(
        rows, live, npk, interpret=True)

    pres_x = np.asarray(pres_x)
    pres_k = np.asarray(pres_k)
    np.testing.assert_array_equal(pres_k, pres_x)
    # scalar rows of ABSENT octants are don't-care (legacy leaves
    # init values, the kernel too, but sgn of an empty octant differs:
    # both are never read -- slot_of only scatters present octants)
    m = pres_x[..., None]
    np.testing.assert_array_equal(
        np.asarray(cand_k) * m, np.asarray(cand_x) * m)
    np.testing.assert_array_equal(np.asarray(full_k),
                                  np.asarray(full_x))


def test_stream3_trace_with_prep_kernel(monkeypatch):
    """End-to-end: the full stream3 pipeline under the Pallas prep
    produces the identical HitRecord (interpret mode)."""
    ds = _single_instance_scene(n_tris=500, seed=17)
    rng = np.random.default_rng(3)
    o, d = gen_rays(rng, 1500, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)

    monkeypatch.delenv("RADIANCE_PREP_KERNEL", raising=False)
    ref = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3,
                                     interpret=True)
    monkeypatch.setenv("RADIANCE_PREP_KERNEL", "1")
    got = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.prim),
                                  np.asarray(got.prim))
    np.testing.assert_array_equal(np.asarray(ref.b1), np.asarray(got.b1))


def test_stream3_trace_with_prep_kernel_live(monkeypatch):
    """Live-mask variant (engine waves): dead lanes out of every
    frustum, identical results on the live lanes."""
    ds = _single_instance_scene(n_tris=400, seed=23)
    rng = np.random.default_rng(7)
    o, d = gen_rays(rng, 1200, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    live = jnp.asarray(rng.random(1200) < 0.5)
    rows = stream3.rows_from_aos(o, d)

    monkeypatch.delenv("RADIANCE_PREP_KERNEL", raising=False)
    ref = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                     interpret=True, live=live)
    monkeypatch.setenv("RADIANCE_PREP_KERNEL", "1")
    got = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                     interpret=True, live=live)
    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(ref.t)[lv],
                                  np.asarray(got.t)[lv])
    np.testing.assert_array_equal(np.asarray(ref.prim)[lv],
                                  np.asarray(got.prim)[lv])
