"""Test config: force CPU with a virtual 8-device mesh for sharding tests.

Note: this environment's JAX build (axon TPU plugin) ignores the
JAX_PLATFORMS env var; jax.config.update is required.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier too (interpret-mode Pallas pipelines, "
             "subprocess parity tests); default tier stays under ~5 "
             "minutes")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: slow tier (opt in with --runslow or "
                   "RADIANCE_FULL_TESTS=1)")


# Slow tier, generated from a full-suite --durations run (2026-08-20,
# 185 tests / 44:37 total on the 1-core CPU env): every test whose call
# time measured >= 12s, EXCEPT load-bearing representatives kept so the
# fast tier still exercises each subsystem end-to-end
# (test_pixel_sharded_matches_single_device).  Fast tier ~6 min.
_SLOW = {
    ("test_engine.py", "test_convergence_more_samples_less_noise"),
    ("test_engine.py", "test_debug_modes_11_17"),
    ("test_engine.py", "test_engine_wave_routing_xla_matches_default"),
    ("test_engine.py", "test_tbound_residual_overflow_rewalked"),
    ("test_engine.py", "test_tbound_store_is_per_tracer"),
    ("test_engine.py", "test_temporal_bound_progressive"),
    ("test_golden_samples.py", "test_golden_sample2"),
    ("test_lbvh.py", "test_lbvh_jit_rebuild_is_fast_to_retrace"),
    ("test_lbvh.py", "test_lbvh_structure"),
    ("test_lbvh.py", "test_lbvh_traversal_matches_oracle"),
    ("test_leaf_cap.py", "test_leaf_cap_parity"),
    ("test_packet_trace.py", "test_multi_instance_packet_sweeps"),
    ("test_sharding.py", "test_sample_parallel_converges"),
    ("test_sharding.py", "test_tile_sample_2d_mesh_matches_single_device"),
    ("test_stream3.py", "test_engine_wavefront_stream3_route"),
    ("test_stream3.py", "test_stream3_bf16_epilogue"),
    ("test_stream3.py", "test_stream3_build_tracer_residual_and_spotcheck"),
    ("test_stream3.py", "test_stream3_cascade_matches_full_trace"),
    ("test_stream3.py", "test_stream3_coherent_vs_oracle"),
    ("test_stream3.py", "test_stream3_conservative_fallback"),
    ("test_stream3.py", "test_stream3_exact_refine_prunes_and_preserves"),
    ("test_stream3.py", "test_stream3_in_jit_residual"),
    ("test_stream3.py", "test_stream3_live_mask_all_dead_packet"),
    ("test_stream3.py", "test_stream3_live_mask_presort"),
    ("test_stream3.py", "test_stream3_live_mask_vs_oracle"),
    ("test_stream3.py", "test_stream3_occlusion_live_mask"),
    ("test_stream3.py", "test_stream3_occlusion_mode"),
    ("test_stream3.py", "test_stream3_random_mixed_packets"),
    ("test_stream3.py", "test_stream3_residual_overflow_poisons"),
    ("test_stream3.py", "test_stream3_sah_collapse_vs_oracle"),
    ("test_stream3.py", "test_stream3_temporal_block_bound_exact"),
    ("test_stream3.py", "test_stream3_temporal_bound_occlusion"),
    ("test_stream3.py", "test_stream3_temporal_bound_overflow_marks_slot"),
    ("test_stream3.py", "test_stream3_temporal_bound_residual_rewalk"),
    ("test_stream3.py", "test_stream3_tmax_clip"),
    ("test_stream3.py", "test_stream3_tq7_word_format"),
    ("test_stream3.py", "test_stream3_tqsort_refine"),
    ("test_stream3.py", "test_stream3_treelet_mixed_octants"),
    ("test_stream3.py", "test_stream3_treelet_vs_oracle"),
    ("test_stream3.py", "test_stream3_ws_end_to_end_matches_plain"),
    ("test_stream3.py", "test_stream3_ws_live_mask_and_diag"),
    ("test_stream3.py", "test_stream3_ws_treelet_matches_lockstep_treelet"),
    ("test_stream3.py", "test_stream3_ws_wide_groups"),
    ("test_stream3_multi.py", "test_multi_coherent_tiles"),
    ("test_stream3_multi.py", "test_multi_live_mask_and_occlusion"),
    ("test_stream3_multi.py", "test_multi_tables_dedup_and_traced_frame"),
    ("test_stream3_multi.py", "test_multi_temporal_bound_scan_and_native"),
    ("test_stream3_multi.py", "test_multi_vs_oracle"),
    ("test_stream3_multi.py", "test_multi_ws_matches_default"),
    ("test_stream3_multi.py", "test_tlas_native_live_mask_and_dispatch"),
    ("test_stream3_multi.py",
     "test_tlas_native_pool_overflow_residual_and_poison"),
    ("test_stream3_multi.py", "test_tlas_native_sah_collapse"),
    ("test_stream3_multi.py", "test_tlas_native_treelet_window_clamp"),
    ("test_stream3_multi.py", "test_tlas_native_vs_oracle"),
    ("test_stream_trace.py", "test_stream_coherent_tile_rays"),
    ("test_stream_trace.py", "test_stream_transformed_instance"),
    ("test_stream_trace.py", "test_stream_vs_xla_traversal"),
    ("test_tpu_smoke.py", "test_tpu_smoke"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if (item.fspath.basename, base) in _SLOW:
            item.add_marker(pytest.mark.slow)
    if config.getoption("--runslow") \
            or os.environ.get("RADIANCE_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow (or RADIANCE_FULL_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs():
    """Free compiled executables between test modules.

    The suite compiles a few hundred large CPU programs (interpret-mode
    Pallas pipelines expand into huge XLA graphs); with everything
    retained, the XLA:CPU JIT deterministically segfaults inside
    backend_compile once enough executables have accumulated (observed
    at the ~160th test regardless of which test runs there).  Dropping
    the jit caches per module keeps the live-executable population
    bounded; cross-module reuse is minimal so the recompile cost is
    noise."""
    yield
    jax.clear_caches()
