"""Radiance-TPU: a TPU-native (JAX/XLA/Pallas) ray tracing framework.

A from-scratch rebuild of the capabilities of the OpenCL "Radiance" framework
(Vulkan-RT-style API: TLAS/BLAS acceleration structures, SBT shader dispatch,
TraceRays) as an idiomatic TPU wavefront path tracer.

Public API mirrors the reference's `RD::` namespace (reference:
/root/reference/radiance/include/radiance.h) while the implementation is
TPU-first: SoA ray/scene arrays, vectorized two-level BVH traversal under
`jax.jit`, and device-resident progressive accumulation.
"""

import jax as _jax

# Strip source-location metadata from lowered HLO.  JAX embeds the
# CALLER's file path and traceback frames into Pallas kernel payloads
# (MLIR loc info), so byte-identical kernels lower to different
# serialized modules depending on which script invoked them -- and the
# Mosaic compiler was observed (v5e, 2026-08) to miscompile the stream
# tracer's emit walk for some of those location strings while compiling
# the same kernel correctly for others (deterministically per string:
# identical inputs, identical stripped HLO, wrong leaf lists).
# Canonicalizing the locations makes every caller produce the same
# module bytes, so one validated compile serves all entry points.
#
# This is a PROCESS-GLOBAL side effect (it also strips source
# attribution from the host app's own HLO and profiles); set
# RADIANCE_KEEP_HLO_LOCATIONS=1 before import to opt out -- at the
# cost of per-caller kernel module bytes (see benchmarks/stream_trace.py (demoted from ops/, r5) for
# why that historically mattered on this platform).
import os as _os

if not _os.environ.get("RADIANCE_KEEP_HLO_LOCATIONS"):
    _jax.config.update("jax_traceback_in_locations_limit", 0)
    _jax.config.update(
        "jax_hlo_source_file_canonicalization_regex", ".*")

# Persistent XLA compilation cache.  Every measurement-chain step is a
# fresh process, and on this platform a cold engine compile runs 5-15
# minutes through the remote-compile tunnel; with the source-location
# canonicalization above, identical kernels hash identically across
# entry points, so one compiled executable serves the whole chain.
# RADIANCE_JAX_CACHE=0 disables; any other value overrides the dir.
_cache = _os.environ.get("RADIANCE_JAX_CACHE", "")
if _cache != "0":
    if not _cache:
        _cache = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            ".bench_cache", "xla_cache")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        # cache anything that took >=2 s to compile (the default 1 s
        # would also cache hundreds of tiny test programs)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # unsupported on this jax/backend: run uncached
        pass

from radiance_tpu import config
from radiance_tpu.core import math as rmath
from radiance_tpu.core import types

__version__ = "0.1.0"

# Re-export the RD-style platform API lazily to keep import light.
def __getattr__(name):
    import importlib

    _api_names = {
        "Platform", "CreateBuffer", "CreateImage", "CreateImageArray",
        "CreateSampler", "ReadBuffer", "WriteBuffer", "ReadImage",
        "WriteImage",
    }
    _pipeline_names = {
        "CreateShaderModule", "CreatePipeline", "CreateDescriptorSet",
        "CreatePipelineLayout", "BindPipeline", "BindDescriptorSet",
        "TraceRays",
    }
    _as_names = {
        "BuildAccelStruct", "TopAccelStructToFile", "FileToTopAccelStruct",
    }
    if name in _api_names:
        return getattr(importlib.import_module("radiance_tpu.api.platform"), name)
    if name in _pipeline_names:
        return getattr(importlib.import_module("radiance_tpu.api.pipeline"), name)
    if name in _as_names:
        return getattr(importlib.import_module("radiance_tpu.api.accel"), name)
    raise AttributeError(f"module 'radiance_tpu' has no attribute {name!r}")
