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
