"""Test configuration: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware.

NOTE: the environment's sitecustomize imports jax (axon TPU plugin) before this
conftest runs, so env vars alone are too late — we must go through jax.config.
"""

import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (the TPU
# tunnel), which must not be claimed by the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    XLA's CPU LLVM backend segfaults deterministically when compiling a large
    program (the 8-way SPMD sampler, the staged deposit) after the process has
    accumulated a few hundred live JIT'd modules — the same programs compile
    fine in a fresh process.  Clearing jit/pjit caches at module boundaries
    keeps the live-module count bounded; the persistent compilation cache
    makes the re-compiles cheap."""
    yield
    jax.clear_caches()
