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

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (the TPU
# tunnel), which must not be claimed by the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
