"""Test configuration: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware. Must set flags before jax import."""

import os

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (the TPU tunnel),
# which must not be claimed by the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
