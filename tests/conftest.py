"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-device test strategy from SURVEY.md §4 — pjit sharding and
cross-replica BN statistics are exercised without TPU hardware.
"""

import os

# Must be set before jax initializes a backend. The environment's axon
# sitecustomize force-selects the tunneled TPU, so we must both set the env
# var and override jax_platforms programmatically after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
