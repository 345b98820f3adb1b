"""Test config: run the suite on a fake 8-device CPU backend.

This is the standard JAX trick for testing multi-chip sharding without
hardware: XLA exposes 8 virtual CPU devices, so Mesh/pjit/shard_map paths
compile and execute exactly as they would across a real TPU slice.
Must be set before jax initializes, hence top of conftest.
"""
import os

# force-set (the launch environment may define JAX_PLATFORMS to a TPU
# backend; tests must not contend for the single tunneled chip)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone does not displace an externally-registered TPU plugin
# (observed with the axon backend); the config update does.
jax.config.update("jax_platforms", "cpu")

# Numerical tests compare against fp64/analytic references; don't let the
# backend silently run matmuls in bf16.
jax.config.update("jax_default_matmul_precision", "highest")
