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

# The suite is compile-dominated on this 1-CPU host (planning/avoid train
# epochs cost ~1 min of XLA CPU compile EACH, and the donation/dedup
# guards intentionally compile several variants).  Persist those compiles
# across runs — same policy switch as the user entry points
# (AIRGYM_TPU_NO_CACHE=1 opts out, JAX_COMPILATION_CACHE_DIR overrides).
# Cache keys include platform/flags, so the 8-virtual-device CPU entries
# never collide with the TPU entries the runners write.
from airgym_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
