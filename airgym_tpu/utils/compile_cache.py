"""Persistent XLA compilation cache for the user-facing entry points.

The reference has nothing to cache (PhysX/torch kernels ship precompiled);
here every jitted train graph is XLA-compiled per process, and on this
class of hardware a cold vision-train compile costs minutes (a tunneled
remote compile).  Enabling JAX's persistent compilation cache makes every
run after the first start in seconds (measured on the Hovering train
epoch: 113.8 s -> 18.2 s fresh-process cold start).

Policy:
- honor an explicit ``JAX_COMPILATION_CACHE_DIR`` env var (user knows best);
- otherwise default to ``~/.cache/airgym_tpu/jax``;
- ``AIRGYM_TPU_NO_CACHE=1`` opts out entirely;
- only compiles slower than 1 s are persisted, so tiny graphs (tests,
  helper jits) don't churn the disk.

Called from scripts/runner.py, scripts/example.py, bench.py and
__graft_entry__.py — not at package import, so libraries embedding
airgym_tpu keep full control of jax config.
"""
from __future__ import annotations

import os

import jax


def enable_compilation_cache() -> str | None:
    """Enable the persistent compilation cache; returns the dir or None."""
    if os.environ.get("AIRGYM_TPU_NO_CACHE") == "1":
        return None
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "airgym_tpu", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None  # read-only FS or older jax: run uncached
    return cache_dir
