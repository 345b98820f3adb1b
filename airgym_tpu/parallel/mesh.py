"""Multi-chip scale-out utilities (reference counterpart: the NCCL DDP
plumbing in lib/agent/a2c_base.py:109-316 + torch_runner.py:35-46).

TPU-native model: one device mesh with an ``env`` axis. Every [N, ...]
env-batch array is sharded along it; model/optimizer state is replicated.
The jitted train step then runs SPMD — XLA inserts the psum for the loss /
gradient means over the sharded batch, which replaces the reference's
explicit flat-grad all_reduce (a2c_base.py:293-316), its KL all_reduce
(a2c_continuous.py:114-125), and its param broadcast (train start).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(driver scripts do this when JAX_COORDINATOR is set); ``process_index() == 0``
gates logging/checkpointing like the reference's rank-0 guards.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(devices: Optional[list] = None, axis: str = ENV_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_env_batch(tree: Any, mesh: Mesh, num_envs: int,
                    axis: str = ENV_AXIS) -> Any:
    """Place a pytree on the mesh: leaves whose leading dim == num_envs are
    sharded along the env axis, everything else replicated."""
    env_sharding = NamedSharding(mesh, P(axis))
    rep_sharding = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, env_sharding)
        return jax.device_put(x, rep_sharding)

    return jax.tree.map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def is_main_process() -> bool:
    """Rank-0 guard (reference a2c_base.py:121-123)."""
    return jax.process_index() == 0


def maybe_init_distributed() -> bool:
    """Multi-host bring-up (replaces the reference's
    dist.init_process_group('nccl') keyed on LOCAL_RANK/RANK/WORLD_SIZE —
    a2c_base.py:109-117). jax.distributed reads
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or
    cluster auto-detection); call once before building the mesh."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False
