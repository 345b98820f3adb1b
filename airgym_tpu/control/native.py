"""ctypes bindings for the native C++ PX4 cascade (native/px4_cascade.cpp).

Fills the role the external C++ ``rlPx4Controller`` plays in the
reference (airgym/envs/base/hovering.py:10): a host-side controller with
the exact semantics of the TPU cascade, for (a) AirGym-Real-style onboard
deployment without JAX, and (b) golden cross-validation of
airgym_tpu/control/px4.py — tests assert the two agree to float32
round-off on random states in every mode.

The shared library builds on first use with g++ (no pybind11 needed) and
is cached next to the source. API mirrors the reference's
ParallelXControl classes:

    ctl = ParallelControl("rate", num_envs)
    cmds = ctl.update(root_states, actions, dt=0.01)   # [n, 4] in [0, 1]
    ctl.reset(mask, quats)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_MODES = {"pos": 0, "vel": 1, "atti": 2, "rate": 3, "prop": 4}
_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "px4_cascade.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libpx4cascade.so")

# per-env state struct: 3+3+3+3 floats + yaw_sp
_STATE_FLOATS = 13


def build(force: bool = False) -> str:
    """Compile the shared library if missing/outdated."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
        check=True)
    return _LIB


_cached_lib: Optional[ctypes.CDLL] = None


def _lib() -> ctypes.CDLL:
    global _cached_lib
    if _cached_lib is None:
        lib = ctypes.CDLL(build())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.cascade_run.argtypes = [
            ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_float,
            f32p, f32p]
        lib.cascade_run.restype = None
        lib.cascade_reset.argtypes = [ctypes.c_int, u8p, f32p, f32p]
        lib.cascade_reset.restype = None
        _cached_lib = lib
    return _cached_lib


class ParallelControl:
    """Batched cascade with persistent per-env state (reference
    ParallelPosControl/VelControl/AttiControl/RateControl)."""

    def __init__(self, mode: str, num_envs: int):
        if mode not in _MODES:
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.num_envs = num_envs
        self.state = np.zeros((num_envs, _STATE_FLOATS), dtype=np.float32)

    def reset(self, mask: np.ndarray, quats_xyzw: np.ndarray):
        _lib().cascade_reset(
            self.num_envs,
            np.ascontiguousarray(mask, dtype=np.uint8),
            np.ascontiguousarray(quats_xyzw, dtype=np.float32),
            self.state)

    def update(self, root_states: np.ndarray, actions: np.ndarray,
               dt: float = 0.01) -> np.ndarray:
        n = self.num_envs
        cmds = np.zeros((n, 4), dtype=np.float32)
        _lib().cascade_run(
            _MODES[self.mode], n,
            np.ascontiguousarray(root_states, dtype=np.float32),
            np.ascontiguousarray(actions, dtype=np.float32),
            float(dt), self.state, cmds)
        return cmds

    def state_as_pytree(self):
        """View the native state in px4.CascadeState layout (for
        cross-validation against the JAX controller)."""
        s = self.state
        from airgym_tpu.control import px4
        import jax.numpy as jnp
        return px4.CascadeState(
            rate_int=jnp.asarray(s[:, 0:3]),
            prev_rate=jnp.asarray(s[:, 3:6]),
            vel_int=jnp.asarray(s[:, 6:9]),
            prev_vel_err=jnp.asarray(s[:, 9:12]),
            yaw_sp=jnp.asarray(s[:, 12]))
