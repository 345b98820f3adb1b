"""Batched PID controller (reference: airgym/utils/tensor_pid.py:4-46).

The reference keeps this as a torch utility (unused by tasks since their
controller is C++); here it is the same spec as a functional JAX pytree:
integral/derivative/output clamps, branch-free per-env reset.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PIDState(NamedTuple):
    integral: jnp.ndarray
    prev_error: jnp.ndarray


class TensorPID(NamedTuple):
    kp: float
    ki: float
    kd: float
    integral_lim: float
    derivative_lim: float
    output_lim: float

    def init(self, shape, dtype=jnp.float32) -> PIDState:
        z = jnp.zeros(shape, dtype)
        return PIDState(integral=z, prev_error=z)

    def step(self, st: PIDState, error, dt: float):
        integral = jnp.clip(st.integral + error * dt,
                            -self.integral_lim, self.integral_lim)
        deriv = jnp.clip((error - st.prev_error) / dt,
                         -self.derivative_lim, self.derivative_lim)
        out = jnp.clip(self.kp * error + self.ki * integral + self.kd * deriv,
                       -self.output_lim, self.output_lim)
        return out, PIDState(integral=integral, prev_error=error)

    def reset(self, st: PIDState, mask) -> PIDState:
        m = jnp.reshape(mask, mask.shape + (1,) * (st.integral.ndim -
                                                   mask.ndim))
        return PIDState(integral=jnp.where(m, 0.0, st.integral),
                        prev_error=jnp.where(m, 0.0, st.prev_error))
