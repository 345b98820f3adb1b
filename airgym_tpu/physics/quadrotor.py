"""Batched 6-DoF quadrotor rigid-body dynamics (TPU-native IsaacGym replacement).

Replaces the reference's PhysX pipeline for flight dynamics:
  * root-state tensor layout [N, 13] = pos(3) quat_xyzw(4) linvel(3) angvel(3),
    matching IsaacGym (reference airgym/envs/base/hovering.py:70-77),
    with linvel/angvel in the WORLD frame as IsaacGym reports them.
  * per-rotor thrust forces applied along each prop body's local z and yaw
    reaction torques on the prop z axis (reference hovering.py:256-281),
  * semi-implicit Euler at dt = 0.01 (reference hovering_config.py:29-30).

The X152b parameters come from the reference URDF
(airgym/assets/robots/X152b/model.urdf): base mass 0.585 kg + 4 x 0.004 kg
props, base inertia diag(0.04), rotor arms (+-0.05374, +-0.05374, 0.024).
Thrust scale 9.59 N per unit command and reaction-torque coefficient 0.2
match reference hovering.py:256,270.

Everything is a pure function over [N, ...] arrays: jit/vmap/shard-friendly,
no Python control flow on traced values.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from airgym_tpu.math import rotations as rot


class QuadrotorParams(NamedTuple):
    """Static physical parameters (hashable -> usable as jit static arg)."""
    mass: float                 # total mass [kg]
    inertia_diag: tuple         # body-frame principal inertia [kg m^2]
    rotor_pos: tuple            # 4 x (x, y, z) rotor positions, body frame [m]
    rotor_spin: tuple           # +1 / -1 yaw reaction sign per rotor
    thrust_scale: float         # N of thrust per unit normalized command
    torque_scale: float         # N*m of yaw reaction per unit command
    gravity: float              # [m/s^2], positive number (acts along -z)
    dt: float                   # physics timestep [s]
    motor_tau: float            # first-order motor lag time constant [s]; 0 = off


_L = 0.05374  # rotor arm half-spacing [m] (X152b/model.urdf:89-104)


def x152b_params(dt: float = 0.01, motor_tau: float = 0.0) -> QuadrotorParams:
    """X152b constants from the reference URDF + task configs."""
    base_m, prop_m = 0.585, 0.004
    mass = base_m + 4.0 * prop_m
    # Composite inertia: base diag(0.04) + prop own inertia (1e-6) +
    # parallel-axis terms for the 4 props at (+-L, +-L, 0.024).
    z = 0.024
    ixx = 0.04 + 4 * 1e-6 + 4 * prop_m * (_L * _L + z * z)
    iyy = ixx
    izz = 0.04 + 4 * 1e-6 + 4 * prop_m * (2 * _L * _L)
    # Rotor layout (URDF joints): 1:(+,-) 2:(-,+) 3:(+,+) 4:(-,-).
    rotor_pos = (
        (_L, -_L, z),
        (-_L, _L, z),
        (_L, _L, z),
        (-_L, -_L, z),
    )
    # Reaction torques: props 1,2 -> -z, props 3,4 -> +z (hovering.py:272-275).
    rotor_spin = (-1.0, -1.0, 1.0, 1.0)
    return QuadrotorParams(
        mass=mass,
        inertia_diag=(ixx, iyy, izz),
        rotor_pos=rotor_pos,
        rotor_spin=rotor_spin,
        thrust_scale=9.59,
        torque_scale=0.2,
        gravity=9.81,
        dt=dt,
        motor_tau=motor_tau,
    )


# --- state slicing helpers (13-float IsaacGym layout) ---------------------

def positions(s):
    return s[..., 0:3]


def quats(s):
    return s[..., 3:7]


def linvels(s):
    return s[..., 7:10]


def angvels(s):
    return s[..., 10:13]


def pack_state(pos, quat, linvel, angvel):
    return jnp.concatenate([pos, quat, linvel, angvel], axis=-1)


def rotor_wrench(params: QuadrotorParams, cmd_thrusts: jnp.ndarray):
    """Normalized rotor commands [N,4] in [0,1] -> body-frame force & torque.

    Force: each rotor pushes ``cmd * thrust_scale`` along body +z.
    Torque: moment arm r x F per rotor, plus yaw reaction
    ``spin * torque_scale * cmd`` about body z (reference hovering.py:256-277).
    Returns (force_body [N,3], torque_body [N,3]).
    """
    f = cmd_thrusts * params.thrust_scale  # [N,4] thrust magnitudes, N
    rp = jnp.asarray(params.rotor_pos, dtype=cmd_thrusts.dtype)  # [4,3]
    spin = jnp.asarray(params.rotor_spin, dtype=cmd_thrusts.dtype)  # [4]

    fz = jnp.sum(f, axis=-1)  # total thrust along body z
    force = jnp.stack([jnp.zeros_like(fz), jnp.zeros_like(fz), fz], axis=-1)

    # r x (0,0,f) = (y*f, -x*f, 0)
    tx = jnp.sum(f * rp[:, 1], axis=-1)
    ty = -jnp.sum(f * rp[:, 0], axis=-1)
    tz = jnp.sum(cmd_thrusts * spin, axis=-1) * params.torque_scale
    torque = jnp.stack([tx, ty, tz], axis=-1)
    return force, torque


def rotor_lag(params: QuadrotorParams, rotors: jnp.ndarray,
              cmd_thrusts: jnp.ndarray) -> jnp.ndarray:
    """First-order rotor response: actual normalized rotor thrust tracks
    the commanded thrust with time constant ``motor_tau`` (exact discrete
    form, u' = a*u + (1-a)*c with a = exp(-dt/tau)). With motor_tau = 0
    (the parity default — the reference applies commands instantaneously,
    hovering.py:256) this is the identity on the commands.

    Part of the sim-to-real fidelity track (BASELINE.json north star:
    "rotor thrust/drag/motor lag"); a real X152b rotor cannot change
    thrust in one 10 ms step.
    """
    if params.motor_tau <= 0.0:
        return cmd_thrusts
    alpha = float(np.exp(-params.dt / params.motor_tau))
    return alpha * rotors + (1.0 - alpha) * cmd_thrusts


def step(params: QuadrotorParams, state: jnp.ndarray,
         cmd_thrusts: jnp.ndarray,
         ext_force_world: jnp.ndarray | None = None) -> jnp.ndarray:
    """One semi-implicit Euler physics step.

    Args:
      state: [N, 13] root states (world-frame velocities).
      cmd_thrusts: [N, 4] normalized rotor commands in [0, 1].
      ext_force_world: optional [N, 3] extra world-frame force (disturbances).
    Returns the next [N, 13] state.
    """
    dt = params.dt
    pos, q, v, w_world = (positions(state), quats(state), linvels(state),
                          angvels(state))

    fb, tb = rotor_wrench(params, cmd_thrusts)

    # Linear: world-frame acceleration.
    f_world = rot.quat_rotate(q, fb)
    if ext_force_world is not None:
        f_world = f_world + ext_force_world
    g = jnp.array([0.0, 0.0, -params.gravity], dtype=state.dtype)
    v_new = v + dt * (f_world / params.mass + g)

    # Angular: Euler's equation in the body frame.
    inertia = jnp.asarray(params.inertia_diag, dtype=state.dtype)
    w_body = rot.quat_rotate_inverse(q, w_world)
    gyro = jnp.cross(w_body, inertia * w_body)
    w_body_new = w_body + dt * (tb - gyro) / inertia

    # Semi-implicit: integrate pose with the *new* velocities.
    q_new = rot.quat_integrate(q, w_body_new, dt)
    pos_new = pos + dt * v_new
    w_world_new = rot.quat_rotate(q_new, w_body_new)

    return pack_state(pos_new, q_new, v_new, w_world_new)


def hover_command(params: QuadrotorParams) -> float:
    """Normalized per-rotor command that exactly cancels gravity.

    For the X152b this is ~0.1537, matching the reference's hard-coded hover
    thrust constant 0.1533 (reference hovering.py:383).
    """
    return params.mass * params.gravity / (4.0 * params.thrust_scale)


def ballistic_step(dt: float, gravity: float, states: jnp.ndarray) -> jnp.ndarray:
    """Integrate free-flying env assets (e.g. the thrown cube in Avoid)
    [.., 13] under gravity only — replaces PhysX for dynamic obstacles."""
    pos, q, v, w = (states[..., 0:3], states[..., 3:7], states[..., 7:10],
                    states[..., 10:13])
    g = jnp.array([0.0, 0.0, -gravity], dtype=states.dtype)
    v_new = v + dt * g
    pos_new = pos + dt * v_new
    return jnp.concatenate([pos_new, q, v_new, w], axis=-1)
