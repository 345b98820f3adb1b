"""PX4-aligned cascaded flight controller, pure JAX, batched over envs.

TPU-native replacement for the reference's external C++ ``rlPx4Controller``
(``pyParallelControl``: ParallelPosControl / ParallelVelControl /
ParallelAttiControl / ParallelRateControl — reference
airgym/envs/base/hovering.py:10,93-123,235-254). The reference crosses
GPU->CPU->C++ with float64 numpy every step; here the whole cascade is
inlined into the jitted env step and never leaves the device.

Call contracts preserved (reference hovering.py:235-254, SURVEY.md 2.4):
  * ``pos``  (PY):   action = [x, y, z, yaw]                -> rotor cmds
  * ``vel``  (LV):   action = [vx, vy, vz, yaw_rate]        -> rotor cmds
  * ``atti`` (CTA):  action = [qw, qx, qy, qz, thrust]      -> rotor cmds
  * ``rate`` (CTBR): action = [p, q, r, thrust]             -> rotor cmds
  * ``prop`` (SRT):  action = per-rotor thrusts, bypass.
Outputs are normalized per-rotor thrust commands in [0, 1], which the sim
scales by 9.59 N (reference hovering.py:256-257).

Cascade structure mirrors PX4 (position P -> velocity PID -> geometric
attitude P -> body-rate PID -> X-quad mixer with desaturation); gains default
to PX4 firmware defaults (MC_*RATE_P/I/D, MC_ROLL/PITCH/YAW_P,
MPC_XY/Z_VEL_*, MPC_XY/Z_P). The hover operating point reproduces the
reference's hard-coded hover-thrust fraction ~0.1533 (hovering.py:383).

The rotor layout/mixer matches the URDF + reaction-torque signs:
rotors 1:(+x,-y) 2:(-x,+y) spin CCW (reaction -z), 3:(+x,+y) 4:(-x,-y) spin
CW (reaction +z) (hovering.py:272-275, X152b/model.urdf:86-105).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from airgym_tpu.math import rotations as rot

CONTROL_MODES = ("pos", "vel", "atti", "rate", "prop")


class CascadeGains(NamedTuple):
    # body-rate PID (normalized torque output), PX4 MC_*RATE_*
    rate_p: tuple = (0.15, 0.15, 0.2)
    rate_i: tuple = (0.2, 0.2, 0.1)
    rate_d: tuple = (0.003, 0.003, 0.0)
    rate_int_lim: float = 0.30
    torque_lim: float = 1.0
    # attitude P (rad/s per rad), PX4 MC_ROLL/PITCH/YAW_P
    att_p: tuple = (6.5, 6.5, 2.8)
    rate_max: tuple = (3.8, 3.8, 3.5)      # ~220/220/200 deg/s
    # velocity PID (accel output), PX4 MPC_*_VEL_*_ACC
    vel_p: tuple = (1.8, 1.8, 4.0)
    vel_i: tuple = (0.4, 0.4, 2.0)
    vel_d: tuple = (0.2, 0.2, 0.0)
    vel_int_lim: float = 5.0
    # position P (m/s per m) + velocity limits, PX4 MPC_XY/Z_P, MPC_*_VEL_MAX
    pos_p: tuple = (0.95, 0.95, 1.0)
    vel_max_xy: float = 12.0
    vel_max_up: float = 3.0
    vel_max_dn: float = 1.5
    # tilt / thrust limits
    max_tilt: float = 0.78                  # ~45 deg, MPC_TILTMAX_AIR
    thrust_min: float = 0.0
    thrust_max: float = 1.0
    # conversion from desired specific force to normalized collective
    # per-rotor command: |f| * mass / (4 * thrust_scale)
    mass: float = 0.601
    thrust_scale: float = 9.59
    gravity: float = 9.81


class CascadeState(NamedTuple):
    """Per-env controller memory; a leaf of the env-state pytree so it is
    checkpointed, sharded, and reset together with the physics state."""
    rate_int: jnp.ndarray      # [N,3] body-rate integrator
    prev_rate: jnp.ndarray     # [N,3] previous body rate (D on measurement)
    vel_int: jnp.ndarray       # [N,3] velocity integrator
    prev_vel_err: jnp.ndarray  # [N,3] previous velocity error (D term)
    yaw_sp: jnp.ndarray        # [N] integrated yaw setpoint (vel mode)


def init_state(n: int, dtype=jnp.float32) -> CascadeState:
    z3 = jnp.zeros((n, 3), dtype=dtype)
    return CascadeState(z3, z3, z3, z3, jnp.zeros((n,), dtype=dtype))


def reset_state(cs: CascadeState, reset_mask: jnp.ndarray,
                quat_xyzw: jnp.ndarray) -> CascadeState:
    """Zero integrators of envs being reset; re-anchor yaw setpoint.

    reset_mask: [N] bool. Branch-free (jnp.where), matching the reference's
    tensor-wise reset style.
    """
    m3 = reset_mask[:, None]
    yaw_now = rot.yaw_from_quat(quat_xyzw)
    return CascadeState(
        rate_int=jnp.where(m3, 0.0, cs.rate_int),
        prev_rate=jnp.where(m3, 0.0, cs.prev_rate),
        vel_int=jnp.where(m3, 0.0, cs.vel_int),
        prev_vel_err=jnp.where(m3, 0.0, cs.prev_vel_err),
        yaw_sp=jnp.where(reset_mask, yaw_now, cs.yaw_sp),
    )


# --------------------------------------------------------------------------
# mixer


def mix_to_rotors(g: CascadeGains, torque_norm: jnp.ndarray,
                  thrust_norm: jnp.ndarray) -> jnp.ndarray:
    """Normalized body torques [N,3] + collective per-rotor thrust [N] ->
    per-rotor commands [N,4] in [0,1], X-quad layout with PX4-style
    desaturation (preserve roll/pitch, then yaw, then clip)."""
    tx, ty, tz = torque_norm[..., 0], torque_norm[..., 1], torque_norm[..., 2]
    # roll/pitch contributions per rotor (see module docstring for layout)
    # tau_x = L*sum(f*y), tau_y = -L*sum(f*x): positive roll needs thrust at
    # +y (rotors 2,3); positive pitch needs thrust at -x (rotors 2,4).
    rp = jnp.stack([
        -tx - ty,   # rotor 1 (+x, -y)
        +tx + ty,   # rotor 2 (-x, +y)
        +tx - ty,   # rotor 3 (+x, +y)
        -tx + ty,   # rotor 4 (-x, -y)
    ], axis=-1)
    yaw = jnp.stack([-tz, -tz, tz, tz], axis=-1)

    f = thrust_norm[..., None] + rp
    # collective shift to keep roll/pitch authority inside [0,1]
    boost = jnp.maximum(0.0, -jnp.min(f, axis=-1, keepdims=True))
    reduce = jnp.maximum(0.0, jnp.max(f, axis=-1, keepdims=True) - 1.0)
    f = f + boost - reduce
    # add yaw only with the margin that remains
    margin_hi = 1.0 - jnp.max(f, axis=-1, keepdims=True)
    margin_lo = jnp.min(f, axis=-1, keepdims=True)
    yaw_mag = jnp.max(jnp.abs(yaw), axis=-1, keepdims=True)
    yaw_scale = jnp.clip(
        jnp.minimum(margin_hi, margin_lo) / jnp.maximum(yaw_mag, 1e-6),
        0.0, 1.0)
    f = f + yaw * yaw_scale
    return jnp.clip(f, 0.0, 1.0)


# --------------------------------------------------------------------------
# rate loop (innermost)


def rate_control(g: CascadeGains, cs: CascadeState, quat_xyzw: jnp.ndarray,
                 angvel_world: jnp.ndarray, rate_sp: jnp.ndarray,
                 thrust_norm: jnp.ndarray, dt: float):
    """Body-rate PID -> mixer. rate_sp [N,3] body frame, thrust_norm [N]."""
    w_body = rot.quat_rotate_inverse(quat_xyzw, angvel_world)
    err = rate_sp - w_body

    kp = jnp.asarray(g.rate_p, dtype=err.dtype)
    ki = jnp.asarray(g.rate_i, dtype=err.dtype)
    kd = jnp.asarray(g.rate_d, dtype=err.dtype)

    rate_int = jnp.clip(cs.rate_int + err * dt * ki,
                        -g.rate_int_lim, g.rate_int_lim)
    # derivative on measurement (PX4): -d(rate)/dt
    d_term = -(w_body - cs.prev_rate) / dt * kd
    torque = jnp.clip(kp * err + rate_int + d_term,
                      -g.torque_lim, g.torque_lim)

    cmds = mix_to_rotors(g, torque, thrust_norm)
    cs = cs._replace(rate_int=rate_int, prev_rate=w_body)
    return cmds, cs


# --------------------------------------------------------------------------
# attitude loop


def attitude_rates(g: CascadeGains, quat_xyzw: jnp.ndarray,
                   quat_sp_xyzw: jnp.ndarray,
                   yaw_rate_ff: jnp.ndarray | None = None) -> jnp.ndarray:
    """Quaternion attitude error -> body-rate setpoint (PX4 geometric P)."""
    q_err = rot.quat_mul(rot.quat_conjugate(rot.quat_normalize(quat_xyzw)),
                         rot.quat_normalize(quat_sp_xyzw))
    q_err = rot.quat_canonical(q_err)
    att_e = 2.0 * q_err[..., :3]              # small-angle body-frame error
    kp = jnp.asarray(g.att_p, dtype=att_e.dtype)
    rate_sp = kp * att_e
    if yaw_rate_ff is not None:
        rate_sp = rate_sp.at[..., 2].add(yaw_rate_ff)
    lim = jnp.asarray(g.rate_max, dtype=att_e.dtype)
    return jnp.clip(rate_sp, -lim, lim)


# --------------------------------------------------------------------------
# velocity loop (gives thrust vector + attitude setpoint)


def _accel_to_att_thrust(g: CascadeGains, acc_sp: jnp.ndarray,
                         yaw_sp: jnp.ndarray):
    """Desired world acceleration -> (quat setpoint xyzw, collective cmd).

    f_world = acc_sp + g*e_z is the specific force the rotors must supply;
    its direction defines body z, combined with the yaw setpoint via the
    standard geometric construction. Tilt is limited before orientation.
    """
    f = acc_sp + jnp.stack(
        [jnp.zeros_like(yaw_sp), jnp.zeros_like(yaw_sp),
         jnp.full_like(yaw_sp, g.gravity)], axis=-1)
    # limit tilt: clamp horizontal component relative to vertical
    fz = jnp.maximum(f[..., 2], 1e-3)
    max_xy = jnp.tan(g.max_tilt) * fz
    f_xy = f[..., :2]
    xy_norm = jnp.linalg.norm(f_xy, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_xy[..., None] / jnp.maximum(xy_norm, 1e-6))
    f = jnp.concatenate([f_xy * scale, fz[..., None]], axis=-1)

    f_norm = jnp.linalg.norm(f, axis=-1)
    b3 = f / jnp.maximum(f_norm[..., None], 1e-6)
    # yaw-aligned body x: project heading onto plane normal to b3
    xc = jnp.stack([jnp.cos(yaw_sp), jnp.sin(yaw_sp),
                    jnp.zeros_like(yaw_sp)], axis=-1)
    b2 = jnp.cross(b3, xc)
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-6)
    b1 = jnp.cross(b2, b3)
    m = jnp.stack([b1, b2, b3], axis=-1)       # columns = body axes
    quat_sp = rot.matrix_to_quat(m)

    thrust_norm = jnp.clip(f_norm * g.mass / (4.0 * g.thrust_scale),
                           g.thrust_min, g.thrust_max)
    return quat_sp, thrust_norm


def velocity_control(g: CascadeGains, cs: CascadeState, vel: jnp.ndarray,
                     vel_sp: jnp.ndarray, yaw_sp: jnp.ndarray, dt: float):
    """Velocity PID -> (quat_sp, thrust_norm, new controller state)."""
    err = vel_sp - vel
    kp = jnp.asarray(g.vel_p, dtype=err.dtype)
    ki = jnp.asarray(g.vel_i, dtype=err.dtype)
    kd = jnp.asarray(g.vel_d, dtype=err.dtype)

    vel_int = jnp.clip(cs.vel_int + err * dt * ki,
                       -g.vel_int_lim, g.vel_int_lim)
    d_term = (err - cs.prev_vel_err) / dt * kd
    acc_sp = kp * err + vel_int + d_term

    quat_sp, thrust_norm = _accel_to_att_thrust(g, acc_sp, yaw_sp)
    cs = cs._replace(vel_int=vel_int, prev_vel_err=err)
    return quat_sp, thrust_norm, cs


# --------------------------------------------------------------------------
# top-level dispatch — one call per control mode, matching the reference's
# ParallelXControl.update() contracts.


def run(mode: str, g: CascadeGains, cs: CascadeState, root_state: jnp.ndarray,
        action: jnp.ndarray, dt: float = 0.01):
    """root_state [N,13] (IsaacGym layout) + mode action -> rotor cmds [N,4].

    ``mode`` is a static Python string — dispatch happens at trace time.
    """
    pos = root_state[..., 0:3]
    quat = rot.quat_canonical(root_state[..., 3:7])
    vel = root_state[..., 7:10]
    angvel = root_state[..., 10:13]

    if mode == "prop":
        return jnp.clip(action, 0.0, 1.0), cs

    if mode == "rate":
        rate_sp = action[..., 0:3]
        thrust = jnp.clip(action[..., 3], g.thrust_min, g.thrust_max)
        return rate_control(g, cs, quat, angvel, rate_sp, thrust, dt)

    if mode == "atti":
        # action = [qw, qx, qy, qz, thrust] (reference hovering.py:105,243-246)
        q_sp = rot.quat_normalize(rot.wxyz_to_xyzw(action[..., 0:4]))
        thrust = jnp.clip(action[..., 4], g.thrust_min, g.thrust_max)
        rate_sp = attitude_rates(g, quat, q_sp)
        return rate_control(g, cs, quat, angvel, rate_sp, thrust, dt)

    if mode == "vel":
        # action = [vx, vy, vz, yaw_rate]; yaw setpoint integrates the rate.
        vel_sp = action[..., 0:3]
        yaw_rate = action[..., 3]
        yaw_sp = rot.wrap_angle(cs.yaw_sp + yaw_rate * dt)
        cs = cs._replace(yaw_sp=yaw_sp)
        quat_sp, thrust, cs = velocity_control(g, cs, vel, vel_sp, yaw_sp, dt)
        rate_sp = attitude_rates(g, quat, quat_sp, yaw_rate_ff=yaw_rate)
        return rate_control(g, cs, quat, angvel, rate_sp, thrust, dt)

    if mode == "pos":
        # action = [x, y, z, yaw] absolute setpoints (reference limits +-3 m,
        # +-6 rad — hovering.py:94-97).
        pos_sp = action[..., 0:3]
        yaw_sp = action[..., 3]
        kp = jnp.asarray(g.pos_p, dtype=pos.dtype)
        vel_sp = kp * (pos_sp - pos)
        vxy = vel_sp[..., :2]
        vxy_n = jnp.linalg.norm(vxy, axis=-1, keepdims=True)
        vxy = vxy * jnp.minimum(1.0, g.vel_max_xy / jnp.maximum(vxy_n, 1e-6))
        vz = jnp.clip(vel_sp[..., 2], -g.vel_max_dn, g.vel_max_up)
        vel_sp = jnp.concatenate([vxy, vz[..., None]], axis=-1)
        quat_sp, thrust, cs = velocity_control(g, cs, vel, vel_sp, yaw_sp, dt)
        rate_sp = attitude_rates(g, quat, quat_sp)
        return rate_control(g, cs, quat, angvel, rate_sp, thrust, dt)

    raise ValueError(f"unknown control mode {mode!r}; expected {CONTROL_MODES}")


def num_actions(mode: str) -> int:
    """5 iff atti else 4 (reference hovering.py:47)."""
    return 5 if mode == "atti" else 4


def action_limits(mode: str):
    """Default (lower, upper) action limits per mode (reference
    hovering.py:93-121). Task-specific deltas live ON THE TASK, as in the
    reference — see QuadEnvCore.action_limit_overrides (envs/base.py):
    the vision-task lineage narrows rate to +-1 (customized.py:109-114),
    tracking widens pos to +-6 (tracking.py:95-118)."""
    import numpy as np
    if mode == "pos":
        return np.array([-3.0, -3, -3, -6]), np.array([3.0, 3, 3, 6])
    if mode == "vel":
        return np.array([-6.0] * 4), np.array([6.0] * 4)
    if mode == "atti":
        return np.array([-1, -1, -1, -1, 0.0]), np.array([1, 1, 1, 1, 1.0])
    if mode == "rate":
        return np.array([-6.0, -6, -6, 0]), np.array([6.0, 6, 6, 1])
    if mode == "prop":
        return np.array([0.0] * 4), np.array([1.0] * 4)
    raise ValueError(f"unknown control mode {mode!r}")
