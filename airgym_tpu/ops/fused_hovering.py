"""Fused Pallas rollout kernel for the Hovering task (rate mode).

Speed-of-light env stepping: the ENTIRE step — PX4 rate-PID + mixer,
6-DoF physics, hovering reward, termination, timeout, and PRNG-randomized
reset — runs inside one Pallas kernel, and the per-env state stays
resident in VMEM across T steps. HBM traffic collapses from
O(state x T) (the XLA scan writes the carry back every step) to O(state)
per rollout chunk, which is what makes stepping compute-bound instead of
HBM-bound.

Semantics are the Hovering task's exactly (reference
airgym/envs/base/hovering.py; same constants via control/px4.py +
physics/quadrotor.py); the test suite drives the fused kernel and the
standard jitted step from identical states under a no-termination window
and requires matching trajectories to f32/polynomial tolerance
(atan2/acos are polynomial — ops/transcendental.py — since Mosaic does
not lower them).

Use cases: scripted/eval rollouts, dataset generation, and the headline
env-step benchmark. The PPO rollout interleaves policy matmuls and keeps
the XLA path (fusing the policy into this kernel is the natural next
step).

State record (field-major [40, N] f32):
  0:13  root state (IsaacGym layout)   13:16 rate integrator
  16:19 prev body rate                 19 progress   20 reset flag
  21:25 pre_actions (remapped)         25:29 rotor state (motor lag)
  29:35 task extras (balloon)          35:40 pad
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airgym_tpu.control import px4
from airgym_tpu.ops import transcendental as tm
from airgym_tpu.physics import quadrotor as qd

TILE = 1024                    # envs per grid cell: each field is (8, 128)
_F = 40                        # fields in the packed record

_P = qd.x152b_params()
_G = px4.CascadeGains()
_DT = 0.01
_HOVER_MAX_LEN = 2400          # 24 s / 0.01 (hovering_config.py:17,29)


def pack_state(core) -> jnp.ndarray:
    """envs.base.EnvState (hovering core) -> [40, N] record."""
    n = core.root.shape[0]
    s = jnp.zeros((_F, n), jnp.float32)
    s = s.at[0:13].set(core.root.T)
    s = s.at[13:16].set(core.ctrl.rate_int.T)
    s = s.at[16:19].set(core.ctrl.prev_rate.T)
    s = s.at[19].set(core.progress.astype(jnp.float32))
    s = s.at[20].set(core.reset_buf.astype(jnp.float32))
    s = s.at[21:25].set(core.pre_actions.T)
    if core.rotors is not None:
        s = s.at[25:29].set(core.rotors.T)
    return s


def unpack_root(s: jnp.ndarray) -> jnp.ndarray:
    return s[0:13].T


def _mix(x):
    """murmur3-style 32-bit finalizer (uint32 arrays)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _make_uniform(base_key, shape):
    """Counter-based in-kernel RNG: works identically on TPU-compiled and
    CPU-interpret backends (pltpu.prng_* has no CPU lowering). base_key is
    a uint32 scalar folded with a per-draw counter and the lane index."""
    lanes = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * 128
             + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    counter = [jnp.uint32(0)]

    def uniform():
        counter[0] = counter[0] + jnp.uint32(1)
        bits = _mix(base_key * jnp.uint32(0x9E3779B9)
                    ^ (lanes + jnp.uint32(0x85EBCA6B))
                    ^ (counter[0] * jnp.uint32(0xC2B2AE35)))
        # Mosaic cannot cast uint32 -> f32; go through a 31-bit int32
        pos = jax.lax.bitcast_convert_type(
            bits >> jnp.uint32(1), jnp.int32)
        return pos.astype(jnp.float32) * (1.0 / 2147483648.0)

    return uniform


def _quat_from_euler(ax, ay, az):
    """Intrinsic XYZ euler -> xyzw quat: q = qx(a) * qy(b) * qz(c)."""
    cx, sx = jnp.cos(ax * 0.5), jnp.sin(ax * 0.5)
    cy, sy = jnp.cos(ay * 0.5), jnp.sin(ay * 0.5)
    cz, sz = jnp.cos(az * 0.5), jnp.sin(az * 0.5)
    # qx*qy (Hamilton, xyzw): (sx,0,0,cx) * (0,sy,0,cy)
    x1, y1, z1, w1 = sx * cy, cx * sy, sx * sy, cx * cy
    # (*) qz: (0,0,sz,cz)
    qx = x1 * cz + y1 * sz
    qy = y1 * cz - x1 * sz
    qz = w1 * sz + z1 * cz
    qw = w1 * cz - z1 * sz
    return qx, qy, qz, qw


def _kernel(seed_ref, act_ref, s_ref, out_ref, rew_ref, *, steps: int,
            motor_alpha: float = 0.0):
    t_id = pl.program_id(0)
    base_seed = (seed_ref[0].astype(jnp.uint32)
                 + jnp.uint32(t_id) * jnp.uint32(0x01000193))

    shape = (8, 128)

    def F(i):
        return s_ref[i].reshape(shape)

    px_, py_, pz_ = F(0), F(1), F(2)
    qx, qy, qz, qw = F(3), F(4), F(5), F(6)
    vx, vy, vz = F(7), F(8), F(9)
    wx, wy, wz = F(10), F(11), F(12)
    rix, riy, riz = F(13), F(14), F(15)
    prx, pry, prz = F(16), F(17), F(18)
    prog = F(19)
    rstf = F(20)
    pa0, pa1, pa2, pa3 = F(21), F(22), F(23), F(24)
    r1_, r2_, r3_, r4_ = F(25), F(26), F(27), F(28)

    # constant remapped action (rate mode): [p, q, r, thrust]
    a0 = act_ref[0]
    a1 = act_ref[1]
    a2 = act_ref[2]
    a3 = act_ref[3]

    rew_sum = jnp.zeros(shape, jnp.float32)

    kp = _G.rate_p
    ki = _G.rate_i
    kd = _G.rate_d
    mass, g = _P.mass, _P.gravity
    ixx, iyy, izz = _P.inertia_diag
    ts_, tq = _P.thrust_scale, _P.torque_scale
    L = _P.rotor_pos[0][0]

    state = (px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
             rix, riy, riz, prx, pry, prz, prog, rstf,
             pa0, pa1, pa2, pa3, r1_, r2_, r3_, r4_, rew_sum)

    def body(step_i, st):
        (px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
         rix, riy, riz, prx, pry, prz, prog, rstf,
         pa0, pa1, pa2, pa3, r1_, r2_, r3_, r4_, rew_sum) = st

        # ---- controller: canonical quat, body rates, PID, mixer --------
        flip = jnp.where(qw < 0.0, -1.0, 1.0)
        qx_, qy_, qz_, qw_ = qx * flip, qy * flip, qz * flip, qw * flip

        def rot_inv(ax_, ay_, az_):
            # v' = q^-1 * v * q  (conjugate rotate), componentwise
            a = 2.0 * qw_ * qw_ - 1.0
            cx_ = -qy_ * az_ + qz_ * ay_          # cross(-qvec, v)
            cy_ = -qz_ * ax_ + qx_ * az_
            cz_ = -qx_ * ay_ + qy_ * ax_
            d = -(qx_ * ax_ + qy_ * ay_ + qz_ * az_)
            return (a * ax_ + 2.0 * qw_ * cx_ + 2.0 * d * -qx_,
                    a * ay_ + 2.0 * qw_ * cy_ + 2.0 * d * -qy_,
                    a * az_ + 2.0 * qw_ * cz_ + 2.0 * d * -qz_)

        wbx, wby, wbz = rot_inv(wx, wy, wz)

        def pid(err, integ, wprev, wnow, kp_, ki_, kd_):
            integ = jnp.clip(integ + err * _DT * ki_,
                             -_G.rate_int_lim, _G.rate_int_lim)
            d = -(wnow - wprev) / _DT * kd_
            return jnp.clip(kp_ * err + integ + d,
                            -_G.torque_lim, _G.torque_lim), integ

        tx, rix = pid(a0 - wbx, rix, prx, wbx, kp[0], ki[0], kd[0])
        ty, riy = pid(a1 - wby, riy, pry, wby, kp[1], ki[1], kd[1])
        tz, riz = pid(a2 - wbz, riz, prz, wbz, kp[2], ki[2], kd[2])
        prx, pry, prz = wbx, wby, wbz

        thrust = jnp.clip(a3, _G.thrust_min, _G.thrust_max)
        rp1, rp2, rp3, rp4 = -tx - ty, tx + ty, tx - ty, -tx + ty
        f1, f2, f3, f4 = thrust + rp1, thrust + rp2, thrust + rp3, \
            thrust + rp4
        mn = jnp.minimum(jnp.minimum(f1, f2), jnp.minimum(f3, f4))
        mx = jnp.maximum(jnp.maximum(f1, f2), jnp.maximum(f3, f4))
        shift = jnp.maximum(0.0, -mn) - jnp.maximum(0.0, mx - 1.0)
        f1, f2, f3, f4 = f1 + shift, f2 + shift, f3 + shift, f4 + shift
        mn = jnp.minimum(jnp.minimum(f1, f2), jnp.minimum(f3, f4))
        mx = jnp.maximum(jnp.maximum(f1, f2), jnp.maximum(f3, f4))
        yaw_scale = jnp.clip(jnp.minimum(1.0 - mx, mn)
                             / jnp.maximum(jnp.abs(tz), 1e-6), 0.0, 1.0)
        ytz = tz * yaw_scale
        c1 = jnp.clip(f1 - ytz, 0.0, 1.0)
        c2 = jnp.clip(f2 - ytz, 0.0, 1.0)
        c3 = jnp.clip(f3 + ytz, 0.0, 1.0)
        c4 = jnp.clip(f4 + ytz, 0.0, 1.0)

        # first post-reset step applies zero thrust (hovering.py:268)
        alive = 1.0 - rstf
        c1, c2, c3, c4 = c1 * alive, c2 * alive, c3 * alive, c4 * alive

        # first-order motor lag (physics/quadrotor.rotor_lag): the ACTUAL
        # rotor thrusts track the commands; rewards stay on the commands
        # like the standard path (envs pass cmds, not rotors, to _reward)
        if motor_alpha > 0.0:
            r1_ = motor_alpha * r1_ + (1.0 - motor_alpha) * c1
            r2_ = motor_alpha * r2_ + (1.0 - motor_alpha) * c2
            r3_ = motor_alpha * r3_ + (1.0 - motor_alpha) * c3
            r4_ = motor_alpha * r4_ + (1.0 - motor_alpha) * c4
        else:
            r1_, r2_, r3_, r4_ = c1, c2, c3, c4

        # ---- physics ----------------------------------------------------
        fz = (r1_ + r2_ + r3_ + r4_) * ts_
        # f_world = R(q) @ (0, 0, fz)
        a_ = 2.0 * qw_ * qw_ - 1.0
        fwx = 2.0 * qw_ * (qy_ * fz) + 2.0 * qx_ * (qz_ * fz)
        fwy = 2.0 * qw_ * (-qx_ * fz) + 2.0 * qy_ * (qz_ * fz)
        fwz = a_ * fz + 2.0 * qz_ * (qz_ * fz)
        vx = vx + _DT * (fwx / mass)
        vy = vy + _DT * (fwy / mass)
        vz = vz + _DT * (fwz / mass - g)

        # body torques: arm moments + yaw reaction (hovering.py:256-277)
        tbx = ts_ * L * (-r1_ + r2_ + r3_ - r4_)
        tby = -ts_ * L * (r1_ - r2_ + r3_ - r4_)
        tbz = tq * (-r1_ - r2_ + r3_ + r4_)
        gyx = wby * (izz * wbz) - wbz * (iyy * wby)
        gyy = wbz * (ixx * wbx) - wbx * (izz * wbz)
        gyz = wbx * (iyy * wby) - wby * (ixx * wbx)
        wbx_n = wbx + _DT * (tbx - gyx) / ixx
        wby_n = wby + _DT * (tby - gyy) / iyy
        wbz_n = wbz + _DT * (tbz - gyz) / izz

        # quat exp-map integration
        wn = jnp.sqrt(wbx_n * wbx_n + wby_n * wby_n + wbz_n * wbz_n)
        half = 0.5 * _DT * wn
        sinc = jnp.where(half < 1e-8, 1.0, jnp.sin(half)
                         / jnp.maximum(half, 1e-8))
        k_ = 0.5 * _DT * sinc
        dx, dy, dz, dw = k_ * wbx_n, k_ * wby_n, k_ * wbz_n, jnp.cos(half)
        nqx = qw_ * dx + qx_ * dw + qy_ * dz - qz_ * dy
        nqy = qw_ * dy + qy_ * dw + qz_ * dx - qx_ * dz
        nqz = qw_ * dz + qz_ * dw + qx_ * dy - qy_ * dx
        nqw = qw_ * dw - qx_ * dx - qy_ * dy - qz_ * dz
        qn = jax.lax.rsqrt(nqx * nqx + nqy * nqy + nqz * nqz + nqw * nqw)
        qx, qy, qz, qw = nqx * qn, nqy * qn, nqz * qn, nqw * qn

        px_ = px_ + _DT * vx
        py_ = py_ + _DT * vy
        pz_ = pz_ + _DT * vz

        # w_world = R(q_new) @ w_body_new
        def rot_fwd(ax_, ay_, az_):
            a2_ = 2.0 * qw * qw - 1.0
            cx_ = qy * az_ - qz * ay_
            cy_ = qz * ax_ - qx * az_
            cz_ = qx * ay_ - qy * ax_
            d = qx * ax_ + qy * ay_ + qz * az_
            return (a2_ * ax_ + 2.0 * qw * cx_ + 2.0 * d * qx,
                    a2_ * ay_ + 2.0 * qw * cy_ + 2.0 * d * qy,
                    a2_ * az_ + 2.0 * qw * cz_ + 2.0 * d * qz)

        wx, wy, wz = rot_fwd(wbx_n, wby_n, wbz_n)
        prog = prog + 1.0

        # ---- reward (hovering.py:371-459, target = identity/origin) ----
        effort_r = 0.1 * (4.0 - (c1 + c2 + c3 + c4)) / 4.0
        d0, d1, d2, d3 = a0 - pa0, a1 - pa1, a2 - pa2, a3 - pa3
        dn = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
        cont_r = 0.2 * jnp.exp(-dn) + 0.5 / (1.0 + (3.0 * d3) ** 2)
        thrust_r = 0.1 * (1.0 - jnp.abs(0.1533 - a3))
        pa0, pa1, pa2, pa3 = (a0 * jnp.ones_like(pa0),
                              a1 * jnp.ones_like(pa1),
                              a2 * jnp.ones_like(pa2),
                              a3 * jnp.ones_like(pa3))

        dist = jnp.sqrt(px_ * px_ + py_ * py_ + pz_ * pz_)
        pos_r = 0.7 / (1.0 + (1.6 * dist) ** 2)

        vn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        dot = (-px_ * vx - py_ * vy - pz_ * vz) / jnp.maximum(
            dist * vn, 1e-6)
        angle = jnp.abs(tm.acos(jnp.clip(dot, -1.0, 1.0)))
        veldir_r = 0.1 * jnp.exp(-angle / np.pi)

        # XYZ-euler yaw (pytorch3d convention): c = atan2(-m01, m00)
        m00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        m01 = 2.0 * (qx * qy - qw * qz)
        yawang = tm.atan2(-m01, m00)
        yaw_r = 1.0 / (1.0 + (3.0 * yawang / np.pi) ** 2)

        spin = wz * wz
        spin_r = 1.0 / (1.0 + (3.0 * spin) ** 2)
        ups_z = 1.0 - 2.0 * (qx * qx + qy * qy)
        ups_r = ((ups_z + 1.0) * 0.5) ** 2

        reward = (cont_r + effort_r + thrust_r + pos_r
                  + pos_r * (veldir_r + ups_r + spin_r + yaw_r))
        rew_sum = rew_sum + reward

        # ---- termination + timeout + randomized reset -------------------
        die = (dist > 4.0) | (pz_ < -2.0) | (pz_ > 2.0) | (ups_z < 0.0)
        reset = die | (prog >= _HOVER_MAX_LEN - 1)
        rstf = reset.astype(jnp.float32)
        keep = 1.0 - rstf

        # per-step key from the traced loop index: each step draws fresh
        # randomness (a python-side counter would be trace-time constant)
        step_key = base_seed ^ ((step_i.astype(jnp.uint32)
                                 + jnp.uint32(1)) * jnp.uint32(0x9E3779B1))
        draw = _make_uniform(step_key, shape)
        u = lambda: draw() * 2.0 - 1.0             # U(-1, 1)
        npx, npy, npz = u(), u(), u()
        ax_ = 0.01 * np.pi * u()
        ay_ = 0.01 * np.pi * u()
        az_ = 0.05 * np.pi * u()
        rqx, rqy, rqz, rqw = _quat_from_euler(ax_, ay_, az_)
        nvx, nvy, nvz = 0.5 * u(), 0.5 * u(), 0.5 * u()
        nwx, nwy, nwz = 0.2 * u(), 0.2 * u(), 0.2 * u()

        def mix(old, new):
            return old * keep + new * rstf

        px_, py_, pz_ = mix(px_, npx), mix(py_, npy), mix(pz_, npz)
        qx, qy, qz, qw = mix(qx, rqx), mix(qy, rqy), mix(qz, rqz), \
            mix(qw, rqw)
        vx, vy, vz = mix(vx, nvx), mix(vy, nvy), mix(vz, nvz)
        wx, wy, wz = mix(wx, nwx), mix(wy, nwy), mix(wz, nwz)
        rix, riy, riz = rix * keep, riy * keep, riz * keep
        prx, pry, prz = prx * keep, pry * keep, prz * keep
        pa0, pa1, pa2, pa3 = pa0 * keep, pa1 * keep, pa2 * keep, \
            pa3 * keep
        r1_, r2_, r3_, r4_ = (r1_ * keep, r2_ * keep, r3_ * keep,
                              r4_ * keep)
        prog = prog * keep

        return (px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
                rix, riy, riz, prx, pry, prz, prog, rstf,
                pa0, pa1, pa2, pa3, r1_, r2_, r3_, r4_, rew_sum)

    state = jax.lax.fori_loop(0, steps, body, state)

    (px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
     rix, riy, riz, prx, pry, prz, prog, rstf,
     pa0, pa1, pa2, pa3, r1_, r2_, r3_, r4_, rew_sum) = state

    flat = lambda x: x.reshape(TILE)
    for i, val in enumerate([px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz,
                             wx, wy, wz, rix, riy, riz, prx, pry, prz,
                             prog, rstf, pa0, pa1, pa2, pa3,
                             r1_, r2_, r3_, r4_]):
        out_ref[i] = flat(val)
    rew_ref[0] = flat(rew_sum)


@functools.partial(jax.jit, static_argnames=("steps", "interpret",
                                             "motor_alpha"))
def rollout_fused(packed: jnp.ndarray, action: jnp.ndarray, seed,
                  steps: int, interpret: bool = False,
                  motor_alpha: float = 0.0):
    """[40, N] packed state + remapped rate action [4] -> (new packed
    state, per-env reward sums [N]) after ``steps`` fused env steps.

    motor_alpha = exp(-dt/motor_tau) threads the first-order motor lag
    through the kernel (0.0 = instantaneous thrust, reference parity)."""
    n = packed.shape[1]
    assert n % TILE == 0, f"N must be a multiple of {TILE}"
    grid = (n // TILE,)
    kernel = functools.partial(_kernel, steps=steps,
                               motor_alpha=motor_alpha)
    out, rews = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # seed [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),     # action [4]
            pl.BlockSpec((_F, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_F, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_F, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,
    )(seed, action, packed)
    return out, rews[0]
