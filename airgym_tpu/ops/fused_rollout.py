"""Fused PPO rollout kernel: policy + env, one Pallas kernel.

Extends ops/fused_hovering.py with the actor-critic INSIDE the kernel:
per step, the hovering observation (noised, target-relative) is
normalized with the running stats, pushed through the [64,128,64] elu MLP
+ mu/value heads on the MXU, a Gaussian action is sampled (Box-Muller
over the in-kernel hash RNG), the action drives the PX4 rate cascade +
physics + reward + reset, and everything PPO's update needs (obs,
actions, neglogp, value, mu, reward, done, timeout) streams to HBM once.

The XLA rollout dispatches 2 x horizon kernels (policy, env) with the
carry bouncing through HBM every step; here state lives in VMEM for the
whole horizon. rl/ppo.FusedHoveringPPO drops this in as the rollout for
hovering/rate and leaves GAE + updates unchanged; the test suite checks
the fused trainer optimizes the same objective (reward climbs like the
standard trainer's).

Weights layout (field-major [features_out, features_in] transposed for
W^T @ X matmuls on [F, TILE] activations): packed on the host by
``pack_policy``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airgym_tpu.ops import fused_hovering as fhov
from airgym_tpu.ops import transcendental as tm

TILE = fhov.TILE
_F = fhov._F
_DT = 0.01
_MAX_LEN = fhov._HOVER_MAX_LEN
_P = fhov._P
_G = fhov._G

OBS = 18
ACT = 4
H0, H1, H2 = 64, 128, 64
# per-step record streamed to HBM: obs(OBS) act(4) nlp(1) value(1) mu(4)
# reward(1) done(1) timeout(1) = OBS + 13 rows
REC = 31

# tracking: 18-dim state + 10 future lemniscate points x 3 (tracking.py)
_TASK_OBS = {"hovering": 18, "balloon": 18, "tracking": 48}


def rec_len(task: str = "hovering") -> int:
    return _TASK_OBS[task] + 13


class PolicyPack(NamedTuple):
    w0: jnp.ndarray      # [H0, OBS]
    b0: jnp.ndarray      # [H0, 1]
    w1: jnp.ndarray      # [H1, H0]
    b1: jnp.ndarray
    w2: jnp.ndarray      # [H2, H1]
    b2: jnp.ndarray
    wmu: jnp.ndarray     # [ACT, H2]
    bmu: jnp.ndarray
    wv: jnp.ndarray      # [1, H2]
    bv: jnp.ndarray
    logstd: jnp.ndarray  # [ACT, 1]
    obs_mean: jnp.ndarray  # [OBS, 1]
    obs_istd: jnp.ndarray  # [OBS, 1] = 1/sqrt(var + 1e-5)


def pack_policy(params, obs_rms) -> PolicyPack:
    p = params["params"]
    mlp = p["actor_mlp"]
    t = lambda a: jnp.asarray(a, jnp.float32)
    col = lambda a: t(a).reshape(-1, 1)
    return PolicyPack(
        w0=t(mlp["Dense_0"]["kernel"]).T, b0=col(mlp["Dense_0"]["bias"]),
        w1=t(mlp["Dense_1"]["kernel"]).T, b1=col(mlp["Dense_1"]["bias"]),
        w2=t(mlp["Dense_2"]["kernel"]).T, b2=col(mlp["Dense_2"]["bias"]),
        wmu=t(p["mu"]["kernel"]).T, bmu=col(p["mu"]["bias"]),
        wv=t(p["value"]["kernel"]).T, bv=col(p["value"]["bias"]),
        logstd=col(p["logstd"]),
        obs_mean=col(obs_rms.mean),
        obs_istd=col(1.0 / jnp.sqrt(obs_rms.var + 1e-5)),
    )


def pack_state_balloon(core, balloon, pre_root_pos) -> jnp.ndarray:
    """Balloon task: hovering's 29 rows (incl. rotor state at 25:29) +
    balloon pos (29:32) + pre_root_pos (32:35) in the same [40, N]
    record."""
    s = fhov.pack_state(core)
    s = s.at[29:32].set(balloon[:, 0:3].T)
    s = s.at[32:35].set(pre_root_pos.T)
    return s


# task-specific episode lengths (episode_length_s / dt)
_TASK_MAX_LEN = {"hovering": _MAX_LEN, "balloon": 800, "tracking": 3600}


def _kernel(seed_ref, s_ref,
            w0_r, b0_r, w1_r, b1_r, w2_r, b2_r, wmu_r, bmu_r, wv_r, bv_r,
            logstd_r, obs_mean_r, obs_istd_r,
            out_ref, traj_ref, *, steps: int, obs_noise: bool,
            task: str = "hovering", motor_alpha: float = 0.0):
    w0, b0, w1, b1 = w0_r[...], b0_r[...], w1_r[...], b1_r[...]
    w2, b2, wmu, bmu = w2_r[...], b2_r[...], wmu_r[...], bmu_r[...]
    wv, bv, logstd = wv_r[...], bv_r[...], logstd_r[...]
    obs_mean, obs_istd = obs_mean_r[...], obs_istd_r[...]
    t_id = pl.program_id(0)
    base_seed = (seed_ref[0].astype(jnp.uint32)
                 + jnp.uint32(t_id) * jnp.uint32(0x01000193))
    # all per-env fields stay (1, TILE) rows: no (8,128) relayouts around
    # the MXU matmuls (mixed layouts crashed the Mosaic compiler)
    shape = (1, TILE)
    LOG2PI = float(np.log(2.0 * np.pi))

    def F(i):
        return s_ref[i].reshape(shape)

    n_rows = 35 if task == "balloon" else 29
    st = tuple(F(i) for i in range(n_rows))
    max_len = _TASK_MAX_LEN[task]

    mass, g = _P.mass, _P.gravity
    ixx, iyy, izz = _P.inertia_diag
    ts_, tq = _P.thrust_scale, _P.torque_scale
    L = _P.rotor_pos[0][0]
    kp, ki, kd = _G.rate_p, _G.rate_i, _G.rate_d

    # keep everything 2D: 1D slices / scalar extraction from VMEM values
    # crash the Mosaic compiler
    sig2 = jnp.exp(logstd)                 # [ACT, 1]
    lsum2 = jnp.sum(logstd, axis=(0, 1), keepdims=True)   # [1, 1]

    def body(step_i, st):
        (px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
         rix, riy, riz, prx, pry, prz, prog, rstf,
         pa0, pa1, pa2, pa3) = st[:25]
        r1_, r2_, r3_, r4_ = st[25:29]
        if task == "balloon":
            bx, by, bz, ppx, ppy, ppz = st[29:35]

        step_key = base_seed ^ ((step_i.astype(jnp.uint32)
                                 + jnp.uint32(1)) * jnp.uint32(0x9E3779B1))
        draw = fhov._make_uniform(step_key, shape)

        def normal():
            u1 = jnp.clip(draw(), 1e-7, 1.0)
            u2 = draw()
            return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                2.0 * np.pi * u2)

        # ---- observation (hovering.py:337-358, target identity/origin) --
        m00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        m01 = 2.0 * (qx * qy - qw * qz)
        m02 = 2.0 * (qx * qz + qw * qy)
        m10 = 2.0 * (qx * qy + qw * qz)
        m11 = 1.0 - 2.0 * (qx * qx + qz * qz)
        m12 = 2.0 * (qy * qz - qw * qx)
        m20 = 2.0 * (qx * qz - qw * qy)
        m21 = 2.0 * (qy * qz + qw * qx)
        m22 = 1.0 - 2.0 * (qx * qx + qy * qy)
        if task == "balloon":
            # balloon.py:132-145: pos relative to the balloon (its quat
            # is identity so the rot-difference part matches hovering's)
            op0, op1, op2 = px_ - bx, py_ - by, pz_ - bz
        else:
            op0, op1, op2 = px_, py_, pz_
        # tracking obs is NOT target-relative (tracking.py:194-214): no
        # identity subtraction on the rotation block
        diag = 0.0 if task == "tracking" else 1.0
        obs_f = [m00 - diag, m01, m02, m10, m11 - diag, m12, m20, m21,
                 m22 - diag, op0, op1, op2, vx, vy, vz, wx, wy, wz]
        if obs_noise:
            for i_ in range(9):
                obs_f[i_] = obs_f[i_] + 1e-3 * normal()
            for i_ in range(9, 12):
                obs_f[i_] = obs_f[i_] + 5e-3 * normal()
            for i_ in range(12, 15):
                obs_f[i_] = obs_f[i_] + 2e-2 * normal()
            for i_ in range(15, 18):
                obs_f[i_] = obs_f[i_] + 4e-1 * normal()
        if task == "tracking":
            # 10 future lemniscate points, drone-relative, noise-free
            # (tracking.py ref_trajectory; traj_scale 0.25, stride 5)
            for i_ in range(10):
                t_ref = (prog + float(i_ * 5)) * (_DT * 0.25)
                st_, ct_ = jnp.sin(t_ref), jnp.cos(t_ref)
                den = 1.0 + ct_ * ct_
                obs_f.append(3.0 * st_ / den - px_)
                obs_f.append(3.0 * st_ * ct_ / den - py_)
                obs_f.append(1.0 - pz_)

        # [OBS, TILE] matrix for the MXU
        X = jnp.concatenate([o.reshape(1, TILE) for o in obs_f], axis=0)
        Xn = jnp.clip((X - obs_mean) * obs_istd, -5.0, 5.0)

        def elu(z):
            return jnp.where(z > 0.0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)

        h = elu(jnp.dot(w0, Xn, preferred_element_type=jnp.float32) + b0)
        h = elu(jnp.dot(w1, h, preferred_element_type=jnp.float32) + b1)
        h = elu(jnp.dot(w2, h, preferred_element_type=jnp.float32) + b2)
        mu = jnp.dot(wmu, h, preferred_element_type=jnp.float32) + bmu
        value = jnp.dot(wv, h, preferred_element_type=jnp.float32) + bv

        # ---- sample + neglogp (models/actor_critic.neglogp) -------------
        eps = [normal().reshape(1, TILE) for _ in range(ACT)]
        act_rows = [mu[k:k + 1] + sig2[k:k + 1] * eps[k]
                    for k in range(ACT)]
        nlp = (0.5 * sum(jnp.square(eps[k]) for k in range(ACT))
               + 0.5 * LOG2PI * ACT + lsum2)

        # env consumes clamp(action, -1, 1) then the rate/thrust remap
        a_env = [jnp.clip(act_rows[k], -1.0, 1.0).reshape(shape)
                 for k in range(ACT)]
        if task == "balloon":
            # NARROW_RATE_LIMITS (customized.py:109-114): rates +-1
            rate_lim = 1.0
        else:
            rate_lim = 6.0
        a0r, a1r, a2r = (jnp.clip(a_env[0], -rate_lim, rate_lim),
                         jnp.clip(a_env[1], -rate_lim, rate_lim),
                         jnp.clip(a_env[2], -rate_lim, rate_lim))
        a3r = jnp.clip(0.5 + 0.5 * a_env[3], 0.0, 1.0)

        # ---- controller + physics + reward + reset (as fused_hovering) --
        flip = jnp.where(qw < 0.0, -1.0, 1.0)
        qx_, qy_, qz_, qw_ = qx * flip, qy * flip, qz * flip, qw * flip

        def rot_inv(ax_, ay_, az_):
            a = 2.0 * qw_ * qw_ - 1.0
            cx_ = -qy_ * az_ + qz_ * ay_
            cy_ = -qz_ * ax_ + qx_ * az_
            cz_ = -qx_ * ay_ + qy_ * ax_
            d = -(qx_ * ax_ + qy_ * ay_ + qz_ * az_)
            return (a * ax_ + 2.0 * qw_ * cx_ - 2.0 * d * qx_,
                    a * ay_ + 2.0 * qw_ * cy_ - 2.0 * d * qy_,
                    a * az_ + 2.0 * qw_ * cz_ - 2.0 * d * qz_)

        wbx, wby, wbz = rot_inv(wx, wy, wz)

        def pid(err, integ, wprev, wnow, kp_, ki_, kd_):
            integ = jnp.clip(integ + err * _DT * ki_,
                             -_G.rate_int_lim, _G.rate_int_lim)
            d = -(wnow - wprev) / _DT * kd_
            return jnp.clip(kp_ * err + integ + d,
                            -_G.torque_lim, _G.torque_lim), integ

        tx, rix = pid(a0r - wbx, rix, prx, wbx, kp[0], ki[0], kd[0])
        ty, riy = pid(a1r - wby, riy, pry, wby, kp[1], ki[1], kd[1])
        tz, riz = pid(a2r - wbz, riz, prz, wbz, kp[2], ki[2], kd[2])
        prx, pry, prz = wbx, wby, wbz

        thrust = a3r
        f1, f2, f3, f4 = (thrust - tx - ty, thrust + tx + ty,
                          thrust + tx - ty, thrust - tx + ty)
        mn = jnp.minimum(jnp.minimum(f1, f2), jnp.minimum(f3, f4))
        mx = jnp.maximum(jnp.maximum(f1, f2), jnp.maximum(f3, f4))
        shift = jnp.maximum(0.0, -mn) - jnp.maximum(0.0, mx - 1.0)
        f1, f2, f3, f4 = f1 + shift, f2 + shift, f3 + shift, f4 + shift
        mn = jnp.minimum(jnp.minimum(f1, f2), jnp.minimum(f3, f4))
        mx = jnp.maximum(jnp.maximum(f1, f2), jnp.maximum(f3, f4))
        ysc = jnp.clip(jnp.minimum(1.0 - mx, mn)
                       / jnp.maximum(jnp.abs(tz), 1e-6), 0.0, 1.0)
        ytz = tz * ysc
        c1 = jnp.clip(f1 - ytz, 0.0, 1.0)
        c2 = jnp.clip(f2 - ytz, 0.0, 1.0)
        c3 = jnp.clip(f3 + ytz, 0.0, 1.0)
        c4 = jnp.clip(f4 + ytz, 0.0, 1.0)
        alive = 1.0 - rstf
        c1, c2, c3, c4 = c1 * alive, c2 * alive, c3 * alive, c4 * alive

        # first-order motor lag (physics/quadrotor.rotor_lag): physics
        # consumes the ACTUAL rotor thrusts; rewards stay on the commands
        # like the standard path
        if motor_alpha > 0.0:
            r1_ = motor_alpha * r1_ + (1.0 - motor_alpha) * c1
            r2_ = motor_alpha * r2_ + (1.0 - motor_alpha) * c2
            r3_ = motor_alpha * r3_ + (1.0 - motor_alpha) * c3
            r4_ = motor_alpha * r4_ + (1.0 - motor_alpha) * c4
        else:
            r1_, r2_, r3_, r4_ = c1, c2, c3, c4

        fz = (r1_ + r2_ + r3_ + r4_) * ts_
        a_ = 2.0 * qw_ * qw_ - 1.0
        fwx = 2.0 * qw_ * (qy_ * fz) + 2.0 * qx_ * (qz_ * fz)
        fwy = 2.0 * qw_ * (-qx_ * fz) + 2.0 * qy_ * (qz_ * fz)
        fwz = a_ * fz + 2.0 * qz_ * (qz_ * fz)
        vx = vx + _DT * (fwx / mass)
        vy = vy + _DT * (fwy / mass)
        vz = vz + _DT * (fwz / mass - g)

        tbx = ts_ * L * (-r1_ + r2_ + r3_ - r4_)
        tby = -ts_ * L * (r1_ - r2_ + r3_ - r4_)
        tbz = tq * (-r1_ - r2_ + r3_ + r4_)
        gyx = wby * (izz * wbz) - wbz * (iyy * wby)
        gyy = wbz * (ixx * wbx) - wbx * (izz * wbz)
        gyz = wbx * (iyy * wby) - wby * (ixx * wbx)
        wbx_n = wbx + _DT * (tbx - gyx) / ixx
        wby_n = wby + _DT * (tby - gyy) / iyy
        wbz_n = wbz + _DT * (tbz - gyz) / izz

        wn = jnp.sqrt(wbx_n * wbx_n + wby_n * wby_n + wbz_n * wbz_n)
        half = 0.5 * _DT * wn
        sinc = jnp.where(half < 1e-8, 1.0,
                         jnp.sin(half) / jnp.maximum(half, 1e-8))
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

        ups_z = 1.0 - 2.0 * (qx * qx + qy * qy)
        if task == "hovering":
            effort_r = 0.1 * (4.0 - (c1 + c2 + c3 + c4)) / 4.0
            d0, d1, d2, d3 = a0r - pa0, a1r - pa1, a2r - pa2, a3r - pa3
            dn = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
            cont_r = 0.2 * jnp.exp(-dn) + 0.5 / (1.0 + (3.0 * d3) ** 2)
            thrust_r = 0.1 * (1.0 - jnp.abs(0.1533 - a3r))

            dist = jnp.sqrt(px_ * px_ + py_ * py_ + pz_ * pz_)
            pos_r = 0.7 / (1.0 + (1.6 * dist) ** 2)
            vn2 = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            dot = (-px_ * vx - py_ * vy - pz_ * vz) / jnp.maximum(
                dist * vn2, 1e-6)
            angle = jnp.abs(tm.acos(jnp.clip(dot, -1.0, 1.0)))
            veldir_r = 0.1 * jnp.exp(-angle / np.pi)
            nm00 = 1.0 - 2.0 * (qy * qy + qz * qz)
            nm01 = 2.0 * (qx * qy - qw * qz)
            yawang = tm.atan2(-nm01, nm00)
            yaw_r = 1.0 / (1.0 + (3.0 * yawang / np.pi) ** 2)
            spin = wz * wz
            spin_r = 1.0 / (1.0 + (3.0 * spin) ** 2)
            ups_r = ((ups_z + 1.0) * 0.5) ** 2

            reward = (cont_r + effort_r + thrust_r + pos_r
                      + pos_r * (veldir_r + ups_r + spin_r + yaw_r))
            die = (dist > 4.0) | (pz_ < -2.0) | (pz_ > 2.0) | (ups_z < 0.0)
        elif task == "tracking":           # tracking.py:223-296, rate mode
            effort_r = 0.1 * (4.0 - (c1 + c2 + c3 + c4)) / 4.0
            d0, d1, d2, d3 = a0r - pa0, a1r - pa1, a2r - pa2, a3r - pa3
            dn = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
            cont_r = 0.1 * jnp.exp(-dn) + 0.5 / (1.0 + (2.0 * d3) ** 2)
            thrust_r = 0.1 * (1.0 - jnp.abs(0.1533 - a3r))

            # current reference point at the (incremented) progress
            t_ref = prog * (_DT * 0.25)
            st_, ct_ = jnp.sin(t_ref), jnp.cos(t_ref)
            den = 1.0 + ct_ * ct_
            rfx = 3.0 * st_ / den
            rfy = 3.0 * st_ * ct_ / den
            ex, ey, ez = rfx - px_, rfy - py_, 1.0 - pz_
            dist = jnp.sqrt(ex * ex + ey * ey + ez * ez)
            dist_r = 1.0 / (1.0 + (1.8 * dist) ** 2)

            nm00 = 1.0 - 2.0 * (qy * qy + qz * qz)
            nm01 = 2.0 * (qx * qy - qw * qz)
            yawang = tm.atan2(-nm01, nm00)
            yaw_r = 1.0 / (1.0 + (4.0 * yawang / np.pi) ** 2)
            spin = wz * wz
            spin_r = 1.0 / (1.0 + (2.0 * spin) ** 2)
            ups_r = ((ups_z + 1.0) * 0.5) ** 2

            reward = (cont_r + effort_r + thrust_r + dist_r
                      + dist_r * (spin_r + yaw_r + ups_r))
            die = dist > 1.0
        else:                              # balloon (balloon.py:125-170)
            relx, rely, relz = bx - px_, by - py_, bz - pz_
            check = jnp.sqrt(relx * relx + rely * rely + relz * relz)
            dir_yaw = tm.atan2(rely, relx)
            nm00 = 1.0 - 2.0 * (qy * qy + qz * qz)
            nm01 = 2.0 * (qx * qy - qw * qz)
            yawang = tm.atan2(-nm01, nm00)
            dyaw = yawang - dir_yaw
            wrapped = tm.atan2(jnp.sin(dyaw), jnp.cos(dyaw))
            yaw_r = 1.0 / (1.0 + (1.6 * jnp.abs(wrapped)) ** 2)

            dpx, dpy, dpz = bx - ppx, by - ppy, bz - ppz
            guidance_r = 30.0 * (jnp.sqrt(dpx * dpx + dpy * dpy
                                          + dpz * dpz) - check)
            ups_r = 0.5 * ((ups_z + 1.0) * 0.5) ** 2
            hit = check < 0.1
            hit_r = 800.0 * hit.astype(jnp.float32)
            effort_r = 0.1 * jnp.exp(-(a0r * a0r + a1r * a1r
                                       + a2r * a2r + a3r * a3r))
            d0, d1, d2, d3 = a0r - pa0, a1r - pa1, a2r - pa2, a3r - pa3
            smooth_r = 0.1 * jnp.exp(-jnp.sqrt(
                d0 * d0 + d1 * d1 + d2 * d2 + d3 * d3))
            reward = (guidance_r + yaw_r + hit_r + smooth_r + ups_r
                      + effort_r)
            # kill rules (:193-215) + ground collision
            # (reset_on_collision, base sphere 0.2 m)
            die = ((relx < -0.2) | (vx < 0.0) | (check > 4.0)
                   | (pz_ < 0.5) | (pz_ > 1.5) | hit | (pz_ < 0.2))
            # update pre_root_pos AFTER the reward (balloon.py step order);
            # zeroed below on reset
            ppx, ppy, ppz = px_, py_, pz_
        pa0, pa1, pa2, pa3 = a0r, a1r, a2r, a3r
        timeout = (prog >= max_len - 1) & ~die
        reset = die | (prog >= max_len - 1)
        new_rstf = reset.astype(jnp.float32)

        # ---- stream the step record to HBM ------------------------------
        row = lambda x: x.reshape(1, TILE)
        rec = jnp.concatenate(
            [X]                                   # raw obs [18, TILE]
            + [act_rows[k] for k in range(ACT)]   # unclamped actions
            + [row(nlp), value[0:1]]
            + [mu[k:k + 1] for k in range(ACT)]
            + [row(reward), row(new_rstf),
               row(timeout.astype(jnp.float32))], axis=0)
        traj_ref[step_i] = rec

        keep = 1.0 - new_rstf
        u = lambda: draw() * 2.0 - 1.0
        if task == "balloon":
            # balloon.py:85-103 (one-sided positive pitch) + balloon
            # resample at reset
            npx, npy = 0.1 * u(), 0.1 * u()
            npz = 1.0 + 0.2 * u()
            rqx, rqy, rqz, rqw = fhov._quat_from_euler(
                0.1 * np.pi * u(), 0.1 * np.pi * draw(),
                0.2 * np.pi * u())
            nvx, nvy, nvz = 0.5 * u(), 0.5 * u(), 0.5 * u()
            nwx, nwy, nwz = 0.2 * u(), 0.2 * u(), 0.2 * u()
            nbx = 2.5 + 0.5 * u()
            nby = 2.0 * u()
            nbz = 1.0 + 0.3 * u()
        elif task == "tracking":           # tracking.py:168-186
            npx, npy = 0.1 * u(), 0.1 * u()
            npz = 1.0 + 0.1 * u()
            rqx, rqy, rqz, rqw = fhov._quat_from_euler(
                0.1 * np.pi * u(), 0.1 * np.pi * u(), 0.2 * np.pi * u())
            nvx, nvy, nvz = 0.5 * u(), 0.5 * u(), 0.5 * u()
            nwx, nwy, nwz = 0.2 * u(), 0.2 * u(), 0.2 * u()
        else:
            npx, npy, npz = u(), u(), u()
            rqx, rqy, rqz, rqw = fhov._quat_from_euler(
                0.01 * np.pi * u(), 0.01 * np.pi * u(), 0.05 * np.pi * u())
            nvx, nvy, nvz = 0.5 * u(), 0.5 * u(), 0.5 * u()
            nwx, nwy, nwz = 0.2 * u(), 0.2 * u(), 0.2 * u()

        def mix(old, new):
            return old * keep + new * new_rstf

        px_, py_, pz_ = mix(px_, npx), mix(py_, npy), mix(pz_, npz)
        qx, qy, qz, qw = (mix(qx, rqx), mix(qy, rqy), mix(qz, rqz),
                          mix(qw, rqw))
        vx, vy, vz = mix(vx, nvx), mix(vy, nvy), mix(vz, nvz)
        wx, wy, wz = mix(wx, nwx), mix(wy, nwy), mix(wz, nwz)
        rix, riy, riz = rix * keep, riy * keep, riz * keep
        prx, pry, prz = prx * keep, pry * keep, prz * keep
        pa0, pa1, pa2, pa3 = (pa0 * keep, pa1 * keep, pa2 * keep,
                              pa3 * keep)
        r1_, r2_, r3_, r4_ = (r1_ * keep, r2_ * keep, r3_ * keep,
                              r4_ * keep)
        prog = prog * keep

        out_rows = (px_, py_, pz_, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
                    rix, riy, riz, prx, pry, prz, prog, new_rstf,
                    pa0, pa1, pa2, pa3, r1_, r2_, r3_, r4_)
        if task == "balloon":
            bx2, by2, bz2 = mix(bx, nbx), mix(by, nby), mix(bz, nbz)
            out_rows = out_rows + (bx2, by2, bz2,
                                   ppx * keep, ppy * keep, ppz * keep)
        return out_rows

    st = jax.lax.fori_loop(0, steps, body, st)

    flat = lambda x: x.reshape(TILE)
    for i in range(n_rows):
        out_ref[i] = flat(st[i])


@functools.partial(jax.jit,
                   static_argnames=("steps", "obs_noise", "interpret",
                                    "task", "motor_alpha"))
def rollout_fused_policy(packed, pack: PolicyPack, seed, steps: int,
                         obs_noise: bool = True, interpret: bool = False,
                         task: str = "hovering", motor_alpha: float = 0.0):
    """[40, N] packed env state + policy weights -> (new packed state,
    trajectory [steps, REC, N]).

    motor_alpha = exp(-dt/motor_tau) threads the first-order motor lag
    through the kernel (0.0 = instantaneous thrust, reference parity)."""
    n = packed.shape[1]
    assert n % TILE == 0
    grid = (n // TILE,)
    kernel = functools.partial(_kernel, steps=steps, obs_noise=obs_noise,
                               task=task, motor_alpha=motor_alpha)
    rec = rec_len(task)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
    out, traj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((_F, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)]
        + wspecs,
        out_specs=(
            pl.BlockSpec((_F, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, rec, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_F, n), jnp.float32),
            jax.ShapeDtypeStruct((steps, rec, n), jnp.float32),
        ),
        interpret=interpret,
    )(seed, packed, *pack)
    return out, traj
