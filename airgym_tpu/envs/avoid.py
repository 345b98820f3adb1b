"""Avoid task — TPU-native port of reference airgym/envs/task/avoid.py.

Hold position at (0, 0, 1) while dodging a cube thrown at the drone.
Obs = {image [N,1,212,120] depth, observation [N,16]} where the state part
is local-frame (yaw-aligned): pos-target, euler_local, vel_local,
angvel_local, actions (avoid.py:203-226). The cube launch solves the
ballistic intercept (avoid.py:58-89): 80% of resets throw from radius
4.2 m, theta ~ +-30 deg, z 1.4 at 4.5 m/s horizontal toward a point near
the drone; 20% park the cube at (-999,-999,0). Collision (cube within the
0.2 m body sphere or ground contact) gives alive -500 and resets
(reset_on_collision=True, avoid_config.py:19). Episode 6 s.

The cube is a free rigid body in PhysX; here it integrates ballistically
(physics/quadrotor.ballistic_step) and rests once it reaches the ground —
by then the episode outcome is already decided.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.envs import base
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import quadrotor as qd
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr


@dataclasses.dataclass(frozen=True)
class AvoidCfg(base.BaseEnvCfg):
    num_envs: int = 64
    episode_length_s: float = 6.0
    reset_on_collision: bool = True
    create_ground_plane: bool = True
    cam_dt: float = 0.04
    # depth camera resolution (reference customized_config.py camera
    # block: 212x120); override for cheaper CI cameras or other sensors
    cam_width: int = 212
    cam_height: int = 120
    target_pos: tuple = (0.0, 0.0, 1.0)   # target_state[9:12], avoid_config
    enable_onboard_cameras: bool = True

    @property
    def cam_every(self) -> int:
        return int(round(self.cam_dt / self.dt))


class AvoidState(NamedTuple):
    core: base.EnvState
    obj: jnp.ndarray              # [N, 13] cube root states
    camera: jnp.ndarray           # [N, 1, W, H] last rendered depth
    counter: jnp.ndarray          # global step counter (camera cadence)
    pre_root_pos: jnp.ndarray


def yaw_deroll_matrix(q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """world->local rotation Rz(yaw)^T (reference avoid.py:208-218)."""
    m = rot.quat_to_matrix(q_xyzw)
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    w2l = jnp.stack([c, s, z, -s, c, z, z, z, o],
                    axis=-1).reshape(q_xyzw.shape[:-1] + (3, 3))
    return w2l, m


def local_state_obs(root: jnp.ndarray, target_pos, actions) -> jnp.ndarray:
    """16-dim local-frame state obs shared by Avoid (and the
    pos-target-relative variant; Planning overrides channel 0:3)."""
    w2l, m_global = yaw_deroll_matrix(root[:, 3:7])
    m_local = w2l @ m_global
    euler_local = rot.matrix_to_euler_xyz(m_local)
    vel_local = jnp.einsum("nij,nj->ni", w2l, root[:, 7:10])
    angvel_local = jnp.einsum("nij,nj->ni", w2l, root[:, 10:13])
    rel = root[:, 0:3] - jnp.asarray(target_pos, root.dtype)
    return jnp.concatenate([rel, euler_local, vel_local, angvel_local,
                            actions], axis=-1)


class Avoid(base.QuadEnvCore):
    task_name = "avoid"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    num_obs = 16
    obs_is_dict = True
    # emits info["success"]: the task is achieved iff the episode reaches
    # the 6 s timeout — i.e. the drone survived the thrown cube without
    # colliding or violating the kill box (reference avoid.py:259 +
    # avoid_config.py:19 reset_on_collision)
    has_success = True

    def __init__(self, cfg: AvoidCfg = AvoidCfg(), **kw):
        super().__init__(cfg, **kw)
        self.cam_cfg = dr.CameraCfg(width=cfg.cam_width,
                                    height=cfg.cam_height)
        self.obs_spec = {
            "image": (cfg.num_envs, 1, self.cam_cfg.width,
                      self.cam_cfg.height),
            "observation": (cfg.num_envs, self.num_obs),
        }

    def initial_state(self, key) -> AvoidState:
        k0, k1, k2 = jax.random.split(key, 3)
        n = self.cfg.num_envs
        root = self._reset_root(k0, n)
        obj = self._reset_object(k1, n)
        cam = jnp.zeros((n, 1, self.cam_cfg.width, self.cam_cfg.height),
                        dtype=self.cfg.dtype)
        return AvoidState(core=self.init_core(k2, root), obj=obj,
                          camera=cam,
                          counter=jnp.asarray(0, jnp.int32),
                          pre_root_pos=jnp.zeros((n, 3)))

    # -- resets -----------------------------------------------------------

    def _reset_root(self, key, n):
        """avoid.py:127-150: xy +-0.2, z 1 +- 0.2, small tilt, zero vels."""
        kp, kz, ka = jax.random.split(key, 3)
        xy = 0.2 * jax.random.uniform(kp, (n, 2), minval=-1, maxval=1)
        z = 1.0 + 0.2 * jax.random.uniform(kz, (n, 1), minval=-1, maxval=1)
        ang = jnp.concatenate([
            0.01 * jax.random.uniform(ka, (n, 2), minval=-np.pi, maxval=np.pi),
            0.05 * jax.random.uniform(jax.random.fold_in(ka, 1), (n, 1),
                                      minval=-np.pi, maxval=np.pi)], axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        zeros = jnp.zeros((n, 6))
        return jnp.concatenate([xy, z, quat, zeros],
                               axis=-1).astype(self.cfg.dtype)

    def _reset_object(self, key, n):
        """Ballistic launch solver (avoid.py:58-126): aim at a point within
        0.3 m of (0,0,1), 4.5 m/s ground speed; 20% parked far away."""
        km, kt, ka = jax.random.split(key, 3)
        parked = jax.random.uniform(km, (n,)) >= 0.8

        theta = (np.pi / 6) * jax.random.uniform(kt, (n,), minval=-1,
                                                 maxval=1)
        r = 4.2
        pos = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta),
                         jnp.full((n,), 1.4)], axis=-1)

        aim = (jnp.array([0.0, 0.0, 1.0])
               + 0.3 * jax.random.uniform(ka, (n, 3), minval=-1, maxval=1))
        direction = aim - pos
        dist_xy = jnp.linalg.norm(direction[:, :2], axis=-1)
        unit_xy = direction[:, :2] / jnp.maximum(dist_xy[:, None], 1e-6)
        v_e = 4.5
        t = dist_xy / v_e
        v_z = (aim[:, 2] - pos[:, 2] + 0.5 * 9.81 * t * t) / t
        vel = jnp.concatenate([unit_xy * v_e, v_z[:, None]], axis=-1)

        pos = jnp.where(parked[:, None], jnp.array([-999.0, -999.0, 0.0]),
                        pos)
        vel = jnp.where(parked[:, None], 0.0, vel)

        s = jnp.zeros((n, 13), dtype=self.cfg.dtype).at[:, 6].set(1.0)
        return s.at[:, 0:3].set(pos).at[:, 7:10].set(vel)

    # -- scene ------------------------------------------------------------

    def _boxes(self, obj) -> sc.Boxes:
        spec = assets.registry.get_asset("cubes/1x1")
        n = obj.shape[0]
        return sc.Boxes(
            center=obj[:, None, 0:3],
            yaw=jnp.zeros((n, 1), obj.dtype),
            half_extents=jnp.broadcast_to(
                jnp.asarray(spec.half_extents, obj.dtype), (n, 1, 3)),
            valid=jnp.ones((n, 1), dtype=bool))

    def _render(self, root, obj, key):
        scene = dr.SceneForRender(boxes=self._boxes(obj), ground=True)
        return dr.render_and_process(self.cam_cfg, root, scene, key)

    # -- step -------------------------------------------------------------

    def step(self, state: AvoidState, actions: jnp.ndarray,
             render: Optional[bool] = None
             ) -> Tuple[AvoidState, base.StepOutput]:
        core = state.core
        cfg = self.cfg
        rng, k_cam, k_r1, k_r2 = jax.random.split(core.rng, 4)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)

        # cube ballistic flight; rests once on the ground (half extent 0.5)
        obj = qd.ballistic_step(cfg.dt, self.params.gravity, state.obj)
        grounded = obj[:, 2] <= 0.5
        obj = obj.at[:, 2].set(jnp.where(grounded, 0.5, obj[:, 2]))
        obj = obj.at[:, 7:10].set(
            jnp.where(grounded[:, None], 0.0, obj[:, 7:10]))

        counter = state.counter + 1
        progress = core.progress + 1

        # `render`: None = dynamic cadence (reference parity); True/False
        # = STATIC decision for phase-aligned rollouts (a lax.cond inside
        # a training scan executes the render branch every step on TPU)
        if render is None:
            camera = jax.lax.cond(
                counter % cfg.cam_every == 0,
                lambda: self._render(root, obj, k_cam),
                lambda: state.camera)
        elif render:
            camera = self._render(root, obj, k_cam)
        else:
            camera = state.camera

        obs_vec = local_state_obs(root, cfg.target_pos, acts)

        # collisions: cube within the 0.2 m body sphere, or ground contact
        cube_d = sc.dist_to_boxes(root[:, 0:3], self._boxes(obj))[:, 0]
        collisions = ((cube_d < assets.ROBOT_COLLISION_RADIUS)
                      | (root[:, 2] < assets.ROBOT_COLLISION_RADIUS))

        reward, die, info = self._reward(root, acts, core.pre_actions,
                                         collisions)
        die = die | collisions
        max_len = cfg.max_episode_length
        timeout = (progress >= max_len - 1) & ~die
        reset = die | (progress >= max_len - 1)
        # task achievement: survived the throw to the episode timeout
        info["success"] = timeout

        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
                             pre_actions=acts, rng=rng)
        core = self.apply_reset(core, reset,
                                self._reset_root(k_r1, cfg.num_envs))
        obj = jnp.where(reset[:, None], self._reset_object(k_r2,
                                                           cfg.num_envs), obj)
        pre_pos = jnp.where(reset[:, None], 0.0, root[:, 0:3])

        obs = {"image": camera, "observation": obs_vec}
        out = base.StepOutput(obs=obs, priv_obs=obj[:, None, :],
                              reward=reward, reset=reset, timeout=timeout,
                              info=info)
        return AvoidState(core=core, obj=obj, camera=camera,
                          counter=counter, pre_root_pos=pre_pos), out

    def _reward(self, root, actions, pre_actions, collisions):
        """avoid.py:246-322."""
        cfg = self.cfg
        target = jnp.asarray(cfg.target_pos, root.dtype)
        rel = target - root[:, 0:3]

        euler = rot.quat_to_euler_xyz(root[:, 3:7])
        rel_heading = rot.yaw_diff(jnp.zeros_like(euler[..., 2]),
                                   euler[..., 2])
        distance = jnp.linalg.norm(
            jnp.concatenate([rel, rel_heading[:, None]], axis=-1), axis=-1)
        pose_r = 1.0 / (1.0 + jnp.square(1.6 * distance))

        ups = rot.quat_axis(root[:, 3:7], 2)[:, 2]
        ups_r = jnp.square((ups + 1.0) / 2.0)
        spin = jnp.square(root[:, 12])
        spin_r = 1.0 / (1.0 + jnp.square(spin))

        effort_r = 0.1 * jnp.exp(-jnp.sum(jnp.square(actions), axis=-1))
        adiff = jnp.linalg.norm(actions[..., :-1] - pre_actions[..., :-1],
                                axis=-1)
        thrust_r = 0.05 * (1.0 - jnp.abs(0.1533 - actions[..., -1]))
        smooth_r = 0.1 * jnp.exp(-adiff)
        alive_r = jnp.where(collisions, -500.0, 0.5)

        reward = (pose_r + pose_r * (ups_r + spin_r) + effort_r + smooth_r
                  + thrust_r + alive_r)

        die = root[:, 2] < 0.3
        die |= root[:, 2] > 1.7
        die |= jnp.linalg.norm(rel, axis=-1) > 2.0
        die |= ups < 0.0

        info = {
            "pose_reward": pose_r,
            "ups_reward": ups_r,
            "spin_reward": spin_r,
            "effort_reward": effort_r,
            "action_smoothness_reward": smooth_r,
            "thrust_reward": thrust_r,
            "alive_reward": alive_r,
            "reward": reward,
        }
        return reward, die, info
