"""Tracking task — TPU-native port of reference airgym/envs/task/tracking.py.

Follow a lemniscate reference trajectory: obs 48 = 18-dim state (noised,
NOT target-relative) + 30 = 10 future reference points x 5-step stride,
relative to the drone (tracking.py:194-214). Reward: dist/yaw/spin/ups
table (:223-296); die when > 1 m from the current reference point.
Episode 36 s. Widened pos-mode action limits (+-6, tracking.py:95-118).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.envs import base
from airgym_tpu.math import rotations as rot


@dataclasses.dataclass(frozen=True)
class TrackingCfg(base.BaseEnvCfg):
    num_envs: int = 64
    episode_length_s: float = 36.0
    create_ground_plane: bool = True
    target_state: tuple = (1., 0., 0., 0., 1., 0., 0., 0., 1.,
                           0., 0., 0., 0., 0., 0., 0., 0., 0.)
    traj_n_steps: int = 10
    traj_step_size: int = 5
    traj_scale: float = 0.25


class TrackingState(NamedTuple):
    core: base.EnvState
    pre_root_pos: jnp.ndarray


class Tracking(base.QuadEnvCore):
    task_name = "tracking"
    action_limit_overrides = {
        "pos": ((-6.0, -6.0, -6.0, -6.0), (6.0, 6.0, 6.0, 6.0))}
    num_obs = 48

    def __init__(self, cfg: TrackingCfg = TrackingCfg(), **kw):
        super().__init__(cfg, **kw)
        t = jnp.asarray(cfg.target_state, dtype=cfg.dtype)
        tmat = t[0:9].reshape(3, 3)
        self.target_yaw = jnp.full((cfg.num_envs,),
                                   rot.matrix_to_euler_xyz(tmat)[2])

    def initial_state(self, key) -> TrackingState:
        k0, k1 = jax.random.split(key)
        root = self._reset_root(k0, self.cfg.num_envs)
        return TrackingState(core=self.init_core(k1, root),
                             pre_root_pos=jnp.zeros((self.cfg.num_envs, 3)))

    def _reset_root(self, key, n):
        """tracking.py:168-186: xy ~ +-0.1, z ~ 1 +- 0.1, tilt 0.1/yaw 0.2."""
        kp, kz, ka, ky, kv, kw = jax.random.split(key, 6)
        xy = 0.1 * jax.random.uniform(kp, (n, 2), minval=-1, maxval=1)
        z = 1.0 + 0.1 * jax.random.uniform(kz, (n, 1), minval=-1, maxval=1)
        ang = jnp.concatenate([
            0.1 * jax.random.uniform(ka, (n, 2), minval=-np.pi, maxval=np.pi),
            0.2 * jax.random.uniform(ky, (n, 1), minval=-np.pi, maxval=np.pi),
        ], axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        v = 0.5 * jax.random.uniform(kv, (n, 3), minval=-1, maxval=1)
        w = 0.2 * jax.random.uniform(kw, (n, 3), minval=-1, maxval=1)
        return jnp.concatenate([xy, z, quat, v, w],
                               axis=-1).astype(self.cfg.dtype)

    def ref_trajectory(self, progress: jnp.ndarray) -> jnp.ndarray:
        """Lemniscate of Gerono-style figure-eight, 10 future points
        (tracking.py:194-200). Returns [N, n_steps, 3]."""
        cfg = self.cfg
        steps = (progress[:, None]
                 + jnp.arange(cfg.traj_n_steps) * cfg.traj_step_size)
        t = steps.astype(self.cfg.dtype) * cfg.dt * cfg.traj_scale
        den = 1.0 + jnp.square(jnp.cos(t))
        x = 3.0 * jnp.sin(t) / den
        y = 3.0 * jnp.sin(t) * jnp.cos(t) / den
        z = jnp.ones_like(x)
        return jnp.stack([x, y, z], axis=-1)

    def step(self, state: TrackingState, actions: jnp.ndarray
             ) -> Tuple[TrackingState, base.StepOutput]:
        core = state.core
        rng, k_noise, k_reset = jax.random.split(core.rng, 3)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)
        progress = core.progress + 1

        ref = self.ref_trajectory(progress)                    # [N, 10, 3]
        obs18 = self.state_obs18(root, k_noise)
        rel_future = (ref - root[:, None, 0:3]).reshape(
            self.cfg.num_envs, -1)
        obs = jnp.concatenate([obs18, rel_future], axis=-1)

        reward, die, info = self._reward(root, ref[:, 0], acts,
                                         core.pre_actions, cmds)
        max_len = self.cfg.max_episode_length
        timeout = (progress >= max_len - 1) & ~die
        reset = die | (progress >= max_len - 1)

        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
                             pre_actions=acts, rng=rng)
        core = self.apply_reset(core, reset,
                                self._reset_root(k_reset, self.cfg.num_envs))
        pre_pos = jnp.where(reset[:, None], 0.0, root[:, 0:3])

        out = base.StepOutput(obs=obs, priv_obs=None, reward=reward,
                              reset=reset, timeout=timeout, info=info)
        return TrackingState(core=core, pre_root_pos=pre_pos), out

    def _reward(self, root, ref_now, actions, pre_actions, cmd_thrusts):
        """tracking.py:223-296 — like Hovering but dist to the moving
        reference, modified gains (1.8/4/2), and cont-action weights."""
        mode = self.cfg.ctl_mode
        effort_r = base.effort_reward(cmd_thrusts)

        diff = actions - pre_actions
        if mode in ("pos", "vel", "prop"):
            cont_r = 0.2 * jnp.exp(-jnp.linalg.norm(diff, axis=-1))
            thrust_r = None
        else:
            cont_r = (0.1 * jnp.exp(-jnp.linalg.norm(diff[..., :-1], axis=-1))
                      + 0.5 / (1.0 + jnp.square(2.0 * diff[..., -1])))
            thrust_r = 0.1 * (1.0 - jnp.abs(0.1533 - actions[..., -1]))

        dist = jnp.linalg.norm(ref_now - root[:, 0:3], axis=-1)
        dist_r = 1.0 / (1.0 + jnp.square(1.8 * dist))

        euler = rot.quat_to_euler_xyz(root[:, 3:7])
        ydiff = rot.yaw_diff(self.target_yaw, euler[..., 2]) / jnp.pi
        yaw_r = 1.0 / (1.0 + jnp.square(4.0 * ydiff))
        spin = jnp.square(root[:, 12])
        spin_r = 1.0 / (1.0 + jnp.square(2.0 * spin))
        ups = rot.quat_axis(root[:, 3:7], 2)[:, 2]
        ups_r = jnp.square((ups + 1.0) / 2.0)

        shaped = dist_r * (spin_r + yaw_r + ups_r)
        if mode in ("pos", "vel", "prop"):
            reward = cont_r + effort_r + dist_r + shaped
        else:
            reward = cont_r + effort_r + thrust_r + dist_r + shaped

        die = dist > 1.0
        if mode == "atti":
            die |= actions[..., 0] < 0.0

        info = {
            "dist_norm": dist,
            "dist_reward": dist_r,
            "yaw_reward": yaw_r,
            "spin_reward": spin_r,
            "continous_action_reward": cont_r,
            "thrust_reward": (thrust_r if thrust_r is not None
                              else jnp.zeros_like(dist)),
            "effort_reward": effort_r,
            "ups_reward": ups_r,
            "reward": reward,
        }
        return reward, die, info
