"""Balloon task — TPU-native port of reference airgym/envs/task/balloon.py.

Dash forward and pop a randomly-placed balloon: obs is the 18-dim state
relative to the balloon (rot-matrix and position differences,
balloon.py:132-145); +800 on hit within 0.1 m (:154-157); aggressive kill
rules (:193-215); ground-plane collision resets (reset_on_collision=True,
balloon_config.py:19 — drone/balloon share collision mask 1 so only the
ground can generate contacts; analytically: base sphere 0.2 m touching
z=0). Episode 8 s.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.envs import base
from airgym_tpu.math import rotations as rot


@dataclasses.dataclass(frozen=True)
class BalloonCfg(base.BaseEnvCfg):
    num_envs: int = 64
    episode_length_s: float = 8.0
    reset_on_collision: bool = True
    create_ground_plane: bool = True


class BalloonState(NamedTuple):
    core: base.EnvState
    balloon: jnp.ndarray          # [N, 13] balloon root states
    pre_root_pos: jnp.ndarray     # [N, 3]


class Balloon(base.QuadEnvCore):
    task_name = "balloon"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    num_obs = 18
    # emits info["success"]: the task is achieved iff the episode ends by
    # popping the balloon (< 0.1 m, reference balloon.py:154-157) — the
    # trainer/player track per-episode hit rate from it
    has_success = True

    def initial_state(self, key) -> BalloonState:
        k0, k1, k2 = jax.random.split(key, 3)
        n = self.cfg.num_envs
        root = self._reset_root(k0, n)
        balloon = self._reset_balloon(k1, n)
        return BalloonState(core=self.init_core(k2, root), balloon=balloon,
                            pre_root_pos=jnp.zeros((n, 3)))

    def _reset_balloon(self, key, n):
        kx, ky, kz = jax.random.split(key, 3)
        pos = jnp.stack([
            2.5 + 0.5 * jax.random.uniform(kx, (n,), minval=-1, maxval=1),
            2.0 * jax.random.uniform(ky, (n,), minval=-1, maxval=1),
            1.0 + 0.3 * jax.random.uniform(kz, (n,), minval=-1, maxval=1),
        ], axis=-1)
        s = jnp.zeros((n, 13), dtype=self.cfg.dtype).at[:, 6].set(1.0)
        return s.at[:, 0:3].set(pos)

    def _reset_root(self, key, n):
        """balloon.py:85-103: tight xy, z ~ 1, larger tilt to encourage
        exploration (pitch sampled one-sided positive)."""
        kp, kz, ka1, ka2, ka3, kv, kw = jax.random.split(key, 7)
        xy = 0.1 * jax.random.uniform(kp, (n, 2), minval=-1, maxval=1)
        z = 1.0 + 0.2 * jax.random.uniform(kz, (n, 1), minval=-1, maxval=1)
        ang = jnp.concatenate([
            0.1 * jax.random.uniform(ka1, (n, 1), minval=-np.pi, maxval=np.pi),
            0.1 * jax.random.uniform(ka2, (n, 1), minval=0.0, maxval=np.pi),
            0.2 * jax.random.uniform(ka3, (n, 1), minval=-np.pi, maxval=np.pi),
        ], axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        v = 0.5 * jax.random.uniform(kv, (n, 3), minval=-1, maxval=1)
        w = 0.2 * jax.random.uniform(kw, (n, 3), minval=-1, maxval=1)
        return jnp.concatenate([xy, z, quat, v, w],
                               axis=-1).astype(self.cfg.dtype)

    def step(self, state: BalloonState, actions: jnp.ndarray
             ) -> Tuple[BalloonState, base.StepOutput]:
        core = state.core
        rng, k_noise, k_reset_r, k_reset_b = jax.random.split(core.rng, 4)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)
        progress = core.progress + 1

        obs = self._observations(root, state.balloon, k_noise)
        collisions = (root[:, 2] < assets.ROBOT_COLLISION_RADIUS)

        reward, die, info = self._reward(root, state.balloon, acts,
                                         core.pre_actions,
                                         state.pre_root_pos, collisions)
        max_len = self.cfg.max_episode_length
        die = die | collisions
        timeout = (progress >= max_len - 1) & ~die
        reset = die | (progress >= max_len - 1)

        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
                             pre_actions=acts, rng=rng)
        core = self.apply_reset(core, reset,
                                self._reset_root(k_reset_r, self.cfg.num_envs))
        balloon = jnp.where(reset[:, None],
                            self._reset_balloon(k_reset_b, self.cfg.num_envs),
                            state.balloon)
        pre_pos = jnp.where(reset[:, None], 0.0, root[:, 0:3])

        out = base.StepOutput(obs=obs, priv_obs=balloon[:, None, :],
                              reward=reward, reset=reset, timeout=timeout,
                              info=info)
        return BalloonState(core=core, balloon=balloon,
                            pre_root_pos=pre_pos), out

    def _observations(self, root, balloon, key):
        """18-dim: (R - R_balloon, pos - pos_balloon, v, w) with noise added
        BEFORE the balloon subtraction (balloon.py:132-145)."""
        obs = self.state_obs18(root, key)
        b_mat = rot.quat_to_matrix(balloon[:, 3:7]).reshape(-1, 9)
        obs = obs.at[:, 0:9].add(-b_mat)
        obs = obs.at[:, 9:12].add(-balloon[:, 0:3])
        return obs

    def _reward(self, root, balloon, actions, pre_actions, pre_root_pos,
                collisions):
        n = self.cfg.num_envs
        pos, v = root[:, 0:3], root[:, 7:10]
        b_pos = balloon[:, 0:3]
        rel = b_pos - pos

        direction = rel / jnp.maximum(
            jnp.linalg.norm(rel, axis=-1, keepdims=True), 1e-6)
        dir_yaw = jnp.arctan2(direction[:, 1], direction[:, 0])
        euler = rot.quat_to_euler_xyz(root[:, 3:7])
        rel_heading = rot.yaw_diff(euler[..., 2], dir_yaw)
        yaw_r = 1.0 / (1.0 + jnp.square(1.6 * jnp.abs(rel_heading)))

        guidance_r = 30.0 * (jnp.linalg.norm(b_pos - pre_root_pos, axis=-1)
                             - jnp.linalg.norm(rel, axis=-1))

        ups = rot.quat_axis(root[:, 3:7], 2)[:, 2]
        ups_r = 0.5 * jnp.square((ups + 1.0) / 2.0)

        check = jnp.linalg.norm(rel, axis=-1)
        hit_r = 800.0 * (check < 0.1).astype(pos.dtype)

        effort_r = 0.1 * jnp.exp(-jnp.sum(jnp.square(actions), axis=-1))
        smooth_r = 0.1 * jnp.exp(
            -jnp.linalg.norm(actions - pre_actions, axis=-1))

        reward = guidance_r + yaw_r + hit_r + smooth_r + ups_r + effort_r

        die = actions[..., -1] < -1.0
        die |= actions[..., -1] > 1.0
        die |= rel[..., 0] < -0.2          # balloon passed behind
        die |= v[..., 0] < 0.0             # flying backwards
        die |= check > 4.0
        die |= pos[..., 2] < 0.5
        die |= pos[..., 2] > 1.5
        die |= check < 0.1                 # hit -> episode ends

        info = {
            "guidance_reward": guidance_r,
            "hit_reward": hit_r,
            "action_smoothness_reward": smooth_r,
            "effort_reward": effort_r,
            "ups_reward": ups_r,
            "reward": reward,
            # task achievement: balloon hit this step (popped from the
            # Episode/ means by the trainer's success tracking)
            "success": check < 0.1,
        }
        return reward, die, info
