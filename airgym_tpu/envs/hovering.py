"""Hovering task — TPU-native port of reference airgym/envs/base/hovering.py.

Reach and hold a target pose from randomized initial states. Obs is the
18-dim state vector relative to ``target_state``; reward reproduces the
reference's table (hovering.py:371-459) term by term; termination rules:
dist > 4 m, |rel z| > 2 m, upside-down, episode length 24 s, and (atti
mode) negative commanded quaternion w.

One quirk fixed deliberately: the reference computes ``time_outs`` AFTER
zeroing progress for reset envs (hovering.py:300-305), so its timeout flag
can never fire and value bootstrap is dead. Here ``timeout`` is the actual
truncation flag (episode-length reset without a failure condition), which
is what the PPO value-bootstrap path expects.
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
class HoveringCfg(base.BaseEnvCfg):
    num_envs: int = 256
    episode_length_s: float = 24.0
    # 18-dim target: identity rotation at the origin, zero velocities
    # (reference hovering_config.py:12)
    target_state: tuple = (1., 0., 0., 0., 1., 0., 0., 0., 1.,
                           0., 0., 0., 0., 0., 0., 0., 0., 0.)


class HoveringState(NamedTuple):
    core: base.EnvState


class Hovering(base.QuadEnvCore):
    task_name = "hovering"
    num_obs = 18

    def __init__(self, cfg: HoveringCfg = HoveringCfg(), **kw):
        super().__init__(cfg, **kw)
        self.target = jnp.asarray(cfg.target_state,
                                  dtype=cfg.dtype)[None].repeat(
                                      cfg.num_envs, axis=0)
        tmat = self.target[:, 0:9].reshape(-1, 3, 3)
        self.target_yaw = rot.matrix_to_euler_xyz(tmat)[..., 2]
        self.target_pos = self.target[:, 9:12]

    def initial_state(self, key) -> HoveringState:
        k0, k1 = jax.random.split(key)
        root = self.randomize_hover_reset(k0, self.cfg.num_envs)
        return HoveringState(core=self.init_core(k1, root))

    def reset_root(self, key, n: int) -> jnp.ndarray:
        return self.randomize_hover_reset(key, n)

    def step(self, state: HoveringState, actions: jnp.ndarray
             ) -> Tuple[HoveringState, base.StepOutput]:
        core = state.core
        rng, k_noise, k_reset = jax.random.split(core.rng, 3)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)
        progress = core.progress + 1

        obs = self.state_obs18(root, k_noise) - self.target

        reward, die, info = self._reward(root, acts, core.pre_actions, cmds)
        max_len = self.cfg.max_episode_length
        timeout = (progress >= max_len - 1) & ~die
        reset = die | (progress >= max_len - 1)

        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
                             pre_actions=acts, rng=rng)
        new_root = self.reset_root(k_reset, self.cfg.num_envs)
        core = self.apply_reset(core, reset, new_root)

        out = base.StepOutput(obs=obs, priv_obs=None, reward=reward,
                              reset=reset, timeout=timeout, info=info)
        return HoveringState(core=core), out

    # -- reward (reference hovering.py:371-459) ---------------------------

    def _reward(self, root, actions, pre_actions, cmd_thrusts):
        mode = self.cfg.ctl_mode
        effort_r = base.effort_reward(cmd_thrusts)
        cont_r, thrust_r = base.continuity_rewards(mode, actions, pre_actions)
        pos_r, vel_dir_r, rel = base.pos_reward_terms(root, self.target_pos)
        yaw_r, spin_r, ups_r, ups_z = base.attitude_reward_terms(
            root, self.target_yaw)

        shaped = pos_r * (vel_dir_r + ups_r + spin_r + yaw_r)
        if mode in ("pos", "vel", "prop"):
            reward = cont_r + effort_r + pos_r + shaped
        else:
            reward = cont_r + effort_r + thrust_r + pos_r + shaped

        die = jnp.linalg.norm(rel, axis=-1) > 4.0
        die |= rel[..., 2] < -2.0
        die |= rel[..., 2] > 2.0
        die |= ups_z < 0.0
        if mode == "atti":
            die |= actions[..., 0] < 0.0

        info = {
            "continous_action_reward": cont_r,
            "effort_reward": effort_r,
            "thrust_reward": (thrust_r if thrust_r is not None
                              else jnp.zeros_like(effort_r)),
            "pos_reward": pos_r,
            "vel_direction_reward": vel_dir_r,
            "ups_reward": ups_r,
            "spin_reward": spin_r,
            "yaw_reward": yaw_r,
            "reward": reward,
        }
        return reward, die, info
