"""MAPlanning — TPU-native port of reference airgym/envs/task/maplanning.py.

Multi-agent corridor flight: R robots per env (R = X152b num_assets, 4 in
the shipped config — maplanning_config.py:11-13,62) race toward one shared
goal ball. Per-robot depth cameras (other robots ARE visible — IsaacGym
renders them regardless of collision masks; here they are 0.2 m spheres in
each other's ray cast), per-robot 16+2R obs whose relative-robot channels
the reference computes then zeroes (maplanning.py:505-514 — replicated),
and planning-style rewards (maplanning.py:523-581) with the MA-specific
differences: esdf from a CLEAN normalized depth image (the noise/blur
calls are commented out in MAPlanning.dump_images, :370-414), per-robot
done flags (z too high / collision / reach goal), and a whole-env reset
when ANY robot is done or the episode times out (:571-584).

Outputs are flattened [E*R, ...] env-major so the single-agent PPO treats
robots as extra actors (maplanning.py:456-468); ``num_agents`` is exposed
for the trainer's batch accounting (a2c_base.py:196).

Robot axis handling is the TPU way: the robot axis is folded into the
batch for physics/controller/render (one [E*R, 13] array), and reshaped
to [E, R, ...] only for env-level reductions (any-robot reset).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.control import px4
from airgym_tpu.envs import base
from airgym_tpu.envs.avoid import yaw_deroll_matrix
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr

LENGTH = 8.0
WIDTH = 4.0
FLY_HEIGHT = 1.5


@dataclasses.dataclass(frozen=True)
class MAPlanningCfg(base.BaseEnvCfg):
    num_envs: int = 4
    episode_length_s: float = 16.0
    create_ground_plane: bool = True
    cam_dt: float = 0.04
    # depth camera resolution (reference customized_config.py camera
    # block: 212x120); override for cheaper CI cameras or other sensors
    cam_width: int = 212
    cam_height: int = 120
    num_robots: int = 4               # X152b num_assets
    # curriculum knob (same recipe as PlanningCfg.start_x): start all
    # robots at this x instead of the reference -LENGTH-0.5 — a shorter
    # corridor makes the shared +200 goal bonus reachable early; the obs
    # carry no absolute position, so the policy transfers to the full
    # task. None = reference start.
    start_x: Optional[float] = None

    @property
    def cam_every(self) -> int:
        return int(round(self.cam_dt / self.dt))

    @property
    def num_agents(self) -> int:
        return self.num_robots


class MAPlanningState(NamedTuple):
    core: base.EnvState               # flat [E*R, ...] robot states
    goal: jnp.ndarray                 # [E, 3] shared goal per env
    camera: jnp.ndarray               # [E*R, 1, W, H]
    esdf: jnp.ndarray                 # [E*R]
    counter: jnp.ndarray
    pre_root_pos: jnp.ndarray         # [E*R, 3]


class MAPlanning(base.QuadEnvCore):
    task_name = "maplanning"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    obs_is_dict = True
    has_success = True            # info["success"]: per-robot goal reach
    # info["env_success"]/["env_done"]: ENV-level episode events — the
    # whole env resets when ANY robot is done (reference
    # maplanning.py:571-584), so per-robot success is capped near
    # 1/num_robots; the env-level rate is the task's real win condition
    # and what the trainer's best-by-success checkpoint gates on
    has_env_success = True

    def __init__(self, cfg: MAPlanningCfg = MAPlanningCfg(), **kw):
        super().__init__(cfg, **kw)
        self.cam_cfg = dr.CameraCfg(width=cfg.cam_width,
                                    height=cfg.cam_height)
        self.num_obs = 16 + 2 * cfg.num_robots
        self.flat_n = cfg.num_envs * cfg.num_robots
        self.obs_spec = {
            "image": (self.flat_n, 1, self.cam_cfg.width,
                      self.cam_cfg.height),
            "observation": (self.flat_n, self.num_obs),
        }

    # expose the flattened actor count for the trainer
    @property
    def num_actors_flat(self) -> int:
        return self.flat_n

    def _reset_goal(self, key, e):
        gy = 1.5 * jax.random.uniform(key, (e,), minval=-1, maxval=1)
        return jnp.stack([jnp.full((e,), LENGTH + 0.5), gy,
                          jnp.full((e,), FLY_HEIGHT)], axis=-1)

    def _reset_root(self, key, goal, e):
        """All robots at x=-L-0.5, y ~ +-2, z=FLY_HEIGHT, yawed at the goal
        (maplanning.py:226-257)."""
        r = self.cfg.num_robots
        y = 2.0 * jax.random.uniform(key, (e, r), minval=-1, maxval=1)
        x0 = (-LENGTH - 0.5 if self.cfg.start_x is None
              else float(self.cfg.start_x))
        x = jnp.full((e, r), x0)
        z = jnp.full((e, r), FLY_HEIGHT)
        yaw = jnp.arctan2(goal[:, None, 1] - y, goal[:, None, 0] - x)
        ang = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw],
                        axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        root = jnp.concatenate([
            jnp.stack([x, y, z], axis=-1), quat, jnp.zeros((e, r, 6))],
            axis=-1)
        return root.reshape(e * r, 13).astype(self.cfg.dtype)

    def initial_state(self, key) -> MAPlanningState:
        kg, kr, kc = jax.random.split(key, 3)
        e, r = self.cfg.num_envs, self.cfg.num_robots
        goal = self._reset_goal(kg, e)
        root = self._reset_root(kr, goal, e)
        n = self.flat_n
        core = base.EnvState(
            root=root,
            ctrl=px4.init_state(n),
            progress=jnp.zeros((e,), jnp.int32),    # per-ENV progress
            pre_actions=jnp.zeros((n, self.cfg.num_actions)),
            reset_buf=jnp.ones((n,), bool),
            rng=kc,
            rotors=jnp.zeros((n, 4), dtype=self.cfg.dtype),
        )
        cam = jnp.zeros((n, 1, self.cam_cfg.width, self.cam_cfg.height),
                        dtype=self.cfg.dtype)
        return MAPlanningState(core=core, goal=goal, camera=cam,
                               esdf=jnp.full((n,), 10.0),
                               counter=jnp.asarray(0, jnp.int32),
                               pre_root_pos=jnp.zeros((n, 3)))

    # -- scene: each robot sees the goal ball + the other robots ----------

    def _render(self, root, goal):
        e, r = self.cfg.num_envs, self.cfg.num_robots
        n = self.flat_n
        # per flat robot: other robots of its env as spheres + the goal
        pos_er = root[:, 0:3].reshape(e, r, 3)
        # build [n, r+1] sphere sets: all robots of own env (self included;
        # self is behind the camera so it never hits) + goal
        all_spheres = jnp.broadcast_to(pos_er[:, None, :, :],
                                       (e, r, r, 3)).reshape(n, r, 3)
        goal_rep = jnp.broadcast_to(goal[:, None, None, :],
                                    (e, r, 1, 3)).reshape(n, 1, 3)
        centers = jnp.concatenate([all_spheres, goal_rep], axis=1)
        radius = jnp.full((n, r + 1), 0.2)
        valid = jnp.ones((n, r + 1), bool)
        scene = dr.SceneForRender(
            spheres=sc.Spheres(center=centers, radius=radius, valid=valid),
            ground=True)
        # MAPlanning's dump_images skips noise/blur: clean clamp/normalize
        depth = dr.render_depth_auto(self.cam_cfg, root, scene)
        img = jnp.clip(depth, 0.0, self.cam_cfg.depth_clamp) \
            / self.cam_cfg.depth_clamp
        return img[:, None]

    # -- step -------------------------------------------------------------

    def step(self, state: MAPlanningState, actions: jnp.ndarray,
             render: Optional[bool] = None
             ) -> Tuple[MAPlanningState, base.StepOutput]:
        cfg = self.cfg
        e, r, n = cfg.num_envs, cfg.num_robots, self.flat_n
        core = state.core
        rng, kg, kr = jax.random.split(core.rng, 3)

        actions = actions.reshape(n, cfg.num_actions)
        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)

        counter = state.counter + 1
        progress = core.progress + 1               # [E]

        goal_flat = jnp.repeat(state.goal, r, axis=0)      # [n, 3]
        # static render override for phase-aligned rollouts (see avoid.py)
        if render is None:
            camera = jax.lax.cond(
                counter % cfg.cam_every == 0,
                lambda: self._render(root, state.goal),
                lambda: state.camera)
        elif render:
            camera = self._render(root, state.goal)
        else:
            camera = state.camera
        esdf = jnp.min(camera.reshape(n, -1), axis=-1)

        # observation (maplanning.py:470-514)
        w2l, m_global = yaw_deroll_matrix(root[:, 3:7])
        m_local = w2l @ m_global
        euler_local = rot.matrix_to_euler_xyz(m_local)
        vel_local = jnp.einsum("nij,nj->ni", w2l, root[:, 7:10])
        angvel_local = jnp.einsum("nij,nj->ni", w2l, root[:, 10:13])
        fwd = goal_flat - root[:, 0:3]
        pos_diff_local = jnp.einsum("nij,nj->ni", w2l, fwd)
        related_dist = jnp.linalg.norm(fwd, axis=-1)
        goal_dir = pos_diff_local / jnp.maximum(
            jnp.linalg.norm(pos_diff_local, axis=-1, keepdims=True), 1e-6)
        obs_vec = jnp.concatenate(
            [goal_dir, euler_local, vel_local, angvel_local, acts,
             jnp.zeros((n, 2 * r))], axis=-1)   # rel channels zeroed (ref)

        collisions = root[:, 2] < assets.ROBOT_COLLISION_RADIUS

        reward, reset_robot, info = self._reward(
            root, acts, core.pre_actions, state.pre_root_pos, goal_flat,
            goal_dir, vel_local, angvel_local, esdf, related_dist,
            collisions)

        # env-level reset: any robot done, or episode length (per env)
        max_len = cfg.max_episode_length
        any_robot = jnp.any(reset_robot.reshape(e, r), axis=-1)
        env_timeout = progress >= max_len - 1
        reset_env = any_robot | env_timeout                 # [E]
        timeout_env = env_timeout & ~any_robot
        reset_flat = jnp.repeat(reset_env, r)               # [n]
        timeout_flat = jnp.repeat(timeout_env, r)

        # env-level episode events for the trainer (has_env_success):
        # success = ANY robot touched the goal this step; done = the
        # whole-env reset (any robot event or episode cap)
        env_succ = jnp.any(info["success"].reshape(e, r), axis=-1)
        info["env_success"] = jnp.repeat(env_succ, r)
        info["env_done"] = reset_flat

        goal = jnp.where(reset_env[:, None], self._reset_goal(kg, e),
                         state.goal)
        new_root = self._reset_root(kr, goal, e)
        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, pre_actions=acts,
                             rng=rng)
        m = reset_flat[:, None]
        core = core._replace(
            root=jnp.where(m, new_root, core.root),
            ctrl=px4.reset_state(core.ctrl, reset_flat,
                                 jnp.where(m, new_root, core.root)[:, 3:7]),
            progress=jnp.where(reset_env, 0, progress),
            pre_actions=jnp.where(m, 0.0, core.pre_actions),
            reset_buf=reset_flat,
            rotors=jnp.where(m, 0.0, core.rotors),
        )
        pre_pos = jnp.where(m, 0.0, root[:, 0:3])

        # privileged obs = env-asset root states [E, 1, 13]: the single
        # shared goal ball (maplanning_config include_single_asset,
        # num_assets=1; layout pos3 quat4-xyzw linvel3 angvel3)
        idq = jnp.tile(jnp.asarray([0.0, 0, 0, 1], goal.dtype), (e, 1, 1))
        ball_roots = jnp.concatenate(
            [goal[:, None, :], idq, jnp.zeros((e, 1, 6), goal.dtype)],
            axis=-1)
        obs = {"image": camera, "observation": obs_vec}
        out = base.StepOutput(
            obs=obs,
            priv_obs=ball_roots,
            reward=reward,
            reset=reset_robot,          # per-robot done flags (reference)
            timeout=timeout_flat,
            info=info)
        return MAPlanningState(core=core, goal=goal, camera=camera,
                               esdf=esdf, counter=counter,
                               pre_root_pos=pre_pos), out

    def _reward(self, root, actions, pre_actions, pre_root_pos, goal,
                goal_dir, vel_local, angvel_local, esdf, related_dist,
                collisions):
        """maplanning.py:523-581."""
        adiff = jnp.linalg.norm(actions - pre_actions, axis=-1)
        cont_r = 0.2 * jnp.linalg.norm(angvel_local, axis=-1) + 0.2 * adiff
        thrust_r = 0.5 * (1.0 - jnp.abs(0.1533 - actions[..., -1]))
        forward_r = 0.1 * (jnp.linalg.norm(goal - pre_root_pos, axis=-1)
                           - jnp.linalg.norm(goal - root[:, 0:3], axis=-1))
        heading_r = goal_dir[:, 0]
        speed_r = -0.5 * (1.0 - jnp.exp(
            -2.0 * jnp.square(vel_local[..., 0] - 1.0)))
        z = root[:, 2]
        z_r = jnp.minimum(jnp.minimum(z - (FLY_HEIGHT + 0.3), 0.0),
                          (FLY_HEIGHT - 0.3) - z)
        ups = rot.quat_axis(root[:, 3:7], 2)[:, 2]
        ups_r = jnp.square((ups + 1.0) / 2.0)
        esdf_r = 0.5 * (1.0 - jnp.exp(-0.5 * jnp.square(esdf)))
        alive_r = jnp.where(esdf > 0.3, 0.0, -1.0)
        reach_goal = related_dist < 0.3
        reach_r = jnp.where(reach_goal, 200.0, 0.0)

        reward = (cont_r + forward_r + alive_r + esdf_r + ups_r + z_r
                  + speed_r + heading_r + thrust_r + reach_r)

        reset_robot = z > FLY_HEIGHT + 0.3
        reset_robot |= collisions
        reset_robot |= reach_goal

        info = {
            "continous_action_reward": cont_r,
            "heading_reward": heading_r,
            "speed_reward": speed_r,
            "forward_reward": forward_r,
            "alive_reward": alive_r,
            "ups_reward": ups_r,
            "z_reward": z_r,
            "esdf_reward": esdf_r,
            "thrust_reward": thrust_r,
            "reach_goal_reward": reach_r,
            "reward": reward,
            # per-robot goal-contact flag for the trainer's per-episode
            # success tracking (popped from the Episode/ means)
            "success": reach_goal,
        }
        return reward, reset_robot, info
