"""Planning task — TPU-native port of reference airgym/envs/task/planning.py.

The flagship vision task: fly down an 17 x 8 m corridor through a forest of
40 random "thin" trees to a goal ball, using a depth camera + local-state
obs. Obs = {image [N,1,212,120], observation [N,16]} with
observation = [goal_dir_local(3), euler_local(3), vel_local(3),
angvel_local(3), actions(4)] (planning.py:186-219).

Scene per env: 40 tree cylinders at x ~ +-LENGTH, y ~ +-WIDTH, random yaw,
variant drawn from the 100 reference URDFs; goal at (LENGTH+0.5,
+-1.5, 1.5); drone starts at (-LENGTH-0.5, 0, 1.5) yawed toward the goal
(planning.py:64-112). LENGTH 8, WIDTH 4, FLY_HEIGHT 1.5 (:10-12).

Rewards/terminations (:226-307) are replicated literally, including:
  * the esdf term = min over the post-processed depth image (which carries
    the reference's unnormalized random-kernel conv scaling),
  * continous_action_reward that *adds* 0.2*|angvel| + 0.2*|action diff|,
  * heading < 0.25, z outside [1.2, 1.8], out of bounds, reach-goal +200.

Trees and the drone share collision mask 1 in the reference, so PhysX
never generates drone-tree contacts — only ground contact can trigger
reset_on_collision. The analytic check replicates that exactly (ground
only); tree proximity is punished through the esdf/alive terms as in the
reference.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.envs import base
from airgym_tpu.envs.avoid import yaw_deroll_matrix
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr

LENGTH = 8.0
WIDTH = 4.0
FLY_HEIGHT = 1.5


@dataclasses.dataclass(frozen=True)
class PlanningCfg(base.BaseEnvCfg):
    num_envs: int = 64
    episode_length_s: float = 16.0
    reset_on_collision: bool = True
    create_ground_plane: bool = True
    cam_dt: float = 0.04
    # depth camera resolution (reference customized_config.py camera
    # block: 212x120); override for cheaper CI cameras or other sensors
    cam_width: int = 212
    cam_height: int = 120
    num_trees: int = 40
    # curriculum knob: start the drone at this x instead of the reference
    # -LENGTH-0.5 (a shorter corridor makes the +200 goal bonus reachable
    # early in training; the policy obs carry no absolute position, so a
    # short-corridor policy transfers to the full task). None = reference.
    start_x: Optional[float] = None

    @property
    def cam_every(self) -> int:
        return int(round(self.cam_dt / self.dt))


class PlanningState(NamedTuple):
    core: base.EnvState
    goal: jnp.ndarray             # [N, 3]
    tree_variant: jnp.ndarray     # [N, T] int32 (fixed per env lifetime)
    tree_pos: jnp.ndarray         # [N, T, 2]
    tree_yaw: jnp.ndarray         # [N, T]
    camera: jnp.ndarray           # [N, 1, W, H]
    esdf: jnp.ndarray             # [N] min of camera image
    counter: jnp.ndarray
    pre_root_pos: jnp.ndarray


class Planning(base.QuadEnvCore):
    task_name = "planning"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    num_obs = 16
    obs_is_dict = True
    # emits info["success"] (episode ended by reaching the goal ball);
    # the trainer tracks the per-episode success rate from it
    has_success = True

    def __init__(self, cfg: PlanningCfg = PlanningCfg(), **kw):
        super().__init__(cfg, **kw)
        self.cam_cfg = dr.CameraCfg(width=cfg.cam_width,
                                    height=cfg.cam_height)
        self.obs_spec = {
            "image": (cfg.num_envs, 1, self.cam_cfg.width,
                      self.cam_cfg.height),
            "observation": (cfg.num_envs, self.num_obs),
        }

    # -- resets -----------------------------------------------------------

    def _reset_scene(self, key, n):
        """Tree placement + goal (planning.py:66-82)."""
        kp, ky, kg = jax.random.split(key, 3)
        t = self.cfg.num_trees
        pos = jax.random.uniform(kp, (n, t, 2), minval=-1.0,
                                 maxval=1.0) * jnp.array([LENGTH, WIDTH])
        yaw = jax.random.uniform(ky, (n, t), minval=-np.pi, maxval=np.pi)
        goal_y = 1.5 * jax.random.uniform(kg, (n,), minval=-1, maxval=1)
        goal = jnp.stack([jnp.full((n,), LENGTH + 0.5), goal_y,
                          jnp.full((n,), FLY_HEIGHT)], axis=-1)
        return pos, yaw, goal

    def _reset_root(self, goal, n):
        """Start at (-L-0.5, 0, FLY_HEIGHT) yawed toward the goal
        (planning.py:84-112), zero velocities. cfg.start_x overrides the
        start x for curriculum stages."""
        x0 = (-LENGTH - 0.5 if self.cfg.start_x is None
              else float(self.cfg.start_x))
        start = jnp.tile(jnp.array([x0, 0.0, FLY_HEIGHT]), (n, 1))
        init_yaw = jnp.arctan2(goal[:, 1] - start[:, 1],
                               goal[:, 0] - start[:, 0])
        ang = jnp.stack([jnp.zeros((n,)), jnp.zeros((n,)), init_yaw],
                        axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        zeros = jnp.zeros((n, 6))
        return jnp.concatenate([start, quat, zeros],
                               axis=-1).astype(self.cfg.dtype)

    def initial_state(self, key) -> PlanningState:
        kv, ks, kc = jax.random.split(key, 3)
        n = self.cfg.num_envs
        variant = jax.random.randint(kv, (n, self.cfg.num_trees), 0, 100)
        tree_pos, tree_yaw, goal = self._reset_scene(ks, n)
        root = self._reset_root(goal, n)
        cam = jnp.zeros((n, 1, self.cam_cfg.width, self.cam_cfg.height),
                        dtype=self.cfg.dtype)
        return PlanningState(
            core=self.init_core(kc, root), goal=goal, tree_variant=variant,
            tree_pos=tree_pos, tree_yaw=tree_yaw, camera=cam,
            esdf=jnp.full((n,), 10.0), counter=jnp.asarray(0, jnp.int32),
            pre_root_pos=jnp.zeros((n, 3)))

    # -- scene ------------------------------------------------------------

    def _cylinders(self, state: PlanningState) -> sc.Cylinders:
        return assets.tree_cylinders_from_placement(
            state.tree_variant, state.tree_pos, state.tree_yaw)

    def _goal_spheres(self, goal) -> sc.Spheres:
        n = goal.shape[0]
        return sc.Spheres(center=goal[:, None, :],
                          radius=jnp.full((n, 1), 0.2),
                          valid=jnp.ones((n, 1), dtype=bool))

    def _render(self, root, state, key):
        scene = dr.SceneForRender(cylinders=self._cylinders(state),
                                  spheres=self._goal_spheres(state.goal),
                                  ground=True)
        return dr.render_and_process(self.cam_cfg, root, scene, key)

    # -- step -------------------------------------------------------------

    def step(self, state: PlanningState, actions: jnp.ndarray,
             render: Optional[bool] = None
             ) -> Tuple[PlanningState, base.StepOutput]:
        core = state.core
        cfg = self.cfg
        rng, k_cam, k_scene = jax.random.split(core.rng, 3)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)

        counter = state.counter + 1
        progress = core.progress + 1

        # static render override for phase-aligned rollouts (see avoid.py)
        if render is None:
            camera = jax.lax.cond(
                counter % cfg.cam_every == 0,
                lambda: self._render(root, state, k_cam),
                lambda: state.camera)
        elif render:
            camera = self._render(root, state, k_cam)
        else:
            camera = state.camera
        esdf = jnp.min(camera.reshape(cfg.num_envs, -1), axis=-1)

        # observation (planning.py:186-219)
        w2l, m_global = yaw_deroll_matrix(root[:, 3:7])
        m_local = w2l @ m_global
        euler_local = rot.matrix_to_euler_xyz(m_local)
        vel_local = jnp.einsum("nij,nj->ni", w2l, root[:, 7:10])
        angvel_local = jnp.einsum("nij,nj->ni", w2l, root[:, 10:13])
        fwd_global = state.goal - root[:, 0:3]
        pos_diff_local = jnp.einsum("nij,nj->ni", w2l, fwd_global)
        related_dist = jnp.linalg.norm(fwd_global, axis=-1)
        goal_dir = pos_diff_local / jnp.maximum(
            jnp.linalg.norm(pos_diff_local, axis=-1, keepdims=True), 1e-6)
        obs_vec = jnp.concatenate([goal_dir, euler_local, vel_local,
                                   angvel_local, acts], axis=-1)

        collisions = root[:, 2] < assets.ROBOT_COLLISION_RADIUS

        reward, die, info = self._reward(
            root, acts, core.pre_actions, state.pre_root_pos, state.goal,
            goal_dir, vel_local, angvel_local, esdf, related_dist)
        die = die | collisions
        max_len = cfg.max_episode_length
        timeout = (progress >= max_len - 1) & ~die
        reset = die | (progress >= max_len - 1)

        # re-randomize scene + root for reset envs
        new_pos, new_yaw, new_goal = self._reset_scene(k_scene,
                                                       cfg.num_envs)
        goal = jnp.where(reset[:, None], new_goal, state.goal)
        tree_pos = jnp.where(reset[:, None, None], new_pos, state.tree_pos)
        tree_yaw = jnp.where(reset[:, None], new_yaw, state.tree_yaw)

        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
                             pre_actions=acts, rng=rng)
        core = self.apply_reset(core, reset,
                                self._reset_root(goal, cfg.num_envs))
        pre_pos = jnp.where(reset[:, None], 0.0, root[:, 0:3])

        obs = {"image": camera, "observation": obs_vec}
        out = base.StepOutput(
            obs=obs,
            priv_obs=self._asset_root_states(goal, tree_pos, tree_yaw),
            reward=reward, reset=reset, timeout=timeout, info=info)
        return PlanningState(core=core, goal=goal, tree_variant=state.tree_variant,
                             tree_pos=tree_pos, tree_yaw=tree_yaw,
                             camera=camera, esdf=esdf, counter=counter,
                             pre_root_pos=pre_pos), out

    def _asset_root_states(self, goal, tree_pos, tree_yaw):
        """Privileged obs: env-asset root states [N, 1+T, 13] in the
        reference's IsaacGym layout (pos3 quat4-xyzw linvel3 angvel3).
        Row 0 is the goal ball (reference planning.py:42-47 reads
        env_asset_root_states[:, 0]); rows 1..T are the trees at z=0 with
        yaw-about-z quats (reference reset_idx :67-74)."""
        n, t = tree_pos.shape[0], tree_pos.shape[1]
        dt = goal.dtype
        idq = jnp.tile(jnp.asarray([0.0, 0, 0, 1], dt), (n, 1, 1))
        ball = jnp.concatenate(
            [goal[:, None, :], idq, jnp.zeros((n, 1, 6), dt)], axis=-1)
        z = jnp.zeros((n, t), dt)
        pos3 = jnp.concatenate([tree_pos, z[..., None]], axis=-1)
        half = 0.5 * tree_yaw
        quat = jnp.stack([z, z, jnp.sin(half), jnp.cos(half)], axis=-1)
        trees = jnp.concatenate([pos3, quat, jnp.zeros((n, t, 6), dt)],
                                axis=-1)
        return jnp.concatenate([ball, trees], axis=1)

    def _reward(self, root, actions, pre_actions, pre_root_pos, goal,
                goal_dir, vel_local, angvel_local, esdf, related_dist):
        """planning.py:226-307, replicated term by term."""
        adiff = jnp.linalg.norm(actions - pre_actions, axis=-1)
        cont_r = (0.2 * jnp.linalg.norm(angvel_local, axis=-1)
                  + 0.2 * adiff)
        thrust_r = 0.5 * (1.0 - jnp.abs(0.1533 - actions[..., -1]))

        forward_r = 0.1 * (jnp.linalg.norm(goal - pre_root_pos, axis=-1)
                           - jnp.linalg.norm(goal - root[:, 0:3], axis=-1))

        heading_r = goal_dir[:, 0]                  # dot with local x-hat
        speed_r = -0.5 * (1.0 - jnp.exp(
            -2.0 * jnp.square(vel_local[..., 0] - 1.0)))
        z = root[:, 2]
        z_r = jnp.minimum(jnp.minimum(z - 1.8, 0.0), 1.2 - z)
        ups = rot.quat_axis(root[:, 3:7], 2)[:, 2]
        ups_r = jnp.square((ups + 1.0) / 2.0)
        esdf_r = 0.5 * (1.0 - jnp.exp(-0.5 * jnp.square(esdf)))
        alive_r = jnp.where(esdf > 0.3, 0.0, -1.0)
        reach_goal = related_dist < 0.3
        reach_r = jnp.where(reach_goal, 200.0, 0.0)

        reward = (cont_r + forward_r + alive_r + esdf_r + ups_r + z_r
                  + speed_r + heading_r + thrust_r + reach_r)

        die = z < FLY_HEIGHT - 0.3
        die |= z > FLY_HEIGHT + 0.3
        die |= root[:, 0] < -LENGTH - 0.5
        die |= root[:, 0] > LENGTH + 0.5
        die |= root[:, 1] < -WIDTH
        die |= root[:, 1] > WIDTH
        die |= reach_goal
        die |= heading_r < 0.25

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
            # not a reward term: per-step goal-contact flag, consumed by
            # the trainer's per-episode success tracking (popped from the
            # Episode/ means)
            "success": reach_goal,
        }
        return reward, die, info
