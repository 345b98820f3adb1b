"""Customized task — the user-extensible vision base task (reference:
airgym/envs/base/customized.py).

The reference's Customized is the template users subclass for new vision
tasks: AssetManager-driven scenes (random assets in a LENGTH x WIDTH
area, customized.py:20-22,355-362), contact checking (:393-397), depth
cameras with the full dump_images pipeline, dict obs {image,
observation(18) - target}, ZERO reward and episode-length-only
termination (:467-477) for users to fill in.

Here the scene comes from assets.manager.AssetManager (include dicts ->
primitives) and everything runs inside the jitted step like every other
task. Subclass and override ``_reward`` / ``_observations`` to build a
new vision task.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.assets.manager import AssetConfig, AssetManager
from airgym_tpu.envs import base
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr

LENGTH = 8.0
WIDTH = 8.0
FLY_HEIGHT = 1.0


@dataclasses.dataclass(frozen=True)
class CustomizedCfg(base.BaseEnvCfg):
    num_envs: int = 16
    episode_length_s: float = 24.0
    reset_on_collision: bool = True
    create_ground_plane: bool = True
    cam_dt: float = 0.04
    # depth camera resolution (reference customized_config.py camera
    # block: 212x120); override for cheaper CI cameras or other sensors
    cam_width: int = 212
    cam_height: int = 120
    enable_onboard_cameras: bool = True
    target_state: tuple = (1., 0., 0., 0., 1., 0., 0., 0., 1.,
                           0., 0., 0., 0., 0., 0., 0., 0., 0.)
    asset_config: AssetConfig = AssetConfig(
        include_group_asset=(("thin", 8),),
        placement_x=LENGTH, placement_y=WIDTH)

    @property
    def cam_every(self) -> int:
        return int(round(self.cam_dt / self.dt))


class CustomizedState(NamedTuple):
    core: base.EnvState
    scene: dr.SceneForRender      # carried per-env placements
    asset_states: jnp.ndarray     # [N, K, 13] env-asset root states
    scene_key: jnp.ndarray        # base RNG for reset-time resampling
    camera: jnp.ndarray
    counter: jnp.ndarray


class Customized(base.QuadEnvCore):
    task_name = "customized"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    num_obs = 18
    obs_is_dict = True

    def __init__(self, cfg: CustomizedCfg = CustomizedCfg(), **kw):
        super().__init__(cfg, **kw)
        self.cam_cfg = dr.CameraCfg(width=cfg.cam_width,
                                    height=cfg.cam_height)
        self.manager = AssetManager(cfg.asset_config, cfg.num_envs)
        self.target = jnp.asarray(cfg.target_state,
                                  dtype=cfg.dtype)[None].repeat(
                                      cfg.num_envs, axis=0)
        self.obs_spec = {
            "image": (cfg.num_envs, 1, self.cam_cfg.width,
                      self.cam_cfg.height),
            "observation": (cfg.num_envs, self.num_obs),
        }

    def _reset_root(self, key, n):
        """customized.py:364-378: start at (-L-0.5, 0, FLY_HEIGHT), tiny
        tilt, zero velocities."""
        ka = key
        start = jnp.tile(jnp.array([-LENGTH - 0.5, 0.0, FLY_HEIGHT]),
                         (n, 1))
        ang = jnp.concatenate([
            0.01 * jax.random.uniform(ka, (n, 2), minval=-np.pi,
                                      maxval=np.pi),
            0.05 * jax.random.uniform(jax.random.fold_in(ka, 1), (n, 1),
                                      minval=-np.pi, maxval=np.pi)], axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        return jnp.concatenate([start, quat, jnp.zeros((n, 6))],
                               axis=-1).astype(self.cfg.dtype)

    def initial_state(self, key) -> CustomizedState:
        kr, ks, k0, kc = jax.random.split(key, 4)
        n = self.cfg.num_envs
        cam = jnp.zeros((n, 1, self.cam_cfg.width, self.cam_cfg.height),
                        dtype=self.cfg.dtype)
        scene, states = self.manager.sample_scene(k0)
        # ground is a STATIC render flag (always True for managed scenes);
        # stored as None (an empty pytree) so jit never traces it, and
        # re-attached in _scene
        return CustomizedState(core=self.init_core(kc, self._reset_root(
            kr, n)), scene=scene._replace(ground=None),
            asset_states=states, scene_key=ks,
            camera=cam, counter=jnp.asarray(0, jnp.int32))

    def _scene(self, state: CustomizedState):
        return state.scene._replace(ground=True), state.asset_states

    @staticmethod
    def _merge_reset_scene(reset, old, new):
        """Per-env scene reset like Planning (planning.py:199-204 here;
        reference customized.py:355-362 re-places assets only for the
        reset envs): every array leaf has a leading env axis, so a
        jnp.where on the reset mask swaps in the fresh placements for
        resetting envs and leaves surviving envs' scenes untouched."""
        def merge(o, nw):
            if not hasattr(o, "ndim"):
                return o           # static leaves (SceneForRender.ground)
            mask = reset.reshape((-1,) + (1,) * (o.ndim - 1))
            return jnp.where(mask, nw, o)

        return jax.tree.map(merge, old, new)

    def step(self, state: CustomizedState, actions: jnp.ndarray,
             render: Optional[bool] = None
             ) -> Tuple[CustomizedState, base.StepOutput]:
        cfg = self.cfg
        core = state.core
        rng, k_noise, k_cam, k_root = jax.random.split(core.rng, 4)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)
        counter = state.counter + 1
        progress = core.progress + 1

        scene, asset_states = self._scene(state)
        # static render override for phase-aligned rollouts (see avoid.py)
        if render is None:
            camera = jax.lax.cond(
                counter % cfg.cam_every == 0,
                lambda: dr.render_and_process(self.cam_cfg, root, scene,
                                              k_cam),
                lambda: state.camera)
        elif render:
            camera = dr.render_and_process(self.cam_cfg, root, scene, k_cam)
        else:
            camera = state.camera

        obs_vec = self.state_obs18(root, k_noise) - self.target

        # contact check (customized.py:393-397): body sphere vs every
        # scene primitive type (cylinders/spheres/boxes/annuli)
        collisions = root[:, 2] < assets.ROBOT_COLLISION_RADIUS
        collisions |= (dr.min_dist_scene(root[:, 0:3], scene)
                       < assets.ROBOT_COLLISION_RADIUS)

        reward, die, info = self._reward(root, acts, core.pre_actions,
                                         collisions)
        if cfg.reset_on_collision:
            die = die | collisions
        max_len = cfg.max_episode_length
        timeout = (progress >= max_len - 1) & ~die
        reset = die | (progress >= max_len - 1)

        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
                             pre_actions=acts, rng=rng)
        core = self.apply_reset(core, reset,
                                self._reset_root(k_root, cfg.num_envs))
        # per-env scene resample on reset: fresh placements are sampled
        # every step from a counter-folded key and jnp.where-merged in for
        # the reset envs only — surviving envs' obstacles never move
        new_scene, new_states = self.manager.sample_scene(
            jax.random.fold_in(state.scene_key, counter))
        scene = self._merge_reset_scene(
            reset, state.scene, new_scene._replace(ground=None))
        asset_states = self._merge_reset_scene(reset, state.asset_states,
                                               new_states)

        obs = {"image": camera, "observation": obs_vec}
        out = base.StepOutput(obs=obs, priv_obs=asset_states,
                              reward=reward, reset=reset, timeout=timeout,
                              info=info)
        return CustomizedState(core=core, scene=scene,
                               asset_states=asset_states,
                               scene_key=state.scene_key,
                               camera=camera, counter=counter), out

    def _reward(self, root, actions, pre_actions, collisions):
        """Zero reward, episode-length-only termination
        (customized.py:467-477) — the subclass hook."""
        n = self.cfg.num_envs
        zero = jnp.zeros((n,))
        return zero, jnp.zeros((n,), bool), {"reward": zero}
