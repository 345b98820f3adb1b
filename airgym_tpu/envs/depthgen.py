"""DepthGen — TPU-native port of reference airgym/envs/base/depthgen.py.

Offline depth-dataset generator for VAE pre-training: 2-step episodes
(max_episode_length hard-coded to 2, depthgen.py:41), zero reward
(:479-489), a small cluttered scene re-randomized every reset — assets at
x ~ U(0, 3), y ~ U(-2, 2), random yaw (:355-362 with LENGTH 3, WIDTH 2) —
and the drone hovering at (-0.3, 0, 0.6 +- 0.15) with a small random tilt
(:371-378). Depth frames are saved as per-env .npy files (clean
clamp/4.5-normalized images — the noise calls are commented out in
DepthGen.dump_images, :430-441).

Scene composition mirrors depthgen_config (3 thin trees + 3 trees +
3 cubes + 3 flags); the mesh assets (trees/flags) are approximated by
primitive compositions (trunk cylinders, arch pillars + lintels) — the
purpose is depth-image diversity for the VAE, not physics.

``generate(out_dir, n_frames)`` is the host-side driver that replaces the
reference's ./misc .npy dump loop.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.envs import base
from airgym_tpu import assets
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr

LENGTH = 3.0
WIDTH = 2.0
FLY_HEIGHT = 0.5


@dataclasses.dataclass(frozen=True)
class DepthGenCfg(base.BaseEnvCfg):
    num_envs: int = 16
    episode_length_s: float = 8.0     # unused: episodes are 2 steps
    create_ground_plane: bool = True
    cam_dt: float = 0.04
    num_thin: int = 3
    num_trees: int = 3
    num_cubes: int = 3
    num_flags: int = 3

    @property
    def max_episode_length(self) -> int:
        return 2                       # depthgen.py:41

    @property
    def cam_every(self) -> int:
        return int(round(self.cam_dt / self.dt))


class DepthGenState(NamedTuple):
    core: base.EnvState
    thin_variant: jnp.ndarray
    thin_pos: jnp.ndarray
    thin_yaw: jnp.ndarray
    tree_pos: jnp.ndarray             # [N, T, 2] trunk positions
    cube_pos: jnp.ndarray             # [N, C, 3]
    cube_yaw: jnp.ndarray
    flag_pos: jnp.ndarray             # [N, F, 2] arch centers
    flag_yaw: jnp.ndarray
    camera: jnp.ndarray
    counter: jnp.ndarray


class DepthGen(base.QuadEnvCore):
    task_name = "depthgen"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    num_obs = 18

    def __init__(self, cfg: DepthGenCfg = DepthGenCfg(), **kw):
        super().__init__(cfg, **kw)
        self.cam_cfg = dr.CameraCfg()
        self.target = jnp.zeros((cfg.num_envs, 18), dtype=cfg.dtype)
        self.target = self.target.at[:, 0].set(1.0).at[:, 4].set(
            1.0).at[:, 8].set(1.0)

    def _sample_xy(self, key, n, count):
        kx, ky = jax.random.split(key)
        x = LENGTH * jax.random.uniform(kx, (n, count))          # U(0, L)
        y = WIDTH * jax.random.uniform(ky, (n, count), minval=-1, maxval=1)
        return jnp.stack([x, y], axis=-1)

    def _reset_scene(self, key, n):
        cfg = self.cfg
        ks = jax.random.split(key, 8)
        thin_pos = self._sample_xy(ks[0], n, cfg.num_thin)
        thin_yaw = jax.random.uniform(ks[1], (n, cfg.num_thin),
                                      minval=-np.pi, maxval=np.pi)
        tree_pos = self._sample_xy(ks[2], n, cfg.num_trees)
        cube_xy = self._sample_xy(ks[3], n, cfg.num_cubes)
        cube_pos = jnp.concatenate(
            [cube_xy, jnp.full((n, cfg.num_cubes, 1), 0.5)], axis=-1)
        cube_yaw = jax.random.uniform(ks[4], (n, cfg.num_cubes),
                                      minval=-np.pi, maxval=np.pi)
        flag_pos = self._sample_xy(ks[5], n, cfg.num_flags)
        flag_yaw = jax.random.uniform(ks[6], (n, cfg.num_flags),
                                      minval=-np.pi, maxval=np.pi)
        return thin_pos, thin_yaw, tree_pos, cube_pos, cube_yaw, \
            flag_pos, flag_yaw

    def _reset_root(self, key, n):
        kz, ka = jax.random.split(key)
        xy = jnp.tile(jnp.array([-0.3, 0.0]), (n, 1))
        z = (FLY_HEIGHT + 0.1
             + 0.15 * jax.random.uniform(kz, (n, 1), minval=-1, maxval=1))
        ang = jnp.concatenate([
            0.04 * jax.random.uniform(ka, (n, 2), minval=-np.pi,
                                      maxval=np.pi),
            0.05 * jax.random.uniform(jax.random.fold_in(ka, 1), (n, 1),
                                      minval=-np.pi, maxval=np.pi)], axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        return jnp.concatenate([xy, z, quat, jnp.zeros((n, 6))],
                               axis=-1).astype(self.cfg.dtype)

    def initial_state(self, key) -> DepthGenState:
        ks, kv, kr, kc = jax.random.split(key, 4)
        n = self.cfg.num_envs
        thin_variant = jax.random.randint(kv, (n, self.cfg.num_thin), 0, 100)
        scene = self._reset_scene(ks, n)
        root = self._reset_root(kr, n)
        cam = jnp.zeros((n, 1, self.cam_cfg.width, self.cam_cfg.height),
                        dtype=self.cfg.dtype)
        return DepthGenState(core=self.init_core(kc, root),
                             thin_variant=thin_variant,
                             thin_pos=scene[0], thin_yaw=scene[1],
                             tree_pos=scene[2], cube_pos=scene[3],
                             cube_yaw=scene[4], flag_pos=scene[5],
                             flag_yaw=scene[6], camera=cam,
                             counter=jnp.asarray(0, jnp.int32))

    def _scene(self, state: DepthGenState) -> dr.SceneForRender:
        n = self.cfg.num_envs
        thin = assets.tree_cylinders_from_placement(
            state.thin_variant, state.thin_pos, state.thin_yaw)
        # "trees": trunk cylinder r 0.1 h 3 (mesh tree approximation)
        t = state.tree_pos.shape[1]
        trunks = sc.Cylinders(
            center=jnp.concatenate(
                [state.tree_pos, jnp.full((n, t, 1), 1.5)], axis=-1),
            axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, t, 3)),
            half_len=jnp.full((n, t), 1.5),
            radius=jnp.full((n, t), 0.1),
            valid=jnp.ones((n, t), bool))
        # flag arches: two pillars r 0.05 h 1.6, 1.2 m apart
        f = state.flag_pos.shape[1]
        off = jnp.stack([-jnp.sin(state.flag_yaw), jnp.cos(state.flag_yaw)],
                        axis=-1) * 0.6
        p1 = state.flag_pos + off
        p2 = state.flag_pos - off
        pillars = jnp.concatenate([p1, p2], axis=1)           # [n, 2f, 2]
        arch = sc.Cylinders(
            center=jnp.concatenate(
                [pillars, jnp.full((n, 2 * f, 1), 0.8)], axis=-1),
            axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]),
                                  (n, 2 * f, 3)),
            half_len=jnp.full((n, 2 * f), 0.8),
            radius=jnp.full((n, 2 * f), 0.05),
            valid=jnp.ones((n, 2 * f), bool))
        cyl = sc.Cylinders(*[jnp.concatenate([a, b, c], axis=1)
                             for a, b, c in zip(thin, trunks, arch)])
        c = state.cube_pos.shape[1]
        boxes = sc.Boxes(center=state.cube_pos, yaw=state.cube_yaw,
                         half_extents=jnp.full((n, c, 3), 0.5),
                         valid=jnp.ones((n, c), bool))
        # arch lintels as flat boxes on top of the pillars
        lintel = sc.Boxes(
            center=jnp.concatenate(
                [state.flag_pos, jnp.full((n, f, 1), 1.65)], axis=-1),
            yaw=state.flag_yaw,
            half_extents=jnp.broadcast_to(jnp.array([0.1, 0.7, 0.05]),
                                          (n, f, 3)),
            valid=jnp.ones((n, f), bool))
        boxes = sc.Boxes(*[jnp.concatenate([a, b], axis=1)
                           for a, b in zip(boxes, lintel)])
        return dr.SceneForRender(cylinders=cyl, boxes=boxes, ground=True)

    def step(self, state: DepthGenState, actions: jnp.ndarray
             ) -> Tuple[DepthGenState, base.StepOutput]:
        core = state.core
        cfg = self.cfg
        rng, k_noise, k_scene, k_root = jax.random.split(core.rng, 4)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root = self.physics_step(core.root, cmds)
        counter = state.counter + 1
        progress = core.progress + 1

        camera = jax.lax.cond(
            counter % cfg.cam_every == 0,
            lambda: self._render_clean(root, state),
            lambda: state.camera)

        obs = self.state_obs18(root, k_noise) - self.target
        reward = jnp.zeros((cfg.num_envs,))
        reset = progress >= self.cfg.max_episode_length - 1
        timeout = reset

        scene = self._reset_scene(k_scene, cfg.num_envs)
        core = core._replace(root=root, ctrl=ctrl, progress=progress,
                             pre_actions=acts, rng=rng)
        core = self.apply_reset(core, reset,
                                self._reset_root(k_root, cfg.num_envs))

        def merge(old, new, extra_dims):
            m = reset.reshape((-1,) + (1,) * extra_dims)
            return jnp.where(m, new, old)

        ns = DepthGenState(
            core=core,
            thin_variant=state.thin_variant,
            thin_pos=merge(state.thin_pos, scene[0], 2),
            thin_yaw=merge(state.thin_yaw, scene[1], 1),
            tree_pos=merge(state.tree_pos, scene[2], 2),
            cube_pos=merge(state.cube_pos, scene[3], 2),
            cube_yaw=merge(state.cube_yaw, scene[4], 1),
            flag_pos=merge(state.flag_pos, scene[5], 2),
            flag_yaw=merge(state.flag_yaw, scene[6], 1),
            camera=camera, counter=counter)
        out = base.StepOutput(obs=obs, priv_obs=None, reward=reward,
                              reset=reset, timeout=timeout, info={})
        return ns, out

    def _render_clean(self, root, state):
        depth = dr.render_depth_auto(self.cam_cfg, root, self._scene(state))
        img = jnp.clip(depth, 0.0, self.cam_cfg.depth_clamp) \
            / self.cam_cfg.depth_clamp
        return img[:, None]

    # -- dataset driver (host side, replaces the ./misc np.save loop) -----

    def generate(self, out_dir: str, n_frames: int, seed: int = 0):
        """Roll the env and save [H, W] = (120, 212) .npy depth frames
        (the reference saves the transposed image, depthgen.py:439-441)."""
        os.makedirs(out_dir, exist_ok=True)
        state = self.initial_state(jax.random.PRNGKey(seed))
        step = jax.jit(self.step)
        act = jnp.zeros((self.cfg.num_envs, self.cfg.num_actions))
        saved = 0
        while saved < n_frames:
            for _ in range(self.cfg.cam_every):
                state, _ = step(state, act)
            imgs = np.asarray(state.camera[:, 0])     # [N, W, H]
            for i in range(imgs.shape[0]):
                if saved >= n_frames:
                    break
                np.save(os.path.join(out_dir, f"{time.time()}_{i}.npy"),
                        imgs[i].T)
                saved += 1
        return saved
