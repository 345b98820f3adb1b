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
3 cubes + 3 flags) with per-variant geometry extracted from the reference
URDF/DAE assets (scripts/extract_assets.py): thin/vtree cylinders and
cube boxes are exact; the tree mesh is a fitted cylinder-skeleton +
leaf-sphere composition and the flag gates are exact annulus panels /
fitted arch hoops.

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
    # depth camera resolution (reference customized_config.py camera
    # block: 212x120); override for cheaper CI cameras or other sensors
    cam_width: int = 212
    cam_height: int = 120
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
    # per-family variants are fixed at creation (IsaacGym cannot swap a
    # loaded asset after create_asset); positions/yaws re-randomize at
    # every reset (depthgen.py:355-362)
    thin_variant: jnp.ndarray
    thin_pos: jnp.ndarray
    thin_yaw: jnp.ndarray
    tree_variant: jnp.ndarray
    tree_pos: jnp.ndarray             # [N, T, 2]
    tree_yaw: jnp.ndarray
    cube_variant: jnp.ndarray
    cube_pos: jnp.ndarray             # [N, C, 2]
    cube_yaw: jnp.ndarray
    flag_variant: jnp.ndarray
    flag_pos: jnp.ndarray             # [N, F, 2]
    flag_yaw: jnp.ndarray
    camera: jnp.ndarray
    counter: jnp.ndarray


class DepthGen(base.QuadEnvCore):
    task_name = "depthgen"
    action_limit_overrides = {"rate": base.NARROW_RATE_LIMITS}
    num_obs = 18

    def __init__(self, cfg: DepthGenCfg = DepthGenCfg(), **kw):
        super().__init__(cfg, **kw)
        self.cam_cfg = dr.CameraCfg(width=cfg.cam_width,
                                    height=cfg.cam_height)
        self.target = jnp.zeros((cfg.num_envs, 18), dtype=cfg.dtype)
        self.target = self.target.at[:, 0].set(1.0).at[:, 4].set(
            1.0).at[:, 8].set(1.0)

    def _sample_xy(self, key, n, count):
        kx, ky = jax.random.split(key)
        x = LENGTH * jax.random.uniform(kx, (n, count))          # U(0, L)
        y = WIDTH * jax.random.uniform(ky, (n, count), minval=-1, maxval=1)
        return jnp.stack([x, y], axis=-1)

    def _reset_scene(self, key, n):
        """Re-randomized placements: (pos, yaw) per family."""
        cfg = self.cfg
        ks = jax.random.split(key, 8)

        def yaws(k, count):
            return jax.random.uniform(k, (n, count), minval=-np.pi,
                                      maxval=np.pi)

        return (self._sample_xy(ks[0], n, cfg.num_thin),
                yaws(ks[1], cfg.num_thin),
                self._sample_xy(ks[2], n, cfg.num_trees),
                yaws(ks[3], cfg.num_trees),
                self._sample_xy(ks[4], n, cfg.num_cubes),
                yaws(ks[5], cfg.num_cubes),
                self._sample_xy(ks[6], n, cfg.num_flags),
                yaws(ks[7], cfg.num_flags))

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
        cfg = self.cfg

        def variants(k, count, family):
            return jax.random.randint(k, (n, count), 0,
                                      assets.num_variants(family))

        kvs = jax.random.split(kv, 4)
        scene = self._reset_scene(ks, n)
        root = self._reset_root(kr, n)
        cam = jnp.zeros((n, 1, self.cam_cfg.width, self.cam_cfg.height),
                        dtype=self.cfg.dtype)
        return DepthGenState(
            core=self.init_core(kc, root),
            thin_variant=variants(kvs[0], cfg.num_thin, "thin"),
            thin_pos=scene[0], thin_yaw=scene[1],
            tree_variant=variants(kvs[1], cfg.num_trees, "trees"),
            tree_pos=scene[2], tree_yaw=scene[3],
            cube_variant=variants(kvs[2], cfg.num_cubes, "cubes"),
            cube_pos=scene[4], cube_yaw=scene[5],
            flag_variant=variants(kvs[3], cfg.num_flags, "flags"),
            flag_pos=scene[6], flag_yaw=scene[7],
            camera=cam, counter=jnp.asarray(0, jnp.int32))

    def _scene(self, state: DepthGenState) -> dr.SceneForRender:
        """Exact per-variant geometry for all four families
        (scripts/extract_assets.py tables)."""
        thin = assets.place_group("thin", state.thin_variant,
                                  state.thin_pos, state.thin_yaw)
        trees = assets.place_group("trees", state.tree_variant,
                                   state.tree_pos, state.tree_yaw)
        cubes = assets.place_group("cubes", state.cube_variant,
                                   state.cube_pos, state.cube_yaw)
        flags = assets.place_group("flags", state.flag_variant,
                                   state.flag_pos, state.flag_yaw)

        def cat(cls, parts):
            parts = [p for p in parts if p is not None]
            if not parts:
                return None
            return cls(*[jnp.concatenate(f, axis=1) for f in zip(*parts)])

        return dr.SceneForRender(
            cylinders=cat(sc.Cylinders, [thin.cylinders, trees.cylinders,
                                         flags.cylinders]),
            spheres=cat(sc.Spheres, [trees.spheres]),
            boxes=cat(sc.Boxes, [cubes.boxes, flags.boxes]),
            annuli=cat(sc.Annuli, [flags.annuli]),
            ground=True)

    def step(self, state: DepthGenState, actions: jnp.ndarray
             ) -> Tuple[DepthGenState, base.StepOutput]:
        core = state.core
        cfg = self.cfg
        rng, k_noise, k_scene, k_root = jax.random.split(core.rng, 4)

        acts = self.remap_actions(actions)
        cmds, ctrl = self.run_controller(core, acts)
        root, rotors = self.physics_step(core, cmds)
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
        core = core._replace(root=root, ctrl=ctrl, rotors=rotors, progress=progress,
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
            tree_variant=state.tree_variant,
            tree_pos=merge(state.tree_pos, scene[2], 2),
            tree_yaw=merge(state.tree_yaw, scene[3], 1),
            cube_variant=state.cube_variant,
            cube_pos=merge(state.cube_pos, scene[4], 2),
            cube_yaw=merge(state.cube_yaw, scene[5], 1),
            flag_variant=state.flag_variant,
            flag_pos=merge(state.flag_pos, scene[6], 2),
            flag_yaw=merge(state.flag_yaw, scene[7], 1),
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
