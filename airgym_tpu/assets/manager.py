"""AssetManager: asset_config -> per-env analytic scene + actor counts.

Reference counterpart: airgym/assets/asset_manager.py (load_asset's four
include-categories and override merging :27-185,220-259; create_asset's
per-env instantiation with random group variants :187-218). IsaacGym
actors become primitive records for the TPU physics/renderer:

  * include_robot      -> the controlled quadrotor(s) (count = num_assets)
  * include_single_asset-> fixed named primitives (balls, cubes, ...)
  * include_group_asset -> per-slot random variant from a directory-style
                          group ("thin" trees etc., asset_manager.py:145)
  * include_boundary   -> ground / walls (only the ground plane exists in
                          the shipped task configs)

``sample_scene(key)`` returns a render/collision-ready SceneForRender
(per-env randomized placements) plus the env-asset root-state block
[N, num_assets, 13] that backs privileged observations like the
reference's env_asset_root_states slice.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets as areg
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr


@dataclasses.dataclass(frozen=True)
class AssetConfig:
    include_robot: tuple = (("X152b", 1),)
    include_single_asset: tuple = ()       # ((name, count), ...)
    include_group_asset: tuple = ()
    include_boundary: tuple = ()
    placement_x: float = 8.0               # placement half-ranges
    placement_y: float = 4.0

    @staticmethod
    def from_dicts(include_robot: Dict[str, Dict] = None,
                   include_single_asset: Dict[str, Dict] = None,
                   include_group_asset: Dict[str, Dict] = None,
                   include_boundary: Dict[str, Dict] = None,
                   **kw) -> "AssetConfig":
        """Reference-style nested dicts -> hashable config (the reference
        merges per-task override dicts onto registry defaults,
        asset_manager.py:220-259; geometry overrides are not needed for
        primitive assets so only num_assets is consumed)."""
        def conv(d):
            return tuple((name, int(p.get("num_assets", 1)))
                         for name, p in (d or {}).items())

        return AssetConfig(
            include_robot=conv(include_robot) or (("X152b", 1),),
            include_single_asset=conv(include_single_asset),
            include_group_asset=conv(include_group_asset),
            include_boundary=conv(include_boundary), **kw)


class AssetManager:
    def __init__(self, cfg: AssetConfig, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs

    # -- counts (asset_manager.py:133-185) --------------------------------

    def get_robot_count(self) -> int:
        return sum(c for _, c in self.cfg.include_robot)

    def get_env_asset_count(self) -> int:
        return (sum(c for _, c in self.cfg.include_single_asset)
                + sum(c for _, c in self.cfg.include_group_asset)
                + self.get_env_boundary_count())

    def get_env_boundary_count(self) -> int:
        return sum(c for _, c in self.cfg.include_boundary)

    def get_env_actor_count(self) -> int:
        return self.get_robot_count() + self.get_env_asset_count()

    def get_robot_num_bodies(self) -> int:
        # X152b: base + 4 props (model.urdf)
        return 5 * self.get_robot_count()

    # -- scene sampling (create_asset + per-task reset_idx placement) ----

    def sample_scene(self, key) -> Tuple[dr.SceneForRender, jnp.ndarray]:
        n = self.num_envs
        cyls, sphs, boxes = [], [], []
        root_blocks = []

        def place(k, count):
            kp, ky = jax.random.split(k)
            xy = jax.random.uniform(kp, (n, count, 2), minval=-1.0,
                                    maxval=1.0) * jnp.array(
                                        [self.cfg.placement_x,
                                         self.cfg.placement_y])
            yaw = jax.random.uniform(ky, (n, count), minval=-np.pi,
                                     maxval=np.pi)
            return xy, yaw

        has_ground_board = False
        for name, count in self.cfg.include_single_asset:
            if count == 0:
                continue
            key, k = jax.random.split(key)
            spec = areg.registry.get_asset(name)
            if spec.geometry == "plane":
                # textured ground boards (8x18ground/18x18*): rendered
                # and collided as the z=0 ground plane
                has_ground_board = True
                root_blocks.append(jnp.zeros((n, count, 3)))
                continue
            xy, yaw = place(k, count)
            if spec.geometry == "sphere":
                center = jnp.concatenate(
                    [xy, jnp.full((n, count, 1), 1.0)], axis=-1)
                sphs.append(sc.Spheres(
                    center=center,
                    radius=jnp.full((n, count), spec.radius),
                    valid=jnp.ones((n, count), bool)))
                root_blocks.append(center)
            elif spec.geometry == "box":
                he = jnp.asarray(spec.half_extents)
                center = jnp.concatenate(
                    [xy, jnp.full((n, count, 1), float(he[2]))], axis=-1)
                boxes.append(sc.Boxes(
                    center=center, yaw=yaw,
                    half_extents=jnp.broadcast_to(he, (n, count, 3)),
                    valid=jnp.ones((n, count), bool)))
                root_blocks.append(center)

        annuli = []
        for name, count in self.cfg.include_group_asset:
            if count == 0:
                continue
            key, kv, k = jax.random.split(key, 3)
            xy, yaw = place(k, count)
            # random URDF variant per slot (asset_manager.py:145), exact
            # per-family multi-primitive geometry tables
            variant = jax.random.randint(
                kv, (n, count), 0, areg.num_variants(name))
            placed = areg.place_group(name, variant, xy, yaw)
            if placed.cylinders is not None:
                cyls.append(placed.cylinders)
            if placed.spheres is not None:
                sphs.append(placed.spheres)
            if placed.boxes is not None:
                boxes.append(placed.boxes)
            if placed.annuli is not None:
                annuli.append(placed.annuli)
            root_blocks.append(jnp.concatenate(
                [xy, jnp.zeros((n, count, 1))], axis=-1))

        def cat(parts, cls):
            if not parts:
                return None
            return cls(*[jnp.concatenate(fields, axis=1)
                         for fields in zip(*parts)])

        scene = dr.SceneForRender(
            cylinders=cat(cyls, sc.Cylinders),
            spheres=cat(sphs, sc.Spheres),
            boxes=cat(boxes, sc.Boxes),
            annuli=cat(annuli, sc.Annuli),
            ground=bool(self.cfg.include_boundary) or has_ground_board
            or True)

        if root_blocks:
            pos = jnp.concatenate(root_blocks, axis=1)
            k_assets = pos.shape[1]
            states = jnp.zeros((n, k_assets, 13)).at[..., 0:3].set(
                pos).at[..., 6].set(1.0)
        else:
            states = jnp.zeros((n, 0, 13))
        return scene, states
