"""Asset layer: registry + primitive geometry tables.

Reference counterpart: airgym/assets/ (asset_register.py:13-57 registry +
DEFAULT_PARAMS, assets/__init__.py:5-12 semantic IDs and registrations,
asset_manager.py load/create). The reference resolves assets to URDF files
for IsaacGym; here assets resolve to **analytic primitive geometry** used
by the TPU physics (collision) and renderer (ray cast):

  * X152b robot: point mass + 0.2 m collision sphere (model.urdf:16,19-23)
  * thin trees: single tilted cylinders; the exact per-variant
    (radius, length, origin, rpy) of all 100 reference URDFs is baked into
    ``thin_trees.npy`` (extracted from env_assets/thin/tree_*.urdf)
  * balls/balloon: 0.2 m spheres (balls/ball/model.urdf)
  * cubes/1x1: 1 m boxes
  * grounds: the ground plane

``sample_tree_scene`` reproduces the reference's group-asset behavior:
each env draws a random URDF variant per tree slot (asset_manager.py:145)
and a random yaw + position at reset (planning.py:67-76).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.physics import scene as sc

THIN_SEMANTIC_ID = 1
VTREE_SEMANTIC_ID = 2
OBJECT_SEMANTIC_ID = 3
CUBE_SEMANTIC_ID = 4
FLAG_SEMANTIC_ID = 5
TREE_SEMANTIC_ID = 6
BALL_SEMANTIC_ID = 7
GROUND_SEMANTIC_ID = 8

_ASSET_DIR = os.path.dirname(__file__)


@dataclasses.dataclass(frozen=True)
class AssetSpec:
    """Reference DEFAULT_PARAMS analogue (asset_register.py:13-34), reduced
    to what the analytic backend consumes."""
    name: str
    asset_type: str              # robot | single | group | boundary
    semantic_id: int = 0
    geometry: str = "sphere"     # sphere | cylinder_table | box | plane
    radius: float = 0.0
    half_extents: tuple = (0.5, 0.5, 0.5)
    fix_base_link: bool = True
    collision_mask: int = 1
    num_assets: int = 1


class AssetRegistry:
    def __init__(self):
        self._assets: Dict[str, AssetSpec] = {}

    def register_asset(self, name: str, spec: AssetSpec) -> None:
        self._assets[name] = spec

    def get_asset(self, name: str) -> AssetSpec:
        return self._assets[name]

    def names(self):
        return sorted(self._assets)


registry = AssetRegistry()

registry.register_asset("X152b", AssetSpec(
    name="X152b", asset_type="robot", geometry="sphere", radius=0.2,
    fix_base_link=False))
registry.register_asset("thin", AssetSpec(
    name="thin", asset_type="group", semantic_id=THIN_SEMANTIC_ID,
    geometry="cylinder_table"))
registry.register_asset("vtrees", AssetSpec(
    name="vtrees", asset_type="group", semantic_id=VTREE_SEMANTIC_ID,
    geometry="cylinder_table"))
registry.register_asset("trees", AssetSpec(
    name="trees", asset_type="group", semantic_id=TREE_SEMANTIC_ID,
    geometry="cylinder_table"))
registry.register_asset("balls/ball", AssetSpec(
    name="balls/ball", asset_type="single", semantic_id=BALL_SEMANTIC_ID,
    geometry="sphere", radius=0.2))
registry.register_asset("balls/balloon", AssetSpec(
    name="balls/balloon", asset_type="single", semantic_id=BALL_SEMANTIC_ID,
    geometry="sphere", radius=0.2))
registry.register_asset("cubes/1x1", AssetSpec(
    name="cubes/1x1", asset_type="single", semantic_id=CUBE_SEMANTIC_ID,
    geometry="box", half_extents=(0.5, 0.5, 0.5), fix_base_link=False))
registry.register_asset("grounds/ground", AssetSpec(
    name="grounds/ground", asset_type="boundary",
    semantic_id=GROUND_SEMANTIC_ID, geometry="plane"))

ROBOT_COLLISION_RADIUS = 0.2  # X152b/model.urdf:16


_TREE_TABLE = None


def thin_tree_table() -> np.ndarray:
    """[100, 8] = (radius, length, ox, oy, oz, roll, pitch, yaw) per
    reference URDF variant (env_assets/thin/tree_*.urdf collision tags)."""
    global _TREE_TABLE
    if _TREE_TABLE is None:
        _TREE_TABLE = np.load(os.path.join(_ASSET_DIR, "thin_trees.npy"))
    return _TREE_TABLE


def tree_cylinders_from_placement(variant_idx: jnp.ndarray,
                                  pos_xy: jnp.ndarray,
                                  yaw: jnp.ndarray) -> sc.Cylinders:
    """Compose world-frame cylinders from per-slot variant + placement.

    variant_idx [N, P] int, pos_xy [N, P, 2], yaw [N, P] — like the
    reference placing a randomly-chosen tree URDF at (x, y, 0) with a
    random z rotation (planning.py:67-76, customized.py:355-362).

    URDF rpy is extrinsic XYZ (R = Rz Ry Rx); trees have roll == 0 so the
    cylinder axis is Rz(yaw_total) @ (sin p, 0, cos p).
    """
    table = jnp.asarray(thin_tree_table())
    row = table[variant_idx]                         # [N, P, 8]
    radius, length = row[..., 0], row[..., 1]
    off = row[..., 2:5]
    pitch, uyaw = row[..., 6], row[..., 7]

    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # actor-yaw rotation of the local cylinder-center offset
    ox = cy * off[..., 0] - sy * off[..., 1]
    oy = sy * off[..., 0] + cy * off[..., 1]
    center = jnp.stack(
        [pos_xy[..., 0] + ox, pos_xy[..., 1] + oy, off[..., 2]], axis=-1)

    total_yaw = yaw + uyaw
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    axis = jnp.stack([jnp.cos(total_yaw) * sp, jnp.sin(total_yaw) * sp,
                      cp], axis=-1)
    valid = jnp.ones(radius.shape, dtype=bool)
    return sc.Cylinders(center=center, axis=axis, half_len=length / 2.0,
                        radius=radius, valid=valid)


def sample_tree_scene(key, n_envs: int, num_trees: int,
                      x_half: float, y_half: float) -> sc.Cylinders:
    """Random forest like the Planning/Customized reset: positions
    ~ U(-x_half, x_half) x U(-y_half, y_half), random yaw, random variant."""
    kv, kp, ky = jax.random.split(key, 3)
    variant = jax.random.randint(kv, (n_envs, num_trees), 0, 100)
    pos = jax.random.uniform(kp, (n_envs, num_trees, 2), minval=-1.0,
                             maxval=1.0) * jnp.array([x_half, y_half])
    yaw = jax.random.uniform(ky, (n_envs, num_trees), minval=-np.pi,
                             maxval=np.pi)
    return tree_cylinders_from_placement(variant, pos, yaw)
