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
from typing import Dict, NamedTuple, Optional

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
    # exact: cubes/1x1/1x1dae.dae is a 0.3 m cube (scripts/extract_assets)
    geometry="box", half_extents=(0.15, 0.15, 0.15), fix_base_link=False))
registry.register_asset("grounds/ground", AssetSpec(
    name="grounds/ground", asset_type="boundary",
    semantic_id=GROUND_SEMANTIC_ID, geometry="plane"))

# -- remaining reference registrations (assets/__init__.py:133-376) --------
# group families backed by per-variant geometry tables (family_geometry)
registry.register_asset("objects", AssetSpec(
    name="objects", asset_type="group", semantic_id=OBJECT_SEMANTIC_ID,
    geometry="family"))
registry.register_asset("cubes", AssetSpec(
    name="cubes", asset_type="group", semantic_id=CUBE_SEMANTIC_ID,
    geometry="family"))
registry.register_asset("balls", AssetSpec(
    name="balls", asset_type="group", semantic_id=BALL_SEMANTIC_ID,
    geometry="family"))
registry.register_asset("flags", AssetSpec(
    name="flags", asset_type="group", semantic_id=FLAG_SEMANTIC_ID,
    geometry="family"))
# textured ground boards (env_assets/grounds/<name>/model.urdf; the .dae
# node matrix scales a z=0 unit square: 8x18 -> half (4, 9) m, 18x18
# variants -> (9, 9) m; 'o'/'s' differ only in the obstacle/stripe
# texture). The analytic backend renders/collides them as the z=0 ground
# plane; half_extents record the board footprint.
registry.register_asset("8x18ground", AssetSpec(
    name="8x18ground", asset_type="single",
    semantic_id=GROUND_SEMANTIC_ID, geometry="plane",
    half_extents=(4.0, 9.0, 0.0)))
for _g in ("18x18ground", "18x18o", "18x18s"):
    registry.register_asset(_g, AssetSpec(
        name=_g, asset_type="single", semantic_id=GROUND_SEMANTIC_ID,
        geometry="plane", half_extents=(9.0, 9.0, 0.0)))

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


# --------------------------------------------------------------------------
# Per-family multi-primitive geometry tables (reference URDF/DAE variants,
# extracted offline by scripts/extract_assets.py — see its docstring for
# exactness notes). Every table is in the Z-up asset frame; placement
# composes a per-slot (x, y, yaw).


class FamilyGeom(NamedTuple):
    """Per-variant primitive tables, all [V, P, k] with a trailing valid
    column (0 padding rows)."""
    cyls: Optional[np.ndarray] = None     # [V, C, 9] center axis radius half_len valid
    boxes: Optional[np.ndarray] = None    # [V, B, 7] center half_extents valid
    sphs: Optional[np.ndarray] = None     # [V, S, 5] center radius valid
    annuli: Optional[np.ndarray] = None   # [V, A, 10] center normal r_in r_out half_thick valid


_FAMILY_CACHE: Dict[str, FamilyGeom] = {}


def _load(name):
    return np.load(os.path.join(_ASSET_DIR, name))


def family_geometry(family: str) -> FamilyGeom:
    """Geometry tables for a group-asset family (env_assets/<family>)."""
    if family in _FAMILY_CACHE:
        return _FAMILY_CACHE[family]
    if family == "thin":
        t = thin_tree_table()                      # [100, 8] legacy layout
        radius, length = t[:, 0], t[:, 1]
        off = t[:, 2:5]
        pitch, uyaw = t[:, 6], t[:, 7]
        axis = np.stack([np.cos(uyaw) * np.sin(pitch),
                         np.sin(uyaw) * np.sin(pitch),
                         np.cos(pitch)], axis=-1)
        cyls = np.concatenate(
            [off, axis, radius[:, None], length[:, None] / 2,
             np.ones((len(t), 1))], axis=-1)[:, None, :]
        geom = FamilyGeom(cyls=cyls.astype(np.float32))
    elif family == "vtrees":
        v = _load("vtrees.npy")                    # [100, 13, 8]
        valid = np.ones(v.shape[:2] + (1,), np.float32)
        geom = FamilyGeom(cyls=np.concatenate([v, valid], axis=-1))
    elif family == "trees":
        z = _load("tree_mesh.npz")
        c, s = z["cylinders"], z["spheres"]        # [12, 8], [24, 4]
        cyls = np.concatenate(
            [c, np.ones((len(c), 1), np.float32)], axis=-1)[None]
        sphs = np.concatenate(
            [s, np.ones((len(s), 1), np.float32)], axis=-1)[None]
        geom = FamilyGeom(cyls=cyls, sphs=sphs)
    elif family == "cubes":
        geom = FamilyGeom(boxes=_load("cubes.npy"))       # [8, 4, 7]
    elif family == "flags":
        z = _load("flags.npz")
        ann = z["annuli"].copy()
        # the ring panels are zero-thickness surfaces in the mesh; give
        # them a 1 cm solid thickness so rays/contacts can hit them
        ann[..., 8] = np.maximum(ann[..., 8], 0.01)
        geom = FamilyGeom(cyls=z["cyls"], boxes=z["boxes"], annuli=ann)
    elif family == "balls":
        # env_assets/balls: ball (0.2 m collision sphere), ball_no_geom
        # (radius-0 collision -> no geometry, valid 0), balloon
        # (ellipsoid_balloon.stl x0.2 = semi-axes (0.14, 0.14, 0.2);
        # bounded by its 0.2 m z semi-axis like the Balloon task target)
        sphs = np.zeros((3, 1, 5), np.float32)
        sphs[0, 0] = (0, 0, 0, 0.2, 1)             # ball
        sphs[1, 0] = (0, 0, 0, 0.0, 0)             # ball_no_geom
        sphs[2, 0] = (0, 0, 0, 0.2, 1)             # balloon
        geom = FamilyGeom(sphs=sphs)
    elif family == "objects":
        t = _load("objects.npy")                   # [5, 8] kind rows
        is_box = t[:, 0] == 0
        boxes = np.zeros((len(t), 1, 7), np.float32)
        boxes[:, 0, :3] = t[:, 1:4]
        boxes[:, 0, 3:6] = t[:, 4:7]
        boxes[:, 0, 6] = is_box
        sphs = np.zeros((len(t), 1, 5), np.float32)
        sphs[:, 0, :3] = t[:, 1:4]
        sphs[:, 0, 3] = t[:, 4]
        sphs[:, 0, 4] = ~is_box
        geom = FamilyGeom(boxes=boxes, sphs=sphs)
    else:
        raise KeyError(f"unknown asset family: {family}")
    _FAMILY_CACHE[family] = geom
    return geom


def num_variants(family: str) -> int:
    g = family_geometry(family)
    for t in g:
        if t is not None:
            return t.shape[0]
    return 0


def _yaw_rot(yaw, v):
    """Rotate [.., 3] vectors by per-element yaw [..] about z."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([c * v[..., 0] - s * v[..., 1],
                      s * v[..., 0] + c * v[..., 1], v[..., 2]], axis=-1)


class PlacedGroup(NamedTuple):
    cylinders: Optional[sc.Cylinders] = None
    spheres: Optional[sc.Spheres] = None
    boxes: Optional[sc.Boxes] = None
    annuli: Optional[sc.Annuli] = None


def place_group(family: str, variant_idx: jnp.ndarray, pos_xy: jnp.ndarray,
                yaw: jnp.ndarray) -> PlacedGroup:
    """World-frame primitives for per-slot (variant, x, y, yaw) placements.

    variant_idx [N, P] int, pos_xy [N, P, 2], yaw [N, P] — like the
    reference placing a random URDF variant per slot at (x, y, 0) with a
    random z rotation (asset_manager.py:145, planning.py:67-76). Every
    per-variant primitive is composed with the slot transform; outputs
    flatten the slot and primitive axes to [N, P*K, ...].
    """
    g = family_geometry(family)
    n, p = variant_idx.shape
    world_xyz = jnp.concatenate(
        [pos_xy, jnp.zeros(pos_xy.shape[:-1] + (1,), pos_xy.dtype)],
        axis=-1)                                           # [N, P, 3]

    def compose_center(local_c):
        # [N, P, K, 3]: yaw-rotate the asset-frame offset, add slot xy
        return (_yaw_rot(yaw[..., None], local_c)
                + world_xyz[:, :, None, :])

    def flat(x, trailing):
        return x.reshape((n, -1) + trailing)

    cylinders = spheres = boxes = annuli = None
    if g.cyls is not None:
        row = jnp.asarray(g.cyls)[variant_idx]             # [N, P, C, 9]
        center = compose_center(row[..., 0:3])
        axis = _yaw_rot(yaw[..., None], row[..., 3:6])
        cylinders = sc.Cylinders(
            center=flat(center, (3,)), axis=flat(axis, (3,)),
            half_len=flat(row[..., 7], ()), radius=flat(row[..., 6], ()),
            valid=flat(row[..., 8] > 0, ()))
    if g.sphs is not None:
        row = jnp.asarray(g.sphs)[variant_idx]             # [N, P, S, 5]
        center = compose_center(row[..., 0:3])
        spheres = sc.Spheres(center=flat(center, (3,)),
                             radius=flat(row[..., 3], ()),
                             valid=flat(row[..., 4] > 0, ()))
    if g.boxes is not None:
        row = jnp.asarray(g.boxes)[variant_idx]            # [N, P, B, 7]
        center = compose_center(row[..., 0:3])
        nb = row.shape[2]
        boxes = sc.Boxes(
            center=flat(center, (3,)),
            yaw=flat(jnp.broadcast_to(yaw[..., None], (n, p, nb)), ()),
            half_extents=flat(row[..., 3:6], (3,)),
            valid=flat(row[..., 6] > 0, ()))
    if g.annuli is not None:
        row = jnp.asarray(g.annuli)[variant_idx]           # [N, P, A, 10]
        center = compose_center(row[..., 0:3])
        normal = _yaw_rot(yaw[..., None], row[..., 3:6])
        annuli = sc.Annuli(
            center=flat(center, (3,)), normal=flat(normal, (3,)),
            r_in=flat(row[..., 6], ()), r_out=flat(row[..., 7], ()),
            half_thick=flat(row[..., 8], ()), valid=flat(row[..., 9] > 0,
                                                         ()))
    return PlacedGroup(cylinders=cylinders, spheres=spheres, boxes=boxes,
                       annuli=annuli)


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
