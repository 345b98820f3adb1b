"""Batched depth-camera renderer (TPU-native IsaacGym camera replacement).

Replaces the reference's PhysX render pipeline + per-env Python
post-processing loop (asset_manager.py:204-213 camera creation,
customized.py:386-435 ``render_cameras``/``dump_images``) with an analytic
ray cast against the scene primitives of airgym_tpu/physics/scene.py,
fully vectorized over envs and rays.

Camera model (reference X152b asset config, planning_config.py:52-62):
  * 212 x 120, horizontal FOV 87 deg (vertical derived by aspect),
    far plane 5 m, mounted at (0.15, 0, 0.1) in the body frame, identity
    rotation — IsaacGym cameras look along their +x with +z up.
  * IsaacGym depth images are perpendicular (z-) depth, negated; the
    reference negates + transposes to [W=212, H=120] (customized.py:402).
    The image array layout here matches: [N, 1, 212, 120].

Post-processing reproduces dump_images exactly, including its quirks:
  clamp at 4.5 m -> /4.5 normalize -> additive N(0, .1) noise (clamped to
  [0, max]) -> multiplicative N(1, .3) noise -> 5x5 convolution with a
  RANDOM UNIFORM kernel quantized to /256 that is NOT normalized
  (customized.py:416-423  the "blur" scales intensities by ~12.5x on
  average; downstream thresholds like the esdf alive check were tuned
  against this, so it is preserved bit-for-spirit).

To bound memory the ray x primitive product is evaluated as a lax.scan
over primitives with an [N, R] running minimum — never materializing
[N, R, P].
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import scene as sc

BIG = sc.BIG


@dataclasses.dataclass(frozen=True)
class CameraCfg:
    width: int = 212
    height: int = 120
    horizontal_fov_deg: float = 87.0
    far_plane: float = 5.0
    depth_clamp: float = 4.5            # customized.py:403-404
    mount_pos: tuple = (0.15, 0.0, 0.1)
    channels: int = 1


def ray_grid(cfg: CameraCfg) -> np.ndarray:
    """Camera-frame ray directions [W, H, 3] (x fwd, y left, z up),
    unnormalized with x == 1 so (hit_t * 1) is directly the z-depth."""
    w, h = cfg.width, cfg.height
    tan_h = np.tan(np.radians(cfg.horizontal_fov_deg) / 2.0)
    tan_v = tan_h * h / w
    u = (np.arange(w) + 0.5) / w          # 0..1 across width
    v = (np.arange(h) + 0.5) / h
    y = tan_h * (1.0 - 2.0 * u)           # left positive
    z = tan_v * (1.0 - 2.0 * v)           # up positive
    yy, zz = np.meshgrid(y, z, indexing="ij")      # [W, H]
    dirs = np.stack([np.ones_like(yy), yy, zz], axis=-1)
    return dirs.astype(np.float32)


class SceneForRender(NamedTuple):
    """Optional primitive sets, each batched [N, P, ...] or None."""
    cylinders: Optional[sc.Cylinders] = None
    spheres: Optional[sc.Spheres] = None
    boxes: Optional[sc.Boxes] = None
    ground: bool = False
    annuli: Optional[sc.Annuli] = None      # circle-flag gate rings


def min_dist_scene(p: jnp.ndarray, scene: "SceneForRender") -> jnp.ndarray:
    """Min distance from point(s) p [.., 3] to every scene primitive
    [..] (contact queries; ground excluded — tasks check z directly)."""
    d = jnp.full(p.shape[:-1], BIG, p.dtype)
    if scene.cylinders is not None:
        d = jnp.minimum(d, jnp.min(
            sc.dist_to_cylinders(p, scene.cylinders), axis=-1))
    if scene.spheres is not None:
        d = jnp.minimum(d, jnp.min(
            sc.dist_to_spheres(p, scene.spheres), axis=-1))
    if scene.boxes is not None:
        d = jnp.minimum(d, jnp.min(
            sc.dist_to_boxes(p, scene.boxes), axis=-1))
    if scene.annuli is not None:
        d = jnp.minimum(d, jnp.min(
            sc.dist_to_annuli(p, scene.annuli), axis=-1))
    return d


def _scan_min(cast_one, prims, t0):
    """Fold a per-primitive ray cast over the primitive axis.

    prims: pytree with leaves [N, P, ...]; cast_one(slice [N, ...]) -> [N, R].
    """
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, 1, 0), prims)

    def body(tmin, p):
        return jnp.minimum(tmin, cast_one(p)), None

    tmin, _ = jax.lax.scan(body, t0, xs)
    return tmin


def render_depth(cfg: CameraCfg, root_states: jnp.ndarray,
                 scene: SceneForRender) -> jnp.ndarray:
    """Raw z-depth images [N, W, H] (meters, BIG where no hit <= far)."""
    n = root_states.shape[0]
    q = root_states[:, 3:7]
    pos = root_states[:, 0:3]

    dirs_cam = jnp.asarray(ray_grid(cfg)).reshape(-1, 3)       # [R, 3]
    R = dirs_cam.shape[0]
    # world-frame ray dirs: R_body @ dir_cam — batched small matmul
    m = rot.quat_to_matrix(q)                                   # [N, 3, 3]
    dirs_w = jnp.einsum("nij,rj->nri", m, dirs_cam,
                        precision=jax.lax.Precision.HIGHEST)  # [N, R, 3]
    norm = jnp.linalg.norm(dirs_w, axis=-1)                     # for t scale
    dirs_u = dirs_w / norm[..., None]
    origin = pos + rot.quat_rotate(q, jnp.asarray(cfg.mount_pos,
                                                  root_states.dtype))
    o = jnp.broadcast_to(origin[:, None, :], (n, R, 3))

    t_eu = jnp.full((n, R), BIG, dtype=root_states.dtype)

    if scene.ground:
        t_eu = jnp.minimum(t_eu, sc.ray_ground(o, dirs_u))

    if scene.cylinders is not None:
        def cast_cyl(p):
            one = sc.Cylinders(*[jnp.expand_dims(a, 1) for a in p])
            return sc.ray_cylinders(o, dirs_u, one)
        t_eu = _scan_min(cast_cyl, scene.cylinders, t_eu)

    if scene.spheres is not None:
        def cast_sph(p):
            one = sc.Spheres(*[jnp.expand_dims(a, 1) for a in p])
            return sc.ray_spheres(o, dirs_u, one)
        t_eu = _scan_min(cast_sph, scene.spheres, t_eu)

    if scene.boxes is not None:
        def cast_box(p):
            one = sc.Boxes(*[jnp.expand_dims(a, 1) for a in p])
            return sc.ray_boxes(o, dirs_u, one)
        t_eu = _scan_min(cast_box, scene.boxes, t_eu)

    if scene.annuli is not None:
        def cast_ann(p):
            one = sc.Annuli(*[jnp.expand_dims(a, 1) for a in p])
            return sc.ray_annuli(o, dirs_u, one)
        t_eu = _scan_min(cast_ann, scene.annuli, t_eu)

    # euclidean t -> perpendicular z-depth: divide by |dir| where the
    # unnormalized dir had x == 1 (depth = t_eu / norm at that pixel)
    depth = t_eu / norm
    return depth.reshape(n, cfg.width, cfg.height)


def postprocess(cfg: CameraCfg, depth: jnp.ndarray, key) -> jnp.ndarray:
    """dump_images pipeline (customized.py:399-427) -> [N, 1, W, H]."""
    n, w, h = depth.shape
    x = jnp.clip(depth, 0.0, cfg.depth_clamp) / cfg.depth_clamp

    k1, k2, k3 = jax.random.split(key, 3)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    x = jnp.clip(x + 0.1 * jax.random.normal(k1, x.shape), 0.0, mx)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    x = jnp.clip(x * (1.0 + 0.3 * jax.random.normal(k2, x.shape)), 0.0, mx)

    # per-env random 5x5 kernel, values in {0/256 .. 255/256}, unnormalized
    kern = jax.random.randint(k3, (n, 5, 5), 0, 256).astype(x.dtype) / 256.0
    # depthwise conv: treat envs as channels [1, N, W, H] * [N, 1, 5, 5]
    out = jax.lax.conv_general_dilated(
        x[None],                                   # NCHW with C = envs
        kern[:, None],                             # OIHW, per-env filter
        window_strides=(1, 1), padding="SAME",
        feature_group_count=n)
    return out[0][:, None]                         # [N, 1, W, H]


def render_depth_auto(cfg: CameraCfg, root_states, scene,
                      cull_far_z=None) -> jnp.ndarray:
    """Fused Pallas ray cast on TPU (9x faster, see
    render/pallas_raycast.py), XLA fallback elsewhere (tests run on CPU).

    cull_far_z: opt-in per-env primitive culling, exact for images that
    are subsequently clipped at this z (see render_depth_pallas). Applied
    on the Pallas path only — the XLA fallback is the uncull'd oracle."""
    if jax.default_backend() == "tpu":
        from airgym_tpu.render.pallas_raycast import render_depth_pallas
        return render_depth_pallas(cfg, root_states, scene,
                                   interpret=False, cull_far_z=cull_far_z)
    return render_depth(cfg, root_states, scene)


def render_and_process(cfg: CameraCfg, root_states, scene, key):
    """Depth render + dump_images postprocess -> [N, 1, W, H].

    On TPU the two stages run as ONE fused Pallas kernel
    (render/pallas_raycast.render_process_pallas): the raw [N, W, H]
    depth never round-trips HBM, and the per-env random 5x5 blur runs as
    in-register rotates instead of a feature_group_count=N grouped conv.
    Its noise comes from the kernel-resident hash RNG — distributionally
    identical to this file's threefry ``postprocess`` (asserted in
    tests/test_fused_render.py) but not bitwise; the exact fused pipeline
    is mirrored by pallas_raycast.postprocess_hash.  Elsewhere (CPU
    tests) the unfused XLA pipeline below is the oracle.

    Cameras taller than the fused kernel's lane budget (H > 126, possible
    since cam_height became user-configurable) fall back to the unfused
    XLA pipeline on every backend instead of crashing TPU-only.
    """
    if jax.default_backend() == "tpu":
        from airgym_tpu.render.pallas_raycast import (LANES,
                                                      render_process_pallas)
        if cfg.height <= LANES - 2:
            # postprocess clips at depth_clamp, so culling at that z is
            # exact
            return render_process_pallas(cfg, root_states, scene, key,
                                         interpret=False,
                                         cull_far_z=cfg.depth_clamp)
    return postprocess(cfg, render_depth(cfg, root_states, scene), key)
