"""Analytic scene primitives: collision queries + ray casting.

TPU-native replacement for the two things the reference gets from
IsaacGym/PhysX beyond rigid-body flight dynamics:

  * contact detection (net-contact-force tensor, reference
    customized.py:52,393-397 — drones die on any contact > 0.1 N, so
    distance checks against primitives are behaviorally equivalent), and
  * the depth-camera ray geometry (reference uses PhysX render cameras,
    asset_manager.py:204-213; here rays are cast analytically against the
    same URDF-derived primitives — see airgym_tpu/render/depth.py).

Primitives cover the URDF inventory actually used by the tasks
(SURVEY.md 2.2): tilted finite cylinders (thin/vtrees trees), spheres
(balls/balloon, and the X152b's own 0.2 m collision sphere —
X152b/model.urdf:16), yaw-rotated boxes (cubes), and the ground plane.

All functions are batched over an arbitrary leading primitive axis P and
broadcast over ray/query axes; everything is jnp, jit/vmap/shard-safe.
Scenes are described by a ``Primitives`` struct of stacked arrays with a
validity mask, so every env can carry MAX_PRIM obstacles with static shape.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

BIG = 1e9


class Cylinders(NamedTuple):
    """Finite cylinders: center [.., P, 3], unit axis [.., P, 3],
    half_len [.., P], radius [.., P], valid [.., P] (bool)."""
    center: jnp.ndarray
    axis: jnp.ndarray
    half_len: jnp.ndarray
    radius: jnp.ndarray
    valid: jnp.ndarray


class Spheres(NamedTuple):
    center: jnp.ndarray       # [.., P, 3]
    radius: jnp.ndarray       # [.., P]
    valid: jnp.ndarray        # [.., P]


class Boxes(NamedTuple):
    """Axis-yawed boxes: center [.., P, 3], yaw [.., P], half_extents
    [.., P, 3], valid [.., P]."""
    center: jnp.ndarray
    yaw: jnp.ndarray
    half_extents: jnp.ndarray
    valid: jnp.ndarray


# --------------------------------------------------------------------------
# distance queries (for contact checks): point -> surface distance


def dist_to_cylinders(p: jnp.ndarray, cyl: Cylinders) -> jnp.ndarray:
    """Min distance from point(s) p [.., 3] to each cylinder surface
    [.., P]; invalid primitives report +BIG."""
    d = p[..., None, :] - cyl.center                       # [.., P, 3]
    along = jnp.sum(d * cyl.axis, axis=-1)                 # [.., P]
    along_cl = jnp.clip(along, -cyl.half_len, cyl.half_len)
    radial = d - along[..., None] * cyl.axis
    r = jnp.linalg.norm(radial, axis=-1)
    # distance decomposition: outside radius and/or beyond caps
    dr = jnp.maximum(r - cyl.radius, 0.0)
    dz = jnp.maximum(jnp.abs(along) - cyl.half_len, 0.0)
    outside = jnp.sqrt(dr * dr + dz * dz)
    inside = jnp.minimum(cyl.radius - r, cyl.half_len - jnp.abs(along))
    dist = jnp.where((dr > 0) | (dz > 0), outside, -inside)
    return jnp.where(cyl.valid, dist, BIG)


def dist_to_spheres(p: jnp.ndarray, sph: Spheres) -> jnp.ndarray:
    d = jnp.linalg.norm(p[..., None, :] - sph.center, axis=-1) - sph.radius
    return jnp.where(sph.valid, d, BIG)


def dist_to_boxes(p: jnp.ndarray, box: Boxes) -> jnp.ndarray:
    d = p[..., None, :] - box.center                       # [.., P, 3]
    c, s = jnp.cos(box.yaw), jnp.sin(box.yaw)
    lx = c * d[..., 0] + s * d[..., 1]
    ly = -s * d[..., 0] + c * d[..., 1]
    local = jnp.stack([lx, ly, d[..., 2]], axis=-1)
    q = jnp.abs(local) - box.half_extents
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return jnp.where(box.valid, outside + inside, BIG)


# --------------------------------------------------------------------------
# ray casts (for the depth camera): origin o, unit dir v -> hit distance t
# (BIG when no hit). Shapes: o, v [.., R, 3]; primitives [.., P, ...];
# result [.., R] = min over P.


def ray_ground(o: jnp.ndarray, v: jnp.ndarray, z: float = 0.0) -> jnp.ndarray:
    t = (z - o[..., 2]) / jnp.where(jnp.abs(v[..., 2]) < 1e-9, 1e-9,
                                    v[..., 2])
    return jnp.where(t > 1e-6, t, BIG)


def ray_spheres(o, v, sph: Spheres) -> jnp.ndarray:
    oc = o[..., None, :] - sph.center[..., None, :, :]      # [.., R, P, 3]
    b = jnp.sum(oc * v[..., None, :], axis=-1)              # [.., R, P]
    c = jnp.sum(oc * oc, axis=-1) - jnp.square(sph.radius)[..., None, :]
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    hit = (disc > 0) & (t > 1e-6) & sph.valid[..., None, :]
    return jnp.min(jnp.where(hit, t, BIG), axis=-1)


def ray_cylinders(o, v, cyl: Cylinders) -> jnp.ndarray:
    """Finite (uncapped) cylinder intersection; caps are irrelevant for
    tree trunks whose ends sit in the ground / above the camera frustum."""
    ax = cyl.axis[..., None, :, :]                          # [.., 1, P, 3]
    ce = cyl.center[..., None, :, :]
    oc = o[..., None, :] - ce                               # [.., R, P, 3]
    vv = v[..., None, :]                                    # [.., R, 1, 3]

    v_par = jnp.sum(vv * ax, axis=-1)                       # [.., R, P]
    o_par = jnp.sum(oc * ax, axis=-1)
    v_perp = vv - v_par[..., None] * ax
    o_perp = oc - o_par[..., None] * ax

    a = jnp.sum(v_perp * v_perp, axis=-1)
    b = jnp.sum(o_perp * v_perp, axis=-1)
    c = jnp.sum(o_perp * o_perp, axis=-1) - jnp.square(
        cyl.radius)[..., None, :]
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a < 1e-9, 1e-9, a)
    t = (-b - sq) / a_safe
    # height check along the axis at the hit point
    h = o_par + t * v_par
    hit = ((disc > 0) & (t > 1e-6) & (jnp.abs(h) <= cyl.half_len[..., None, :])
           & cyl.valid[..., None, :])
    return jnp.min(jnp.where(hit, t, BIG), axis=-1)


def ray_boxes(o, v, box: Boxes) -> jnp.ndarray:
    """Slab-test intersection with yaw-rotated boxes."""
    c, s = jnp.cos(box.yaw), jnp.sin(box.yaw)               # [.., P]
    d = o[..., None, :] - box.center[..., None, :, :]       # [.., R, P, 3]

    def to_local(w):
        wx = c[..., None, :] * w[..., 0] + s[..., None, :] * w[..., 1]
        wy = -s[..., None, :] * w[..., 0] + c[..., None, :] * w[..., 1]
        return jnp.stack([wx, wy, w[..., 2]], axis=-1)

    lo = to_local(d)
    lv = to_local(jnp.broadcast_to(v[..., None, :], d.shape))
    lv = jnp.where(jnp.abs(lv) < 1e-9, 1e-9, lv)
    he = box.half_extents[..., None, :, :]
    t1 = (-he - lo) / lv
    t2 = (he - lo) / lv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax > 1e-6) & box.valid[..., None, :]
    t = jnp.where(tmin > 1e-6, tmin, tmax)
    return jnp.min(jnp.where(hit, t, BIG), axis=-1)
