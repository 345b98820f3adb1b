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


class Annuli(NamedTuple):
    """Solid flat rings (the circle-flag gate panels,
    env_assets/flags/circle*/: a board with a circular hole):
    {p : |(p-c)·n| <= half_thick, r_in <= |(p-c) - ((p-c)·n)n| <= r_out}.
    center [.., P, 3], unit normal [.., P, 3], r_in/r_out/half_thick
    [.., P], valid [.., P]."""
    center: jnp.ndarray
    normal: jnp.ndarray
    r_in: jnp.ndarray
    r_out: jnp.ndarray
    half_thick: jnp.ndarray
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


def dist_to_annuli(p: jnp.ndarray, ann: Annuli) -> jnp.ndarray:
    """Signed distance from point(s) p [.., 3] to each solid ring [.., P]."""
    d = p[..., None, :] - ann.center                       # [.., P, 3]
    h = jnp.sum(d * ann.normal, axis=-1)                   # [.., P]
    radial = d - h[..., None] * ann.normal
    rho = jnp.linalg.norm(radial, axis=-1)
    drho = jnp.maximum(jnp.maximum(ann.r_in - rho, rho - ann.r_out), 0.0)
    dh = jnp.maximum(jnp.abs(h) - ann.half_thick, 0.0)
    outside = jnp.sqrt(drho * drho + dh * dh)
    inside = jnp.minimum(jnp.minimum(rho - ann.r_in, ann.r_out - rho),
                         ann.half_thick - jnp.abs(h))
    dist = jnp.where((drho > 0) | (dh > 0), outside, -inside)
    return jnp.where(ann.valid, dist, BIG)


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


def ray_annuli(o, v, ann: Annuli) -> jnp.ndarray:
    """Ray vs solid flat ring: intersect the thickness slab with the
    radial band [r_in, r_out]; a ray entering inside the hole exits
    through the inner rim (enter at the inner-cylinder far root)."""
    nrm = ann.normal[..., None, :, :]                       # [.., 1, P, 3]
    ce = ann.center[..., None, :, :]
    oc = o[..., None, :] - ce                               # [.., R, P, 3]
    vv = v[..., None, :]

    vh = jnp.sum(vv * nrm, axis=-1)                         # [.., R, P]
    oh = jnp.sum(oc * nrm, axis=-1)
    ht = ann.half_thick[..., None, :]
    vh_safe = jnp.where(jnp.abs(vh) < 1e-9, 1e-9, vh)
    tsa = (-ht - oh) / vh_safe
    tsb = (ht - oh) / vh_safe
    ts1 = jnp.minimum(tsa, tsb)
    ts2 = jnp.maximum(tsa, tsb)
    flat = jnp.abs(vh) < 1e-9                   # ray parallel to the disc
    in_slab = jnp.abs(oh) <= ht
    ts1 = jnp.where(flat, jnp.where(in_slab, -BIG, BIG), ts1)
    ts2 = jnp.where(flat, jnp.where(in_slab, BIG, -BIG), ts2)

    v_perp = vv - vh[..., None] * nrm
    o_perp = oc - oh[..., None] * nrm
    a = jnp.sum(v_perp * v_perp, axis=-1)
    b = jnp.sum(o_perp * v_perp, axis=-1)
    osq = jnp.sum(o_perp * o_perp, axis=-1)
    r_in = ann.r_in[..., None, :]
    r_out = ann.r_out[..., None, :]
    a_safe = jnp.maximum(a, 1e-12)
    par = a < 1e-12                             # ray along the normal

    c_o = osq - r_out * r_out
    disc_o = b * b - a * c_o
    sq_o = jnp.sqrt(jnp.maximum(disc_o, 0.0))
    to1 = (-b - sq_o) / a_safe
    to2 = (-b + sq_o) / a_safe
    c_i = osq - r_in * r_in
    # radial band membership for axis-parallel rays is constant in t
    in_band = (c_o <= 0) & (c_i > 0)
    to1 = jnp.where(par, jnp.where(in_band, -BIG, BIG),
                    jnp.where(disc_o > 0, to1, BIG))
    to2 = jnp.where(par, jnp.where(in_band, BIG, -BIG),
                    jnp.where(disc_o > 0, to2, -BIG))

    disc_i = b * b - a * c_i
    sq_i = jnp.sqrt(jnp.maximum(disc_i, 0.0))
    ti1 = (-b - sq_i) / a_safe
    ti2 = (-b + sq_i) / a_safe
    has_inner = (disc_i > 0) & ~par & (r_in > 0)

    lo = jnp.maximum(ts1, to1)
    hi = jnp.minimum(ts2, to2)
    in_hole = has_inner & (lo > ti1) & (lo < ti2)
    lo = jnp.where(in_hole, ti2, lo)
    hit = (lo <= hi) & (lo > 1e-6) & ann.valid[..., None, :]
    return jnp.min(jnp.where(hit, lo, BIG), axis=-1)


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
