"""Fused Pallas TPU kernel for the depth-camera ray cast.

The XLA version (render/depth.py render_depth) materializes [N, R] f32
intermediates per primitive in HBM — ~40 sequential passes over ~50 MB at
512 envs, measured ~60 ms/render. This kernel keeps everything in
VMEM/registers: ray directions are synthesized in-kernel from pixel
indices, the primitive table (a few KB per env) is resident, and the
whole primitive loop runs per ray block with a single [N, R] output
write. The work is pure VPU arithmetic (~30 flops/ray/primitive), so the
kernel is compute-bound rather than HBM-bound.

Scene encoding: a packed [N, P, 12] float32 record table
  rec[0]  type: 0 invalid | 1 cylinder | 2 sphere | 3 box | 4 annulus
  rec[1:4]  center
  cylinder: rec[4:7] unit axis, rec[7] half_len, rec[8] radius
  sphere:   rec[8] radius
  box:      rec[4]=cos(yaw), rec[5]=sin(yaw), rec[9:12] half extents
  annulus:  rec[4:7] unit normal, rec[7] half_thick, rec[8] r_in,
            rec[9] r_out (flag-gate ring panels, physics/scene.py Annuli)
The ground plane (z=0) is a static flag folded into the t-init.

Output is perpendicular z-depth [N, W, H] in meters (far rays = BIG),
identical semantics to render_depth — the test suite asserts the two
agree to f32 round-off.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr

BIG = dr.BIG
LANES = 128


def _block_rows(n_prims: int, guarded: bool = False) -> int:
    """Rays-per-cell block height. The kernel is per-cell-overhead-bound
    for small scenes (measured ~0.5 us/cell: 4096 envs x 25 cells at 8
    rows cost 31 ms for a 2-primitive scene vs 14 ms at 64 rows), while
    big primitive tables favor smaller blocks (planning's 48-record
    table: 70 ms at 32 rows vs 77 ms at 64). With cull guards the balance
    flips back — fewer, bigger tiles amortize the per-group branch +
    scratch roundtrip (38.2 vs 41.1 ms culled mid-corridor). Swept on
    v5e."""
    if guarded:
        return 64
    return 64 if n_prims <= 8 else 32


def pack_scene(n: int, scene: "dr.SceneForRender",
               dtype=jnp.float32) -> jnp.ndarray:
    """SceneForRender -> packed [N, P_pad, 12] record table."""
    recs = []

    def zeros(p):
        return jnp.zeros((n, p, 12), dtype)

    if scene.cylinders is not None:
        c = scene.cylinders
        p = c.radius.shape[1]
        r = zeros(p)
        r = r.at[..., 0].set(jnp.where(c.valid, 1.0, 0.0))
        r = r.at[..., 1:4].set(c.center)
        r = r.at[..., 4:7].set(c.axis)
        r = r.at[..., 7].set(c.half_len)
        r = r.at[..., 8].set(c.radius)
        recs.append(r)
    if scene.spheres is not None:
        s = scene.spheres
        p = s.radius.shape[1]
        r = zeros(p)
        r = r.at[..., 0].set(jnp.where(s.valid, 2.0, 0.0))
        r = r.at[..., 1:4].set(s.center)
        r = r.at[..., 8].set(s.radius)
        recs.append(r)
    if scene.boxes is not None:
        b = scene.boxes
        p = b.yaw.shape[1]
        r = zeros(p)
        r = r.at[..., 0].set(jnp.where(b.valid, 3.0, 0.0))
        r = r.at[..., 1:4].set(b.center)
        r = r.at[..., 4].set(jnp.cos(b.yaw))
        r = r.at[..., 5].set(jnp.sin(b.yaw))
        r = r.at[..., 9:12].set(b.half_extents)
        recs.append(r)
    if getattr(scene, "annuli", None) is not None:
        a = scene.annuli
        p = a.r_in.shape[1]
        r = zeros(p)
        r = r.at[..., 0].set(jnp.where(a.valid, 4.0, 0.0))
        r = r.at[..., 1:4].set(a.center)
        r = r.at[..., 4:7].set(a.normal)
        r = r.at[..., 7].set(a.half_thick)
        r = r.at[..., 8].set(a.r_in)
        r = r.at[..., 9].set(a.r_out)
        recs.append(r)
    if not recs:
        recs.append(zeros(1))
    table = jnp.concatenate(recs, axis=1)
    # static type layout: [cylinders | spheres | boxes | annuli | padding]
    ann = getattr(scene, "annuli", None)
    counts = (
        scene.cylinders.radius.shape[1] if scene.cylinders is not None else 0,
        scene.spheres.radius.shape[1] if scene.spheres is not None else 0,
        scene.boxes.yaw.shape[1] if scene.boxes is not None else 0,
        ann.r_in.shape[1] if ann is not None else 0,
    )
    # pad P to a multiple of 8 for clean VMEM tiling
    p = table.shape[1]
    p_pad = -(-p // 8) * 8
    if p_pad != p:
        table = jnp.pad(table, ((0, 0), (0, p_pad - p), (0, 0)))
    return table, counts


def _corner_tan(cfg: "dr.CameraCfg") -> float:
    """tan of the cone half-angle that bounds every ray (image corner)."""
    tan_h = float(np.tan(np.radians(cfg.horizontal_fov_deg) / 2.0))
    tan_v = tan_h * cfg.height / cfg.width
    return float(np.hypot(tan_h, tan_v))


GROUP = 8  # records per pl.when guard (see _kernel)


def cull_and_compact(table: jnp.ndarray, counts: tuple, origin: jnp.ndarray,
                     forward: jnp.ndarray, far_z: float,
                     corner_tan: float):
    """Per-env visibility cull + in-segment compaction of the packed
    primitive table -> (table, per-kind survivor counts [N, 4] int32).

    A record cannot contribute to the POST-CLAMP depth image when either
    (a) its bounding sphere lies outside the cone that contains every
    camera ray (apex at the origin, axis ``forward``, half-angle =
    image-corner angle), or (b) every point of it projects beyond
    ``far_z`` along ``forward`` (z-depth is the forward projection, and
    ``postprocess`` clips at cfg.depth_clamp — so hits past it are
    indistinguishable from misses). Survivors are compacted to the front
    of their kind segment so the kernel can skip whole GROUP-sized
    record blocks past the count. Culled-but-real records left inside a
    live group are harmless to compute — the cull condition proves their
    contribution is clipped away — so the kernel guards groups, not
    records (per-record pl.when + a scratch roundtrip measured 3.5x
    SLOWER than the unguarded pure-value chain; per-group guards keep
    the chain in registers).
    """
    n = table.shape[0]
    cos_t = 1.0 / float(np.sqrt(1.0 + corner_tan * corner_tan))
    sin_t = corner_tan * cos_t

    c = table[..., 1:4]
    d = c - origin[:, None, :]
    dp = jnp.einsum("npk,nk->np", d, forward)
    dq = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1) - dp * dp, 0.0))

    # conservative bounding radius per record, by (static) kind segment
    n_cyl, n_sph, n_box, n_ann = counts
    rbs = []
    if n_cyl:
        seg = table[:, :n_cyl]
        rbs.append(jnp.sqrt(seg[..., 7] ** 2 + seg[..., 8] ** 2))
    if n_sph:
        seg = table[:, n_cyl:n_cyl + n_sph]
        rbs.append(seg[..., 8])
    if n_box:
        seg = table[:, n_cyl + n_sph:n_cyl + n_sph + n_box]
        rbs.append(jnp.linalg.norm(seg[..., 9:12], axis=-1))
    if n_ann:
        seg = table[:, n_cyl + n_sph + n_box:n_cyl + n_sph + n_box + n_ann]
        rbs.append(jnp.sqrt(seg[..., 8 + 1] ** 2 + seg[..., 7] ** 2))
    pad = table.shape[1] - (n_cyl + n_sph + n_box + n_ann)
    if pad:
        rbs.append(jnp.zeros((n, pad), table.dtype))
    rb = jnp.concatenate(rbs, axis=1)

    vis = ((dq * cos_t - dp * sin_t <= rb)
           & (dp - rb <= far_z)
           & (table[..., 0] > 0.0))

    segments = []
    p0 = 0
    dyn = []
    for cnt in counts:
        if cnt == 0:
            dyn.append(jnp.zeros((n,), jnp.int32))
            continue
        v = vis[:, p0:p0 + cnt]
        order = jnp.argsort(jnp.logical_not(v), axis=1, stable=True)
        segments.append(jnp.take_along_axis(
            table[:, p0:p0 + cnt], order[..., None], axis=1))
        dyn.append(jnp.sum(v, axis=1).astype(jnp.int32))
        p0 += cnt
    if table.shape[1] > p0:
        segments.append(table[:, p0:])
    out = jnp.concatenate(segments, axis=1) if segments else table
    return out, jnp.stack(dyn, axis=1)


def _make_caster(prims_ref, ox, oy, oz, ux, uy, uz):
    """Per-record ray intersection, shared by the depth-only and the
    fused render+postprocess kernels.  Returns body(p, kind, t_eu) ->
    updated running euclidean-t minimum."""

    def body(p, kind, t_eu):
        # kind is STATIC (pack_scene orders records cylinders|spheres|boxes)
        # so only one intersection routine is emitted per record.
        valid = prims_ref[0, p, 0]
        cx = prims_ref[0, p, 1]
        cy = prims_ref[0, p, 2]
        cz = prims_ref[0, p, 3]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz

        if kind == 1:    # cylinder
            ax = prims_ref[0, p, 4]
            ay = prims_ref[0, p, 5]
            az = prims_ref[0, p, 6]
            hl = prims_ref[0, p, 7]
            rad = prims_ref[0, p, 8]
            v_par = ux * ax + uy * ay + uz * az
            o_par = ocx * ax + ocy * ay + ocz * az
            vpx, vpy, vpz = ux - v_par * ax, uy - v_par * ay, uz - v_par * az
            opx = ocx - o_par * ax
            opy = ocy - o_par * ay
            opz = ocz - o_par * az
            a = vpx * vpx + vpy * vpy + vpz * vpz
            b = opx * vpx + opy * vpy + opz * vpz
            c = opx * opx + opy * opy + opz * opz - rad * rad
            disc = b * b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_p = (-b - sq) / jnp.where(a < 1e-9, 1e-9, a)
            h = o_par + t_p * v_par
            hit = (disc > 0) & (t_p > 1e-6) & (jnp.abs(h) <= hl)
        elif kind == 2:  # sphere
            rad = prims_ref[0, p, 8]
            b_s = ocx * ux + ocy * uy + ocz * uz
            c_s = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc_s = b_s * b_s - c_s
            t_p = -b_s - jnp.sqrt(jnp.maximum(disc_s, 0.0))
            hit = (disc_s > 0) & (t_p > 1e-6)
        elif kind == 4:  # annulus (solid flat ring, scene.ray_annuli)
            nx_ = prims_ref[0, p, 4]
            ny_ = prims_ref[0, p, 5]
            nz_ = prims_ref[0, p, 6]
            ht = prims_ref[0, p, 7]
            ri = prims_ref[0, p, 8]
            ro = prims_ref[0, p, 9]
            vh = ux * nx_ + uy * ny_ + uz * nz_
            oh = ocx * nx_ + ocy * ny_ + ocz * nz_
            vh_safe = jnp.where(jnp.abs(vh) < 1e-9, 1e-9, vh)
            tsa = (-ht - oh) / vh_safe
            tsb = (ht - oh) / vh_safe
            ts1 = jnp.minimum(tsa, tsb)
            ts2 = jnp.maximum(tsa, tsb)
            is_flat = jnp.abs(vh) < 1e-9
            in_slab = jnp.abs(oh) <= ht
            ts1 = jnp.where(is_flat, jnp.where(in_slab, -BIG, BIG), ts1)
            ts2 = jnp.where(is_flat, jnp.where(in_slab, BIG, -BIG), ts2)
            vpx, vpy, vpz = ux - vh * nx_, uy - vh * ny_, uz - vh * nz_
            opx, opy, opz = ocx - oh * nx_, ocy - oh * ny_, ocz - oh * nz_
            a_a = vpx * vpx + vpy * vpy + vpz * vpz
            b_a = opx * vpx + opy * vpy + opz * vpz
            osq = opx * opx + opy * opy + opz * opz
            a_safe = jnp.maximum(a_a, 1e-12)
            par = a_a < 1e-12
            c_o = osq - ro * ro
            disc_o = b_a * b_a - a_a * c_o
            sq_o = jnp.sqrt(jnp.maximum(disc_o, 0.0))
            to1 = (-b_a - sq_o) / a_safe
            to2 = (-b_a + sq_o) / a_safe
            c_i = osq - ri * ri
            in_band = (c_o <= 0) & (c_i > 0)
            to1 = jnp.where(par, jnp.where(in_band, -BIG, BIG),
                            jnp.where(disc_o > 0, to1, BIG))
            to2 = jnp.where(par, jnp.where(in_band, BIG, -BIG),
                            jnp.where(disc_o > 0, to2, -BIG))
            disc_i = b_a * b_a - a_a * c_i
            sq_i = jnp.sqrt(jnp.maximum(disc_i, 0.0))
            ti1 = (-b_a - sq_i) / a_safe
            ti2 = (-b_a + sq_i) / a_safe
            has_inner = (disc_i > 0) & ~par & (ri > 0)
            lo = jnp.maximum(ts1, to1)
            hi = jnp.minimum(ts2, to2)
            in_hole = has_inner & (lo > ti1) & (lo < ti2)
            lo = jnp.where(in_hole, ti2, lo)
            t_p = lo
            hit = (lo <= hi) & (lo > 1e-6)
        else:            # box (yaw-rotated slab test)
            cyaw = prims_ref[0, p, 4]
            syaw = prims_ref[0, p, 5]
            hex_ = prims_ref[0, p, 9]
            hey = prims_ref[0, p, 10]
            hez = prims_ref[0, p, 11]
            lox = cyaw * ocx + syaw * ocy
            loy = -syaw * ocx + cyaw * ocy
            lvx = cyaw * ux + syaw * uy
            lvy = -syaw * ux + cyaw * uy

            def slab(o, d, he):
                d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
                t1 = (-he - o) / d
                t2 = (he - o) / d
                return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

            n1, x1 = slab(lox, lvx, hex_)
            n2, x2 = slab(loy, lvy, hey)
            n3, x3 = slab(ocz, uz, hez)
            tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
            tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
            t_p = jnp.where(tmin > 1e-6, tmin, tmax)
            hit = (tmax >= tmin) & (tmax > 1e-6)

        return jnp.minimum(t_eu, jnp.where(hit & (valid > 0.0), t_p, BIG))

    return body


def _run_chain(body, t_init, counts, counts_ref, guarded, acc_ref):
    """Fold every scene record into the running t minimum.

    Static unroll: all primitive loads become static VMEM scalar reads
    (a traced fori_loop index forces slow per-element dynamic gathers).

    unguarded: one pure-value min-chain, accumulator lives in vector
    registers end to end (the fastest shape when every record must run —
    65.7 ms vs 79.9+ for any guarded variant).

    guarded (culling on): records run in GROUP-sized blocks as pure-value
    min-chains; each block is guarded by ONE pl.when on the per-env
    survivor count from cull_and_compact (survivors are a segment
    prefix). Guarding individual records instead (scalar branch + scratch
    roundtrip per record) measured 3.5x SLOWER than no culling at all;
    per-group guards cost ~30% unculled and win 1.7x once culling bites.
    """
    n_cyl, n_sph, n_box, n_ann = counts
    segs = [(n_cyl, 1), (n_sph, 2), (n_box, 3), (n_ann, 4)]
    if not guarded:
        t_eu = t_init
        p = 0
        for seg_n, kind in segs:
            for _ in range(seg_n):
                t_eu = body(p, kind, t_eu)
                p += 1
        return t_eu
    acc_ref[:, :] = t_init
    p = 0
    for slot, (seg_n, kind) in enumerate(segs):
        for g0 in range(0, seg_n, GROUP):
            @pl.when(g0 < counts_ref[0, 0, slot])
            def _(p=p, g=min(GROUP, seg_n - g0), kind=kind):
                t = acc_ref[:, :]
                for k in range(g):
                    t = body(p + k, kind, t)
                acc_ref[:, :] = t
            p += min(GROUP, seg_n - g0)
    return acc_ref[:, :]


def _kernel(origin_ref, rot_ref, prims_ref, counts_ref, out_ref, acc_ref,
            *, W, H, tan_h, tan_v, ground, counts, block_rows, guarded):
    t_idx = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 1)
    idx = (t_idx * block_rows + rows) * LANES + lanes       # flat ray id
    u = (idx // H).astype(jnp.float32)
    v = (idx % H).astype(jnp.float32)
    in_range = idx < W * H

    y = tan_h * (1.0 - 2.0 * (u + 0.5) / W)
    z = tan_v * (1.0 - 2.0 * (v + 0.5) / H)

    m = rot_ref[0, 0, :]                                     # 9 floats + pad
    dx = m[0] + m[1] * y + m[2] * z
    dy = m[3] + m[4] * y + m[5] * z
    dz = m[6] + m[7] * y + m[8] * z
    nsq = dx * dx + dy * dy + dz * dz
    inv_norm = jax.lax.rsqrt(nsq)
    # one Newton step: ~1e-7 relative error at rsqrt speed
    inv_norm = inv_norm * (1.5 - 0.5 * nsq * inv_norm * inv_norm)
    ux, uy, uz = dx * inv_norm, dy * inv_norm, dz * inv_norm

    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    oz = origin_ref[0, 0, 2]

    t_eu = jnp.full((block_rows, LANES), BIG, jnp.float32)
    if ground:
        uz_safe = jnp.where(jnp.abs(uz) < 1e-9, 1e-9, uz)
        tg = (0.0 - oz) / uz_safe
        t_eu = jnp.where(tg > 1e-6, jnp.minimum(t_eu, tg), t_eu)

    body = _make_caster(prims_ref, ox, oy, oz, ux, uy, uz)
    t_eu = _run_chain(body, t_eu, counts, counts_ref, guarded, acc_ref)
    # perpendicular z-depth = t_euclid * inv_norm (camera dir has x == 1)
    out_ref[0, :, :] = jnp.where(in_range, t_eu * inv_norm, BIG)


@functools.partial(jax.jit, static_argnames=("cfg", "ground", "interpret",
                                             "counts", "guarded"))
def _raycast(cfg: dr.CameraCfg, origins, rots, prims, counts_dyn,
             ground: bool, interpret: bool, counts: tuple,
             guarded: bool = False):
    n = origins.shape[0]
    W, H = cfg.width, cfg.height
    rays = W * H
    block_rows = _block_rows(prims.shape[1], guarded)
    rays_pad = -(-rays // (block_rows * LANES)) * (block_rows * LANES)
    n_tiles = rays_pad // (block_rows * LANES)
    tan_h = float(np.tan(np.radians(cfg.horizontal_fov_deg) / 2.0))
    tan_v = tan_h * H / W

    kernel = functools.partial(_kernel, W=W, H=H, tan_h=tan_h, tan_v=tan_v,
                               ground=ground, counts=counts,
                               block_rows=block_rows, guarded=guarded)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, prims.shape[1], 12), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, LANES),
                               lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles * block_rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_rows, LANES), jnp.float32)],
        interpret=interpret,
    )(origins, rots, prims, counts_dyn[:, None, :])
    return out.reshape(n, rays_pad)[:, :rays].reshape(n, W, H)


# ---------------------------------------------------------------------------
# Fused render + postprocess: the [N, W, H] raw depth never leaves VMEM.
#
# The reference post-processing (customized.py:399-427: clamp/normalize,
# additive + multiplicative noise with per-stage max clips, 5x5 random
# unnormalized blur) ran as a separate XLA stage, forcing the raw depth
# through HBM twice and lowering the per-env random blur as a
# feature_group_count=N grouped convolution.  Here one grid step renders a
# whole env's image into a (rows_pad, 128) block (W on sublanes, H on
# lanes) and applies the full pipeline in registers.
#
# Noise comes from the same counter-based hash RNG as the fused rollout
# kernels (ops/fused_hovering._make_uniform): identical on TPU and in
# interpret mode, mirrored bit-for-bit by postprocess_hash() below, which
# is both the CPU oracle for the parity test and the documentation of the
# exact draw order.  Distribution parity with the jax.random reference
# pipeline (threefry) is asserted statistically in tests.
# ---------------------------------------------------------------------------

_TAP_SALT = 0xA511E9B3
_TAP_STEP = 0x63D83595


def _image_rows_pad(w: int) -> int:
    """Sublane rows for a whole-image block: >= W + 2 zero rows so the
    5x5 blur's rotate-based shifts wrap only zeros, rounded to 8."""
    return -(-(w + 2) // 8) * 8


def _env_seeds(seed, n: int) -> jnp.ndarray:
    """Per-env base keys [N] uint32 (fused_hovering-style per-tile fold)."""
    i = jnp.arange(n, dtype=jnp.uint32)
    return (jnp.asarray(seed, jnp.uint32)
            + i * jnp.uint32(0x01000193))


def _hash_kernel_taps(env_seeds: jnp.ndarray) -> jnp.ndarray:
    """25 random 5x5 blur taps per env, values in {0..255}/256 — the hash
    twin of the reference's randint(0,256)/256 kernel (customized.py:416).
    Returned padded to [N, 1, 32] f32 for a clean VMEM block."""
    from airgym_tpu.ops.fused_hovering import _mix
    j = jnp.arange(25, dtype=jnp.uint32)
    salts = (jnp.uint32(_TAP_SALT) + j * jnp.uint32(_TAP_STEP))
    bits = _mix(env_seeds[:, None] * jnp.uint32(0x9E3779B9) ^ salts[None])
    k = (bits >> jnp.uint32(24)).astype(jnp.float32) / 256.0
    return jnp.pad(k, ((0, 0), (0, 7)))[:, None, :]


def _postprocess_block(x, in_img, draw, taps_at, rows_pad, clamp):
    """Shared postprocess math on one (rows_pad, LANES) block.

    x: euclidean-free z-depth (already *inv_norm), any value >= 0.
    draw(): next (rows_pad, LANES) uniform [0,1) draw (4 consumed).
    taps_at(j): j-th blur tap as a scalar (or [N,1,1] outside pallas).
    Mirrors dr.postprocess stage-for-stage; padding pixels are kept at 0
    so the rotate-based SAME blur wraps only zeros.
    """
    x = jnp.clip(x, 0.0, clamp) / clamp
    x = jnp.where(in_img, x, 0.0)

    def normal():
        u1 = jnp.clip(draw(), 1e-7, 1.0)
        u2 = draw()
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)

    mx = jnp.max(x, axis=1, keepdims=True)
    mx = jnp.max(mx, axis=0, keepdims=True)
    x = jnp.where(in_img,
                  jnp.minimum(jnp.maximum(x + 0.1 * normal(), 0.0), mx), 0.0)
    mx = jnp.max(x, axis=1, keepdims=True)
    mx = jnp.max(mx, axis=0, keepdims=True)
    x = jnp.where(in_img,
                  jnp.minimum(jnp.maximum(x * (1.0 + 0.3 * normal()), 0.0),
                              mx), 0.0)

    blur = jnp.zeros_like(x)
    for a in range(5):
        xs = pltpu.roll(x, (2 - a) % rows_pad, 0)
        for b in range(5):
            blur = blur + taps_at(a * 5 + b) * pltpu.roll(
                xs, (2 - b) % LANES, 1)
    return jnp.where(in_img, blur, 0.0)


def _kernel_image(origin_ref, rot_ref, prims_ref, counts_ref, seed_ref,
                  taps_ref, out_ref, acc_ref, *, W, H, rows_pad, tan_h,
                  tan_v, ground, counts, guarded, clamp):
    from airgym_tpu.ops.fused_hovering import _make_uniform

    u = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, LANES), 0)  # width
    v = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, LANES), 1)  # height
    in_img = (u < W) & (v < H)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    y = tan_h * (1.0 - 2.0 * (uf + 0.5) / W)
    z = tan_v * (1.0 - 2.0 * (vf + 0.5) / H)

    m = rot_ref[0, 0, :]
    dx = m[0] + m[1] * y + m[2] * z
    dy = m[3] + m[4] * y + m[5] * z
    dz = m[6] + m[7] * y + m[8] * z
    nsq = dx * dx + dy * dy + dz * dz
    inv_norm = jax.lax.rsqrt(nsq)
    inv_norm = inv_norm * (1.5 - 0.5 * nsq * inv_norm * inv_norm)
    ux, uy, uz = dx * inv_norm, dy * inv_norm, dz * inv_norm

    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    oz = origin_ref[0, 0, 2]

    t_eu = jnp.full((rows_pad, LANES), BIG, jnp.float32)
    if ground:
        uz_safe = jnp.where(jnp.abs(uz) < 1e-9, 1e-9, uz)
        tg = (0.0 - oz) / uz_safe
        t_eu = jnp.where(tg > 1e-6, jnp.minimum(t_eu, tg), t_eu)

    body = _make_caster(prims_ref, ox, oy, oz, ux, uy, uz)
    t_eu = _run_chain(body, t_eu, counts, counts_ref, guarded, acc_ref)

    draw = _make_uniform(seed_ref[0, 0, 0], (rows_pad, LANES))
    out_ref[0, :, :] = _postprocess_block(
        t_eu * inv_norm, in_img, draw,
        lambda j: taps_ref[0, 0, j], rows_pad, clamp)


@functools.partial(jax.jit, static_argnames=("cfg", "ground", "interpret",
                                             "counts", "guarded"))
def _raycast_process(cfg: dr.CameraCfg, origins, rots, prims, counts_dyn,
                     seeds, taps, ground: bool, interpret: bool,
                     counts: tuple, guarded: bool = False):
    n = origins.shape[0]
    W, H = cfg.width, cfg.height
    rows_pad = _image_rows_pad(W)
    tan_h = float(np.tan(np.radians(cfg.horizontal_fov_deg) / 2.0))
    tan_v = tan_h * H / W

    kernel = functools.partial(
        _kernel_image, W=W, H=H, rows_pad=rows_pad, tan_h=tan_h,
        tan_v=tan_v, ground=ground, counts=counts, guarded=guarded,
        clamp=float(cfg.depth_clamp))
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, prims.shape[1], 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 32), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_pad, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows_pad, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(origins, rots, prims, counts_dyn[:, None, :],
      seeds[:, None, None], taps)
    return out[:, :W, :H][:, None]                       # [N, 1, W, H]


def _key_to_seed(key) -> jnp.ndarray:
    """Fold a jax PRNG key (typed or raw uint32[2]) to one uint32."""
    if hasattr(key, "dtype") and jnp.issubdtype(key.dtype,
                                                jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    kd = jnp.asarray(key, jnp.uint32).reshape(-1)
    return kd[0] ^ (kd[-1] * jnp.uint32(0x9E3779B9))


def render_process_pallas(cfg: dr.CameraCfg, root_states: jnp.ndarray,
                          scene: "dr.SceneForRender", key,
                          interpret: Optional[bool] = None,
                          cull_far_z: Optional[float] = None) -> jnp.ndarray:
    """Fused drop-in for dr.postprocess(dr.render_depth(...)): one kernel
    invocation per env renders and post-processes the whole image without
    the raw depth ever reaching HBM.  Output [N, 1, W, H].

    Noise uses the in-kernel hash RNG (same family as the fused rollout
    kernels), not jax.random threefry — distributionally identical to the
    reference pipeline, mirrored exactly by postprocess_hash().
    """
    from airgym_tpu.math import rotations as rot

    if cfg.height > LANES - 2:
        raise ValueError(f"fused render+process requires H <= {LANES - 2}")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    n = root_states.shape[0]
    q = root_states[:, 3:7]
    m = rot.quat_to_matrix(q).reshape(n, 9)
    rots = jnp.pad(m, ((0, 0), (0, 7))).astype(jnp.float32)[:, None, :]
    origin = root_states[:, 0:3] + rot.quat_rotate(
        q, jnp.asarray(cfg.mount_pos, root_states.dtype))
    prims, counts = pack_scene(n, scene)
    if cull_far_z is not None and prims.shape[1] <= 16:
        cull_far_z = None
    if cull_far_z is not None:
        forward = m[:, [0, 3, 6]].astype(jnp.float32)
        prims, counts_dyn = cull_and_compact(
            prims, counts, origin.astype(jnp.float32), forward,
            float(cull_far_z), _corner_tan(cfg))
    else:
        counts_dyn = jnp.broadcast_to(
            jnp.asarray(counts, jnp.int32)[None], (n, 4))
    origins = jnp.pad(origin, ((0, 0), (0, 5))).astype(
        jnp.float32)[:, None, :]
    seeds = _env_seeds(_key_to_seed(key), n)
    taps = _hash_kernel_taps(seeds)
    return _raycast_process(cfg, origins, rots, prims, counts_dyn, seeds,
                            taps, bool(scene.ground), bool(interpret),
                            counts, guarded=cull_far_z is not None)


def postprocess_hash(cfg: dr.CameraCfg, depth: jnp.ndarray,
                     key) -> jnp.ndarray:
    """Plain-jnp mirror of the fused kernel's postprocess stage: same hash
    RNG, same draw order, same rotate-based blur — the CPU oracle the
    parity test compares render_process_pallas against, and the exact
    spec of its noise. depth: raw z-depth [N, W, H] (dr.render_depth)."""
    from airgym_tpu.ops.fused_hovering import _mix

    n, w, h = depth.shape
    rows_pad = _image_rows_pad(w)
    x = jnp.pad(depth, ((0, 0), (0, rows_pad - w), (0, LANES - h)))

    seeds = _env_seeds(_key_to_seed(key), n)
    taps = _hash_kernel_taps(seeds)                        # [N, 1, 32]

    rows = jnp.arange(rows_pad, dtype=jnp.uint32)[:, None]
    lanes_2d = rows * jnp.uint32(LANES) + jnp.arange(
        LANES, dtype=jnp.uint32)[None, :]
    counter = [0]

    def draw():
        counter[0] += 1
        bits = _mix(seeds[:, None, None] * jnp.uint32(0x9E3779B9)
                    ^ (lanes_2d[None] + jnp.uint32(0x85EBCA6B))
                    ^ (jnp.uint32(counter[0]) * jnp.uint32(0xC2B2AE35)))
        return (bits >> jnp.uint32(1)).astype(jnp.float32) * (
            1.0 / 2147483648.0)

    u = jnp.arange(rows_pad)[None, :, None]
    v = jnp.arange(LANES)[None, None, :]
    in_img = (u < w) & (v < h)

    # _postprocess_block over the batched [N, rows_pad, LANES] array:
    # identical math, with per-env keepdims maxes and [N,1,1] taps
    y = jnp.clip(x, 0.0, cfg.depth_clamp) / cfg.depth_clamp
    y = jnp.where(in_img, y, 0.0)

    def normal():
        u1 = jnp.clip(draw(), 1e-7, 1.0)
        u2 = draw()
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)

    mx = jnp.max(y, axis=(1, 2), keepdims=True)
    y = jnp.where(in_img,
                  jnp.minimum(jnp.maximum(y + 0.1 * normal(), 0.0), mx), 0.0)
    mx = jnp.max(y, axis=(1, 2), keepdims=True)
    y = jnp.where(in_img,
                  jnp.minimum(jnp.maximum(y * (1.0 + 0.3 * normal()), 0.0),
                              mx), 0.0)

    blur = jnp.zeros_like(y)
    for a in range(5):
        ys = jnp.roll(y, (2 - a) % rows_pad, 1)
        for b in range(5):
            blur = blur + taps[:, :, a * 5 + b, None] * jnp.roll(
                ys, (2 - b) % LANES, 2)
    blur = jnp.where(in_img, blur, 0.0)
    return blur[:, :w, :h][:, None]


def render_depth_pallas(cfg: dr.CameraCfg, root_states: jnp.ndarray,
                        scene: "dr.SceneForRender",
                        interpret: Optional[bool] = None,
                        cull_far_z: Optional[float] = None) -> jnp.ndarray:
    """Drop-in replacement for render/depth.render_depth.

    cull_far_z: if set, primitives that provably cannot affect the depth
    image CLIPPED at this z value (outside the all-rays cone, or entirely
    beyond it along the camera forward axis) are skipped per env — exact
    for the postprocessed image when cull_far_z >= cfg.depth_clamp, but
    raw depths past it may differ (hit -> miss). None = no culling,
    bit-identical to render_depth.
    """
    from airgym_tpu.math import rotations as rot

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    n = root_states.shape[0]
    q = root_states[:, 3:7]
    m = rot.quat_to_matrix(q).reshape(n, 9)
    rots = jnp.pad(m, ((0, 0), (0, 7))).astype(jnp.float32)[:, None, :]
    origin = root_states[:, 0:3] + rot.quat_rotate(
        q, jnp.asarray(cfg.mount_pos, root_states.dtype))
    prims, counts = pack_scene(n, scene)
    if cull_far_z is not None and prims.shape[1] <= 16:
        # tiny tables have at most 1-2 guard groups: the prepass +
        # branches cost more than the skippable casts
        cull_far_z = None
    if cull_far_z is not None:
        forward = m[:, [0, 3, 6]].astype(jnp.float32)   # world camera +x
        prims, counts_dyn = cull_and_compact(
            prims, counts, origin.astype(jnp.float32), forward,
            float(cull_far_z), _corner_tan(cfg))
    else:
        counts_dyn = jnp.broadcast_to(
            jnp.asarray(counts, jnp.int32)[None], (n, 4))
    origins = jnp.pad(origin, ((0, 0), (0, 5))).astype(
        jnp.float32)[:, None, :]
    return _raycast(cfg, origins, rots, prims, counts_dyn,
                    bool(scene.ground), bool(interpret), counts,
                    guarded=cull_far_z is not None)
