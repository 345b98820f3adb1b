"""Fused CNN-encoder megakernel: conv0->bn0->conv1->bn1->conv2->bn2->pool
in ONE Pallas kernel, activations resident in VMEM.

Replaces the XLA lowering of the reference CNNFeatureExtractor
(reference lib/network/cnn.py:3-34) on the PPO hot path.  The XLA path
crosses HBM at every conv/elementwise boundary (a TPU convolution is not
a fusible root, so relu/BN around it cannot ride the conv's epilogue);
at minibatch scale the [B,53,30,64] activation costs ~0.5 ms per pass
and the passes dominate the encoder's fwd+bwd time (BENCHMARKS.md).
Here the whole stack runs per-image inside VMEM and only the input
patches and the pooled [B,64] features touch HBM.

Layout trick — parity planes
----------------------------
Strided (stride-2) access inside a Mosaic kernel is either unsupported
or lowers to slow per-element gathers.  Every stride in the stack is
eliminated by storing activations as FOUR PARITY PLANES over the conv0
output-cell grid [hc, wc] (row parity x col parity, each plane padded
to [ceil(hc/2), ceil(wc/2)]):

* conv0 (5x5 s2, folded 2x2-output form, models/actor_critic.py
  _FoldedConv0) is 1x1 in cell space -> a pure [4P,64]@[64,64] matmul
  on im2col patches built (in XLA) directly in plane order.
* conv1 (3x3 s2 == 2x2-cell stride-1, _CellConv1): an output pixel of
  row parity ``op`` reads cells of parities op-1, op -> each tap is a
  STATIC plane slice shifted by {-1,0} rows/cols.  The im2col is a
  lane-axis concat of 4 masked shifted plane slices.
* conv2 (3x3 s2 SAME): output (i',j') reads pixels 2i'-1..2i'+1 ->
  again 9 static (plane, shift) taps.  Its output grid equals one
  padded plane exactly, so the global avg pool is a plain row-sum.

Backward: a second kernel recomputes the forward in VMEM (flash-style)
and accumulates all parameter gradients (conv kernels via row-contracted
matmuls, conv biases / folded-BN effective scale+bias via row sums) into
constant-index output blocks across the sequential grid.  The image
cotangent is NOT computed: camera frames are rollout data, nothing
upstream of them is differentiated (rl/ppo.py feeds them from the
experience buffer), so the custom_vjp returns a symbolic-zero that XLA
dead-code-eliminates.

BN enters as pre-folded effective scale/bias rows (FrozenBatchNorm's
one-madd form); their gradients chain back to scale/bias/mean/var
outside the kernel by ordinary autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------- geometry

def _geom(hc: int, wc: int):
    """Plane geometry for a [hc, wc] conv0 cell grid.

    ``Pp`` pads each plane's flat length to a multiple of 32 so every
    plane slice inside the kernel starts on a sublane-tile boundary —
    Mosaic's lane-axis concatenate requires matching register offsets,
    which unaligned slices break ("result/input offset mismatch on
    non-concat dimension").  Pad rows are masked everywhere.
    """
    pe_r = (hc + 1) // 2          # padded plane rows  (== conv2 out rows)
    pe_c = (wc + 1) // 2          # padded plane cols  (== conv2 out cols)
    P = pe_r * pe_c
    Pp = ((P + 31) // 32) * 32
    vr = ((hc + 1) // 2, hc // 2)   # valid rows per row-parity plane
    vc = ((wc + 1) // 2, wc // 2)   # valid cols per col-parity plane
    return pe_r, pe_c, P, Pp, vr, vc


def _tap(o: int, d: int):
    """Source (parity, offset) for output parity ``o`` and tap ``d``.

    Output index m (on the stride-2 grid 2m+o) reads source index
    2m+o+d-1 -> source parity sp, plane-local offset du in {-1, 0}.
    Covers conv1 (o in {0,1}, d in {0,1}) and conv2 (o=0, d in {0,1,2}).
    """
    off = o + d - 1
    sp = off % 2
    du = off // 2                 # python floor division: -1 or 0
    return sp, du


# ----------------------------------------------------- XLA-side im2col

def build_x0_planes(x_nhwc: jnp.ndarray, group: int = 1) -> jnp.ndarray:
    """[B,H,W,1] image -> conv0 im2col patches in plane order
    [B/group, 4*group*P, 64] (plane-major, then image-within-group, then
    plane row t = u*pe_c+v; channel = a*16 + b*4 + cin over the 4x4-cell
    x 4-s2d-channel patch).

    Matches _FoldedConv0's input transform exactly: zero pad 2, 2x2
    space-to-depth, 4x4 stride-2 patch extraction.  Pure gather/reshape
    work that XLA fuses with the upstream image normalization.

    ``group`` packs that many images into one kernel invocation (row
    axis): every plane slice becomes [group*Pp, C], making the kernel's
    matmuls group x taller and amortizing its per-step overhead. The
    in-kernel shifted-plane masks depend only on position-in-plane, so
    the same masks (tiled) zero exactly the rows a rotate would leak
    across image boundaries — grouping is mask-transparent.
    """
    b, h, w, _ = x_nhwc.shape
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    assert b % group == 0, (b, group)
    hc, wc = h // 4, w // 4
    pe_r, pe_c, P, Pp, vr, vc = _geom(hc, wc)
    xp = jnp.pad(x_nhwc, ((0, 0), (2, 2), (2, 2), (0, 0)))
    s = xp.reshape(b, h // 2 + 2, 2, w // 2 + 2, 2)
    s = s.transpose(0, 1, 3, 2, 4).reshape(b, h // 2 + 2, w // 2 + 2, 4)
    # cell (i, j), tap (a, b): s[2i+a, 2j+b]
    cols = [s[:, a:a + 2 * hc - 1:2, c:c + 2 * wc - 1:2, :]
            for a in range(4) for c in range(4)]
    x0 = jnp.concatenate(cols, axis=-1)            # [B, hc, wc, 64]
    planes = []
    for op in (0, 1):
        for oq in (0, 1):
            p = x0[:, op::2, oq::2, :]             # [B, vr[op], vc[oq], 64]
            p = jnp.pad(p, ((0, 0), (0, pe_r - vr[op]),
                            (0, pe_c - vc[oq]), (0, 0)))
            p = p.reshape(b, P, 64)
            p = jnp.pad(p, ((0, 0), (0, Pp - P), (0, 0)))
            # [B/G, G*Pp, 64]: images of a group are consecutive in B
            planes.append(p.reshape(b // group, group * Pp, 64))
    return jnp.concatenate(planes, axis=1)     # [B/G, 4*G*Pp, 64]


# --------------------------------------------------------------- kernels

def _masks(pe_r: int, pe_c: int, Pp: int, vr, vc, dtype, group: int = 1):
    """Cacheable [group*Pp,1] source-validity masks keyed by
    (du, dv, sp, sq), plus the output-row validity mask (pads beyond
    pe_r*pe_c zeroed). With group > 1 the per-plane mask pattern tiles
    over the stacked images — position-in-plane only, image-agnostic."""
    t = jax.lax.broadcasted_iota(jnp.int32, (group * Pp, 1), 0)
    q = t % Pp if group > 1 else t
    u = q // pe_c
    v = q % pe_c
    valid = (u < pe_r)
    cache = {}

    def get(du, dv, sp, sq):
        key = (du, dv, sp, sq)
        if key not in cache:
            m = (valid & (u + du >= 0) & (u + du < vr[sp])
                 & (v + dv >= 0) & (v + dv < vc[sq]))
            cache[key] = m.astype(dtype)
        return cache[key]

    return get, valid.astype(jnp.float32)


def _shift(src, s: int, dtype):
    """Row-shift a [Pp,C] plane slice by s (<= 0): out[t] = src[t+s].

    Implemented as a ROTATE (tpu.dynamic_rotate): Mosaic's concatenate
    cannot merge the register-offset layouts a zero-pad + slice shift
    produces ("result/input offset mismatch on non-concat dimension").
    The wrap-around rows (t < -s) are exactly the rows whose source
    index is negative — (u+du)*pe_c + (v+dv) = t + s < 0 implies
    u+du < 0, or u+du == 0 and v+dv < 0 — which the caller's validity
    mask zeroes, so the rotate is equivalent to the zero-padded shift.
    """
    if s == 0:
        return src
    return pltpu.roll(src, (-s) % src.shape[0], 0)


def _unshift_add(acc, col, s: int, dtype):
    """Adjoint of _shift: scatter out[t] grads back to src[t+s].

    ``col`` must already be validity-masked (its rows t < -s are zero),
    so the rotate wraps only zeros back to the tail."""
    if s == 0:
        return acc + col
    return acc + pltpu.roll(col, s % col.shape[0], 0)


def _fwd_stack(x0, w0, b0, s0, t0, w1, b1, s1, t1, w2, b2, s2, t2,
               *, pe_r, pe_c, P, Pp, vr, vc, dt, G=1):
    """Shared forward body -> (pooled [G,64] f32, residuals for bwd).

    All row dims carry G stacked images (plane-major, image-within-group
    inner): matmuls are G x taller, masks tile per image, and the rotate
    shifts stay correct because every row a rotate pulls across an image
    boundary lands on a masked position (see build_x0_planes)."""
    GPp = G * Pp
    mask, valid = _masks(pe_r, pe_c, Pp, vr, vc, jnp.float32, group=G)

    # conv0 + relu + bn0 (1x1 in cell space: one matmul).  Activations
    # stay f32 through the rotate (Mosaic: no bf16 rotate) and are cast
    # to the compute dtype after masking, at the matmul boundary.
    y0 = jnp.dot(x0, w0, preferred_element_type=jnp.float32)
    r0 = jnp.maximum(y0 + b0, 0.0)                 # [4GPp, 64] f32
    a0 = r0 * s0 + t0

    # conv1: per output plane, im2col = 4 masked shifted plane slices
    z1_planes = []
    for op in (0, 1):
        for oq in (0, 1):
            cols = []
            for a in (0, 1):
                for c in (0, 1):
                    sp, du = _tap(op, a)
                    sq, dv = _tap(oq, c)
                    src = a0[(sp * 2 + sq) * GPp:
                             (sp * 2 + sq + 1) * GPp, :]
                    blk = _shift(src, du * pe_c + dv, jnp.float32)
                    cols.append((blk * mask(du, dv, sp, sq)).astype(dt))
            z1_planes.append(jnp.concatenate(cols, axis=1))   # [GPp, 256]
    z1 = jnp.concatenate(z1_planes, axis=0)                   # [4GPp, 256]
    y1 = jnp.dot(z1, w1, preferred_element_type=jnp.float32)
    r1 = jnp.maximum(y1 + b1, 0.0)                            # [4GPp, 32]
    a1 = r1 * s1 + t1

    # conv2: single output grid == one padded plane, 9 taps
    cols = []
    for di in (0, 1, 2):
        for dj in (0, 1, 2):
            sp, du = _tap(0, di)
            sq, dv = _tap(0, dj)
            src = a1[(sp * 2 + sq) * GPp:(sp * 2 + sq + 1) * GPp, :]
            blk = _shift(src, du * pe_c + dv, jnp.float32)
            cols.append((blk * mask(du, dv, sp, sq)).astype(dt))
    z2 = jnp.concatenate(cols, axis=1)                        # [GPp, 288]
    y2 = jnp.dot(z2, w2, preferred_element_type=jnp.float32)
    r2 = jnp.maximum(y2 + b2, 0.0)                            # [GPp, 64]
    out = (r2 * s2 + t2) * valid
    # per-image mean pool: segment sums over each image's Pp rows
    pooled = jnp.sum(out.reshape(G, Pp, 64), axis=1) * (1.0 / P)  # [G, 64]
    return pooled, (r0, z1, r1, z2, r2, valid)


def _fwd_kernel(x0_ref, w0_r, b0_r, s0_r, t0_r, w1_r, b1_r, s1_r, t1_r,
                w2_r, b2_r, s2_r, t2_r, out_ref, *, pe_r, pe_c, P, Pp,
                vr, vc, G):
    x0 = x0_ref[0]
    dt = x0.dtype
    pooled, _ = _fwd_stack(
        x0, w0_r[...], b0_r[...], s0_r[...], t0_r[...],
        w1_r[...], b1_r[...], s1_r[...], t1_r[...],
        w2_r[...], b2_r[...], s2_r[...], t2_r[...],
        pe_r=pe_r, pe_c=pe_c, P=P, Pp=Pp, vr=vr, vc=vc, dt=dt, G=G)
    out_ref[0] = pooled


def _bwd_kernel(x0_ref, dp_ref, w0_r, b0_r, s0_r, t0_r, w1_r, b1_r,
                s1_r, t1_r, w2_r, b2_r, s2_r, t2_r, w1t_r, w2t_r,
                dw0_ref, db0_ref, ds0_ref, dt0_ref,
                dw1_ref, db1_ref, ds1_ref, dt1_ref,
                dw2_ref, db2_ref, ds2_ref, dt2_ref,
                *, pe_r, pe_c, P, Pp, vr, vc, G):
    x0 = x0_ref[0]
    dt = x0.dtype
    dp = dp_ref[0]                                            # [G, 64]
    w0, b0, s0, t0 = w0_r[...], b0_r[...], s0_r[...], t0_r[...]
    w1, b1, s1, t1 = w1_r[...], b1_r[...], s1_r[...], t1_r[...]
    w2, b2, s2, t2 = w2_r[...], b2_r[...], s2_r[...], t2_r[...]
    GPp = G * Pp
    mask, _ = _masks(pe_r, pe_c, Pp, vr, vc, jnp.float32, group=G)

    _, (r0, z1, r1, z2, r2, valid) = _fwd_stack(
        x0, w0, b0, s0, t0, w1, b1, s1, t1, w2, b2, s2, t2,
        pe_r=pe_r, pe_c=pe_c, P=P, Pp=Pp, vr=vr, vc=vc, dt=dt, G=G)

    # pool -> bn2 -> relu -> conv2 (per-image cotangent broadcast over
    # that image's Pp rows)
    dy2 = jnp.broadcast_to(
        dp[:, None, :] * (1.0 / P), (G, Pp, 64)).reshape(GPp, 64) * valid
    ds2 = jnp.sum(dy2 * r2, axis=0, keepdims=True)
    dt2 = jnp.sum(dy2, axis=0, keepdims=True)
    g2 = dy2 * s2 * (r2 > 0.0)                                # [Pp, 64] f32
    db2 = jnp.sum(g2, axis=0, keepdims=True)
    g2c = g2.astype(dt)
    dw2 = jax.lax.dot_general(z2, g2c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # col2im conv2 -> dA1 per plane.  Each tap's data gradient comes
    # from its OWN small matmul (g2 @ w2^T tap columns) instead of a
    # lane-slice of one big dz2 — sliced wide vectors carry register
    # offsets Mosaic's rotate/concat lowering cannot reconcile.
    w2t = w2t_r[...]                                          # [64, 288]
    da1 = [jnp.zeros((GPp, 32), jnp.float32) for _ in range(4)]
    k = 0
    for di in (0, 1, 2):
        for dj in (0, 1, 2):
            sp, du = _tap(0, di)
            sq, dv = _tap(0, dj)
            col = jnp.dot(g2c, w2t[:, k * 32:(k + 1) * 32],
                          preferred_element_type=jnp.float32)
            col = col * mask(du, dv, sp, sq)
            pidx = sp * 2 + sq
            da1[pidx] = _unshift_add(da1[pidx], col,
                                     du * pe_c + dv, jnp.float32)
            k += 1

    # bn1 -> relu -> conv1, all per plane (no sublane concats)
    w1t = w1t_r[...]                                          # [32, 256]
    ds1 = dt1 = db1 = dw1 = None
    dz1p_g = []
    for p in range(4):
        r1p = r1[p * GPp:(p + 1) * GPp, :]
        z1p = z1[p * GPp:(p + 1) * GPp, :]
        d = da1[p]
        ds1p = jnp.sum(d * r1p, axis=0, keepdims=True)
        dt1p = jnp.sum(d, axis=0, keepdims=True)
        g1p = d * s1 * (r1p > 0.0)
        db1p = jnp.sum(g1p, axis=0, keepdims=True)
        g1pc = g1p.astype(dt)
        dw1p = jax.lax.dot_general(z1p, g1pc, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dz1p_g.append(g1pc)
        ds1 = ds1p if ds1 is None else ds1 + ds1p
        dt1 = dt1p if dt1 is None else dt1 + dt1p
        db1 = db1p if db1 is None else db1 + db1p
        dw1 = dw1p if dw1 is None else dw1 + dw1p

    # col2im conv1 -> dA0 per source plane (per-tap matmuls again)
    da0 = [jnp.zeros((GPp, 64), jnp.float32) for _ in range(4)]
    for op in (0, 1):
        for oq in (0, 1):
            g1pc = dz1p_g[op * 2 + oq]
            k = 0
            for a in (0, 1):
                for c in (0, 1):
                    sp, du = _tap(op, a)
                    sq, dv = _tap(oq, c)
                    col = jnp.dot(g1pc, w1t[:, k * 64:(k + 1) * 64],
                                  preferred_element_type=jnp.float32)
                    col = col * mask(du, dv, sp, sq)
                    pidx = sp * 2 + sq
                    da0[pidx] = _unshift_add(da0[pidx], col,
                                             du * pe_c + dv, jnp.float32)
                    k += 1

    # bn0 -> relu -> conv0, per plane
    ds0 = dt0 = db0 = dw0 = None
    for p in range(4):
        r0p = r0[p * GPp:(p + 1) * GPp, :]
        x0p = x0[p * GPp:(p + 1) * GPp, :]
        d = da0[p]
        ds0p = jnp.sum(d * r0p, axis=0, keepdims=True)
        dt0p = jnp.sum(d, axis=0, keepdims=True)
        g0p = d * s0 * (r0p > 0.0)
        db0p = jnp.sum(g0p, axis=0, keepdims=True)
        dw0p = jax.lax.dot_general(x0p, g0p.astype(dt),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds0 = ds0p if ds0 is None else ds0 + ds0p
        dt0 = dt0p if dt0 is None else dt0 + dt0p
        db0 = db0p if db0 is None else db0 + db0p
        dw0 = dw0p if dw0 is None else dw0 + dw0p

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw0_ref, db0_ref, ds0_ref, dt0_ref, dw1_ref, db1_ref,
                    ds1_ref, dt1_ref, dw2_ref, db2_ref, ds2_ref, dt2_ref):
            ref[...] = jnp.zeros_like(ref)

    dw0_ref[...] += dw0
    db0_ref[...] += db0
    ds0_ref[...] += ds0
    dt0_ref[...] += dt0
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    ds1_ref[...] += ds1
    dt1_ref[...] += dt1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    ds2_ref[...] += ds2
    dt2_ref[...] += dt2


# ------------------------------------------------------------ custom_vjp

_W_KEYS = ("w0", "b0", "s0", "t0", "w1", "b1", "s1", "t1",
           "w2", "b2", "s2", "t2")
_ROW = {"b0": 64, "s0": 64, "t0": 64, "b1": 32, "s1": 32, "t1": 32,
        "b2": 64, "s2": 64, "t2": 64}
_MAT = {"w0": (64, 64), "w1": (256, 32), "w2": (288, 64)}


@functools.lru_cache(maxsize=8)
def _make_pooled_fn(hc: int, wc: int, interpret: bool, group: int = 1,
                    bwd_group: int = 1):
    pe_r, pe_c, P, Pp, vr, vc = _geom(hc, wc)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    wspecs = [vmem] * 12
    G = group
    Gb = bwd_group

    def fwd_call(x0, ws):
        nb = x0.shape[0]                 # = batch / G
        kern = functools.partial(_fwd_kernel, pe_r=pe_r, pe_c=pe_c, P=P,
                                 Pp=Pp, vr=vr, vc=vc, G=G)
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, 4 * G * Pp, 64),
                                   lambda i: (i, 0, 0))]
            + wspecs,
            out_specs=pl.BlockSpec((1, G, 64), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, G, 64), jnp.float32),
            interpret=interpret,
        )(x0, *(ws[k] for k in _W_KEYS)).reshape(nb * G, 64)

    def _regroup(x0):
        """[B/G, 4*G*Pp, 64] fwd-grouped planes -> bwd grouping Gb.

        The backward kernel recomputes and HOLDS the whole group's
        residuals in VMEM, so its group must be smaller than the
        forward's (G=4 measured 21 MB of scoped VMEM — over the 16 MB
        limit); a plain XLA transpose regroups the saved planes."""
        if Gb == G:
            return x0
        nb = x0.shape[0]
        x = x0.reshape(nb, 4, G, Pp, 64).swapaxes(1, 2)   # [nb,G,4,Pp,64]
        x = x.reshape(nb * G // Gb, Gb, 4, Pp, 64).swapaxes(1, 2)
        return x.reshape(nb * G // Gb, 4 * Gb * Pp, 64)

    def bwd_call(x0, ws, dy):
        x0 = _regroup(x0)
        nb = x0.shape[0]                 # = batch / Gb
        kern = functools.partial(_bwd_kernel, pe_r=pe_r, pe_c=pe_c, P=P,
                                 Pp=Pp, vr=vr, vc=vc, G=Gb)
        grads = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, 4 * Gb * Pp, 64),
                                   lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, Gb, 64), lambda i: (i, 0, 0))]
            + wspecs + [vmem, vmem],
            out_specs=tuple(
                pl.BlockSpec(_MAT.get(k, (1, _ROW.get(k, 0))),
                             lambda i: (0, 0))
                for k in _W_KEYS),
            out_shape=tuple(
                jax.ShapeDtypeStruct(_MAT.get(k, (1, _ROW.get(k, 0))),
                                     jnp.float32)
                for k in _W_KEYS),
            interpret=interpret,
        )(x0, dy.reshape(nb, Gb, 64), *(ws[k] for k in _W_KEYS),
          jnp.swapaxes(ws["w1"], 0, 1), jnp.swapaxes(ws["w2"], 0, 1))
        out = {}
        for k, g in zip(_W_KEYS, grads):
            g = g.astype(ws[k].dtype)
            out[k] = g if k in _MAT else g.reshape(ws[k].shape)
        return out

    @jax.custom_vjp
    def pooled(x0, ws):
        return fwd_call(x0, ws)

    def pooled_fwd(x0, ws):
        return fwd_call(x0, ws), (x0, ws)

    def pooled_bwd(res, dy):
        x0, ws = res
        # camera frames are data, not parameters: their cotangent is
        # never consumed (rl/ppo.py differentiates params only), so a
        # zero placeholder is returned and DCE'd by XLA.
        return jnp.zeros_like(x0), bwd_call(x0, ws, dy)

    pooled.defvjp(pooled_fwd, pooled_bwd)
    return pooled


def encode_pooled(x_nhwc: jnp.ndarray, ws: dict,
                  interpret: bool = False, group: int = 4,
                  bwd_group: int = 1) -> jnp.ndarray:
    """Fused CNN stack: normalized [B,H,W,1] image -> pooled [B,64] f32.

    GRADIENT CONTRACT: differentiates w.r.t. ``ws`` ONLY. The image
    input is treated as rollout data (stop_gradient'd below) — callers
    that need d/d(image), e.g. a learned pre-encoder, must use the XLA
    path. The custom VJP would otherwise silently return zeros for it.

    ``ws``: w0 [64,64] (folded conv0 matrix), w1 [256,32] (cell conv1),
    w2 [288,64] (conv2 im2col, (di,dj,cin) row order), conv biases
    b0 [64] (tiled x4) / b1 [32] / b2 [64], folded-BN effective
    scale/bias s0,t0 [64] (tiled) / s1,t1 [32] / s2,t2 [64].
    Matmul weights should be in the compute dtype (bf16 on TPU);
    biases/BN rows are kept f32 and applied in f32 like the XLA path's
    accumulation, then cast at layer boundaries.

    ``group``: images stacked per FORWARD kernel invocation (row axis) —
    taller matmuls, fewer grid steps. ``bwd_group``: the backward's own
    (smaller) grouping — it recomputes and holds the whole group's
    residuals in VMEM, so group=4 overflows the 16 MB scoped limit
    (measured 21 MB at 212x120); the saved planes are regrouped by a
    plain XLA transpose before the backward kernel. The batch is
    zero-padded up to a group multiple and the pad rows' outputs
    dropped (their gradients are exactly zero: masked rows).
    """
    b, h, w, _ = x_nhwc.shape
    # the image cotangent is declared zero ON PURPOSE via stop_gradient:
    # pooled_bwd does not compute d/d(image), and no caller needs it (the
    # camera is not learned).  A future learned pre-encoder must use the
    # XLA path — under stop_gradient it would silently get zero image
    # gradients here, not an error.
    x_nhwc = jax.lax.stop_gradient(x_nhwc)
    group = max(1, min(int(group), b))
    bwd_group = max(1, min(int(bwd_group), group))
    while group % bwd_group:
        bwd_group -= 1
    b_pad = -(-b // group) * group
    if b_pad != b:
        x_nhwc = jnp.pad(x_nhwc, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    x0 = build_x0_planes(x_nhwc, group=group)
    fn = _make_pooled_fn(h // 4, w // 4, interpret, group, bwd_group)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    packed = {k: (ws[k].astype(x_nhwc.dtype) if k in _MAT else row(ws[k]))
              for k in _W_KEYS}
    out = fn(x0, packed)
    return out[:b] if b_pad != b else out
