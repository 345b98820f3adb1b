"""Fused PPO update phase: ALL mini-epoch x minibatch Adam steps in ONE
Pallas kernel, with params + Adam moments resident in VMEM.

Why: at reference-parity model sizes ([64,128,64] elu MLP, minibatch
2048) the XLA update phase is 240 chained steps of ~30 tiny ops each —
per-op dispatch/scheduling latency dominates and utilization sits at
~0.4% of peak (benchmarks/roofline.json). Fusing the whole chain removes
the per-op overhead: one kernel, one weight residency, minibatch data
streamed from HBM in feature-major blocks.

Exact XLA-update semantics replicated (rl/ppo.py update/minibatch_step/
_loss_fn, which themselves mirror reference a2c_continuous.py:299-369 +
schedulers.py:81-94 + datasets.py update_mu_sigma):
  * clipped PPO surrogate (hard clamp), critic MSE (no value clip),
    bounds loss, entropy term (coef may be 0);
  * grad-norm clip (global norm over ALL tensors, scale = min(1, gn/n));
  * Adam with optax's update rule (lr folded after: p -= lr*mhat/
    (sqrt(vhat)+eps), bias correction by shared step count);
  * mu/sigma write-back per minibatch (later mini-epochs compute KL vs
    the values stored at the PREVIOUS visit);
  * adaptive-KL lr update at each mini-epoch end (x/÷1.5 vs 2x / 0.5x
    the threshold, clamped to [min_lr, max_lr]);
  * metrics = means over the LAST mini-epoch's minibatches.

Supported surface (asserted): vector observations, fixed_sigma shared
logstd, clip_value False, use_smooth_clamp False, adaptive or fixed lr.
Everything outside the minibatch scan (GAE, normalization, running
stats, dataset prep) stays in XLA. Single-device only: a data-parallel
mesh needs per-minibatch gradient psums between grid steps, which a
TPU kernel cannot issue — the runner keeps the XLA update there.

Parity: tests/test_fused_update.py (interpret mode) and the on-chip
family (scripts/preflight_tpu.py PARITY_TESTS).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ACT = 4                        # all tasks command 4 actions (rate mode)
B1, B2, EPS = 0.9, 0.999, 1e-8
LOG2PI = float(np.log(2.0 * np.pi))


class UpdatePack(NamedTuple):
    """Weights + Adam moments, feature-major (matches fused_rollout's
    PolicyPack conventions). head = [mu(4) ; value(1)] rows."""
    w0: jnp.ndarray        # [H0, OBS]
    b0: jnp.ndarray        # [H0, 1]
    w1: jnp.ndarray        # [H1, H0]
    b1: jnp.ndarray
    w2: jnp.ndarray        # [H2, H1]
    b2: jnp.ndarray
    wh: jnp.ndarray        # [HEAD, H2]
    bh: jnp.ndarray        # [HEAD, 1]
    logstd: jnp.ndarray    # [ACT, 1]


def pack_update(params):
    p = params["params"]
    mlp = p["actor_mlp"]
    t = lambda a: jnp.asarray(a, jnp.float32)
    col = lambda a: t(a).reshape(-1, 1)
    wh = jnp.concatenate([t(p["mu"]["kernel"]).T,
                          t(p["value"]["kernel"]).T], axis=0)
    assert wh.shape[0] == ACT + 1
    bh = jnp.concatenate([col(p["mu"]["bias"]),
                          col(p["value"]["bias"])], axis=0)
    return UpdatePack(
        w0=t(mlp["Dense_0"]["kernel"]).T, b0=col(mlp["Dense_0"]["bias"]),
        w1=t(mlp["Dense_1"]["kernel"]).T, b1=col(mlp["Dense_1"]["bias"]),
        w2=t(mlp["Dense_2"]["kernel"]).T, b2=col(mlp["Dense_2"]["bias"]),
        wh=wh, bh=bh, logstd=col(p["logstd"]))


def unpack_update(pack: UpdatePack, params_like):
    """UpdatePack -> flax params pytree (shapes of params_like)."""
    p = jax.tree.map(lambda x: x, params_like)   # fresh containers
    mlp = p["params"]["actor_mlp"]
    mlp["Dense_0"] = {"kernel": pack.w0.T, "bias": pack.b0[:, 0]}
    mlp["Dense_1"] = {"kernel": pack.w1.T, "bias": pack.b1[:, 0]}
    mlp["Dense_2"] = {"kernel": pack.w2.T, "bias": pack.b2[:, 0]}
    p["params"]["mu"] = {"kernel": pack.wh[:ACT].T,
                         "bias": pack.bh[:ACT, 0]}
    p["params"]["value"] = {"kernel": pack.wh[ACT:].T,
                            "bias": pack.bh[ACT:, 0]}
    p["params"]["logstd"] = pack.logstd[:, 0]
    return p


_FIELDS = list(UpdatePack._fields)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a [M, K] x b [N, K] -> [M, N] (contract the minor axes)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tt(a, b):
    """a [K, M] x b [K, N] -> [M, N] (contract the major axes)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(*refs, nmb: int, mini_epochs: int, mb: int, cfg: dict):
    """Positional refs: 5 data inputs, 27 weight/moment inputs, lr_in,
    t_in, then 27 weight/moment outputs, lr_out, t_out, metrics_out,
    then scratch (mus, sigma table, accum, live lr, live t, 27 live
    weight/moment buffers)."""
    n_w = len(_FIELDS)
    (obs_r, act_r, sc_r, mus0_r, sigma0_r) = refs[:5]
    k = 5
    w_in = refs[k:k + n_w]
    m_in = refs[k + n_w:k + 2 * n_w]
    v_in = refs[k + 2 * n_w:k + 3 * n_w]
    lr_in = refs[k + 3 * n_w]
    t_in = refs[k + 3 * n_w + 1]
    k = k + 3 * n_w + 2
    w_out = refs[k:k + n_w]
    m_out = refs[k + n_w:k + 2 * n_w]
    v_out = refs[k + 2 * n_w:k + 3 * n_w]
    lr_out = refs[k + 3 * n_w]
    t_out = refs[k + 3 * n_w + 1]
    met_out = refs[k + 3 * n_w + 2]
    k = k + 3 * n_w + 3
    mus_scr, acc_scr, lr_scr, t_scr = refs[k:k + 4]
    scr_w = refs[k + 4:k + 4 + 3 * n_w]

    g = pl.program_id(0)
    i = g % nmb                      # minibatch index
    e = g // nmb                     # mini-epoch index
    first = g == 0
    last = g == nmb * mini_epochs - 1

    # --- live state: params/moments in VMEM scratch (scr_w is a list of
    # 27 refs ordered [w x9, m x9, v x9]), lr + step count in SMEM
    @pl.when(first)
    def _init():
        for k in range(n_w):
            scr_w[k][...] = w_in[k][...]
            scr_w[n_w + k][...] = m_in[k][...]
            scr_w[2 * n_w + k][...] = v_in[k][...]
        lr_scr[0] = lr_in[0]
        t_scr[0] = t_in[0]
        for k in range(8):
            acc_scr[k] = 0.0

    W = [scr_w[k][...] for k in range(n_w)]
    (w0, b0, w1, b1, w2, b2, wh, bh, logstd) = W

    # --- minibatch data (feature-major blocks)
    x = obs_r[0]                     # [OBS, mb] (already normalized)
    a = act_r[0]                     # [ACT, mb]
    adv = sc_r[0, 0:1, :]            # [1, mb]
    ret = sc_r[0, 1:2, :]
    nlp_old = sc_r[0, 2:3, :]

    # --- forward
    z0 = _mm(w0, x) + b0
    h0 = jnp.where(z0 > 0, z0, jnp.exp(jnp.minimum(z0, 0.0)) - 1.0)
    z1 = _mm(w1, h0) + b1
    h1 = jnp.where(z1 > 0, z1, jnp.exp(jnp.minimum(z1, 0.0)) - 1.0)
    z2 = _mm(w2, h1) + b2
    h2 = jnp.where(z2 > 0, z2, jnp.exp(jnp.minimum(z2, 0.0)) - 1.0)
    out = _mm(wh, h2) + bh           # [HEAD, mb]
    mu = out[:ACT]
    v = out[ACT:ACT + 1]             # [1, mb]
    sigma = jnp.exp(logstd)          # [ACT, 1]

    d = (a - mu) / sigma
    nlp = (0.5 * jnp.sum(d * d, axis=0, keepdims=True)
           + 0.5 * LOG2PI * ACT + jnp.sum(logstd))
    ratio = jnp.exp(nlp_old - nlp)   # [1, mb]
    e_clip = cfg["e_clip"]
    clamped = jnp.clip(ratio, 1.0 - e_clip, 1.0 + e_clip)
    n_s1 = -adv * ratio
    n_s2 = -adv * clamped
    a_loss = jnp.maximum(n_s1, n_s2)

    verr = v - ret
    c_loss = verr * verr

    sb = 1.1
    mu_hi = jnp.maximum(mu - sb, 0.0)
    mu_lo = jnp.minimum(mu + sb, 0.0)
    b_loss = jnp.sum(mu_hi * mu_hi + mu_lo * mu_lo, axis=0, keepdims=True)

    ent = jnp.sum(logstd) + 0.5 * ACT * (1.0 + LOG2PI)

    # --- backward (see rl/ppo._loss_fn; mean over mb samples)
    inv = 1.0 / mb
    # d a_loss / d nlp: branch on the max, clip passes gradient inside
    use1 = (n_s1 >= n_s2).astype(jnp.float32)
    inclip = ((ratio > 1.0 - e_clip) & (ratio < 1.0 + e_clip)) \
        .astype(jnp.float32)
    # d(-adv*ratio)/dnlp = adv*ratio ; clipped branch gated by inclip
    dnlp = inv * (use1 * adv * ratio + (1.0 - use1) * adv * ratio * inclip)
    dmu = dnlp * (-d / sigma)                                  # [ACT, mb]
    dmu = dmu + (cfg["bounds_coef"] * inv) * (2.0 * mu_hi + 2.0 * mu_lo)
    dv = (cfg["critic_coef"] * inv) * verr                     # [1, mb]
    dlogstd = (jnp.sum(dnlp * (1.0 - d * d), axis=1, keepdims=True)
               - cfg["entropy_coef"])                          # [ACT, 1]

    dout = jnp.concatenate([dmu, dv], axis=0)                  # [HEAD, mb]
    dwh = _mm_t(dout, h2)
    dbh = jnp.sum(dout, axis=1, keepdims=True)
    dh2 = _mm_tt(wh, dout)
    dz2 = dh2 * jnp.where(z2 > 0, 1.0, h2 + 1.0)
    dw2 = _mm_t(dz2, h1)
    db2 = jnp.sum(dz2, axis=1, keepdims=True)
    dh1 = _mm_tt(w2, dz2)
    dz1 = dh1 * jnp.where(z1 > 0, 1.0, h1 + 1.0)
    dw1 = _mm_t(dz1, h0)
    db1 = jnp.sum(dz1, axis=1, keepdims=True)
    dh0 = _mm_tt(w1, dz1)
    dz0 = dh0 * jnp.where(z0 > 0, 1.0, h0 + 1.0)
    dw0 = _mm_t(dz0, x)
    db0 = jnp.sum(dz0, axis=1, keepdims=True)

    grads = [dw0, db0, dw1, db1, dw2, db2, dwh, dbh, dlogstd]

    # --- global grad-norm clip
    if cfg["truncate_grads"]:
        gsq = 0.0
        for gr in grads:
            gsq = gsq + jnp.sum(gr * gr)
        gn = jnp.sqrt(gsq)
        scale = jnp.minimum(1.0, cfg["grad_norm"] / jnp.maximum(gn, 1e-6))
        grads = [gr * scale for gr in grads]

    # --- Adam (optax rule; lr folded after bias-corrected update)
    t_new = t_scr[0] + 1.0
    t_scr[0] = t_new
    bc1 = 1.0 - jnp.exp(t_new * jnp.log(B1))
    bc2 = 1.0 - jnp.exp(t_new * jnp.log(B2))
    lr = lr_scr[0]
    for k in range(n_w):
        m_new = B1 * scr_w[n_w + k][...] + (1.0 - B1) * grads[k]
        v_new = B2 * scr_w[2 * n_w + k][...] + (1.0 - B2) * (grads[k]
                                                             * grads[k])
        scr_w[n_w + k][...] = m_new
        scr_w[2 * n_w + k][...] = v_new
        upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
        scr_w[k][...] = scr_w[k][...] - lr * upd

    # --- KL vs the stored (previous-visit) policy + write-back. The
    # per-minibatch storage is an 8-row block (Mosaic needs dynamic
    # sublane slices at 8-row granularity): rows 0:ACT = mu, rows
    # ACT:2*ACT = sigma broadcast over the minibatch columns.
    blk_old = mus_scr[pl.ds(i * 8, 8), :]                     # [8, mb]
    mu_old = jnp.where(e == 0, mus0_r[0], blk_old[:ACT])      # [ACT, mb]
    sig_old = jnp.where(e == 0, sigma0_r[...],
                        blk_old[ACT:2 * ACT, 0:1])            # [ACT, 1]
    kl_e = (jnp.log(sigma / sig_old + 1e-7)
            + (sig_old * sig_old + (mu - mu_old) * (mu - mu_old))
            / (2.0 * sigma * sigma + 1e-7) - 0.5)
    kl = jnp.mean(jnp.sum(kl_e, axis=0))
    mus_scr[pl.ds(i * 8, 8), :] = jnp.concatenate(
        [mu, jnp.broadcast_to(sigma, (ACT, mb))], axis=0)

    clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > e_clip)
                         .astype(jnp.float32))
    total = (jnp.mean(a_loss) + 0.5 * cfg["critic_coef"] * jnp.mean(c_loss)
             - cfg["entropy_coef"] * ent
             + cfg["bounds_coef"] * jnp.mean(b_loss))

    # --- mini-epoch accumulators: loss, kl, a, c, b, ent, clip
    @pl.when(i == 0)
    def _reset():
        for k in range(8):
            acc_scr[k] = 0.0

    acc_scr[0] = acc_scr[0] + total
    acc_scr[1] = acc_scr[1] + kl
    acc_scr[2] = acc_scr[2] + jnp.mean(a_loss)
    acc_scr[3] = acc_scr[3] + jnp.mean(c_loss)
    acc_scr[4] = acc_scr[4] + jnp.mean(b_loss)
    acc_scr[5] = acc_scr[5] + ent
    acc_scr[6] = acc_scr[6] + clip_frac

    @pl.when(i == nmb - 1)
    def _mini_epoch_end():
        av_kl = acc_scr[1] / nmb
        if cfg["adaptive_lr"]:
            lr0 = lr_scr[0]
            thr = cfg["kl_threshold"]
            lr1 = jnp.where(av_kl > 2.0 * thr,
                            jnp.maximum(lr0 / 1.5, cfg["min_lr"]), lr0)
            lr1 = jnp.where(av_kl < 0.5 * thr,
                            jnp.minimum(lr1 * 1.5, cfg["max_lr"]), lr1)
            lr_scr[0] = lr1

    @pl.when(last)
    def _finish():
        for k in range(n_w):
            w_out[k][...] = scr_w[k][...]
            m_out[k][...] = scr_w[n_w + k][...]
            v_out[k][...] = scr_w[2 * n_w + k][...]
        lr_out[0] = lr_scr[0]
        t_out[0] = t_scr[0]
        # scatter doesn't lower on Mosaic: build the (8,128) metrics
        # block as col-0 = accumulator means via iota/where
        vals = jnp.stack([acc_scr[k] / nmb for k in range(7)]
                         + [jnp.float32(0.0)])               # (8,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        met_out[...] = jnp.where(cols == 0, vals[:, None], 0.0)


def fused_update(obs_n, actions, adv, returns, neglogp, mus0, sigma0,
                 pack: UpdatePack, m_pack: UpdatePack, v_pack: UpdatePack,
                 lr, count, *, nmb: int, mini_epochs: int, cfg: dict,
                 interpret=None):
    OBS = obs_n.shape[1]
    if interpret is None:
        # Mosaic only lowers on TPU; anywhere else (CPU test suite)
        # run the kernel in interpret mode (same numerics, jax ops)
        interpret = jax.default_backend() != "tpu"
    """Run the whole update phase.

    obs_n     [B, OBS]  NORMALIZED observations (obs_rms applied+clipped)
    actions   [B, ACT]; adv/returns/neglogp [B]
    mus0      [B, ACT] rollout policy means (first-visit KL reference)
    sigma0    [ACT, 1] rollout sigma
    pack/m_pack/v_pack  weights and Adam moments (UpdatePack)
    lr [1] f32; count [1] f32 (Adam step count so far)

    Returns (pack', m', v', lr', count', metrics dict).
    """
    B = obs_n.shape[0]
    assert B % nmb == 0
    mb = B // nmb

    fm = lambda x, f: jnp.swapaxes(x.reshape(nmb, mb, f), 1, 2)
    obs_d = fm(obs_n, OBS)                              # [nmb, OBS, mb]
    act_d = fm(actions, ACT)
    sc_d = jnp.stack([adv.reshape(nmb, mb), returns.reshape(nmb, mb),
                      neglogp.reshape(nmb, mb)], axis=1)  # [nmb, 3, mb]
    mus_d = fm(mus0, ACT)

    grid = (nmb * mini_epochs,)
    blk = lambda f: pl.BlockSpec((1, f, mb), lambda g: (g % nmb, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    w_shapes = [tuple(getattr(pack, f).shape) for f in _FIELDS]
    n_w = len(_FIELDS)

    kernel = functools.partial(
        _kernel, nmb=nmb, mini_epochs=mini_epochs, mb=mb, cfg=cfg)

    out_shape = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes] * 3
        + [jax.ShapeDtypeStruct((1,), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([blk(OBS), blk(ACT), blk(3), blk(ACT), full()]
                  + [full()] * (3 * n_w) + [smem(), smem()]),
        out_specs=tuple([full()] * (3 * n_w) + [smem(), smem(), full()]),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((nmb * 8, mb), jnp.float32),     # mu+sigma blocks
            pltpu.SMEM((8,), jnp.float32),              # metric accum
            pltpu.SMEM((1,), jnp.float32),              # live lr
            pltpu.SMEM((1,), jnp.float32),              # live Adam count
        ] + [pltpu.VMEM(s, jnp.float32) for s in w_shapes] * 3,
        interpret=interpret,
    )(obs_d, act_d, sc_d, mus_d, sigma0,
      *pack, *m_pack, *v_pack, lr, count)

    w_new = UpdatePack(*outs[:n_w])
    m_new = UpdatePack(*outs[n_w:2 * n_w])
    v_new = UpdatePack(*outs[2 * n_w:3 * n_w])
    lr_new = outs[3 * n_w]
    t_new = outs[3 * n_w + 1]
    met = outs[3 * n_w + 2]
    metrics = {"loss": met[0, 0], "kl": met[1, 0], "a_loss": met[2, 0],
               "c_loss": met[3, 0], "b_loss": met[4, 0],
               "entropy": met[5, 0], "clip_frac": met[6, 0]}
    return w_new, m_new, v_new, lr_new, t_new, metrics
