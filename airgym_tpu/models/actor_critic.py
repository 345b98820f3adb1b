"""Actor-critic model (reference: lib/model/a2c_continuous_logstd_model.py +
lib/network/mlp.py).

Continuous A2C model with a global state-independent log-std
(``fixed_sigma: True`` in every reference YAML), shared MLP trunk
([64,128,64] elu by default, ppo_hovering.yaml:22-27), mu and value heads
initialized at 0.1x scale (reference model :52-68), and optional image
encoders (CNN / VAE, reference lib/network/cnn.py, VAE.py) for dict
observations {'image', 'observation'}.

Flax linen; parameters live in a replicated pytree; forward passes are
shaped [B, ...] and designed to land on the MXU as single fused matmul
chains (bf16-friendly widths are up to the config).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_ACTIVATIONS = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "sin": jnp.sin,
    "none": lambda x: x,
}


def scaled_init(scale: float = 1.0):
    """Lecun-normal variance scaling times ``scale`` — used at 0.1 for the
    mu/value heads like the reference (model :52-68)."""
    base = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class MLP(nn.Module):
    """Plain MLP trunk (reference lib/network/mlp.py:4-40)."""
    units: Sequence[int]
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        for u in self.units:
            x = act(nn.Dense(u)(x))
        return x


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm: y = scale * (x - mean) / sqrt(var + eps) + bias
    with running statistics stored as (non-updated) parameters so torch
    checkpoints import/export losslessly. Inside the jitted RL train loop
    batch statistics are never collected (the reference's BN also runs in
    a noisy, momentum-lagged regime during rollouts; freezing them keeps
    the model a pure function — scale/bias still learn)."""
    features: int

    @nn.compact
    def __call__(self, x=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        # fold to one multiply-add, computed at the feature-vector level
        # in f32 then applied in x's dtype — a naive (x - mean) * ... in
        # f32 silently promotes the whole bf16 activation (2x the HBM
        # traffic of the conv stack's dominant tensors)
        eff_scale = scale * jax.lax.rsqrt(var + 1e-5)
        eff_bias = bias - mean * eff_scale
        if x is None:
            # fused-kernel path: hand the folded madd to the caller
            # (ops/fused_cnn applies it inside the Pallas stack)
            return eff_scale, eff_bias
        return x * eff_scale.astype(x.dtype) + eff_bias.astype(x.dtype)


class _SpaceToDepthConv0(nn.Module):
    """The first conv (5x5, stride 2, C_in=1) in space-to-depth form.

    XLA's backward pass for a stride-2 conv with a SINGLE input channel
    computes the [5,5,1,16] filter gradient as a giant elementwise
    multiply+reduce over the [B,106,60,16] activation (traced: 2.4 ms of
    a 3.8 ms vision minibatch step was conv0 fwd+bwd at B=609). Folding
    2x2 input blocks into 4 channels turns it into an equivalent 3x3
    stride-1 conv whose filter gradient XLA lowers as an MXU contraction:
      out[i,j,o] = sum_{di,dj<5} x_pad[2i+di, 2j+dj] w[di,dj,o]
                 = sum_{a,b<3, p,q<2} s2d[i+a, j+b, 2p+q] w[2a+p, 2b+q, o]
    The parameter keeps the reference's exact [5,5,1,16] shape/name
    (checkpoint .pth round-trip unaffected); the rearranged [3,3,4,16]
    weight is built in-graph from it, so gradients flow back through the
    (zero-padded) scatter. Numerics match the direct conv up to bf16
    summation order."""
    features: int = 16
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, 1], H and W even
        b, h, w_, _ = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        wk = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # [6,6,1,F]
        wk = wk.reshape(3, 2, 3, 2, self.features)              # a,p,b,q,F
        wk = wk.transpose(0, 2, 1, 3, 4).reshape(3, 3, 4, self.features)
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        s = xp.reshape(b, h // 2 + 2, 2, w_ // 2 + 2, 2)
        s = s.transpose(0, 1, 3, 2, 4).reshape(
            b, h // 2 + 2, w_ // 2 + 2, 4)
        if self.compute_dtype is not None:
            wk = wk.astype(self.compute_dtype)
            bias = bias.astype(self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            s, wk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class _FoldedConv0(nn.Module):
    """conv0 (5x5 stride 2, C_in=1) with 2x2 OUTPUT pixels folded into the
    channel dim, on top of the space-to-depth input form (see
    _SpaceToDepthConv0).

    The s2d form fixed the filter-gradient lowering but still runs a
    16-channel output on the 128-lane MXU (~12% lane fill) with a huge
    spatial M. Packing each 2x2 block of output pixels into channels
    turns the conv into a 4x4-cell stride-2 conv with 64 output channels:
    M shrinks 4x, lane fill quadruples, and K stays one MXU pass
    (4*4*4 = 64 <= 128). Measured 5.5x faster fwd+bwd for the whole
    3-conv stack at minibatch scale vs the s2d form (chained with
    _CellConv1 below, which consumes this layout directly).

    Output: [B, H//4, W//4, 4*features], channel index = (p*2+q)*F + o
    for output pixel (2i+p, 2j+q) and filter o. The parameter keeps the
    reference's exact [5,5,1,16] shape/name (checkpoint .pth round-trip
    unaffected); numerics match the direct conv up to bf16 summation
    order."""
    features: int = 16
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_matrix: bool = False):
        # x: [B, H, W, 1], H and W divisible by 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # [3,3,4,F] stride-1 s2d weight (as in _SpaceToDepthConv0) ...
        wk = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        wk = wk.reshape(3, 2, 3, 2, self.features)
        wk = wk.transpose(0, 2, 1, 3, 4).reshape(3, 3, 4, self.features)
        # ... then fold the 2x2 output pixels: output pixel (2i+p, 2j+q)
        # reads cells [2i+p, 2i+p+2], so W4[p:p+3, q:q+3, :, (p,q), :] = wk
        cols = [jnp.pad(wk, ((p, 1 - p), (q, 1 - q), (0, 0), (0, 0)))
                for p in (0, 1) for q in (0, 1)]
        w4 = jnp.stack(cols, axis=-2)
        w4 = w4.reshape(4, 4, 4, 4 * self.features)
        bias4 = jnp.tile(bias, (4,))
        if return_matrix:
            # fused-kernel path: [64, 4F] im2col matrix, rows ordered
            # (cell_a, cell_b, s2d_channel) to match
            # ops/fused_cnn.build_x0_planes
            return w4.reshape(4 * 4 * 4, 4 * self.features), bias4
        b, h, w_, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        s = xp.reshape(b, h // 2 + 2, 2, w_ // 2 + 2, 2)
        s = s.transpose(0, 1, 3, 2, 4).reshape(
            b, h // 2 + 2, w_ // 2 + 2, 4)
        if self.compute_dtype is not None:
            w4 = w4.astype(self.compute_dtype)
            bias4 = bias4.astype(self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            s, w4, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias4


class _CellConv1(nn.Module):
    """conv1 (3x3 stride 2) consuming _FoldedConv0's folded layout
    [B, hc, wc, 4*C_in] directly (cell (i,j) holds pixels (2i+p, 2j+q)).

    Output pixel (y,x) of the original conv reads pixel rows 2y-1..2y+1,
    i.e. cells y-1..y — a 2x2-cell stride-1 conv with the weight
    rearranged as W[a,(p,·)] = K[2a+p-1] (the dy=-1 tap is the zero row
    of the padded kernel; the cell -1 column is the zero-padded input,
    matching the original SAME padding). K = 2*2*4*16 = 256 stays two
    MXU passes; output is the ordinary [B, hc, wc, features] pixel grid.
    The parameter keeps the reference's [3,3,C_in,features] shape."""
    features: int = 32
    in_features: int = 16
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_matrix: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # idx = dy+1
        w = kp[jnp.array([[0, 1], [2, 3]])]            # [a, p, 4, Cin, F]
        w = w[:, :, jnp.array([[0, 1], [2, 3]])]       # [a, p, b, q, Cin, F]
        w = w.transpose(0, 2, 1, 3, 4, 5).reshape(
            2, 2, 4 * self.in_features, self.features)
        if return_matrix:
            # fused-kernel path: [4*4Cin, F] im2col matrix, rows ordered
            # (cell_a, cell_b, folded_channel)
            return (w.reshape(4 * 4 * self.in_features, self.features),
                    bias)
        if self.compute_dtype is not None:
            w = w.astype(self.compute_dtype)
            bias = bias.astype(self.compute_dtype)
            x = x.astype(self.compute_dtype)  # bn0 promotes back to f32
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class _RawConvParams(nn.Module):
    """Parameter twin of nn.Conv (same names/shapes/inits) that only
    hands out the raw kernel/bias — used by the fused-kernel path so the
    parameter tree stays identical to the XLA path's nn.Conv."""
    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.kernel_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.kernel_shape[-1],), jnp.float32)
        return kernel, bias


class CNNEncoder(nn.Module):
    """Depth-image feature extractor, layer-for-layer the reference
    CNNFeatureExtractor (lib/network/cnn.py:3-34): conv(16,5,s2) -> ReLU
    -> BN, conv(32,3,s2) -> ReLU -> BN, conv(64,3,s2) -> ReLU -> BN,
    global avg pool, fc(64 -> feature_dim). Checkpoint keys round-trip to
    ``actor_cnn.features.{0,3,6}`` / ``.features.{2,5,8}`` / ``.fc``.

    Convolutions compute in bf16 on the MXU by default (+33% measured
    vision-PPO throughput); parameters stay f32 so checkpoints are
    unaffected. Pass compute_dtype=None for full f32. The first conv runs
    in space-to-depth form for even input dims (see _SpaceToDepthConv0) —
    same parameters, same math, much cheaper backward pass.
    """
    feature_dim: int = 30
    compute_dtype: Any = jnp.bfloat16
    # 'auto': the folded XLA stack (fastest measured END-TO-END: the
    # Pallas megakernel's forward is competitive but its backward is
    # ~2.4x slower than XLA's at minibatch scale, which regressed vision
    # training 2.7x when 'auto' briefly meant pallas-on-TPU).  'pallas' /
    # 'pallas_interpret' force the fused kernel (the latter in Pallas
    # interpret mode, for CPU parity tests); 'xla' forces the XLA path.
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        # x: [B, C, W, H] (reference image layout [N,1,212,120]) -> NHWC
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        folded = x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        s2d_ok = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if self.impl in ("pallas", "pallas_interpret") and not folded:
            raise ValueError(
                f"impl={self.impl!r} requires H and W divisible by 4 "
                f"(got {x.shape[1]}x{x.shape[2]}); use impl='xla'/'auto' "
                "for non-foldable shapes")
        use_pallas = folded and self.impl in ("pallas", "pallas_interpret")
        if use_pallas:
            # one Pallas megakernel for the whole conv stack: activations
            # never leave VMEM (ops/fused_cnn.py).  Identical parameters
            # and layer math as the folded XLA path below.
            from airgym_tpu.experiments import fused_cnn
            w0, b0 = _FoldedConv0(features=16, name="conv0")(
                None, return_matrix=True)
            s0_16, t0_16 = FrozenBatchNorm(16, name="bn0")()
            w1, b1 = _CellConv1(features=32, in_features=16,
                                name="conv1")(None, return_matrix=True)
            s1, t1 = FrozenBatchNorm(32, name="bn1")()
            k2, b2 = _RawConvParams((3, 3, 32, 64), name="conv2")()
            s2, t2 = FrozenBatchNorm(64, name="bn2")()
            ws = {"w0": w0, "b0": b0,
                  "s0": jnp.tile(s0_16, (4,)), "t0": jnp.tile(t0_16, (4,)),
                  "w1": w1, "b1": b1, "s1": s1, "t1": t1,
                  "w2": k2.reshape(9 * 32, 64), "b2": b2,
                  "s2": s2, "t2": t2}
            pooled = fused_cnn.encode_pooled(
                x, ws, interpret=self.impl == "pallas_interpret")
            return nn.Dense(self.feature_dim, name="fc")(pooled)
        if folded:
            # conv0 with 2x2 output pixels packed into MXU lanes; conv1
            # consumes the folded layout directly (see _FoldedConv0 /
            # _CellConv1 — 5.5x faster stack, identical parameters)
            x = _FoldedConv0(features=16, compute_dtype=self.compute_dtype,
                             name="conv0")(x)
            x = nn.relu(x)
            b_, hc, wc, _ = x.shape
            x = FrozenBatchNorm(16, name="bn0")(
                x.reshape(b_, hc, wc, 4, 16)).reshape(b_, hc, wc, 64)
            x = _CellConv1(features=32, in_features=16,
                           compute_dtype=self.compute_dtype,
                           name="conv1")(x)
            x = nn.relu(x)
            x = FrozenBatchNorm(32, name="bn1")(x)
            x = nn.Conv(64, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=self.compute_dtype, name="conv2")(x)
            x = nn.relu(x)
            x = FrozenBatchNorm(64, name="bn2")(x)
        else:
            for i, (ch, k) in enumerate([(16, 5), (32, 3), (64, 3)]):
                if i == 0 and s2d_ok:
                    x = _SpaceToDepthConv0(
                        features=ch, compute_dtype=self.compute_dtype,
                        name="conv0")(x)
                else:
                    x = nn.Conv(ch, (k, k), strides=(2, 2),
                                padding=((k // 2, k // 2),
                                         (k // 2, k // 2)),
                                dtype=self.compute_dtype,
                                name=f"conv{i}")(x)
                x = nn.relu(x)
                x = FrozenBatchNorm(ch, name=f"bn{i}")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))   # avg pool, f32
        return nn.Dense(self.feature_dim, name="fc")(x)


class ActorCritic(nn.Module):
    """Shared-trunk actor-critic with fixed log-std.

    obs: either [B, D] array or {'image': [B,C,W,H], 'observation': [B,D]}.
    Returns (mu [B,A], sigma [B,A], value [B, 1]).

    Normalization placement matches the reference model exactly
    (a2c_continuous_logstd_model.py:142-157): the image is normalized
    per-pixel first, the encoder runs on the normalized image, and the
    running-mean-std for 'observation' covers the CONCATENATED
    [observation ++ features] vector (46-dim for the shipped planning
    checkpoint). ``obs_rms`` is passed in (an immutable pytree owned by
    the trainer) rather than being torch-style mutable buffers.
    """
    num_actions: int
    units: Sequence[int] = (64, 128, 64)
    activation: str = "elu"
    image_encoder: Optional[str] = None      # None | 'cnn' | 'vae'
    image_feature_dim: int = 30
    vae_latent_dim: int = 64
    cnn_compute_dtype: Any = jnp.bfloat16    # None -> full f32 convs
    cnn_impl: str = "auto"                   # see CNNEncoder.impl
    separate: bool = False                   # network.separate (model :38-50)
    fixed_sigma: bool = True                 # space.continuous.fixed_sigma

    def encode(self, obs, obs_rms=None):
        """-> (mlp input after normalization, pre-normalization vector).

        The pre-norm vector is what the trainer feeds back into the
        running stats (the reference updates them inside train-mode
        forwards; here stats are updated functionally once per epoch).
        """
        if isinstance(obs, dict):
            vec = obs["observation"]
            if "features" in obs:
                # precomputed encoder features (the PPO trainer encodes
                # each UNIQUE camera frame once and gathers — see
                # rl/ppo.py frame dedup); normalization placement is
                # unchanged: concat rms still runs below
                feat = obs["features"]
                prenorm = jnp.concatenate([vec, feat], axis=-1)
                x = (obs_rms["observation"].normalize(prenorm)
                     if obs_rms is not None else prenorm)
                return x, prenorm
            img = obs["image"]
            if obs_rms is not None:
                img = obs_rms["image"].normalize(img)
            if self.image_encoder == "vae":
                from airgym_tpu.models.vae import VAEEncoder
                feat = VAEEncoder(latent_dim=self.vae_latent_dim,
                                  name="actor_enc")(img)
            elif self.image_encoder == "resnet":
                from airgym_tpu.models.resnet import ResNet18Encoder
                feat = ResNet18Encoder(output_dim=self.image_feature_dim,
                                       name="actor_resnet")(img)
            else:
                feat = CNNEncoder(feature_dim=self.image_feature_dim,
                                  compute_dtype=self.cnn_compute_dtype,
                                  impl=self.cnn_impl,
                                  name="actor_cnn")(img)
            prenorm = jnp.concatenate([vec, feat], axis=-1)
            x = (obs_rms["observation"].normalize(prenorm)
                 if obs_rms is not None else prenorm)
        else:
            prenorm = obs
            x = obs_rms.normalize(obs) if obs_rms is not None else obs
        return x, prenorm

    @nn.compact
    def __call__(self, obs, obs_rms=None, return_prenorm: bool = False):
        x, prenorm = self.encode(obs, obs_rms)
        a_out = MLP(self.units, self.activation, name="actor_mlp")(x)
        if self.separate:
            # separate: True builds a twin critic trunk on the same
            # normalized input (reference model :38-50,85-100).  The
            # reference's separate+vision branch crashes on undefined
            # locals (model :89-95 `normed_a_out`) so only vector obs are
            # supported, like the reference in practice.
            if self.image_encoder is not None or isinstance(obs, dict):
                raise ValueError(
                    "separate: True with image observations is not "
                    "supported (the reference's own branch is broken, "
                    "a2c_continuous_logstd_model.py:85-95)")
            c_out = MLP(self.units, self.activation, name="critic_mlp")(x)
        else:
            c_out = a_out
        mu = nn.Dense(self.num_actions, kernel_init=scaled_init(0.1),
                      name="mu")(a_out)
        value = nn.Dense(1, kernel_init=scaled_init(0.1),
                         name="value")(c_out)
        if self.fixed_sigma:
            # global state-independent parameter, init 0 (sigma_init val 0,
            # ppo_hovering.yaml:18-20; reference model :57-59)
            logstd = self.param("logstd", nn.initializers.zeros,
                                (self.num_actions,))
            sigma = jnp.exp(logstd) * jnp.ones_like(mu)
        else:
            # fixed_sigma: False -> state-dependent linear logstd head,
            # weight zero-init (reference model :60-62; bias also zeroed
            # here so sigma starts at exactly 1 like the fixed case)
            logstd = nn.Dense(self.num_actions,
                              kernel_init=nn.initializers.zeros,
                              name="logstd_head")(a_out)
            sigma = jnp.exp(logstd)
        if return_prenorm:
            return mu, sigma, value, prenorm
        return mu, sigma, value


def neglogp(x, mu, sigma, logstd):
    """Diagonal-Gaussian negative log prob (reference model :195-198)."""
    return (0.5 * jnp.sum(jnp.square((x - mu) / sigma), axis=-1)
            + 0.5 * np.log(2.0 * np.pi) * x.shape[-1]
            + jnp.sum(logstd, axis=-1))


def entropy(logstd):
    """Gaussian entropy (up to the additive constant convention used by
    rl_games): sum(logstd) + 0.5*A*log(2*pi*e)."""
    a = logstd.shape[-1]
    return jnp.sum(logstd, axis=-1) + 0.5 * a * (1.0 + np.log(2.0 * np.pi))
