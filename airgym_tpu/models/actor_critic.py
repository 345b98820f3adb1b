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


class CNNEncoder(nn.Module):
    """Depth-image feature extractor (reference lib/network/cnn.py:3-34):
    three conv(3x3, stride 2)+norm blocks -> global average pool -> fc.

    BatchNorm in the reference; GroupNorm here — identical capacity,
    batch-independent, and far friendlier to jit/vmap/sharding (no mutable
    batch statistics threading through the rollout scan).
    """
    feature_dim: int = 30

    @nn.compact
    def __call__(self, x):
        # x: [B, C, W, H] (reference image layout [N,1,212,120]) -> NHWC
        x = jnp.transpose(x, (0, 2, 3, 1))
        for ch in (32, 64, 128):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=8)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))          # adaptive avg pool to 1x1
        return nn.Dense(self.feature_dim)(x)


class ActorCritic(nn.Module):
    """Shared-trunk actor-critic with fixed log-std.

    obs: either [B, D] array or {'image': [B,C,W,H], 'observation': [B,D]}.
    Returns (mu [B,A], sigma [B,A], value [B, 1]).
    """
    num_actions: int
    units: Sequence[int] = (64, 128, 64)
    activation: str = "elu"
    image_encoder: Optional[str] = None      # None | 'cnn' | 'vae'
    image_feature_dim: int = 30
    vae_latent_dim: int = 64

    @nn.compact
    def __call__(self, obs):
        if isinstance(obs, dict):
            img = obs["image"]
            vec = obs["observation"]
            if self.image_encoder == "vae":
                from airgym_tpu.models.vae import VAEEncoder
                feat = VAEEncoder(latent_dim=self.vae_latent_dim,
                                  deterministic=True)(img)
            else:
                feat = CNNEncoder(feature_dim=self.image_feature_dim)(img)
            x = jnp.concatenate([feat, vec], axis=-1)
        else:
            x = obs
        x = MLP(self.units, self.activation)(x)
        mu = nn.Dense(self.num_actions, kernel_init=scaled_init(0.1),
                      name="mu")(x)
        value = nn.Dense(1, kernel_init=scaled_init(0.1), name="value")(x)
        # fixed_sigma: global parameter, init 0 (sigma_init val 0,
        # ppo_hovering.yaml:18-20; reference model :57-59)
        logstd = self.param("logstd", nn.initializers.zeros,
                            (self.num_actions,))
        sigma = jnp.exp(logstd) * jnp.ones_like(mu)
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
