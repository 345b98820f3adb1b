"""PPO loss library (reference: lib/core/common_losses.py).

The jitted trainer (rl/ppo.py) inlines its own loss for fusion; these
standalone functions cover the reference's full loss surface, including
the variants the shipped configs can switch on (use_smooth_clamp) and the
unused-but-present decoupled loss. All are elementwise jnp and jit-safe.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def smooth_clamp(x, mi, mx):
    """Sigmoid-smoothed clamp (common_losses.py:22-23).

    Exact reference formula: 1/(1+exp((-(x-mi)/(mx-mi)+0.5)*4))*(mx-mi)+mi
    — the sigmoid is centered at the interval midpoint (the +0.5 term),
    so smooth_clamp((mi+mx)/2) == (mi+mx)/2.
    """
    t = (-(x - mi) / (mx - mi) + 0.5) * 4.0
    return 1.0 / (1.0 + jnp.exp(t)) * (mx - mi) + mi


def actor_loss(old_neglogp, neglogp, advantage, is_ppo: bool, e_clip):
    """Clipped PPO surrogate (common_losses.py:39-48)."""
    if not is_ppo:
        return neglogp * advantage
    ratio = jnp.exp(old_neglogp - neglogp)
    surr1 = advantage * ratio
    surr2 = advantage * jnp.clip(ratio, 1.0 - e_clip, 1.0 + e_clip)
    return jnp.maximum(-surr1, -surr2)


def smoothed_actor_loss(old_neglogp, neglogp, advantage, is_ppo: bool,
                        e_clip):
    """PPO surrogate with the smooth clamp (common_losses.py:26-36,
    enabled by use_smooth_clamp in config — a2c_base.py:270-274)."""
    if not is_ppo:
        return neglogp * advantage
    ratio = jnp.exp(old_neglogp - neglogp)
    surr1 = advantage * ratio
    surr2 = advantage * smooth_clamp(ratio, 1.0 - e_clip, 1.0 + e_clip)
    return jnp.maximum(-surr1, -surr2)


def default_critic_loss(value_preds, values, e_clip, returns,
                        clip_value: bool):
    """(common_losses.py:10-20)."""
    if clip_value:
        value_pred_clipped = value_preds + jnp.clip(
            values - value_preds, -e_clip, e_clip)
        value_losses = jnp.square(values - returns)
        value_losses_clipped = jnp.square(value_pred_clipped - returns)
        return jnp.maximum(value_losses, value_losses_clipped)
    return jnp.square(returns - values)


def critic_loss(value_preds, values, e_clip, returns, clip_value: bool):
    return default_critic_loss(value_preds, values, e_clip, returns,
                               clip_value)


def decoupled_actor_loss(behavior_neglogp, neglogp, proxy_neglogp,
                         advantage, e_clip):
    """Decoupled/behavior-proxy PPO loss (common_losses.py:51-59; present
    but unused by the shipped configs)."""
    logratio = proxy_neglogp - neglogp
    pg1 = -advantage * jnp.exp(behavior_neglogp - neglogp)
    clipped = jnp.clip(logratio, math.log(1.0 - e_clip),
                       math.log(1.0 + e_clip))
    pg2 = -advantage * jnp.exp(clipped - proxy_neglogp + behavior_neglogp)
    return jnp.maximum(pg1, pg2)


def bound_loss(mu, soft_bound: float = 1.1):
    """Soft action-bound penalty (a2c_continuous.py:382-390)."""
    high = jnp.square(jnp.maximum(mu - soft_bound, 0.0))
    low = jnp.square(jnp.minimum(mu + soft_bound, 0.0))
    return jnp.sum(high + low, axis=-1)


def policy_kl(mu0, sigma0, mu1, sigma1, reduce: bool = True):
    """Diagonal-Gaussian KL (lib/core/torch_ext.py:27-36)."""
    c = (jnp.log(sigma1 / sigma0 + 1e-7)
         + (jnp.square(sigma0) + jnp.square(mu1 - mu0))
         / (2.0 * jnp.square(sigma1) + 1e-7) - 0.5)
    kl = jnp.sum(c, axis=-1)
    return jnp.mean(kl) if reduce else kl


def explained_variance(y_pred, y_true):
    """(lib/core/torch_ext.py:149-166)."""
    var_y = jnp.var(y_true)
    return 1.0 - jnp.var(y_true - y_pred) / (var_y + 1e-8)


def policy_clip_fraction(new_neglogp, old_neglogp, e_clip):
    """(lib/core/torch_ext.py:168-178)."""
    ratio = jnp.exp(old_neglogp - new_neglogp)
    return jnp.mean((jnp.abs(ratio - 1.0) > e_clip).astype(jnp.float32))
