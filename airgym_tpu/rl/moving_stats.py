"""Exponential/percentile moving statistics (reference:
lib/core/moving_mean_std.py GeneralizedMovingStats, used for the
rms-advantage option, a2c_base.py:277-279).

Functional pytree state + pure update, same three implementations:
EMA mean/std, min-max, and percentile-based scaling."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MovingStats(NamedTuple):
    center: jnp.ndarray
    scale: jnp.ndarray
    initialized: jnp.ndarray     # scalar bool as float

    @staticmethod
    def create(shape=(), dtype=jnp.float32) -> "MovingStats":
        return MovingStats(jnp.zeros(shape, dtype), jnp.ones(shape, dtype),
                           jnp.asarray(0.0, dtype))


def update_mean_std(ms: MovingStats, x, decay: float = 0.99):
    """EMA of mean and std (impl='mean_std')."""
    axes = tuple(range(x.ndim - ms.center.ndim))
    b_mean = jnp.mean(x, axis=axes)
    b_std = jnp.std(x, axis=axes)
    d = jnp.where(ms.initialized > 0, decay, 0.0)
    return MovingStats(
        center=d * ms.center + (1 - d) * b_mean,
        scale=d * ms.scale + (1 - d) * b_std,
        initialized=jnp.ones_like(ms.initialized))


def update_min_max(ms: MovingStats, x, decay: float = 0.99):
    """EMA of min/max -> center=(min+max)/2, scale=(max-min)/2."""
    axes = tuple(range(x.ndim - ms.center.ndim))
    b_min = jnp.min(x, axis=axes)
    b_max = jnp.max(x, axis=axes)
    d = jnp.where(ms.initialized > 0, decay, 0.0)
    lo = d * (ms.center - ms.scale) + (1 - d) * b_min
    hi = d * (ms.center + ms.scale) + (1 - d) * b_max
    return MovingStats(center=(lo + hi) / 2, scale=(hi - lo) / 2,
                       initialized=jnp.ones_like(ms.initialized))


def update_percentile(ms: MovingStats, x, decay: float = 0.99,
                      lo_q: float = 5.0, hi_q: float = 95.0):
    """EMA of percentile band."""
    flat = x.reshape(-1, *ms.center.shape) if ms.center.ndim else x.ravel()
    b_lo = jnp.percentile(flat, lo_q, axis=0)
    b_hi = jnp.percentile(flat, hi_q, axis=0)
    d = jnp.where(ms.initialized > 0, decay, 0.0)
    lo = d * (ms.center - ms.scale) + (1 - d) * b_lo
    hi = d * (ms.center + ms.scale) + (1 - d) * b_hi
    return MovingStats(center=(lo + hi) / 2, scale=(hi - lo) / 2,
                       initialized=jnp.ones_like(ms.initialized))


def normalize(ms: MovingStats, x, eps: float = 1e-5):
    return (x - ms.center) / (ms.scale + eps)


def denormalize(ms: MovingStats, y, eps: float = 1e-5):
    return y * (ms.scale + eps) + ms.center
