"""Kernel-safe transcendentals for Pallas TPU.

Mosaic (KernelType.TC) does not lower atan / atan2 / asin / acos; these
are polynomial implementations built only from ops that do lower
(mul/add, sqrt, select, abs). Accuracy ~1e-6 absolute on f32 — verified
against numpy inside a Pallas kernel by the test suite. They also work
outside kernels (plain jnp), so code can share one math path.

atan core: 11th-order odd minimax polynomial on [-1, 1] with the
classic |x| > 1 range reduction atan(x) = sign(x)*pi/2 - atan(1/x).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PI = float(np.pi)
_HALF_PI = float(np.pi / 2)

# minimax coefficients for atan on [-1, 1] (Abramowitz–Stegun 4.4.49 family)
_C1 = 0.99997726
_C3 = -0.33262347
_C5 = 0.19354346
_C7 = -0.11643287
_C9 = 0.05265332
_C11 = -0.01172120


def atan(x):
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    z2 = z * z
    p = z * (_C1 + z2 * (_C3 + z2 * (_C5 + z2 * (_C7 + z2 * (
        _C9 + z2 * _C11)))))
    r = jnp.where(inv, _HALF_PI - p, p)
    return jnp.sign(x) * r


def atan2(y, x):
    """Quadrant-correct atan2 via the atan polynomial."""
    safe_x = jnp.where(jnp.abs(x) < 1e-30, 1e-30, x)
    base = atan(y / safe_x)
    # x < 0: shift by +-pi depending on the sign of y (sign(0) -> +pi,
    # matching numpy's atan2(0, -1) = pi)
    shift = jnp.where(y < 0.0, -_PI, _PI)
    r = jnp.where(x < 0.0, base + shift, base)
    # x == 0 exactly: +-pi/2
    r = jnp.where(jnp.abs(x) < 1e-30,
                  jnp.where(y >= 0.0, _HALF_PI, -_HALF_PI), r)
    return r


def asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    return atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def acos(x):
    x = jnp.clip(x, -1.0, 1.0)
    return atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)
