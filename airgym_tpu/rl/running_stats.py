"""Running mean/std normalizers (reference: lib/core/running_mean_std.py).

Welford parallel-merge update, clamp at +-5, optional denorm mode — same
semantics as the reference's RunningMeanStd (:8-83), but as an immutable
pytree updated functionally so it can live inside the jitted train step
(the reference mutates float64 torch buffers in-place).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray     # scalar

    @staticmethod
    def create(shape, dtype=jnp.float32) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.asarray(1e-4, dtype),
        )

    def update(self, batch: jnp.ndarray) -> "RunningMeanStd":
        """Merge batch statistics (batch axis = all leading axes)."""
        reduce_axes = tuple(range(batch.ndim - self.mean.ndim))
        # reduce in the stats dtype (f32): bf16-stored image batches would
        # otherwise accumulate in bf16; the convert fuses into the reduce
        b_mean = jnp.mean(batch, axis=reduce_axes, dtype=self.mean.dtype)
        b_var = jnp.var(batch.astype(self.mean.dtype), axis=reduce_axes)
        b_count = jnp.asarray(
            batch.size / max(self.mean.size, 1), self.count.dtype)

        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * b_count / tot
        return RunningMeanStd(new_mean, m2 / tot, tot)

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -5.0, 5.0)

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
