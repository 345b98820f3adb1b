"""Running mean/std normalizers (reference: lib/core/running_mean_std.py).

Welford parallel-merge update, clamp at +-5, optional denorm mode — same
semantics as the reference's RunningMeanStd (:8-83), but as an immutable
pytree updated functionally so it can live inside the jitted train step
(the reference mutates float64 torch buffers in-place).

Precision: the reference keeps float64 buffers (running_mean_std.py:29-31)
because at production step rates ``count`` passes 2^24 within seconds and
float32 Welford increments start rounding to zero. TPUs have no f64
hardware (and jax x64 is a global switch), so instead every accumulator
carries a Neumaier compensation term: the low-order bits lost by each
float32 add are captured in a second float32 and folded into the next
increment. Drift vs a numpy float64 oracle stays at f32-representation
level out to count ~= 1e9+ (pinned by tests/test_lib_components.py), where
naive f32 stalls completely (count freezes at 2^24 and the stats stop
moving).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _comp_add(acc, acc_c, inc):
    """Neumaier compensated add: returns (acc', acc_c') with
    acc' + acc_c' ~= acc + acc_c + inc to ~2 ulp even when |inc| is far
    below ulp(acc) — the lost low bits live on in acc_c'."""
    inc = inc + acc_c
    t = acc + inc
    # (t - acc) is the part of inc that made it into t; the rest carries
    return t, inc - (t - acc)


class RunningMeanStd(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray     # scalar
    # Neumaier carries (same shapes); true value = field + field_c
    mean_c: jnp.ndarray = None
    var_c: jnp.ndarray = None
    count_c: jnp.ndarray = None

    @staticmethod
    def create(shape, dtype=jnp.float32) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.asarray(1e-4, dtype),
        )._with_carries()

    def _with_carries(self) -> "RunningMeanStd":
        """Fill any None carries with zeros so the pytree structure is
        fixed from construction (None leaves would change the treedef on
        the first update, breaking jit/donation/scan state invariants)."""
        return self._replace(
            mean_c=(jnp.zeros_like(self.mean) if self.mean_c is None
                    else self.mean_c),
            var_c=(jnp.zeros_like(self.var) if self.var_c is None
                   else self.var_c),
            count_c=(jnp.zeros_like(self.count) if self.count_c is None
                     else self.count_c),
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

        s = self._with_carries()
        mean, var, count = s.mean, s.var, s.count
        mean_c, var_c, count_c = s.mean_c, s.var_c, s.count_c

        new_count, new_count_c = _comp_add(count, count_c, b_count)
        # divisions use the compensated total (sum is exact enough at
        # these magnitudes; the compensation matters for the ADDS)
        tot = new_count + new_count_c

        delta = b_mean - mean
        new_mean, new_mean_c = _comp_add(mean, mean_c,
                                         delta * (b_count / tot))

        # var' = var*(count/tot) + [b_var*b_count + delta^2*count*b_count
        #        /tot]/tot: the rescale is a (relative-error) multiply, so
        # the carry rescales with it; the lossy ADD gets compensated
        r = count / tot
        addend = (b_var * b_count
                  + jnp.square(delta) * count * (b_count / tot)) / tot
        new_var, new_var_c = _comp_add(var * r, var_c * r, addend)

        return RunningMeanStd(new_mean, new_var, new_count,
                              new_mean_c, new_var_c, new_count_c)

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -5.0, 5.0)

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
