"""Microbenchmark: CNN encoder fwd+bwd at minibatch scale, XLA vs fused
Pallas stack (ops/fused_cnn.py). TPU-only; run exclusively (axon tunnel
allows one TPU process at a time)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from airgym_tpu.models.actor_critic import CNNEncoder
from airgym_tpu.utils.compile_cache import enable_compilation_cache


def _sync(r):
    """Force completion with a host fetch (block_until_ready does not
    reliably wait for remote execution over the axon tunnel)."""
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def bench(impl: str, batch: int, iters: int = 30) -> dict:
    enc = CNNEncoder(feature_dim=30, compute_dtype=jnp.bfloat16, impl=impl)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (batch, 1, 212, 120), jnp.float32)
    params = enc.init(jax.random.PRNGKey(1), img[:2])
    probe = jax.random.normal(jax.random.PRNGKey(2), (batch, 30))

    @jax.jit
    def fwdbwd(p, im):
        def loss(q):
            return jnp.sum(enc.apply(q, im) * probe)
        return jax.grad(loss)(p)

    @jax.jit
    def fwd(p, im):
        return enc.apply(p, im)

    out = {}
    for name, fn in (("fwd", fwd), ("fwdbwd", fwdbwd)):
        _sync(fn(params, img))
        _sync(fn(params, img))  # two warmups: weak-type settle
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(params, img)
        _sync(r)
        dt = (time.perf_counter() - t0) / iters
        out[name] = dt * 1e3
        print(f"{impl:18s} {name:6s} B={batch}: {dt*1e3:8.3f} ms")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--impl", default="both")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    impls = (["xla", "pallas"] if args.impl == "both" else [args.impl])
    for impl in impls:
        bench(impl, args.batch)
