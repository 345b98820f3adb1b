"""Benchmark: Hovering env throughput at 8192 envs (BASELINE.json metric).

Measures raw env-steps/sec of the fully-jitted Hovering step (controller
cascade + 6-DoF physics + obs/reward/termination/reset) chained with
``lax.scan`` so per-call dispatch overhead amortizes — this is exactly how
the PPO rollout consumes the env.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": x}
vs_baseline is against the 10M steps/s target from BASELINE.json
(the reference itself publishes no numbers; its implicit bar is a single
RTX 4090 bottlenecked by a per-step CPU controller round-trip).
"""
import json
import time

import jax
import jax.numpy as jnp

import airgym_tpu.envs as envs

NUM_ENVS = 8192
STEPS_PER_CALL = 200
CALLS = 5
TARGET = 10_000_000.0  # env steps/s (BASELINE.json, v5e-8)


def main():
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=NUM_ENVS)
    state = task.initial_state(jax.random.PRNGKey(0))
    actions = jnp.tile(
        jnp.array([0.0, 0.0, 0.0, -0.7], jnp.float32), (NUM_ENVS, 1))

    def body(s, _):
        s, out = task.step(s, actions)
        return s, out.reward

    @jax.jit
    def run_chunk(s):
        s, rews = jax.lax.scan(body, s, None, length=STEPS_PER_CALL)
        return s, jnp.sum(rews)

    # warmup/compile
    state, _ = run_chunk(state)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    total = 0.0
    for _ in range(CALLS):
        state, r = run_chunk(state)
        total += float(r)  # forces sync each call
    dt = time.perf_counter() - t0

    steps = NUM_ENVS * STEPS_PER_CALL * CALLS
    sps = steps / dt
    print(json.dumps({
        "metric": "hovering_env_steps_per_sec_8192envs",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
