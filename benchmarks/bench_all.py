#!/usr/bin/env python3
"""Throughput harness for every task + training (SURVEY.md 7 item 12 —
the reference ships no benchmarks; this is the measurement suite the
driver's headline bench.py draws from).

Usage: python benchmarks/bench_all.py [--envs N] [--steps K]
Prints a JSON line per measurement. Every measurement warms up twice
(first call compiles; the second settles weak-type promotion in the scan
carry) before timing.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import airgym_tpu.envs as envs
from airgym_tpu.rl import ppo as ppo_mod

STATE_TASKS = {"hovering": 8192, "balloon": 8192, "tracking": 8192}
VISION_TASKS = {"avoid": 512, "planning": 512, "maplanning": 32}


def bench_env(task_name: str, n: int, steps: int = 40, iters: int = 5):
    task = envs.make_task(task_name, ctl_mode="rate", num_envs=n)
    s = task.initial_state(jax.random.PRNGKey(0))
    rows = getattr(task, "flat_n", n)
    act = jnp.zeros((rows, task.cfg.num_actions))

    def body(s, _):
        s, out = task.step(s, act)
        return s, jnp.sum(out.reward)

    @jax.jit
    def chunk(s):
        s, r = jax.lax.scan(body, s, None, length=steps)
        return s, jnp.sum(r)

    for _ in range(2):                      # compile + weak-type settle
        s, r = chunk(s)
        float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, r = chunk(s)
        float(r)
    dt = time.perf_counter() - t0
    sps = rows * steps * iters / dt
    return {"bench": f"{task_name}_env_steps_per_sec", "num_envs": n,
            "value": round(sps, 1), "ms_per_step": round(
                dt / iters / steps * 1e3, 3)}


def bench_train(n: int = 4096, epochs: int = 20):
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=n)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig())
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch()
    for _ in range(2):
        ts, m = step(ts)
    jax.block_until_ready(ts.lr)
    t0 = time.perf_counter()
    for _ in range(epochs):
        ts, m = step(ts)
    jax.block_until_ready(ts.lr)
    dt = time.perf_counter() - t0
    return {"bench": "hovering_train_env_steps_per_sec", "num_envs": n,
            "value": round(n * 24 * epochs / dt, 1)}


def main():
    from airgym_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="scan-chunk length; default 2000 for state tasks"
                        " / 200 for vision — short chunks are dispatch-"
                        "RTT-bound over the axon tunnel and under-report"
                        " fast tasks by up to 3x")
    p.add_argument("--only", default=None)
    args = p.parse_args()

    sizes = {**STATE_TASKS, **VISION_TASKS}
    for name, default_n in sizes.items():
        if args.only and name != args.only:
            continue
        n = args.envs or default_n
        steps = args.steps or (200 if name in VISION_TASKS else 2000)
        try:
            print(json.dumps(bench_env(name, n, steps=steps)),
                  flush=True)
        except Exception as e:          # pragma: no cover
            print(json.dumps({"bench": name, "error": str(e)[:200]}),
                  flush=True)
    if not args.only:
        print(json.dumps(bench_train()), flush=True)


if __name__ == "__main__":
    main()
