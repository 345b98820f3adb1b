#!/usr/bin/env python3
"""Install smoke test (reference airgym/scripts/example.py:11-31):
constant-action rollout of 1000 steps on a handful of envs."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import airgym_tpu.envs as envs


def main():
    from airgym_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="hovering")
    p.add_argument("--ctl_mode", default="pos")
    p.add_argument("--num_envs", type=int, default=4)
    p.add_argument("--steps", type=int, default=1000)
    args = p.parse_args()

    env = envs.make_env(args.task, ctl_mode=args.ctl_mode,
                        num_envs=args.num_envs)
    obs, priv = env.reset()
    n_rows = obs["observation"].shape[0] if isinstance(obs, dict) \
        else obs.shape[0]
    actions = jnp.zeros((n_rows, env.num_actions))
    t0 = time.time()
    total_r = 0.0
    for i in range(args.steps):
        obs, priv, rew, reset, extras = env.step(actions)
        total_r += float(rew.sum())
    dt = time.time() - t0
    print(f"{args.steps} steps x {args.num_envs} envs in {dt:.2f}s "
          f"({args.steps * args.num_envs / dt:.0f} steps/s), "
          f"sum reward {total_r:.1f}")


if __name__ == "__main__":
    main()
