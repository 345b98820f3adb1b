#!/usr/bin/env python3
"""Multi-agent smoke test (reference airgym/scripts/ma_example.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import airgym_tpu.envs as envs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctl_mode", default="rate")
    p.add_argument("--num_envs", type=int, default=2)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()

    env = envs.make_env("maplanning", ctl_mode=args.ctl_mode,
                        num_envs=args.num_envs)
    task = env.task
    actions = jnp.zeros((task.flat_n, env.num_actions))
    obs, priv = env.reset()
    for i in range(args.steps):
        obs, priv, rew, reset, extras = env.step(actions)
    print(f"ok: {args.steps} steps, {task.cfg.num_robots} robots x "
          f"{args.num_envs} envs, last mean reward {float(rew.mean()):.3f}")


if __name__ == "__main__":
    main()
