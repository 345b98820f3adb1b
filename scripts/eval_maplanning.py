"""Deterministic MAPlanning eval: goal-reach with statistical teeth
(VERDICT r3 next #3).

The reference resets the WHOLE env when ANY robot reaches the goal ball
or dies (maplanning.py:581-584: reset_env = any(reset_robot)), so the
per-robot success rate is structurally capped near 1/num_robots — when
the first robot touches the ball the other three episodes end unfinished.
Task achievement is therefore reported at BOTH granularities:

  - env_success_rate:   env episodes where >= 1 robot reached the goal
                        (the task's actual win condition);
  - robot_success_rate: flat per-robot episodes ending in goal contact
                        (the trainer's metric, ceiling ~ 1/R).

    python scripts/eval_maplanning.py runs/<run>/nn/<ckpt>.ckpt [--smoke]
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import airgym_tpu.envs as envs                      # noqa: E402
from airgym_tpu.rl import ppo as ppo_mod            # noqa: E402
from airgym_tpu.rl import runner as runner_mod      # noqa: E402
from airgym_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402


def main(ckpt: str, smoke: bool = False, seed: int = 7,
         start_x=None, num_robots: int = 4, out_path=None,
         scans: int = 4) -> int:
    enable_compilation_cache()
    num_envs = 4 if smoke else 256
    cap = 1600                       # episode_length_s 16 / dt 0.01
    episodes = 1 if smoke else scans  # episode caps to scan through
    kw = dict(cam_width=24, cam_height=20) if smoke else {}
    if start_x is not None:
        kw["start_x"] = float(start_x)
    kw["num_robots"] = num_robots
    task = envs.make_task("maplanning", ctl_mode="rate",
                          num_envs=num_envs, **kw)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=24),
                     network_kw={"image_encoder": "cnn",
                                 "image_feature_dim": 30})
    run = runner_mod.Runner()
    ts = tr.init(jax.random.PRNGKey(0))
    if not smoke:
        # smoke shrinks the camera, so a real (full-res) checkpoint's
        # obs_rms would not fit — smoke drives the plumbing untrained
        ts = run.restore(tr, ts, ckpt)

    n = task.flat_n

    def boot(k):
        st = task.initial_state(k)
        return task.step(st, jnp.zeros((n, task.cfg.num_actions)))

    st, out = jax.jit(boot)(jax.random.PRNGKey(seed))

    def body(carry, _):
        st, obs = carry
        mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)
        st, out = task.step(st, jnp.clip(mu, -1.0, 1.0))
        return (st, out.obs), {"reset": out.reset,
                               "timeout": out.timeout,
                               "success": out.info["success"] & out.reset,
                               "reward": out.reward}

    steps = 100 if smoke else cap
    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=steps))
    carry = (st, out.obs)
    recs = []
    for _ in range(episodes):
        carry, rec = scan(carry)
        recs.append(jax.tree.map(np.asarray, rec))
    rec = {k: np.concatenate([r[k] for r in recs], 0) for k in recs[0]}

    r = task.cfg.num_robots
    # out.reset carries the reference's per-robot event flags (only the
    # triggering robot fires, maplanning.py:575-580); episode-cap endings
    # arrive via out.timeout (env-level, repeated across robots). An env
    # episode ends on either.
    reset = rec["reset"].reshape(-1, num_envs, r)       # [T, E, R]
    timeout = rec["timeout"].reshape(-1, num_envs, r).any(-1)
    succ = rec["success"].reshape(-1, num_envs, r)
    env_end = reset.any(-1) | timeout                   # [T, E]
    env_succ = succ.any(-1)                             # any robot reached
    env_games = int(env_end.sum())
    # every env ending terminates all R robot episodes (the non-triggering
    # robots' flags never fire — reference contract)
    robot_games = env_games * r
    out = {
        "task": "maplanning",
        "checkpoint": os.path.basename(ckpt),
        "start_x": start_x,
        "num_envs": num_envs,
        "num_robots": r,
        "seed": seed,
        "steps": int(rec["reset"].shape[0]),
        "env_games": env_games,
        "env_success_rate": round(float(env_succ.sum()) / max(1, env_games), 4),
        "robot_games": robot_games,
        "robot_success_rate": round(float(succ.sum()) / max(1, robot_games), 4),
        "mean_env_ep_reward": round(
            float(rec["reward"].sum()) / max(1, robot_games), 2),
        "note": "env_success = any robot reached the goal before the "
                "any-robot env reset (reference maplanning.py:581-584); "
                "robot_success ceiling ~ 1/num_robots by construction",
    }
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--start-x", type=float, default=None,
                   help="curriculum start distance; omit = reference -8.5")
    p.add_argument("--robots", type=int, default=4)
    p.add_argument("--scans", type=int, default=4)
    p.add_argument("--out", default=None)
    a = p.parse_args()
    main(a.checkpoint, smoke=a.smoke, seed=a.seed, start_x=a.start_x,
         num_robots=a.robots, out_path=a.out, scans=a.scans)
