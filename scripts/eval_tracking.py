"""Deterministic Tracking eval: does the trained policy hold the full
3600-step lemniscate episode? (VERDICT r3 next #6)

Runs N envs for exactly one episode cap (3600 steps) with the
deterministic policy (action = clipped mu), then reports the episode
length distribution (per-env step of first reset; envs that never reset
held the full cap) and mean distance-to-target over the run.

    python scripts/eval_tracking.py runs/<run>/nn/last_track_long.ckpt
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

NUM_ENVS = 512
CAP = 3600          # tracking episode cap (episode_length_s=36 / dt=0.01)


def main(ckpt: str, seed: int = 7) -> int:
    enable_compilation_cache()
    task = envs.make_task("tracking", ctl_mode="rate", num_envs=NUM_ENVS)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=24))
    run = runner_mod.Runner()
    ts = run.restore(tr, tr.init(jax.random.PRNGKey(0)), ckpt)

    def boot(k):
        st = task.initial_state(k)
        return task.step(st, jnp.zeros((NUM_ENVS, task.cfg.num_actions)))

    st, out = jax.jit(boot)(jax.random.PRNGKey(seed))

    def body(carry, _):
        st, obs = carry
        mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)
        st, out = task.step(st, jnp.clip(mu, -1.0, 1.0))
        return (st, out.obs), {"reset": out.reset,
                               "timeout": out.timeout,
                               "dist": out.info["dist_norm"]}

    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=CAP))
    (_, _), rec = scan((st, out.obs))
    reset = np.asarray(rec["reset"])          # [CAP, N]
    timeout = np.asarray(rec["timeout"])
    dist = np.asarray(rec["dist"])

    # per-env first termination step (cap if none): scan index + 1 steps
    # happened inside the scan, + 1 for the zero-action boot step taken
    # before it (ADVICE r4 #4 — the env's episode counter includes the
    # boot step, so lengths now align with the 3600-step cap)
    any_reset = reset.any(axis=0)
    idx = reset.argmax(axis=0)                   # scan index of 1st reset
    first = np.minimum(np.where(any_reset, idx + 2, CAP), CAP)
    # "held" = the first episode ended by the episode-cap timeout (or the
    # scan window ended before any termination), not by a crash reset
    first_was_timeout = timeout[idx, np.arange(NUM_ENVS)]
    held = (~any_reset) | (any_reset & first_was_timeout)
    result = {
        "task": "tracking",
        "what": "deterministic eval of the 3000-epoch checkpoint: one full "
                "3600-step lemniscate episode per env (VERDICT r3 next #6)",
        "checkpoint": os.path.basename(ckpt),
        "num_envs": NUM_ENVS, "seed": seed, "cap_steps": CAP,
        "episodes_held_full_cap": int(held.sum()),
        "hold_rate": round(float(held.mean()), 4),
        "ep_length_mean": round(float(first.mean()), 1),
        "ep_length_p5": int(np.percentile(first, 5)),
        "ep_length_median": int(np.median(first)),
        "dist_norm_mean_m": round(float(dist.mean()), 4),
        "dist_norm_p95_m": round(float(np.percentile(dist, 95)), 4),
    }
    print(json.dumps(result, indent=1))
    out_path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                            "convergence", "tracking_eval.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
