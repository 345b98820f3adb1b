"""MAPlanning ROBOT-COUNT curriculum (VERDICT r4 next #1).

The start-distance curriculum (scripts/curriculum_maplanning.py) plateaued
at env-level success 0.09: with 4 robots under the reference's any-robot
env reset (maplanning.py:571-584), per-robot episodes are truncated by
other robots' deaths ~3/4 of the time, so the +200 goal bonus is rarely
credited to the robot that earned progress toward it.  This curriculum
attacks the plateau on the robot axis instead:

  R=1 -> R=2 -> R=4, all at the FULL reference start (-8.5, goal +8.5),
  constant 4096 flat actors (4096x1, 2048x2, 1024x4 envs x robots).

R=1 is exactly the multi-agent task without interference — goal-reach
skill transfers because the obs carry no robot count: the 2R per-robot
relative channels are zeroed by the reference (maplanning.py:505-514), so
checkpoint.transfer_obs_width moves a policy across widths EXACTLY (padded
first-layer rows only ever see zeros).  Stage 0 warm-starts from the
start-distance curriculum's final checkpoint (sliced 24 -> 18 the same
way).  Each later stage warm-starts from the previous stage's best
env-level-success checkpoint (runner gates _best_success.ckpt on
env_success_rate for has_env_success tasks).

Usage:
    python scripts/curriculum_ma_robots.py [--source <ckpt>] [--smoke]
"""
import argparse
import copy
import json
import os
import sys
import time

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from airgym_tpu.rl import runner as runner_mod              # noqa: E402
from airgym_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))

# (tag, num_robots, num_envs, start_x, max_epochs) — epoch counter
# restarts at 0 each stage (transfer_obs_width resets it).
#
# Why a start ladder INSIDE R=1: the v4-warm-started policy cruises at
# exactly 1.0 m/s (the speed-reward optimum, maplanning.py:555) and times
# out at 1600 steps having covered ~16 of the 17.35 m corridor —
# reach_goal_reward mean is exactly 0, so at full distance there is no
# gradient toward the +200 bonus. Starting closer makes reach happen
# within the cap; gamma=0.99 discounting then rewards reaching FASTER
# (0.99^800 << 0.99^400), which is what teaches overspeeding past the
# 1 m/s speed-reward optimum (Planning learned ~1.6 m/s this way,
# planning_eval.json ep len ~1080).
STAGES = [
    ("r1a", 1, 4096, 0.5, 400),
    ("r1b", 1, 4096, -4.5, 500),
    # ratchet the last 4 m in short stages: each stage improves reach for
    # ~200-300 epochs before the loiter drift sets in (observed r1a/r1b:
    # env success rises, peaks, then collapses while reward keeps
    # climbing — the reference reward's per-step income ~2.2/step over
    # the gamma=0.99 horizon slightly outweighs the +200 reach bonus in
    # a treeless corridor, so sustained-training converges to loitering;
    # Planning escapes only because tree deaths tax loitering). Short
    # stages + the env-gated best_success checkpoint carry the PEAK
    # policy forward instead of the collapsed endpoint.
    ("r1c", 1, 4096, -5.5, 250),
    ("r1d", 1, 4096, -6.5, 250),
    ("r1e", 1, 4096, -7.5, 250),
    ("r1f", 1, 4096, None, 350),
    ("r2", 2, 2048, None, 450),
    ("r4", 4, 1024, None, 700),
]

DEFAULT_SOURCE = os.path.join(
    REPO, "runs", "maplan_v4_20-07-58-54", "nn", "last_maplan_v4.ckpt")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--source", default=DEFAULT_SOURCE,
                   help="start-distance-curriculum checkpoint to slice "
                        "into stage r1 (R=4 obs width 24)")
    p.add_argument("--source-robots", type=int, default=4)
    p.add_argument("--start-stage", default=None,
                   help="skip stages before this tag (resume a partial "
                        "curriculum; --source then points at the last "
                        "completed stage's checkpoint)")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--smoke", action="store_true")
    a = p.parse_args()

    enable_compilation_cache()
    base = yaml.safe_load(open(os.path.join(
        REPO, "airgym_tpu", "configs", "ppo_maplanning.yaml")))

    # smoke shrinks the cameras, so the full-res source checkpoint's image
    # stats would not fit — smoke drives the stage-to-stage plumbing only
    prev_ckpt = (a.source if os.path.exists(a.source) and not a.smoke
                 else None)
    prev_robots = a.source_robots
    results = []
    stages = list(STAGES)
    if a.start_stage:
        tags = [s[0] for s in stages]
        stages = stages[tags.index(a.start_stage):]
    for i, (tag, robots, envs_n, start_x, max_epochs) in enumerate(stages):
        params = copy.deepcopy(base["params"])
        cfg = params["config"]
        cfg["name"] = f"maplan_{tag}"
        cfg["max_epochs"] = max_epochs
        cfg["env_config"] = {"use_image": True, "num_robots": robots}
        if start_x is not None:
            cfg["env_config"]["start_x"] = start_x
        cfg["num_actors"] = envs_n
        cfg["save_frequency"] = 500
        if a.smoke:
            cfg["num_actors"] = max(8 // robots, 2)   # 8 flat actors
            cfg["minibatch_size"] = 96
            cfg["max_epochs"] = 2
            cfg["save_best_after"] = 1
            cfg["env_config"].update(cam_width=24, cam_height=20)

        run = runner_mod.Runner()
        run.load({"params": params})
        args = {"train": True, "ctl_mode": "rate", "seed": a.seed,
                "run_root": os.path.join(REPO, "runs")}
        if prev_ckpt:
            args["transfer_checkpoint"] = prev_ckpt
            args["transfer_old_obs_dim"] = 16 + 2 * prev_robots
        t0 = time.time()
        _, summary = run.run_train(args)
        summary["stage"] = tag
        summary["num_robots"] = robots
        summary["start_x"] = start_x
        summary["wall_s"] = round(time.time() - t0, 1)
        results.append(summary)
        print(f"[stage {tag}] R={robots} -> {summary}", flush=True)

        nn = os.path.join(summary["run_dir"], "nn")
        best = os.path.join(nn, f"maplan_{tag}_best_success.ckpt")
        last = os.path.join(nn, f"last_maplan_{tag}.ckpt")
        prev_ckpt = best if os.path.exists(best) else last
        prev_robots = robots
        if not os.path.exists(prev_ckpt):
            raise RuntimeError(f"stage checkpoint missing: {prev_ckpt}")
        summary["carried_checkpoint"] = prev_ckpt

        out = os.path.join(REPO, "runs", "maplan_robots_summary.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1, default=str)
    print(f"robot-count curriculum done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
