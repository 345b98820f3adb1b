"""MAPlanning start-distance curriculum driver (VERDICT r3 next #3).

Applies the recipe that got Planning to goal-reach (BENCHMARKS.md:204) to
the multi-agent task: train at 1024 envs x 4 robots = 4096 flat actors
(the scale where the Planning curriculum converges), starting all robots
close to the shared goal ball and warm-starting each longer stage from
the previous stage's final checkpoint.  The obs carry no absolute
position (maplanning.py obs block), so the policy transfers across
stages; the +200 goal bonus (reference maplanning.py:554-579) is
reachable from epoch one in stage 1 instead of being ~1700 exploration
steps away.

Stages (start_x, cumulative max_epochs) mirror the Planning run:
    4.5 -> 0.5 -> -4.5 -> full -8.5 (reference start, goal at +8.5).

Usage:
    python scripts/curriculum_maplanning.py            # full chip run
    python scripts/curriculum_maplanning.py --smoke    # tiny CPU check
"""
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

STAGES = [
    # (tag, start_x, cumulative max_epochs)
    ("v1", 4.5, 350),
    ("v2", 0.5, 700),
    ("v3", -4.5, 1100),
    ("v4", -8.5, 1800),
]


def main(smoke: bool) -> int:
    enable_compilation_cache()
    base = yaml.safe_load(open(os.path.join(
        REPO, "airgym_tpu", "configs", "ppo_maplanning.yaml")))

    prev_ckpt = None
    results = []
    for i, (tag, start_x, max_epochs) in enumerate(STAGES):
        params = copy.deepcopy(base["params"])
        cfg = params["config"]
        cfg["name"] = f"maplan_{tag}"
        cfg["max_epochs"] = max_epochs
        cfg["env_config"] = {"use_image": True, "start_x": start_x}
        # 1024 envs x 4 robots = 4096 flat vision actors (Planning's
        # converging scale); YAML num_actors is ENVS like the reference.
        cfg["num_actors"] = 1024
        if smoke:
            cfg["num_actors"] = 4
            cfg["minibatch_size"] = 96
            cfg["max_epochs"] = 2 * (i + 1)
            cfg["save_best_after"] = 1
            cfg["env_config"].update(cam_width=24, cam_height=20)

        run = runner_mod.Runner()
        run.load({"params": params})
        args = {"train": True, "ctl_mode": "rate", "seed": 11,
                "run_root": os.path.join(REPO, "runs")}
        if prev_ckpt:
            args["checkpoint"] = prev_ckpt
        t0 = time.time()
        _, summary = run.run_train(args)
        summary["stage"] = tag
        summary["start_x"] = start_x
        summary["wall_s"] = round(time.time() - t0, 1)
        results.append(summary)
        prev_ckpt = os.path.join(
            summary["run_dir"], "nn", f"last_maplan_{tag}.ckpt")
        print(f"[stage {tag}] start_x={start_x} -> {summary}", flush=True)
        if not os.path.exists(prev_ckpt):
            raise RuntimeError(f"stage checkpoint missing: {prev_ckpt}")

    out = os.path.join(REPO, "runs", "maplan_curriculum_summary.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"curriculum done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main("--smoke" in sys.argv))
