"""Extend a MAPlanning curriculum stage (VERDICT r3 next #3, stage v5+).

The four-stage start-distance curriculum (scripts/curriculum_maplanning.py)
reaches the full reference start (start_x = -8.5, goal ball at +8.5 —
reference maplanning.py:554-579) with per-robot success still climbing
(0.004 -> 0.012 over the last 20M frames of stage v4).  This script
warm-starts from any stage checkpoint and keeps training at a fixed
start_x so the success curve can finish rising.

Usage:
    python scripts/extend_maplanning.py <ckpt> --tag v5 --max-epochs 4500
    python scripts/extend_maplanning.py --smoke       # tiny CPU check
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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--tag", default="v5")
    p.add_argument("--start-x", type=float, default=-8.5)
    p.add_argument("--max-epochs", type=int, default=4500,
                   help="CUMULATIVE epoch target (the counter resumes "
                        "from the checkpoint)")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--smoke", action="store_true")
    a = p.parse_args()

    enable_compilation_cache()
    base = yaml.safe_load(open(os.path.join(
        REPO, "airgym_tpu", "configs", "ppo_maplanning.yaml")))
    params = copy.deepcopy(base["params"])
    cfg = params["config"]
    cfg["name"] = f"maplan_{a.tag}"
    cfg["max_epochs"] = a.max_epochs
    cfg["env_config"] = {"use_image": True, "start_x": a.start_x}
    cfg["num_actors"] = 1024       # envs; x4 robots = 4096 flat actors
    cfg["save_frequency"] = 500
    if a.smoke:
        cfg["num_actors"] = 4
        cfg["minibatch_size"] = 96
        cfg["max_epochs"] = 2
        cfg["env_config"].update(cam_width=24, cam_height=20)

    run = runner_mod.Runner()
    run.load({"params": params})
    args = {"train": True, "ctl_mode": "rate", "seed": a.seed,
            "run_root": os.path.join(REPO, "runs")}
    if a.checkpoint:
        args["checkpoint"] = a.checkpoint
    t0 = time.time()
    _, summary = run.run_train(args)
    summary["stage"] = a.tag
    summary["start_x"] = a.start_x
    summary["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(summary, default=str), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
