"""Avoid convergence refresh with the survive-the-throw success curve
(VERDICT r3 missing #4).

Round 3's avoid artifact (reward 354 @ 78.6M frames) predates the
success metric; Avoid's task achievement is surviving the thrown cube to
episode timeout (collision resets — reference avoid.py:259 +
avoid_config.py:19 reset_on_collision, so reaching max_episode_length
IS the win).  envs/avoid.py now emits info["success"] = timeout; this
run re-trains at full reference scale (4096 x 64) long enough for the
success curve to flatten and distills it into
benchmarks/convergence/avoid.json via summarize_runs.

Usage:
    python scripts/longrun_avoid.py            # chip run
    python scripts/longrun_avoid.py --smoke    # tiny CPU check
"""
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


def main(smoke: bool) -> int:
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="resume (epoch counter continues; pair with a "
                        "larger --max-epochs to extend a finished run — "
                        "VERDICT r4 next #4: the 400-epoch run ended "
                        "with survive-rate still rising)")
    p.add_argument("--max-epochs", type=int, default=400,
                   help="CUMULATIVE epoch target")
    a = p.parse_args()
    smoke = a.smoke

    enable_compilation_cache()
    base = yaml.safe_load(open(os.path.join(
        REPO, "airgym_tpu", "configs", "ppo_avoid.yaml")))
    params = base["params"]
    cfg = params["config"]
    cfg["name"] = "avoid_long"
    cfg["max_epochs"] = a.max_epochs
    cfg["save_frequency"] = 100
    if smoke:
        cfg["num_actors"] = 8
        cfg["minibatch_size"] = 64
        cfg["max_epochs"] = 2
        cfg["env_config"] = dict(cfg.get("env_config") or {},
                                 cam_width=24, cam_height=20)

    run = runner_mod.Runner()
    run.load({"params": params})
    t0 = time.time()
    args = {"train": True, "ctl_mode": "rate", "seed": 5,
            "run_root": os.path.join(REPO, "runs")}
    if a.checkpoint:
        args["checkpoint"] = a.checkpoint
    _, summary = run.run_train(args)
    summary["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(summary, default=str), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main("--smoke" in sys.argv))
