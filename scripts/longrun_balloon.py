"""Balloon long-run convergence evidence (VERDICT r3 missing #4 / weak #5).

The reference ships Balloon at 64 actors x horizon 32 x 200 epochs = 0.4M
frames (scripts/config/ppo_balloon.yaml:38-44 deltas vs hovering) -- one
tiny curve, no hit-rate.  This run keeps the reference hyperparams but
scales the env batch to 2048 and runs 3000 epochs (~196M frames) so the
success (hit < 0.1 m, reference balloon.py:154-157) curve is the evidence,
not just rising reward.  Balloon declares has_success, so success_rate
flows through the trainer and into events.jsonl for summarize_runs.py.

Usage:
    python scripts/longrun_balloon.py           # chip run
    python scripts/longrun_balloon.py --smoke   # tiny CPU check
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
    enable_compilation_cache()
    base = yaml.safe_load(open(os.path.join(
        REPO, "airgym_tpu", "configs", "ppo_balloon.yaml")))
    params = base["params"]
    cfg = params["config"]
    cfg["name"] = "balloon_long"
    cfg["num_actors"] = 2048
    cfg["max_epochs"] = 3000
    cfg["save_frequency"] = 500
    if smoke:
        cfg["num_actors"] = 8
        cfg["minibatch_size"] = 64
        cfg["max_epochs"] = 3

    run = runner_mod.Runner()
    run.load({"params": params})
    t0 = time.time()
    _, summary = run.run_train({"train": True, "ctl_mode": "rate",
                                "seed": 3,
                                "run_root": os.path.join(REPO, "runs")})
    summary["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main("--smoke" in sys.argv))
