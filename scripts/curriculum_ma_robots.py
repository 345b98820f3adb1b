"""MAPlanning ROBOT-COUNT curriculum (VERDICT r4 next #1) — the recipe
that produced the committed round-5 results (maplanning_stage_evals.json).

The start-distance curriculum alone (scripts/curriculum_maplanning.py)
plateaued at env-level success 0.09. Two structural facts shape the
recipe that beats it:

1. **Robot-count transfer is exact.** The obs carry no robot count (the
   2R per-robot relative channels are zeroed by the reference,
   maplanning.py:505-514), so checkpoint.transfer_obs_width moves a
   policy across widths EXACTLY — train goal-reach solo (R=1, no
   any-robot truncation chopping episodes), then widen to R=4.

2. **The literal reference reward destroys goal-reach under sustained
   training** (benchmarks/convergence/maplanning_reward_cap_analysis
   .json): per-step income ~2.45 x the gamma=0.99 horizon gives a
   loiter continuation value ~245 > the +200 reach bonus, so reach is
   advantage-NEGATIVE except within ~169 steps of the episode cap, and
   training first learns reach (while values are cold) then unlearns it
   (r1a: env success 0 -> 0.786 -> 0.087 while reward rose). The
   env-gated best_success checkpoint (rl/runner.py) captures the peak;
   each stage warm-starts from the PREVIOUS stage's captured peak, not
   its endpoint. R=4 adds truncation pressure (a reaching teammate ends
   everyone's episode) that softens the collapse: m4a held ~0.80-0.86.

Stage DAG (sources refer to the *_best_success.ckpt of earlier stages):

    source(start-dist curriculum, R=4) --slice--> r1a(R1 @ +0.5)
    r1a -> r1b(R1 @ -4.5)
    r1a --pad--> m4a(R4 @ +0.5)        # peak env success 0.858
    r1b --pad--> m4b(R4 @ -4.5)        # peak env success 0.344
    m4b -> m4c(R4 @ full -8.5)         # full-task transient capture

Full-distance reach is additionally capped by geometry: 17.0-17.4 m in a
16 s cap needs >= 1.07 m/s sustained, above the speed-reward optimum of
1.0 — see the analysis artifact.

Usage:
    python scripts/curriculum_ma_robots.py [--source <ckpt>] [--smoke]
    python scripts/curriculum_ma_robots.py --start-stage m4a
"""
import argparse
import copy
import glob
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

# (tag, num_robots, num_envs, start_x, max_epochs, source_tag)
# source_tag None = the --source checkpoint (sliced from --source-robots
# width); epoch counter restarts at 0 each stage (transfer resets it).
STAGES = [
    ("r1a", 1, 4096, 0.5, 400, None),
    ("r1b", 1, 4096, -4.5, 500, "r1a"),
    ("m4a", 4, 1024, 0.5, 300, "r1a"),
    ("m4b", 4, 1024, -4.5, 450, "r1b"),
    ("m4c", 4, 1024, None, 300, "m4b"),
]

DEFAULT_SOURCE = os.path.join(
    REPO, "runs", "maplan_v4_20-07-58-54", "nn", "last_maplan_v4.ckpt")


def stage_ckpt(run_dir: str, tag: str) -> str:
    nn = os.path.join(run_dir, "nn")
    best = os.path.join(nn, f"maplan_{tag}_best_success.ckpt")
    return best if os.path.exists(best) else os.path.join(
        nn, f"last_maplan_{tag}.ckpt")


def find_existing(tag: str):
    """Locate an already-trained stage (for --start-stage resumes)."""
    cands = sorted(glob.glob(os.path.join(REPO, "runs",
                                          f"maplan_{tag}_*")))
    return stage_ckpt(cands[-1], tag) if cands else None


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--source", default=DEFAULT_SOURCE,
                   help="start-distance-curriculum checkpoint feeding "
                        "stage r1a")
    p.add_argument("--source-robots", type=int, default=4)
    p.add_argument("--start-stage", default=None,
                   help="skip stages before this tag; their checkpoints "
                        "are located under runs/")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--smoke", action="store_true")
    a = p.parse_args()

    enable_compilation_cache()
    base = yaml.safe_load(open(os.path.join(
        REPO, "airgym_tpu", "configs", "ppo_maplanning.yaml")))

    # smoke shrinks the cameras, so the full-res source checkpoint's image
    # stats would not fit — smoke drives the stage-to-stage plumbing only
    root_src = (a.source if os.path.exists(a.source) and not a.smoke
                else None)
    done = {}          # tag -> (ckpt path, robots)
    stages = list(STAGES)
    if a.start_stage:
        tags = [s[0] for s in stages]
        for s in stages[:tags.index(a.start_stage)]:
            ck = find_existing(s[0])
            if ck:
                done[s[0]] = (ck, s[1])
        stages = stages[tags.index(a.start_stage):]

    results = []
    for tag, robots, envs_n, start_x, max_epochs, src_tag in stages:
        if src_tag is None:
            src = (root_src, a.source_robots) if root_src else None
        else:
            if src_tag not in done:
                raise RuntimeError(f"stage {tag} needs {src_tag}, which "
                                   f"has not run (use --start-stage "
                                   f"only after its sources exist)")
            src = done[src_tag]

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
        if src is not None:
            args["transfer_checkpoint"] = src[0]
            args["transfer_old_obs_dim"] = 16 + 2 * src[1]
        t0 = time.time()
        _, summary = run.run_train(args)
        summary["stage"] = tag
        summary["num_robots"] = robots
        summary["start_x"] = start_x
        summary["source"] = src[0] if src else None
        summary["wall_s"] = round(time.time() - t0, 1)
        results.append(summary)
        print(f"[stage {tag}] R={robots} -> {summary}", flush=True)

        ck = stage_ckpt(summary["run_dir"], tag)
        if not os.path.exists(ck):
            raise RuntimeError(f"stage checkpoint missing: {ck}")
        done[tag] = (ck, robots)
        summary["carried_checkpoint"] = ck

        out = os.path.join(REPO, "runs", "maplan_robots_summary.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1, default=str)
    print(f"robot-count curriculum done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
