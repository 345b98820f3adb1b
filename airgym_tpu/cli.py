"""CLI entry point (reference: scripts/runner.py + airgym/utils/helpers.py
get_args). Installed as the ``airgym-tpu`` console script; usage mirrors
the reference:

    airgym-tpu --train --task hovering --ctl_mode rate \
        [--num_envs N] [--checkpoint path] [--seed S] [--file cfg.yaml]
    airgym-tpu --play --task hovering --ctl_mode rate \
        --checkpoint runs/.../nn/ppo_hovering.ckpt

Selects the packaged airgym_tpu/configs/ppo_<task>.yaml unless --file is
given (reference runner.py:52-58); CLI flags override YAML values
(update_config, reference runner.py:19-44).
"""
import argparse
import os

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "configs")


def get_args(argv=None):
    """reference airgym/utils/helpers.py:82-116 custom parameters."""
    p = argparse.ArgumentParser("airgym_tpu runner")
    p.add_argument("--task", default="hovering",
                   choices=["hovering", "balloon", "tracking", "avoid",
                            "planning", "maplanning", "depthgen"])
    p.add_argument("--ctl_mode", required=True,
                   choices=["pos", "vel", "atti", "rate", "prop"])
    p.add_argument("--train", action="store_true")
    p.add_argument("--play", action="store_true")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--experiment_name", default=None,
                   help="overrides config.name (run-dir prefix), reference "
                        "runner.py:24-25")
    p.add_argument("--headless", action="store_true",
                   help="accepted for reference-CLI compatibility; the TPU "
                        "backend has no viewer")
    p.add_argument("--file", default=None,
                   help="algorithm config YAML (default: packaged "
                        "airgym_tpu/configs/ppo_<task>.yaml)")
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--record_dir", default=None,
                   help="--play: dump headless episode visualization "
                        "(trajectory.png, depth.gif, episode.npz) here")
    return p.parse_args(argv)


def resolve_train(args) -> bool:
    """reference torch_runner.py:95-101: --train wins over --play, and
    NEITHER flag also trains (the else branch runs run_train)."""
    return args.train or not args.play


def update_config(cfg, args):
    """Merge CLI overrides into the YAML config (reference runner.py:19-44)."""
    c = cfg["params"]["config"]
    if args.task:
        c["env_name"] = args.task
    if args.experiment_name:
        c["name"] = args.experiment_name
    if args.num_envs:
        c["num_actors"] = args.num_envs
    if args.seed is not None:
        cfg["params"]["seed"] = args.seed
    return cfg


def run_cli(argv=None):
    """Parse args, run, and return the runner's result (TrainState +
    summary for --train, eval dict for --play) for programmatic callers."""
    from airgym_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    args = get_args(argv)
    cfg_path = args.file or os.path.join(CONFIG_DIR,
                                         f"ppo_{args.task}.yaml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg = update_config(cfg, args)

    from airgym_tpu.rl.runner import Runner
    runner = Runner()
    runner.load(cfg)
    run_args = {
        "train": resolve_train(args),
        "task": args.task,
        "ctl_mode": args.ctl_mode,
        "num_envs": args.num_envs,
        "seed": args.seed,
        "checkpoint": args.checkpoint,
        "max_steps": args.max_steps,
        "record_dir": args.record_dir,
    }
    return runner.run(run_args)


def main(argv=None):
    """Console-script entry: setuptools wraps this in sys.exit(), so it
    must return None/int — NOT the runner result (a tuple exit status
    reads as failure and dumps the TrainState repr)."""
    run_cli(argv)
    return 0


if __name__ == "__main__":
    main()
