"""Demo: play a checkpoint with the runtime action/state stream attached
(the reference's optional rospy bridge, hovering.py:149-156,362-366 — see
airgym_tpu/utils/action_stream.py for the protocol).

    python scripts/stream_play.py --checkpoint runs/<run>/nn/<ckpt>.ckpt \
        [--port 7781] [--steps 2000] [--hz 100]

Consume the stream from another terminal, e.g.:
    nc 127.0.0.1 7781                      # watch actions/state
    echo '{"target_state": [1,0,0,0,1,0,0,0,1, 2,1,1.5, 0,0,0,0,0,0]}' \
        | nc 127.0.0.1 7781                # re-target all envs mid-flight
"""
import argparse
import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import airgym_tpu.envs as envs                      # noqa: E402
from airgym_tpu.rl import ppo as ppo_mod            # noqa: E402
from airgym_tpu.rl import runner as runner_mod      # noqa: E402
from airgym_tpu.utils.action_stream import (ActionStreamServer,  # noqa: E402
                                            run_bridged_play)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="optional; untrained policy when omitted")
    p.add_argument("--task", default="hovering")
    p.add_argument("--ctl_mode", default="rate")
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--port", type=int, default=7781)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--hz", type=float, default=100.0,
                   help="control rate pacing; 0 = as fast as possible")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    task = envs.make_task(a.task, ctl_mode=a.ctl_mode, num_envs=a.num_envs)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig())
    ts = tr.init(jax.random.PRNGKey(0))
    if a.checkpoint:
        ts = runner_mod.Runner().restore(tr, ts, a.checkpoint)

    server = ActionStreamServer(port=a.port)
    print(f"streaming on {server.address}; send "
          f'{{"target_state": [...18]}} lines to re-target', flush=True)
    try:
        run_bridged_play(task, tr.model, ts, server, steps=a.steps,
                         seed=a.seed, realtime_hz=a.hz or None)
    finally:
        server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
