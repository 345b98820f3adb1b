"""Deterministic Avoid eval: survive-the-throw rate over >= 500 episodes
(VERDICT r4 next #4).

Avoid's win condition is reaching the episode cap (6 s) without a
collision — reset_on_collision=True, reference avoid.py:259 +
avoid_config.py:19 — while a cube is ballistically thrown at the drone
(80%) or parked nearby (20%). Success = episode ended by timeout.
Vision task (depth camera): run on the chip.

    python scripts/eval_avoid.py runs/<run>/nn/last_avoid_long.ckpt
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
CAP = 600                 # episode_length_s 6 / dt 0.01
EPISODES_SCANS = 3        # 3 caps => >= 1500 episode endings


def main(ckpt: str, seed: int = 7, smoke: bool = False) -> int:
    enable_compilation_cache()
    n = 8 if smoke else NUM_ENVS
    kw = dict(cam_width=24, cam_height=20) if smoke else {}
    task = envs.make_task("avoid", ctl_mode="rate", num_envs=n, **kw)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=64),
                     network_kw={"image_encoder": "cnn",
                                 "image_feature_dim": 30})
    run = runner_mod.Runner()
    ts = tr.init(jax.random.PRNGKey(0))
    if not smoke:
        ts = run.restore(tr, ts, ckpt)

    def boot(k):
        st = task.initial_state(k)
        return task.step(st, jnp.zeros((n, task.cfg.num_actions)))

    st, out = jax.jit(boot)(jax.random.PRNGKey(seed))

    def body(carry, _):
        st, obs = carry
        mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)
        st, out = task.step(st, jnp.clip(mu, -1.0, 1.0))
        return (st, out.obs), {"reset": out.reset,
                               "success": out.info["success"] & out.reset}

    steps = 50 if smoke else CAP
    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=steps))
    carry = (st, out.obs)
    recs = []
    for _ in range(1 if smoke else EPISODES_SCANS):
        carry, r = scan(carry)
        recs.append(jax.tree.map(np.asarray, r))
    rec = {k: np.concatenate([r[k] for r in recs], 0) for k in recs[0]}

    games = int(rec["reset"].sum())
    surv = int(rec["success"].sum())
    result = {
        "task": "avoid",
        "what": ("deterministic survive-the-throw eval, >=500 episodes "
                 "(VERDICT r4 next #4); success = episode reached the "
                 "6 s cap without collision (reference avoid.py:259)"),
        "checkpoint": os.path.basename(ckpt),
        "num_envs": n, "steps": int(rec["reset"].shape[0]), "seed": seed,
        "games": games,
        "survive_rate": round(surv / max(1, games), 4),
        "mean_ep_length": round(
            rec["reset"].shape[0] * n / max(1, games), 1),
    }
    print(json.dumps(result, indent=1))
    if not smoke:
        out_path = os.path.join(
            os.path.dirname(__file__), "..", "benchmarks", "convergence",
            "avoid_eval.json")
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    args = [x for x in sys.argv[1:] if not x.startswith("--")]
    main(args[0] if args else "", smoke="--smoke" in sys.argv)
