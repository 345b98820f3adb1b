"""Root-cause the Tracking eval's early-death tail (VERDICT r4 next #7).

tracking_eval.json shows hold_rate ~0.89 with ep_length_p5 ~84: a twentieth
of envs die (>1 m from the reference, reference tracking.py:215-221)
within ~1 s of a lemniscate start. This script re-runs the deterministic
policy over many initial draws, recording each env's INITIAL state
(reference-parity draws: v ~ U(+-0.5)^3, tilt ~ 0.1pi, xy/z offset 0.1 —
reference tracking.py:165-180) and its first-death step, then reports how
death probability concentrates in the initial-draw tails.

Early deaths need only the first few hundred steps, so this runs on CPU.

    JAX_PLATFORMS=cpu python scripts/diagnose_tracking_tail.py \
        runs/track_long_20-04-45-13/nn/last_track_long.ckpt
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import airgym_tpu.envs as envs                      # noqa: E402
from airgym_tpu.math import rotations as rot        # noqa: E402
from airgym_tpu.rl import ppo as ppo_mod            # noqa: E402
from airgym_tpu.rl import runner as runner_mod      # noqa: E402
from airgym_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

NUM_ENVS = 2048
STEPS = 400          # the tail under study dies by ~step 84


def main(ckpt: str, seed: int = 7) -> int:
    enable_compilation_cache()
    task = envs.make_task("tracking", ctl_mode="rate", num_envs=NUM_ENVS)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=24))
    run = runner_mod.Runner()
    ts = run.restore(tr, tr.init(jax.random.PRNGKey(0)), ckpt)

    def boot(k):
        st = task.initial_state(k)
        root0 = st.core.root
        st, out = task.step(st, jnp.zeros((NUM_ENVS, task.cfg.num_actions)))
        return st, out, root0

    st, out, root0 = jax.jit(boot)(jax.random.PRNGKey(seed))

    def body(carry, _):
        st, obs = carry
        mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)
        st, out = task.step(st, jnp.clip(mu, -1.0, 1.0))
        return (st, out.obs), {"reset": out.reset,
                               "dist": out.info["dist_norm"]}

    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=STEPS))
    (_, _), rec = scan((st, out.obs))

    reset = np.asarray(rec["reset"])                  # [T, N]
    dist = np.asarray(rec["dist"])
    root0 = np.asarray(root0)

    died = reset.any(axis=0)
    first = np.where(died, reset.argmax(axis=0) + 2, STEPS)  # env counter

    # initial-draw features
    v0 = root0[:, 7:10]
    speed0 = np.linalg.norm(v0, axis=-1)
    ups0 = np.asarray(rot.quat_axis(jnp.asarray(root0[:, 3:7]), 2))[:, 2]
    tilt0 = np.degrees(np.arccos(np.clip(ups0, -1, 1)))
    ref0 = np.array([0.0, 0.0, 1.0])
    d0 = root0[:, 0:3] - ref0
    dist0 = np.linalg.norm(d0, axis=-1)
    # the component of initial velocity pointing AWAY from the reference,
    # plus the tilt-induced lateral acceleration direction
    away_v = np.einsum("nd,nd->n", v0, d0) / np.maximum(dist0, 1e-6)

    def rate(mask):
        return float(died[mask].mean()) if mask.any() else float("nan")

    med_speed = float(np.median(speed0))
    med_tilt = float(np.median(tilt0))
    hi = (speed0 > np.percentile(speed0, 75)) & (
        tilt0 > np.percentile(tilt0, 75))
    lo = (speed0 < np.percentile(speed0, 25)) & (
        tilt0 < np.percentile(tilt0, 25))

    # peak distance of survivors: how close do recoveries come to the
    # 1 m kill line
    surv_peak = dist[:, ~died].max(axis=0) if (~died).any() else np.array([])

    result = {
        "what": ("early-death tail diagnosis over reference-parity initial "
                 "draws (VERDICT r4 next #7)"),
        "checkpoint": os.path.basename(ckpt),
        "num_envs": NUM_ENVS, "steps": STEPS, "seed": seed,
        "death_rate_in_window": round(float(died.mean()), 4),
        "death_step_median": int(np.median(first[died])) if died.any() else None,
        "death_rate_by_draw": {
            "fast+tilted (top-quartile speed AND tilt)": round(rate(hi), 4),
            "slow+level (bottom-quartile speed AND tilt)": round(rate(lo), 4),
            "speed>median": round(rate(speed0 > med_speed), 4),
            "speed<median": round(rate(speed0 < med_speed), 4),
            "tilt>median": round(rate(tilt0 > med_tilt), 4),
            "tilt<median": round(rate(tilt0 < med_tilt), 4),
            "away_v>0.3": round(rate(away_v > 0.3), 4),
            "away_v<0": round(rate(away_v < 0.0), 4),
        },
        "initial_draw_stats": {
            "speed0_p95": round(float(np.percentile(speed0, 95)), 3),
            "tilt0_deg_p95": round(float(np.percentile(tilt0, 95)), 1),
            "dist0_p95": round(float(np.percentile(dist0, 95)), 3),
        },
        "dying_envs_initial_stats": {
            "speed0_mean": round(float(speed0[died].mean()), 3),
            "tilt0_deg_mean": round(float(tilt0[died].mean()), 1),
            "away_v_mean": round(float(away_v[died].mean()), 3),
        } if died.any() else {},
        "surviving_envs_initial_stats": {
            "speed0_mean": round(float(speed0[~died].mean()), 3),
            "tilt0_deg_mean": round(float(tilt0[~died].mean()), 1),
            "away_v_mean": round(float(away_v[~died].mean()), 3),
        },
        "survivor_peak_dist_p99": (round(float(np.percentile(surv_peak, 99)), 3)
                                   if surv_peak.size else None),
    }
    print(json.dumps(result, indent=1))
    out_path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                            "convergence", "tracking_tail_diagnosis.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
