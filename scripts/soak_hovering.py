"""Long-run soak: one Hovering training run past 2^32 env-steps on the
real chip (VERDICT r3 next #9).

Exercises, at production scale, the claims previously pinned only by CPU
unit tests:
  * the [lo, hi] uint32-pair frame counter crossing 2^32
    (rl/ppo.frame_add carry path) inside the jitted epoch,
  * Neumaier-compensated running obs/value stats at count >= 1e9
    (rl/running_stats.py — naive f32 Welford stalls at 2^24),
  * adaptive-KL lr stability over ~44k epochs,
  * a mid-run checkpoint save -> restore -> continue, with an exact
    state round-trip check (params/opt/stats/frame bitwise equal).

Writes benchmarks/soak/hovering_soak.json. Takes ~15-25 min on the chip:

    python scripts/soak_hovering.py [epochs] [--fused]

--fused runs the same protocol through the DEFAULT shipped trainer
(FusedHoveringPPO: fused rollout + fused update kernels) and writes
benchmarks/soak/hovering_soak_fused.json — the r5 headline path soaked
past 2^32 frames with the same mid-run bitwise-restore check.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import airgym_tpu.envs as envs                       # noqa: E402
from airgym_tpu.rl import checkpoint as ckpt         # noqa: E402
from airgym_tpu.rl import ppo as ppo_mod             # noqa: E402
from airgym_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

NUM_ENVS = 4096
HORIZON = 24
FRAMES_PER_EPOCH = NUM_ENVS * HORIZON          # 98 304


def tree_equal(a, b) -> bool:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(la, lb))


def main(epochs: int, fused: bool = False) -> int:
    enable_compilation_cache()
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=NUM_ENVS)
    if fused:
        from airgym_tpu.rl.fused_ppo import FusedHoveringPPO
        tr = FusedHoveringPPO(task, ppo_mod.PPOConfig(horizon=HORIZON))
    else:
        tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=HORIZON))
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch()

    out_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                           "soak")
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "soak_mid.ckpt")

    mid = epochs // 2
    curve = []
    lr_min, lr_max = float("inf"), 0.0
    restore_ok = None
    t0 = time.perf_counter()
    m = None
    for e in range(1, epochs + 1):
        ts, m = step(ts)
        if e % 1000 == 0 or e == epochs:
            # host fetch = real sync over the tunnel; keep it infrequent
            row = {"epoch": e,
                   "frames": ppo_mod.frame_to_int(ts.frame),
                   "mean_reward": round(float(m["mean_reward"]), 2),
                   "mean_ep_length": round(float(m["mean_ep_length"]), 1),
                   "kl": float(m["kl"]), "lr": float(m["lr"]),
                   "wall_s": round(time.perf_counter() - t0, 1)}
            lr_min = min(lr_min, row["lr"])
            lr_max = max(lr_max, row["lr"])
            curve.append(row)
            print(row, flush=True)
            assert np.isfinite(row["mean_reward"]), row
        if e == mid:
            # mid-run save -> load -> continue from the RESTORED state
            saved = ts._replace(env_state=None, obs=None)
            ckpt.save(ckpt_path, saved)
            loaded, _ = ckpt.load(ckpt_path)
            restore_ok = (
                tree_equal(loaded.params, ts.params)
                and tree_equal(loaded.opt_state, ts.opt_state)
                and tree_equal(loaded.obs_rms, ts.obs_rms)
                and tree_equal(loaded.value_rms, ts.value_rms)
                and ppo_mod.frame_to_int(loaded.frame)
                == ppo_mod.frame_to_int(ts.frame))
            print(f"mid-run restore round-trip exact: {restore_ok}",
                  flush=True)
            assert restore_ok
            loaded = loaded._replace(env_state=ts.env_state, obs=ts.obs)
            ts = jax.tree.map(lambda t, l: jnp.asarray(l), ts, loaded)

    wall = time.perf_counter() - t0
    frames = ppo_mod.frame_to_int(ts.frame)
    hi_word = int(np.asarray(ts.frame)[1])
    # running stats consumed one batch per epoch
    count = float(np.asarray(ts.obs_rms.count))
    result = {
        "task": "hovering", "num_envs": NUM_ENVS, "horizon": HORIZON,
        "trainer": type(tr).__name__,
        "epochs": epochs,
        "frames_total": frames,
        "frames_expected": epochs * FRAMES_PER_EPOCH,
        "crossed_2_32": frames > 2 ** 32,
        "frame_hi_word": hi_word,
        "wall_s": round(wall, 1),
        "env_steps_per_sec": round(frames / wall, 1),
        "obs_rms_count": count,
        "obs_rms_count_ge_1e9": count >= 1e9,
        "obs_rms_finite": bool(np.isfinite(
            np.asarray(ts.obs_rms.mean)).all()
            and np.isfinite(np.asarray(ts.obs_rms.var)).all()),
        "lr_range": [lr_min, lr_max],
        "restore_roundtrip_exact": bool(restore_ok),
        "final_mean_reward": round(float(m["mean_reward"]), 2),
        "final_mean_ep_length": round(float(m["mean_ep_length"]), 1),
        "curve": curve[-10:],
    }
    assert result["frames_total"] == result["frames_expected"], result
    assert result["crossed_2_32"] and hi_word == 1, result
    assert result["obs_rms_count_ge_1e9"] and result["obs_rms_finite"]
    out = os.path.join(out_dir, "hovering_soak_fused.json" if fused
                       else "hovering_soak.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    os.remove(ckpt_path)
    print(f"soak OK -> {out}")
    return 0


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("--")]
    sys.exit(main(int(a[0]) if a else 44000,
                  fused="--fused" in sys.argv))
