"""Phase timing for the vision PPO epoch: rollout vs update vs render.

Jits the rollout (incl. GAE + dataset prep) and the update separately
and times each, plus one bare render, so optimization effort goes to
the real bottleneck. Usage:
    python scripts/profile_vision.py [task] [num_envs] [horizon] [mb] [me]
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import airgym_tpu.envs as envs
from airgym_tpu.rl import ppo as ppo_mod


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    task_name = sys.argv[1] if len(sys.argv) > 1 else "planning"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    horizon = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    mb = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    me = int(sys.argv[5]) if len(sys.argv) > 5 else 5

    task = envs.make_task(task_name, ctl_mode="vel", num_envs=n)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=horizon, minibatch_size=mb, mini_epochs=me))
    ts = tr.init(jax.random.PRNGKey(0))

    @jax.jit
    def rollout_and_prep(ts):
        ts = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))
        ts, traj, last_value, infos = tr.rollout(ts)
        values, adv, returns = tr.compute_gae(ts, traj, last_value)
        return ts._replace(obs=tr._strip_obs(ts.obs)), traj, values, adv

    @jax.jit
    def env_only(ts):
        ts2 = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))

        def step_fn(carry, _):
            st, obs = carry
            st, out = tr.task.step(
                st, jnp.zeros((tr.num_envs, tr.num_actions)))
            return (st, out.obs), out.reward

        (_, _), rews = jax.lax.scan(
            step_fn, (ts2.env_state, ts2.obs), None, length=horizon)
        return rews.sum()

    full = tr.make_train_epoch()

    t_ro, _ = timeit(rollout_and_prep, ts)
    t_env, _ = timeit(env_only, ts)

    # the donating epoch consumes its input: rebind, don't reuse
    ts2, _ = full(ts)
    jax.block_until_ready(ts2.lr)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        ts2, _ = full(ts2)
    jax.block_until_ready(ts2.lr)
    t_full = (time.perf_counter() - t0) / reps
    t_upd = t_full - t_ro

    steps = n * horizon
    print(f"task={task_name} n={n} H={horizon} mb={mb} me={me}")
    print(f"env-only scan       : {t_env*1e3:8.1f} ms  "
          f"({steps/t_env/1e3:.1f}k steps/s)")
    print(f"rollout+GAE+prep    : {t_ro*1e3:8.1f} ms")
    print(f"full epoch          : {t_full*1e3:8.1f} ms  "
          f"({steps/t_full/1e3:.1f}k steps/s)")
    print(f"=> update (approx)  : {t_upd*1e3:8.1f} ms  "
          f"({me * (steps // mb)} minibatches, "
          f"{t_upd/(me*(steps//mb))*1e3:.2f} ms each)")


if __name__ == "__main__":
    main()
