"""Worker process for the multi-process (multi-host/DCN) validation test.

Each process runs this script with a distinct process_id. Together they form
a 2-process jax.distributed job over CPU devices — the same wiring a real
multi-host TPU pod uses (coordinator + N processes, collectives over the
inter-host fabric), which replaces the reference's NCCL rank machinery
(reference lib/torch_runner.py:35-46, lib/agent/a2c_base.py:109-123,293-316).

Usage: python multiproc_worker.py <process_id> <num_processes> <port>

Prints, on success:
  RANK0_ONLY           (exactly one process — the rank-0 gate)
  MULTIPROC OK pid=<i> kl=<float> reward=<float>   (every process)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Force CPU before any backend query; 2 local devices per process so the
# global mesh (num_processes * 2 devices) exercises both intra-process
# sharding and cross-process collectives.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == nproc * 2, n_global
    assert n_local == 2, n_local

    import jax.numpy as jnp

    import airgym_tpu.envs as envs
    from airgym_tpu.parallel import mesh as pmesh
    from airgym_tpu.rl import ppo as ppo_mod

    # rank-0-only gating (reference a2c_base.py:121-123)
    if pmesh.is_main_process():
        print("RANK0_ONLY", flush=True)

    num_envs = 8 * n_global
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=num_envs,
                          obs_noise=False)
    trainer = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=4, minibatch_size=num_envs * 2))
    # Same seed on every process -> identical host values, so device_put
    # onto the global sharding places consistent shards.
    ts = trainer.init(jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh()
    ts = pmesh.shard_env_batch(ts, mesh, num_envs)

    step = jax.jit(trainer.train_epoch, donate_argnums=(0,))
    with mesh:
        ts, metrics = step(ts)
        ts, metrics = step(ts)
    jax.block_until_ready(metrics["kl"])

    kl = float(metrics["kl"])
    rew = float(metrics["reward_raw_per_step"])
    for k in ("kl", "a_loss", "c_loss", "reward_raw_per_step"):
        assert bool(jnp.isfinite(metrics[k])), k
    print(f"MULTIPROC OK pid={pid} kl={kl:.8f} reward={rew:.6f}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
