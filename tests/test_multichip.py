"""Multi-chip correctness: the sharded train step on an 8-device mesh
produces the same training trajectory as the unsharded one (pure data
parallelism must be semantics-preserving; reduction-order float noise is
the only allowed difference)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airgym_tpu.envs as envs
from airgym_tpu.parallel import mesh as pmesh
from airgym_tpu.rl import ppo as ppo_mod


def make(n_envs=32):
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=n_envs,
                          obs_noise=False)
    cfg = ppo_mod.PPOConfig(horizon=8, minibatch_size=64)
    return ppo_mod.PPO(task, cfg)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_equals_unsharded():
    tr = make()
    ts0 = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch(donate=False)

    # unsharded (single device)
    ts_a, m_a = step(ts0)
    ts_a, m_a = step(ts_a)

    # sharded over 8 devices
    mesh = pmesh.make_mesh(jax.devices()[:8])
    ts_b = pmesh.shard_env_batch(tr.init(jax.random.PRNGKey(0)), mesh,
                                 tr.num_envs)
    with mesh:
        ts_b, m_b = step(ts_b)
        ts_b, m_b = step(ts_b)

    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)
    # params agree to reduction-order noise
    for a, b in zip(jax.tree.leaves(ts_a.params),
                    jax.tree.leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_env_state_is_actually_sharded():
    tr = make()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    ts = pmesh.shard_env_batch(tr.init(jax.random.PRNGKey(0)), mesh,
                               tr.num_envs)
    root = ts.env_state.core.root
    shards = root.sharding.device_set
    assert len(shards) == 8
    # params replicated
    leaf = jax.tree.leaves(ts.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_vision_task_with_frame_dedup():
    """Vision train epoch (dict obs + frame-dedup gather) under env-axis
    sharding: runs, stays finite, and matches the unsharded trajectory.
    The dedup minibatch gather indexes [frame, env] pairs — env ids cross
    shard boundaries, which XLA must resolve without changing numerics."""
    # num_trees=6: sharding semantics don't depend on forest size, and the
    # 40-tree unrolled render chain dominates the (double: unsharded +
    # sharded) CPU compile on the 1-CPU suite host
    task = envs.make_task("planning", ctl_mode="vel", num_envs=16,
                          num_trees=6, cam_width=64, cam_height=32)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=8, minibatch_size=32, mini_epochs=2))
    assert tr.frame_dedup
    ts0 = tr.init(jax.random.PRNGKey(1))
    step = tr.make_train_epoch(donate=False)

    ts_a, m_a = step(ts0)

    mesh = pmesh.make_mesh(jax.devices()[:8])
    ts_b = pmesh.shard_env_batch(tr.init(jax.random.PRNGKey(1)), mesh,
                                 tr.num_envs)
    with mesh:
        ts_b, m_b = step(ts_b)

    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=5e-3, atol=5e-4, err_msg=k)
