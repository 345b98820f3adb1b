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


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_fused_rollout_equals_unsharded():
    """The shard_map-wrapped fused rollout kernel reproduces the
    single-device call EXACTLY: per-shard seeds are offset so local tile
    t of shard d derives the same RNG stream as global tile
    d*tiles_per_shard + t (fused_ppo._rollout_kernel)."""
    import functools

    from airgym_tpu.ops import fused_rollout as fr
    from airgym_tpu.rl.fused_ppo import FusedHoveringPPO

    n = 8 * fr.TILE
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=n)
    tr = FusedHoveringPPO(task, ppo_mod.PPOConfig(horizon=2,
                                                  minibatch_size=2048))
    orig = fr.rollout_fused_policy
    fr.rollout_fused_policy = functools.partial(orig, interpret=True)
    try:
        ts = tr.init(jax.random.PRNGKey(0))
        pack = fr.pack_policy(ts.params, ts.obs_rms)
        packed = tr._pack_env(ts.env_state)
        seed = jnp.array([12345], jnp.int32)

        tr.mesh = None
        out_a, rec_a = jax.jit(
            lambda p, pk, s: tr._rollout_kernel(p, pk, s, 2))(
                packed, pack, seed)

        mesh = pmesh.make_mesh(jax.devices()[:8])
        tr.mesh = mesh
        sharded = jax.jit(
            lambda p, pk, s: tr._rollout_kernel(p, pk, s, 2))
        out_b, rec_b = sharded(
            jax.device_put(
                packed, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(None, "env"))),
            pack, seed)

        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rec_a), np.asarray(rec_b),
                                   atol=1e-6)
    finally:
        fr.rollout_fused_policy = orig
        tr.mesh = None


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_fused_train_epoch():
    """Full fused TRAIN epoch on an 8-device mesh (rollout kernel under
    shard_map, GAE/minibatch updates sharded by XLA): finite metrics and
    params stay replicated-identical across devices."""
    import functools

    from airgym_tpu.ops import fused_rollout as fr
    from airgym_tpu.rl.fused_ppo import FusedHoveringPPO

    n = 8 * fr.TILE
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=n)
    tr = FusedHoveringPPO(task, ppo_mod.PPOConfig(horizon=2,
                                                  minibatch_size=2048,
                                                  mini_epochs=1))
    orig = fr.rollout_fused_policy
    fr.rollout_fused_policy = functools.partial(orig, interpret=True)
    try:
        mesh = pmesh.make_mesh(jax.devices()[:8])
        tr.mesh = mesh
        ts = pmesh.shard_env_batch(tr.init(jax.random.PRNGKey(0)), mesh,
                                   tr.num_envs)
        step = tr.make_train_epoch(donate=False)
        with mesh:
            ts, m = step(ts)
            ts, m = step(ts)
        for k in ("loss", "kl", "mean_reward", "reward_raw_per_step"):
            assert np.isfinite(float(m[k])), k
        # params replicated: every device shard identical
        p = jax.tree.leaves(ts.params)[0]
        shards = [np.asarray(s.data) for s in p.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    finally:
        fr.rollout_fused_policy = orig
        tr.mesh = None
