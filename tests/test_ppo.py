"""PPO trainer tests: shapes, GAE correctness vs a numpy reference, and a
short convergence smoke test on Hovering (SURVEY.md 4(e))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airgym_tpu.envs as envs
from airgym_tpu.rl import ppo as ppo_mod


def small_trainer(num_envs=16, horizon=8, minibatch=32, **kw):
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=num_envs,
                          obs_noise=False)
    cfg = ppo_mod.PPOConfig(horizon=horizon, minibatch_size=minibatch, **kw)
    return ppo_mod.PPO(task, cfg)


def test_init_shapes():
    tr = small_trainer()
    ts = tr.init(jax.random.PRNGKey(0))
    assert ts.obs.shape == (16, 18)
    assert float(ts.lr) == pytest.approx(3e-4)


def test_train_epoch_runs_and_is_finite():
    tr = small_trainer()
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch(donate=False)
    ts, m = step(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert int(ts.epoch) == 1
    assert ppo_mod.frame_to_int(ts.frame) == 16 * 8


def test_frame_counter_is_64bit_safe():
    """frame is a [lo, hi] uint32 pair: must roll over 2**31 and 2**32
    exactly (int32 would overflow at 2.1B frames — an afternoon at the
    demonstrated throughput)."""
    f = ppo_mod.frame_from_int(2**31 - 100)
    f = ppo_mod.frame_add(f, 300)
    assert ppo_mod.frame_to_int(f) == 2**31 + 200
    f = ppo_mod.frame_from_int(2**32 - 50)
    f = ppo_mod.frame_add(f, 100)
    assert ppo_mod.frame_to_int(f) == 2**32 + 50
    big = 10**13
    assert ppo_mod.frame_to_int(ppo_mod.frame_from_int(big)) == big


def test_train_epoch_with_smooth_clamp():
    """use_smooth_clamp swaps the surrogate's clamp for the sigmoid-smoothed
    one (reference a2c_base.py:270-274); must train and stay finite."""
    tr = small_trainer(use_smooth_clamp=True)
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch(donate=False)
    ts, m = step(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_gae_matches_numpy_reference():
    tr = small_trainer()
    H, N = 5, 3
    gamma, tau = tr.cfg.gamma, tr.cfg.tau
    rng = np.random.RandomState(0)
    rewards = rng.randn(H, N).astype(np.float32)
    values = rng.randn(H, N).astype(np.float32)
    dones = (rng.rand(H, N) < 0.2)
    last_v = rng.randn(N).astype(np.float32)

    traj = ppo_mod.Rollout(
        obs=None, prenorm=None, actions=None, neglogp=None,
        values=jnp.asarray(values), mus=None, sigmas=None,
        rewards=jnp.asarray(rewards) / tr.cfg.reward_shaper_scale,
        dones=jnp.asarray(dones), timeouts=jnp.zeros((H, N), bool))
    ts = tr.init(jax.random.PRNGKey(0))._replace(value_rms=None)
    object.__setattr__(tr, "cfg",
                       tr.cfg.__class__(**{**tr.cfg.__dict__,
                                           "normalize_value": False}))
    v_out, adv, ret = tr.compute_gae(ts, traj, jnp.asarray(last_v))

    # numpy reference (reference a2c_base.py:463-478)
    adv_np = np.zeros((H, N), np.float32)
    lastgaelam = np.zeros(N, np.float32)
    for t in reversed(range(H)):
        nt = 1.0 - dones[t]
        nv = last_v if t == H - 1 else values[t + 1]
        delta = rewards[t] + gamma * nv * nt - values[t]
        lastgaelam = delta + gamma * tau * nt * lastgaelam
        adv_np[t] = lastgaelam
    np.testing.assert_allclose(np.array(adv), adv_np, atol=1e-5)
    np.testing.assert_allclose(np.array(ret), adv_np + values, atol=1e-5)


def test_adaptive_lr_moves():
    tr = small_trainer()
    ts = tr.init(jax.random.PRNGKey(1))
    step = tr.make_train_epoch(donate=False)
    lrs = [float(ts.lr)]
    for _ in range(3):
        ts, m = step(ts)
        lrs.append(float(ts.lr))
    # the schedule must have adapted at least once in 3 epochs of a fresh
    # policy (KL starts near zero -> lr grows, or spikes -> shrinks)
    assert len({round(l, 8) for l in lrs}) > 1


@pytest.mark.slow
def test_hovering_reward_improves():
    tr = small_trainer(num_envs=64, horizon=24, minibatch=256)
    ts = tr.init(jax.random.PRNGKey(2))
    step = tr.make_train_epoch(donate=False)
    first = None
    for i in range(30):
        ts, m = step(ts)
        if i == 4:
            first = float(m["reward_raw_per_step"])
    last = float(m["reward_raw_per_step"])
    assert last > first, (first, last)


def test_rms_advantage_option():
    tr = small_trainer(normalize_rms_advantage=True)
    ts = tr.init(jax.random.PRNGKey(9))
    step = tr.make_train_epoch(donate=False)
    for _ in range(2):
        ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))
    assert float(ts.adv_ms.initialized) == 1.0


def test_linear_lr_schedule_decays_by_epoch():
    """lr_schedule: linear must decay the lr linearly over max_epochs
    (reference LinearScheduler, schedulers.py:97-119)."""
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=8)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=8, minibatch_size=16, mini_epochs=1,
        lr_schedule="linear", learning_rate=1e-3, max_epochs=10))
    ts = tr.init(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_epoch)
    lrs = []
    for _ in range(3):
        ts, m = step(ts)
        lrs.append(float(m["lr"]))
    # epoch counter starts at 0: lr_k = 1e-3 * (1 - k/10)
    assert abs(lrs[0] - 1e-3) < 1e-9
    assert abs(lrs[1] - 9e-4) < 1e-9
    assert abs(lrs[2] - 8e-4) < 1e-9
