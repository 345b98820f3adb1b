"""Tests for the library-surface components: losses, schedulers, moving
stats, replay buffers, tensor PID, helpers, vecenv glue."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airgym_tpu.rl import losses, moving_stats, replay, schedulers, tr_helpers
from airgym_tpu.utils import helpers, tensor_pid  # noqa


def test_actor_loss_matches_manual():
    old = jnp.array([1.0, 2.0])
    new = jnp.array([1.2, 1.9])
    adv = jnp.array([0.5, -1.0])
    out = losses.actor_loss(old, new, adv, True, 0.2)
    ratio = np.exp(np.array(old) - np.array(new))
    s1 = np.array(adv) * ratio
    s2 = np.array(adv) * np.clip(ratio, 0.8, 1.2)
    np.testing.assert_allclose(np.array(out), np.maximum(-s1, -s2),
                               atol=1e-6)


def test_smooth_clamp_bounds():
    x = jnp.linspace(-3, 3, 50)
    y = losses.smooth_clamp(x, 0.8, 1.2)
    assert float(y.min()) >= 0.8 - 1e-5 and float(y.max()) <= 1.2 + 1e-5


def test_smooth_clamp_matches_reference_formula():
    """Numerical equivalence with the reference expression
    (common_losses.py:22-23): 1/(1+exp((-(x-mi)/(mx-mi)+0.5)*4))*(mx-mi)+mi.
    In particular the sigmoid must be centered at the interval MIDPOINT."""
    mi, mx = 0.8, 1.2
    x = np.linspace(-3, 3, 101)
    ref = 1.0 / (1.0 + np.exp((-(x - mi) / (mx - mi) + 0.5) * 4.0)) \
        * (mx - mi) + mi
    out = np.asarray(losses.smooth_clamp(jnp.asarray(x), mi, mx))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)
    mid = float(losses.smooth_clamp(jnp.asarray((mi + mx) / 2.0), mi, mx))
    assert mid == pytest.approx((mi + mx) / 2.0, abs=1e-6)


def test_critic_loss_clip_branch():
    vp = jnp.array([1.0])
    v = jnp.array([2.0])
    ret = jnp.array([0.0])
    unclipped = losses.default_critic_loss(vp, v, 0.2, ret, False)
    clipped = losses.default_critic_loss(vp, v, 0.2, ret, True)
    assert float(clipped[0]) == pytest.approx(4.0)   # max((2)^2,(1.2)^2)
    assert float(unclipped[0]) == pytest.approx(4.0)


def test_schedulers():
    ad = schedulers.AdaptiveScheduler(kl_threshold=0.008)
    lr, _ = ad.update(jnp.asarray(3e-4), 0.0, 0, 0, jnp.asarray(0.1))
    assert float(lr) == pytest.approx(2e-4)
    lr, _ = ad.update(jnp.asarray(3e-4), 0.0, 0, 0, jnp.asarray(0.001))
    assert float(lr) == pytest.approx(4.5e-4)
    lin = schedulers.LinearScheduler(start_lr=1e-3, max_steps=100)
    lr, _ = lin.update(None, 0.0, 50, 0, 0.0)
    assert float(lr) == pytest.approx(5e-4)
    assert isinstance(schedulers.make("adaptive"),
                      schedulers.AdaptiveScheduler)


def test_moving_stats_converges():
    ms = moving_stats.MovingStats.create(())
    key = jax.random.PRNGKey(0)
    for i in range(200):
        key, k = jax.random.split(key)
        x = 3.0 + 2.0 * jax.random.normal(k, (256,))
        ms = moving_stats.update_mean_std(ms, x, decay=0.95)
    assert abs(float(ms.center) - 3.0) < 0.2
    assert abs(float(ms.scale) - 2.0) < 0.2


def test_segment_trees():
    st = replay.SumSegmentTree(8)
    st[np.arange(8)] = np.array([1, 2, 3, 4, 0, 0, 0, 0], float)
    assert st.reduce() == pytest.approx(10.0)
    idx = st.find_prefixsum_idx([0.5, 2.5, 9.5])
    np.testing.assert_array_equal(idx, [0, 1, 3])
    mt = replay.MinSegmentTree(8)
    mt[np.arange(4)] = np.array([5, 2, 7, 3], float)
    assert mt.reduce() == pytest.approx(2.0)


def test_prioritized_replay():
    buf = replay.PrioritizedReplayBuffer(64, alpha=0.6, obs_shape=(3,),
                                         action_shape=(2,))
    rng = np.random.default_rng(0)
    for i in range(100):
        buf.add(np.full(3, i % 64, np.float32), np.zeros(2), float(i),
                np.zeros(3), 0.0)
    obs, act, rew, nobs, dones, w, idx = buf.sample(16, beta=0.4, rng=rng)
    assert obs.shape == (16, 3) and w.shape == (16,)
    buf.update_priorities(idx, np.full(16, 2.0))
    assert buf._max_priority == 2.0


def test_vectorized_replay_jit():
    vb = replay.VectorizedReplayBuffer((4,), (2,), capacity=32)
    st = vb.create()

    @jax.jit
    def add(st, i):
        n = 8
        obs = jnp.full((n, 4), i, jnp.float32)
        return vb.add(st, obs, jnp.zeros((n, 2)), jnp.zeros(n),
                      obs + 1, jnp.zeros(n))

    for i in range(6):   # 48 adds -> wraps the 32-ring
        st = add(st, i)
    assert bool(st.full)
    obs, act, rew, nobs, dones = vb.sample(st, jax.random.PRNGKey(0), 16)
    assert obs.shape == (16, 4)
    # oldest entries (value 0) are overwritten
    assert float(st.obs.min()) >= 1.0


def test_tensor_pid():
    pid = tensor_pid.TensorPID(kp=1.0, ki=0.5, kd=0.1, integral_lim=1.0,
                               derivative_lim=10.0, output_lim=2.0)
    st = pid.init((4, 3))
    err = jnp.ones((4, 3))
    out, st = pid.step(st, err, 0.01)
    assert out.shape == (4, 3)
    st = pid.reset(st, jnp.array([True, False, False, False]))
    np.testing.assert_allclose(np.array(st.integral[0]), 0.0)
    assert float(st.integral[1, 0]) > 0.0


def test_class_to_dict():
    import dataclasses

    @dataclasses.dataclass
    class Inner:
        a: int = 1

    @dataclasses.dataclass
    class Outer:
        inner: Inner = dataclasses.field(default_factory=Inner)
        b: float = 2.0

    d = helpers.class_to_dict(Outer())
    assert d == {"inner": {"a": 1}, "b": 2.0}


def test_vecenv_glue():
    from airgym_tpu.rl import vecenv
    env = vecenv.create_vec_env("hovering", 8, ctl_mode="rate",
                                obs_noise=False)
    info = env.get_env_info()
    assert info["action_space"].shape == (4,)
    assert info["observation_space"].shape == (18,)
    assert info["agents"] == 1
    obs = env.reset()
    assert obs.shape == (8, 18)
    obs, rew, reset, extras = env.step(jnp.zeros((8, 4)))
    assert "time_outs" in extras


def test_dataset_list():
    dl = tr_helpers.DatasetList()
    dl.add({"a": np.arange(4), "b": np.ones(4)})
    dl.add({"a": np.arange(4, 8), "b": np.zeros(4)})
    cat = dl.concat()
    np.testing.assert_array_equal(cat["a"], np.arange(8))
    mbs = list(dl.minibatches(4))
    assert len(mbs) == 2
    np.testing.assert_array_equal(mbs[1]["a"], np.arange(4, 8))
    dl.clear()
    assert dl.datasets == []
