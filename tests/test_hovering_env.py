"""Contract tests for the Hovering task (obs layout, reset rules, rewards,
auto-reset semantics — SURVEY.md 4(c))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airgym_tpu.envs as envs
from airgym_tpu.physics import quadrotor as qd

N = 32


@pytest.fixture(scope="module")
def task():
    return envs.make_task("hovering", ctl_mode="rate", num_envs=N,
                          obs_noise=False)


@pytest.fixture(scope="module")
def jit_step(task):
    return jax.jit(task.step)


def test_obs_shape_and_layout(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(0))
    a = jnp.zeros((N, 4))
    s, out = jit_step(s, a)
    assert out.obs.shape == (N, 18)
    # identity-rotation env at target: obs ~ 0 except residual state
    # cross-check layout: obs[0:9] == R - I for the post-step root
    m = np.array(out.obs[:, 0:9] + np.array(task.target[:, 0:9]))
    root_m = np.array(
        jax.vmap(lambda q: jnp.ravel(
            __import__("airgym_tpu.math.rotations",
                       fromlist=["quat_to_matrix"]).quat_to_matrix(q)))(
                           s.core.root[:, 3:7]))
    # obs was computed pre-reset; only check envs that did not reset
    alive = ~np.array(out.reset)
    if alive.any():
        np.testing.assert_allclose(m[alive], root_m[alive], atol=1e-5)


def test_progress_and_timeout(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(1))
    a = jnp.zeros((N, 4))
    s, out = jit_step(s, a)
    assert s.core.progress.dtype == jnp.int32
    # after the first step progress == 1 for alive envs, 0 for reset ones
    assert int(s.core.progress.max()) <= 1


def test_termination_far_away(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(2))
    # teleport env 0 beyond the 4 m kill radius
    root = s.core.root.at[0, 0].set(10.0)
    s = s._replace(core=s.core._replace(root=root,
                                        reset_buf=jnp.zeros(N, bool)))
    a = jnp.zeros((N, 4))
    s2, out = jit_step(s, a)
    assert bool(out.reset[0])
    # and its state was re-randomized back within bounds
    assert abs(float(s2.core.root[0, 0])) < 2.0


def test_termination_upside_down(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(3))
    # flip env 1 upside down (180 deg about x): quat xyzw = (1,0,0,0)
    root = s.core.root.at[1, 3:7].set(jnp.array([1.0, 0, 0, 0]))
    s = s._replace(core=s.core._replace(root=root,
                                        reset_buf=jnp.zeros(N, bool)))
    s2, out = jit_step(s, jnp.zeros((N, 4)))
    assert bool(out.reset[1])


def test_item_reward_info_keys(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(4))
    _, out = jit_step(s, jnp.zeros((N, 4)))
    expected = {"continous_action_reward", "effort_reward", "thrust_reward",
                "pos_reward", "vel_direction_reward", "ups_reward",
                "spin_reward", "yaw_reward", "reward"}
    assert expected == set(out.info)
    for v in out.info.values():
        assert v.shape == (N,)


def test_hover_near_target_high_reward(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(5))
    # place all envs exactly at the target, level, still
    root = jnp.zeros((N, 13)).at[:, 6].set(1.0)
    s = s._replace(core=s.core._replace(
        root=root, reset_buf=jnp.zeros(N, bool)))
    hov = qd.hover_command(task.params)
    act = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 2 * hov - 1.0]]), (N, 1))
    s, out = jit_step(s, act)
    # pos/yaw/spin/ups rewards all near their maxima:
    # cont(.2+.5) + effort(.1*(1-.15)) + thrust(.1) + pos(.7) + pos*(~2.1)
    assert float(out.reward.mean()) > 2.5
    assert not bool(out.reset.any())


def test_first_step_after_reset_zero_thrust(task, jit_step):
    s = task.initial_state(jax.random.PRNGKey(6))
    # reset_buf starts all-True -> first step must ignore actions (zero
    # rotor commands, reference hovering.py:268): velocity only changes by
    # gravity despite full-thrust action.
    root = jnp.zeros((N, 13)).at[:, 6].set(1.0)
    s = s._replace(core=s.core._replace(root=root))
    act = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (N, 1))
    s2, _ = jit_step(s, act)
    vz = s2.core.root[:, 9]
    alive = ~np.array(s2.core.reset_buf)
    np.testing.assert_allclose(np.array(vz)[alive],
                               -9.81 * 0.01, atol=1e-4)


def test_wrapper_reference_api():
    env = envs.make_env("hovering", ctl_mode="rate", num_envs=8, seed=0)
    obs, priv = env.reset()
    assert obs.shape == (8, 18)
    obs, priv, rew, reset, extras = env.step(jnp.zeros((8, 4)))
    assert rew.shape == (8,)
    assert "time_outs" in extras and "item_reward_info" in extras


def test_rollout_is_finite_and_episodes_cycle(task):
    s = task.initial_state(jax.random.PRNGKey(7))
    hov = qd.hover_command(task.params)

    def body(s, _):
        act = jnp.tile(jnp.array([0.0, 0.0, 0.0, 2 * hov - 1.0]), (N, 1))
        s, out = task.step(s, act)
        return s, (out.reward, out.reset)

    s, (rews, resets) = jax.lax.scan(body, s, None, length=200)
    assert bool(jnp.all(jnp.isfinite(rews)))
    assert bool(jnp.all(jnp.isfinite(s.core.root)))
