"""Hand-computed golden values for individual reward terms, pinning the
reference formulas (hovering.py:371-459, balloon.py:149-215,
planning.py:226-307) against regressions."""
import jax.numpy as jnp
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.envs import base


def test_effort_reward_formula():
    # .1 * sum(1 - cmd)/4 (hovering.py:373-374)
    cmds = jnp.array([[0.2, 0.2, 0.2, 0.2]])
    np.testing.assert_allclose(float(base.effort_reward(cmds)[0]),
                               0.1 * (0.8 * 4) / 4, atol=1e-6)


def test_continuity_rewards_rate_mode():
    # .2*exp(-|d_rate|) + .5/(1+(3*d_thrust)^2); thrust term .1*(1-|.1533-t|)
    a = jnp.array([[0.1, 0.0, 0.0, 0.5]])
    pre = jnp.array([[0.0, 0.0, 0.0, 0.4]])
    cont, thrust = base.continuity_rewards("rate", a, pre)
    exp_cont = 0.2 * np.exp(-0.1) + 0.5 / (1 + (3 * 0.1) ** 2)
    np.testing.assert_allclose(float(cont[0]), exp_cont, atol=1e-5)
    np.testing.assert_allclose(float(thrust[0]),
                               0.1 * (1 - abs(0.1533 - 0.5)), atol=1e-6)


def test_continuity_rewards_pos_mode():
    a = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    pre = jnp.zeros((1, 4))
    cont, thrust = base.continuity_rewards("pos", a, pre)
    np.testing.assert_allclose(float(cont[0]), 0.2 * np.exp(-1.0),
                               atol=1e-6)
    assert thrust is None


def test_pos_reward_curve():
    # .7 / (1 + (1.6 d)^2) at d = 1 (hovering.py:387-390)
    root = jnp.zeros((1, 13)).at[0, 6].set(1.0).at[0, 0].set(1.0)
    root = root.at[0, 7].set(1.0)      # vel toward -x? target at origin
    pos_r, vel_dir_r, rel = base.pos_reward_terms(root,
                                                  jnp.zeros((1, 3)))
    np.testing.assert_allclose(float(pos_r[0]), 0.7 / (1 + 1.6 ** 2),
                               atol=1e-6)
    # velocity points +x, target direction -x: angle pi
    np.testing.assert_allclose(float(vel_dir_r[0]),
                               0.1 * np.exp(-1.0), atol=1e-4)


def test_attitude_terms_level():
    root = jnp.zeros((1, 13)).at[0, 6].set(1.0)
    yaw_r, spin_r, ups_r, ups = base.attitude_reward_terms(
        root, jnp.zeros((1,)))
    np.testing.assert_allclose(float(yaw_r[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(spin_r[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(ups_r[0]), 1.0, atol=1e-5)
    # spinning at 2 rad/s: spinnage 4, reward 1/(1+144)
    root = root.at[0, 12].set(2.0)
    _, spin_r, _, _ = base.attitude_reward_terms(root, jnp.zeros((1,)))
    np.testing.assert_allclose(float(spin_r[0]), 1 / (1 + (3 * 4.0) ** 2),
                               atol=1e-6)


def test_balloon_guidance_reward_value():
    task = envs.make_task("balloon", ctl_mode="rate", num_envs=1,
                          obs_noise=False)
    root = jnp.zeros((1, 13)).at[0, 6].set(1.0).at[0, 2].set(1.0)
    root = root.at[0, 7].set(1.0)       # moving +x (avoids vx<0 kill)
    balloon = jnp.zeros((1, 13)).at[0, 6].set(1.0)
    balloon = balloon.at[0, 0:3].set(jnp.array([2.0, 0.0, 1.0]))
    pre_pos = jnp.array([[-0.5, 0.0, 1.0]])   # was 2.5 m away, now 2.0
    acts = jnp.zeros((1, 4))
    rew, die, info = task._reward(root, balloon, acts, acts, pre_pos,
                                  jnp.zeros((1,), bool))
    np.testing.assert_allclose(float(info["guidance_reward"][0]),
                               30.0 * (2.5 - 2.0), atol=1e-4)
    assert float(info["hit_reward"][0]) == 0.0


def test_planning_speed_and_z_rewards():
    task = envs.make_task("planning", ctl_mode="rate", num_envs=1,
                          obs_noise=False)
    root = jnp.zeros((1, 13)).at[0, 6].set(1.0)
    root = root.at[0, 0:3].set(jnp.array([-8.5, 0.0, 1.5]))
    goal = jnp.array([[8.5, 0.0, 1.5]])
    goal_dir = jnp.array([[1.0, 0.0, 0.0]])
    vel_local = jnp.array([[1.0, 0.0, 0.0]])   # exactly the 1 m/s target
    angvel_local = jnp.zeros((1, 3))
    acts = jnp.zeros((1, 4))
    rew, die, info = task._reward(
        root, acts, acts, jnp.zeros((1, 3)), goal, goal_dir, vel_local,
        angvel_local, esdf=jnp.full((1,), 10.0),
        related_dist=jnp.full((1,), 17.0))
    np.testing.assert_allclose(float(info["speed_reward"][0]), 0.0,
                               atol=1e-6)     # at target speed
    # z = 1.5: min(min(1.5-1.8, 0), 1.2-1.5) = -0.3
    np.testing.assert_allclose(float(info["z_reward"][0]), -0.3,
                               atol=1e-6)
    np.testing.assert_allclose(float(info["heading_reward"][0]), 1.0,
                               atol=1e-6)
    # esdf 10 (far from everything): reward saturates at 0.5, alive 0
    np.testing.assert_allclose(float(info["esdf_reward"][0]), 0.5,
                               atol=1e-6)
    np.testing.assert_allclose(float(info["alive_reward"][0]), 0.0)
    assert not bool(die[0])
