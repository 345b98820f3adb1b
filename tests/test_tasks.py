"""Contract tests for Balloon, Tracking, Avoid, Planning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airgym_tpu.envs as envs

N = 8


def rollout(task, steps=6, key=0):
    s = task.initial_state(jax.random.PRNGKey(key))
    step = jax.jit(task.step)
    outs = []
    a = jnp.zeros((task.cfg.num_envs, task.cfg.num_actions))
    for _ in range(steps):
        s, out = step(s, a)
        outs.append(out)
    return s, outs


def test_registry_has_all_tasks():
    names = envs.registered_tasks()
    for t in ["hovering", "balloon", "tracking", "avoid", "planning"]:
        assert t in names, names


def test_balloon_contract():
    task = envs.make_task("balloon", ctl_mode="rate", num_envs=N,
                          obs_noise=False)
    s, outs = rollout(task)
    out = outs[-1]
    assert out.obs.shape == (N, 18)
    assert out.priv_obs.shape == (N, 1, 13)
    expected = {"guidance_reward", "hit_reward", "action_smoothness_reward",
                "effort_reward", "ups_reward", "reward", "success"}
    assert expected == set(out.info)
    assert bool(jnp.all(jnp.isfinite(out.reward)))
    # balloon x in [2, 3]
    assert float(s.balloon[:, 0].min()) >= 2.0
    assert float(s.balloon[:, 0].max()) <= 3.0


def test_balloon_hit_gives_800():
    task = envs.make_task("balloon", ctl_mode="rate", num_envs=N,
                          obs_noise=False)
    s = task.initial_state(jax.random.PRNGKey(0))
    # teleport env 0 onto the balloon
    root = s.core.root.at[0, 0:3].set(s.balloon[0, 0:3])
    root = root.at[0, 7].set(0.1)  # moving forward (vx>0 kill rule)
    s = s._replace(core=s.core._replace(root=root,
                                        reset_buf=jnp.zeros(N, bool)))
    s2, out = jax.jit(task.step)(s, jnp.zeros((N, 4)))
    assert float(out.info["hit_reward"][0]) == 800.0
    assert bool(out.reset[0])
    # task achievement: the hit IS the success signal
    assert bool(out.info["success"][0])


def test_tracking_contract():
    task = envs.make_task("tracking", ctl_mode="rate", num_envs=N,
                          obs_noise=False)
    s, outs = rollout(task)
    out = outs[-1]
    assert out.obs.shape == (N, 48)
    assert "dist_norm" in out.info
    # reference trajectory starts near (0, 0, 1): rel-future obs magnitudes
    # are small at episode start
    assert bool(jnp.all(jnp.isfinite(out.obs)))


def test_tracking_lemniscate_shape():
    task = envs.make_task("tracking", ctl_mode="rate", num_envs=2)
    ref = task.ref_trajectory(jnp.zeros((2,), jnp.int32))
    assert ref.shape == (2, 10, 3)
    np.testing.assert_allclose(ref[:, :, 2], 1.0)
    np.testing.assert_allclose(ref[0, 0, 0:2], 0.0, atol=1e-6)
    # quarter period t = pi/2 -> x = 3, y = 0
    prog = jnp.full((2,), int((np.pi / 2) / (0.01 * 0.25)), jnp.int32)
    ref = task.ref_trajectory(prog)
    np.testing.assert_allclose(ref[0, 0], [3.0, 0.0, 1.0], atol=1e-2)


def test_avoid_contract():
    task = envs.make_task("avoid", ctl_mode="rate", num_envs=N,
                          obs_noise=False)
    s, outs = rollout(task, steps=5)
    out = outs[-1]
    assert set(out.obs) == {"image", "observation"}
    assert out.obs["observation"].shape == (N, 16)
    assert out.obs["image"].shape == (N, 1, 212, 120)
    assert "alive_reward" in out.info
    # the thrown cube moves toward the drone (for non-parked envs)
    moving = np.array(s.obj[:, 0]) > -100
    if moving.any():
        assert bool(jnp.all(jnp.isfinite(s.obj)))


def test_avoid_cube_collision_kills():
    task = envs.make_task("avoid", ctl_mode="rate", num_envs=N,
                          obs_noise=False)
    s = task.initial_state(jax.random.PRNGKey(1))
    obj = s.obj.at[0, 0:3].set(s.core.root[0, 0:3])  # cube on the drone
    s = s._replace(obj=obj,
                   core=s.core._replace(reset_buf=jnp.zeros(N, bool)))
    s2, out = jax.jit(task.step)(s, jnp.zeros((N, 4)))
    assert float(out.info["alive_reward"][0]) == -500.0
    assert bool(out.reset[0])
    # dying to the cube is NOT a success
    assert not bool(out.info["success"][0])


def test_avoid_timeout_is_success():
    """Surviving the throw to the 6 s episode cap emits success=True
    (reference avoid.py:259: the task is achieved iff nothing killed the
    drone before timeout)."""
    task = envs.make_task("avoid", ctl_mode="rate", num_envs=N,
                          obs_noise=False)
    s = task.initial_state(jax.random.PRNGKey(2))
    progress = jnp.full((N,), task.cfg.max_episode_length - 2, jnp.int32)
    s = s._replace(core=s.core._replace(progress=progress,
                                        reset_buf=jnp.zeros(N, bool)))
    s2, out = jax.jit(task.step)(s, jnp.zeros((N, 4)))
    alive = ~np.array(out.info["alive_reward"] < 0)  # envs the cube missed
    assert alive.any()
    np.testing.assert_array_equal(np.array(out.info["success"]),
                                  np.array(out.timeout))
    assert np.array(out.info["success"])[alive].all()
    assert np.array(out.reset).all()


def test_planning_contract():
    task = envs.make_task("planning", ctl_mode="rate", num_envs=4,
                          obs_noise=False)
    s, outs = rollout(task, steps=5, key=3)
    out = outs[-1]
    assert out.obs["observation"].shape == (4, 16)
    assert out.obs["image"].shape == (4, 1, 212, 120)
    for k in ["heading_reward", "esdf_reward", "reach_goal_reward",
              "forward_reward", "alive_reward"]:
        assert k in out.info, k
    # after 4+ steps the camera has rendered at least once: image nonzero
    assert float(jnp.abs(out.obs["image"]).max()) > 0.0
    # drone starts at the corridor entrance aimed at the goal
    assert bool(jnp.all(jnp.isfinite(out.reward)))
    # privileged obs = env-asset root states [N, 1 ball + 40 trees, 13]
    # (reference customized.py:77-83, planning.py:42-47)
    assert out.priv_obs.shape == (4, 41, 13)
    np.testing.assert_allclose(np.asarray(out.priv_obs[:, 0, 0:3]),
                               np.asarray(s.goal), atol=1e-6)
    # trees sit at z=0 with unit yaw-about-z quats, zero velocity
    assert float(jnp.abs(out.priv_obs[:, 1:, 2]).max()) == 0.0
    qn = jnp.linalg.norm(out.priv_obs[:, 1:, 3:7], axis=-1)
    np.testing.assert_allclose(np.asarray(qn), 1.0, atol=1e-5)
    assert float(jnp.abs(out.priv_obs[:, :, 7:]).max()) == 0.0


def test_planning_reach_goal():
    # num_trees=6: the reach-goal reward doesn't depend on forest size,
    # and the 40-tree unrolled render chain dominates CPU compile time
    task = envs.make_task("planning", ctl_mode="rate", num_envs=4,
                          obs_noise=False, num_trees=6)
    s = task.initial_state(jax.random.PRNGKey(4))
    root = s.core.root.at[0, 0:3].set(s.goal[0])
    s = s._replace(core=s.core._replace(root=root,
                                        reset_buf=jnp.zeros(4, bool)))
    s2, out = jax.jit(task.step)(s, jnp.zeros((4, 4)))
    assert float(out.info["reach_goal_reward"][0]) == 200.0
    assert bool(out.reset[0])


def test_planning_vae_encoder_trains():
    """The third encoder family (VAE latent obs) trains end to end."""
    from airgym_tpu.rl import ppo as ppo_mod
    task = envs.make_task("planning", ctl_mode="rate", num_envs=4,
                          obs_noise=False, num_trees=6,
                          cam_width=64, cam_height=32)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4, minibatch_size=8),
                     network_kw={"image_encoder": "vae",
                                 "vae_latent_dim": 64})
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch(donate=False)
    ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))
    assert ts.obs_rms["observation"].mean.shape == (16 + 64,)


@pytest.mark.parametrize("name", ["avoid", "planning", "customized",
                                  "maplanning"])
def test_static_render_flag_matches_dynamic_cadence(name):
    """step(render=True/False) must equal the render=None lax.cond path
    step-for-step when the static schedule follows the counter cadence
    (the contract the frame-dedup rollout relies on)."""
    kw = {"num_envs": 2, "cam_width": 64, "cam_height": 32}
    if name == "planning":
        kw["num_trees"] = 6     # cadence contract is scene-size-agnostic
    task = envs.make_task(name, ctl_mode="vel", **kw)
    ce = task.cfg.cam_every
    s_dyn = task.initial_state(jax.random.PRNGKey(11))
    s_sta = task.initial_state(jax.random.PRNGKey(11))
    a = jnp.zeros((getattr(task, "flat_n", task.cfg.num_envs),
                   task.cfg.num_actions))
    step = jax.jit(task.step)
    step_r = jax.jit(lambda s, a: task.step(s, a, render=True))
    step_n = jax.jit(lambda s, a: task.step(s, a, render=False))
    for i in range(2 * ce):
        s_dyn, out_d = step(s_dyn, a)
        render = (int(s_dyn.counter) % ce) == 0
        s_sta, out_s = (step_r if render else step_n)(s_sta, a)
        # allclose, not equal: the cond-wrapped render compiles in a
        # different fusion context than the direct call, giving
        # ULP-level (~4e-6) float differences on identical math
        assert jnp.allclose(s_dyn.camera, s_sta.camera,
                            rtol=1e-5, atol=1e-5), (name, i)
        for x, y in zip(jax.tree.leaves(out_d), jax.tree.leaves(out_s)):
            assert jnp.allclose(x, y, rtol=1e-5, atol=1e-5), (name, i)
