"""Tests for MAPlanning, DepthGen, and the VAE module."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airgym_tpu.envs as envs
from airgym_tpu.models import vae as jvae


def test_maplanning_contract():
    task = envs.make_task("maplanning", ctl_mode="rate", num_envs=2,
                          obs_noise=False)
    assert task.cfg.num_agents == 4
    n = task.flat_n
    s = task.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    a = jnp.zeros((n, 4))
    for _ in range(5):
        s, out = step(s, a)
    assert out.obs["observation"].shape == (n, 16 + 2 * 4)
    assert out.obs["image"].shape == (n, 1, 212, 120)
    assert out.reward.shape == (n,)
    assert out.reset.shape == (n,)
    # relative-robot channels are zeroed (reference maplanning.py:514)
    np.testing.assert_allclose(np.array(out.obs["observation"][:, 16:]), 0.0)
    assert bool(jnp.all(jnp.isfinite(out.reward)))


def test_maplanning_any_robot_resets_env():
    task = envs.make_task("maplanning", ctl_mode="rate", num_envs=2,
                          obs_noise=False)
    s = task.initial_state(jax.random.PRNGKey(1))
    # push robot 0 of env 0 above the kill ceiling
    root = s.core.root.at[0, 2].set(2.5)
    s = s._replace(core=s.core._replace(
        root=root, reset_buf=jnp.zeros(task.flat_n, bool)))
    s2, out = jax.jit(task.step)(s, jnp.zeros((task.flat_n, 4)))
    assert bool(out.reset[0])           # robot 0 done
    # whole env 0 (robots 0..3) has been re-randomized to the start line
    np.testing.assert_allclose(np.array(s2.core.root[:4, 0]), -8.5,
                               atol=1e-5)


def test_maplanning_env_level_success_info():
    """Env-level episode events for the trainer (VERDICT r4 next #1):
    when ANY robot touches the goal, every robot row of that env reports
    env_success and env_done; per-robot success stays on the toucher."""
    task = envs.make_task("maplanning", ctl_mode="rate", num_envs=2,
                          obs_noise=False, cam_width=24, cam_height=20)
    r = task.cfg.num_robots
    s = task.initial_state(jax.random.PRNGKey(2))
    # teleport robot 1 of env 1 onto env 1's goal ball
    root = s.core.root.at[r + 1, 0:3].set(s.goal[1])
    s = s._replace(core=s.core._replace(
        root=root, reset_buf=jnp.zeros(task.flat_n, bool)))
    _, out = jax.jit(task.step)(s, jnp.zeros((task.flat_n, 4)))
    env_succ = np.array(out.info["env_success"]).reshape(2, r)
    env_done = np.array(out.info["env_done"]).reshape(2, r)
    succ = np.array(out.info["success"]).reshape(2, r)
    assert env_succ[1].all() and not env_succ[0].any()
    assert env_done[1].all() and not env_done[0].any()
    assert succ[1, 1] and succ.sum() == 1


def test_maplanning_trainer_tracks_env_success():
    from airgym_tpu.rl import ppo as ppo_mod
    task = envs.make_task("maplanning", ctl_mode="rate", num_envs=2,
                          obs_noise=False, cam_width=24, cam_height=20)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4, minibatch_size=8),
                     network_kw={"image_encoder": "cnn",
                                 "image_feature_dim": 8})
    ts = tr.init(jax.random.PRNGKey(0))
    assert ts.last_ep_env_success is not None
    assert ts.last_ep_env_success.shape == (task.flat_n,)
    ts = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))
    ts2, _, _, infos = tr.rollout(ts)
    # env_success/env_done are consumed by the tracker, not logged as
    # per-step Episode/ means
    assert "env_success" not in infos and "env_done" not in infos
    assert ts2.last_ep_env_success.shape == (task.flat_n,)


def test_transfer_obs_width_exact():
    """Robot-count curriculum transfer (checkpoint.transfer_obs_width):
    the per-robot obs channels are zeroed (reference maplanning.py:514),
    so a policy padded R2->R4 (and sliced R4->R2) must produce bitwise
    the same outputs on matched inputs."""
    from airgym_tpu.rl import checkpoint as ckpt
    from airgym_tpu.rl import ppo as ppo_mod
    kw = dict(obs_noise=False, cam_width=24, cam_height=20)
    nkw = {"image_encoder": "cnn", "image_feature_dim": 8}
    cfg = ppo_mod.PPOConfig(horizon=4, minibatch_size=8)
    t2 = envs.make_task("maplanning", ctl_mode="rate", num_envs=2,
                        num_robots=2, **kw)
    t4 = envs.make_task("maplanning", ctl_mode="rate", num_envs=2,
                        num_robots=4, **kw)
    tr2 = ppo_mod.PPO(t2, cfg, network_kw=nkw)
    tr4 = ppo_mod.PPO(t4, cfg, network_kw=nkw)
    ts2 = tr2.init(jax.random.PRNGKey(0))
    ts4 = tr4.init(jax.random.PRNGKey(1))

    # make the source stats non-trivial, keeping the zeroed obs channels
    # at their training-time value (always exactly 0)
    k = jax.random.PRNGKey(3)
    batch2 = jax.random.normal(k, (64, 16 + 4 + 8)).at[:, 16:20].set(0.0)
    ts2 = ts2._replace(obs_rms={
        "image": ts2.obs_rms["image"].update(
            jax.random.uniform(k, (5,) + tuple(t2.obs_spec["image"][1:]))),
        "observation": ts2.obs_rms["observation"].update(batch2)})

    img = jax.random.uniform(jax.random.PRNGKey(4), (3, 1, 24, 20))
    vec16 = jax.random.normal(jax.random.PRNGKey(5), (3, 16))
    obs2 = {"image": img,
            "observation": jnp.concatenate([vec16, jnp.zeros((3, 4))], -1)}
    obs4 = {"image": img,
            "observation": jnp.concatenate([vec16, jnp.zeros((3, 8))], -1)}

    # pad R2 -> R4
    ts4b = ckpt.transfer_obs_width(tr4, ts4, ts2, 16 + 4, 16 + 8)
    mu2, sig2, v2 = tr2.model.apply(ts2.params, obs2, ts2.obs_rms)
    mu4, sig4, v4 = tr4.model.apply(ts4b.params, obs4, ts4b.obs_rms)
    np.testing.assert_array_equal(np.array(mu2), np.array(mu4))
    np.testing.assert_array_equal(np.array(v2), np.array(v4))
    np.testing.assert_array_equal(np.array(sig2), np.array(sig4))
    # counters restart, optimizer is fresh
    assert int(ts4b.epoch) == 0

    # slice back R4 -> R2: recover the original outputs exactly
    ts2b = ckpt.transfer_obs_width(tr2, tr2.init(jax.random.PRNGKey(6)),
                                   ts4b, 16 + 8, 16 + 4)
    mu2b, _, v2b = tr2.model.apply(ts2b.params, obs2, ts2b.obs_rms)
    np.testing.assert_array_equal(np.array(mu2), np.array(mu2b))
    np.testing.assert_array_equal(np.array(v2), np.array(v2b))


def test_depthgen_two_step_episodes_and_generate(tmp_path):
    task = envs.make_task("depthgen", ctl_mode="rate", num_envs=4,
                          obs_noise=False)
    assert task.cfg.max_episode_length == 2
    s = task.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    a = jnp.zeros((4, 4))
    s, out = step(s, a)
    assert bool(out.reset.all())        # 2-step episodes: reset every cycle
    n = task.generate(str(tmp_path), n_frames=6, seed=1)
    assert n == 6
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 6
    img = np.load(os.path.join(tmp_path, files[0]))
    assert img.shape == (120, 212)      # saved transposed like reference
    assert np.isfinite(img).all() and img.max() <= 1.0


def test_vae_shapes_and_determinism():
    model = jvae.VAE(latent_dim=64)
    img = jnp.zeros((2, 1, 212, 120))
    params = model.init(jax.random.PRNGKey(0), img)
    recon, mean, logvar, z = model.apply(params, img)
    assert recon.shape == (2, 120, 212, 1)
    assert mean.shape == (2, 64) and z.shape == (2, 64)
    np.testing.assert_allclose(np.array(z), np.array(mean))  # eps=0 infer


def test_vae_encoder_module_frozen():
    enc = jvae.VAEEncoder(latent_dim=64)
    img = jnp.ones((2, 1, 212, 120))
    params = enc.init(jax.random.PRNGKey(0), img)
    out = enc.apply(params, img)
    assert out.shape == (2, 64)
    # frozen: no gradient flows into the VAE weights
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, img) ** 2))(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert total == 0.0


def test_vae_loss_finite():
    model = jvae.VAE(latent_dim=8)
    img = jnp.ones((2, 1, 212, 120)) * 0.5
    params = model.init(jax.random.PRNGKey(0), img)
    recon, mean, logvar, _ = model.apply(params, img,
                                         key=jax.random.PRNGKey(1))
    target = jnp.transpose(jvae._to_image_res(img), (0, 2, 3, 1))
    loss, parts = jvae.vae_loss(recon, target, mean, logvar)
    assert np.isfinite(float(loss))
    assert parts["recon"] >= 0 and parts["kl"] >= 0
