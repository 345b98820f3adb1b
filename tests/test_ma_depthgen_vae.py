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
