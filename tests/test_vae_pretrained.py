"""Pretrained-VAE graft: the reference loads a frozen ``vae_model.pth``
into its VAEImageEncoder at construction (vae_image_encoder.py:17-31) when
the network YAML carries a ``vae:`` block with model_folder/model_file.
Here the graft happens after trainer.init (Runner._maybe_load_pretrained_vae)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make_vae_pth(path, seed=7, latent=64):
    """Random-init flax VAE -> torch-layout .pth via the train_vae exporter."""
    from airgym_tpu.models import vae as jvae
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "train_vae", os.path.join(repo, "scripts", "train_vae.py"))
    tv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tv)
    model = jvae.VAE(latent_dim=latent)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 1, 212, 120)), jax.random.PRNGKey(0))
    tv.export_vae_pth(params, path, latent=latent)
    return params


def test_runner_grafts_pretrained_vae(tmp_path):
    torch = pytest.importorskip("torch")
    from airgym_tpu.rl.runner import Runner
    import airgym_tpu.envs as envs
    from airgym_tpu.rl import ppo as ppo_mod
    from airgym_tpu.rl import runner as rmod

    pth = str(tmp_path / "vae_model.pth")
    src_params = _make_vae_pth(pth)

    params_yaml = {
        "network": {"mlp": {"units": [32], "activation": "elu"},
                    "vae": {"latent_dims": 64,
                            "model_folder": str(tmp_path),
                            "model_file": "vae_model.pth"}},
        "config": {},
    }
    runner = Runner().load({"params": params_yaml})
    task = envs.make_task("planning", ctl_mode="rate", num_envs=4)
    trainer = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,
                                                  minibatch_size=8),
                          network_kw=rmod.network_kw_from_params(params_yaml))
    ts = trainer.init(jax.random.PRNGKey(0))

    before = ts.params["params"]["actor_enc"]["vae"]["encoder"]["conv0"][
        "kernel"]
    ts2 = runner._maybe_load_pretrained_vae(ts)
    after = ts2.params["params"]["actor_enc"]["vae"]["encoder"]["conv0"][
        "kernel"]
    want = src_params["params"]["encoder"]["conv0"]["kernel"]

    assert not np.allclose(np.asarray(before), np.asarray(want))
    np.testing.assert_allclose(np.asarray(after), np.asarray(want),
                               rtol=1e-6)
    # non-VAE weights untouched
    np.testing.assert_array_equal(
        np.asarray(ts.params["params"]["actor_mlp"]["Dense_0"]["kernel"]),
        np.asarray(ts2.params["params"]["actor_mlp"]["Dense_0"]["kernel"]))

    # the grafted model runs: one policy forward on a dict obs
    state = task.initial_state(jax.random.PRNGKey(1))
    _, out = task.step(state, jnp.zeros((4, task.cfg.num_actions)))
    mu, _, _ = trainer.model.apply(ts2.params, out.obs, ts2.obs_rms)
    assert np.isfinite(np.asarray(mu)).all()


def test_encoder_priority_and_guards():
    """Reference model build order resnet > cnn > vae
    (a2c_continuous_logstd_model.py:26-33); return_sampled_latent and
    non-resnet18 types are rejected loudly."""
    from airgym_tpu.rl import runner as rmod

    kw = rmod.network_kw_from_params(
        {"network": {"resnet": {"type": "resnet18", "output_dim": 12},
                     "cnn": {"output_dim": 30},
                     "vae": {"latent_dims": 64}}})
    assert kw["image_encoder"] == "resnet"
    assert kw["image_feature_dim"] == 12

    kw = rmod.network_kw_from_params(
        {"network": {"cnn": {"output_dim": 30}, "vae": {"latent_dims": 64}}})
    assert kw["image_encoder"] == "cnn"

    with pytest.raises(NotImplementedError):
        rmod.network_kw_from_params(
            {"network": {"vae": {"latent_dims": 64,
                                 "return_sampled_latent": True}}})
    with pytest.raises(ValueError):
        rmod.network_kw_from_params(
            {"network": {"resnet": {"type": "resnet50"}}})


def test_runner_grafts_pretrained_resnet(tmp_path):
    torch = pytest.importorskip("torch")
    from airgym_tpu.rl.runner import Runner
    import airgym_tpu.envs as envs
    from airgym_tpu.rl import ppo as ppo_mod
    from airgym_tpu.rl import runner as rmod
    from tests.test_resnet import _torch_resnet18

    net = _torch_resnet18()
    pth = str(tmp_path / "resnet18.pth")
    torch.save(net.state_dict(), pth)

    params_yaml = {
        "network": {"mlp": {"units": [32], "activation": "elu"},
                    "resnet": {"type": "resnet18", "output_dim": 16,
                               "model_folder": str(tmp_path),
                               "model_file": "resnet18.pth"}},
        "config": {},
    }
    runner = Runner().load({"params": params_yaml})
    task = envs.make_task("planning", ctl_mode="rate", num_envs=4)
    trainer = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,
                                                  minibatch_size=8),
                          network_kw=rmod.network_kw_from_params(params_yaml))
    ts = trainer.init(jax.random.PRNGKey(0))

    ts2 = runner._maybe_load_pretrained_vae(ts)
    got = ts2.params["params"]["actor_resnet"]["conv1"]["kernel"]
    want = np.transpose(np.asarray(net.state_dict()["conv1.weight"]),
                        (2, 3, 1, 0)).sum(axis=2, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    # fc head keeps the model's own fresh init
    np.testing.assert_array_equal(
        np.asarray(ts.params["params"]["actor_resnet"]["fc"]["kernel"]),
        np.asarray(ts2.params["params"]["actor_resnet"]["fc"]["kernel"]))


def test_no_vae_block_is_noop():
    from airgym_tpu.rl.runner import Runner
    import airgym_tpu.envs as envs
    from airgym_tpu.rl import ppo as ppo_mod

    runner = Runner().load({"params": {"network": {}, "config": {}}})
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=4)
    trainer = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,
                                                  minibatch_size=8))
    ts = trainer.init(jax.random.PRNGKey(0))
    assert runner._maybe_load_pretrained_vae(ts) is ts
