"""Checkpoint tests: native round-trip, .pth export/import, and loading
the reference's shipped trained/planning_cnn_rate.pth (AirGym-Real
compatibility)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airgym_tpu.envs as envs
from airgym_tpu.models import actor_critic as ac
from airgym_tpu.rl import checkpoint as ckpt
from airgym_tpu.rl import ppo as ppo_mod

REF_CKPT = "/root/reference/trained/planning_cnn_rate.pth"


def mlp_trainer(n=8):
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=n,
                          obs_noise=False)
    return ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4, minibatch_size=16))


def test_native_roundtrip(tmp_path):
    tr = mlp_trainer()
    ts = tr.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.pkl")
    ckpt.save(path, ts, extra={"note": "test"})
    ts2, extra = ckpt.load(path)
    assert extra["note"] == "test"
    a = jax.tree.leaves(ts.params)
    b = jax.tree.leaves(ts2["params"] if isinstance(ts2, dict) else
                        ts2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_pth_export_import_roundtrip(tmp_path):
    tr = mlp_trainer()
    ts = tr.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "ck.pth")
    ckpt.export_pth(path, ts)

    params2, obs_rms2, value_rms2, meta = ckpt.import_pth(
        path, ts.params, ts.obs_rms, ts.value_rms)
    for x, y in zip(jax.tree.leaves(ts.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts.obs_rms.mean),
                               np.asarray(obs_rms2.mean), atol=1e-6)
    # forward pass agrees
    obs = jnp.ones((3, 18))
    m1 = tr.model.apply(ts.params, obs)
    m2 = tr.model.apply(params2, obs)
    np.testing.assert_allclose(np.asarray(m1[0]), np.asarray(m2[0]),
                               atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkpoint not present")
def test_load_reference_planning_checkpoint():
    """The shipped rl_games-format planning CNN checkpoint must load into
    our Planning model and produce finite actions."""
    task = envs.make_task("planning", ctl_mode="rate", num_envs=2,
                          obs_noise=False, num_trees=6)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=2, minibatch_size=4),
                     network_kw={"image_encoder": "cnn",
                                 "image_feature_dim": 30})
    ts = tr.init(jax.random.PRNGKey(0))
    params, obs_rms, value_rms, meta = ckpt.import_pth(
        REF_CKPT, ts.params, ts.obs_rms, ts.value_rms)
    assert meta["epoch"] > 0
    obs = {"image": jnp.full((2, 1, 212, 120), 0.5),
           "observation": jnp.zeros((2, 16))}
    mu, sigma, value = tr.model.apply(params, obs, obs_rms)
    assert mu.shape == (2, 4)
    assert bool(jnp.all(jnp.isfinite(mu)))
    assert bool(jnp.all(jnp.isfinite(value)))


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkpoint not present")
def test_mlp_to_cnn_partial_transfer(tmp_path):
    """Reference a2c_continuous.py:423-471: an MLP-only hovering checkpoint
    warm-starts a CNN planning model (mismatched first layer stays fresh)."""
    tr_mlp = mlp_trainer()
    ts_mlp = tr_mlp.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "mlp.pth")
    ckpt.export_pth(path, ts_mlp)

    task = envs.make_task("planning", ctl_mode="rate", num_envs=2,
                          obs_noise=False, num_trees=6)
    tr_cnn = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=2,
                                                 minibatch_size=4),
                         network_kw={"image_encoder": "cnn",
                                     "image_feature_dim": 30})
    ts_cnn = tr_cnn.init(jax.random.PRNGKey(3))
    params, obs_rms, _, _ = ckpt.import_pth(
        path, ts_cnn.params, ts_cnn.obs_rms, ts_cnn.value_rms)
    # logstd transferred
    np.testing.assert_allclose(
        np.asarray(params["params"]["logstd"]),
        np.asarray(ts_mlp.params["params"]["logstd"]), atol=1e-6)
    # first MLP layer kept fresh (shape differs: 18 vs 46 inputs)
    assert params["params"]["actor_mlp"]["Dense_0"]["kernel"].shape[0] == 46
    # later layers transferred from the MLP checkpoint
    np.testing.assert_allclose(
        np.asarray(params["params"]["actor_mlp"]["Dense_1"]["kernel"]),
        np.asarray(ts_mlp.params["params"]["actor_mlp"]["Dense_1"]
                   ["kernel"]), atol=1e-6)


def test_pth_roundtrip_dict_obs(tmp_path):
    """CNN model + dict obs running stats export/import (the
    running_mean_std.running_mean_std.{image,observation} key family)."""
    task = envs.make_task("planning", ctl_mode="rate", num_envs=2,
                          obs_noise=False, num_trees=6)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=2, minibatch_size=4),
                     network_kw={"image_encoder": "cnn",
                                 "image_feature_dim": 30})
    ts = tr.init(jax.random.PRNGKey(5))
    path = str(tmp_path / "cnn.pth")
    ckpt.export_pth(path, ts)

    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]
    assert "actor_cnn.features.0.weight" in sd
    assert "running_mean_std.running_mean_std.image.running_mean" in sd
    assert sd["running_mean_std.running_mean_std.observation."
              "running_mean"].shape == (46,)

    params2, obs_rms2, value_rms2, _ = ckpt.import_pth(
        path, ts.params, ts.obs_rms, ts.value_rms)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts.obs_rms["image"].mean),
                               np.asarray(obs_rms2["image"].mean),
                               atol=1e-6)


@pytest.mark.skipif(not os.path.isdir("/root/reference/lib"),
                    reason="reference repo not mounted")
def test_reference_torch_model_loads_our_export(tmp_path):
    """Ultimate sim-to-real proof: the reference's OWN torch model class
    loads our exported .pth and produces the same policy outputs."""
    import sys
    import types
    import torch

    # the reference imports torchvision at module load; stub it (absent
    # in this image, and the CNN path does not use it) — and clean the
    # stub back out so other tests see the real import state
    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet18 = lambda *a, **k: None
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    sys.path.insert(0, "/root/reference")
    try:
        from lib.model.a2c_continuous_logstd_model import \
            ModelA2CContinuousLogStd
    finally:
        sys.path.remove("/root/reference")
        if stubbed:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.models", None)

    task = envs.make_task("planning", ctl_mode="rate", num_envs=2,
                          obs_noise=False, num_trees=6)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=2, minibatch_size=4),
                     network_kw={"image_encoder": "cnn",
                                 "image_feature_dim": 30})
    ts = tr.init(jax.random.PRNGKey(7))
    path = str(tmp_path / "ours.pth")
    ckpt.export_pth(path, ts)

    params = {"network": {"name": "actor_critic", "separate": False,
                          "space": {"continuous": {"fixed_sigma": True}},
                          "mlp": {"units": [64, 128, 64],
                                  "activation": "elu"},
                          "cnn": {"output_dim": 30}},
              "config": {"normalize_value": True, "normalize_input": True,
                         "value_size": 1}}
    keys = {"actions_num": 4,
            "input_shape": {"image": (1, 212, 120), "observation": (16,)},
            "num_seqs": 2, "value_size": 1}
    model = ModelA2CContinuousLogStd(params, keys)
    state = torch.load(path, map_location="cpu", weights_only=False)
    model.load_state_dict(state["model"])          # must accept all keys
    model.eval()

    obs_t = {"image": torch.full((2, 1, 212, 120), 0.5),
             "observation": torch.zeros(2, 16)}
    with torch.no_grad():
        out = model({"is_train": False, "prev_actions": None,
                     "obs": obs_t})
    obs_j = {"image": jnp.full((2, 1, 212, 120), 0.5),
             "observation": jnp.zeros((2, 16))}
    mu_j, _, _ = tr.model.apply(ts.params, obs_j, ts.obs_rms)
    np.testing.assert_allclose(out["mus"].numpy(), np.array(mu_j),
                               atol=2e-4)
