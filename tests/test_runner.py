"""End-to-end runner tests: YAML -> train a few epochs -> checkpoint ->
play (reference call stacks 3.1/3.2)."""
import os

import jax
import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_cfg(**updates):
    with open(os.path.join(REPO,
                           "airgym_tpu/configs/ppo_hovering.yaml")) as f:
        cfg = yaml.safe_load(f)
    c = cfg["params"]["config"]
    c.update({"num_actors": 16, "horizon_length": 8, "minibatch_size": 32,
              "max_epochs": 3, "save_frequency": 0, "mini_epochs": 2})
    c.update(updates)
    return cfg


def test_yaml_parsing_matches_reference_schema():
    from airgym_tpu.rl import runner as rmod
    cfg = tiny_cfg()
    pcfg = rmod.ppo_config_from_params(cfg["params"])
    assert pcfg.gamma == 0.99
    assert pcfg.reward_shaper_scale == 0.1
    assert pcfg.kl_threshold == 0.008
    nkw = rmod.network_kw_from_params(cfg["params"])
    assert nkw["units"] == (64, 128, 64)
    assert nkw["activation"] == "elu"


def test_cnn_vae_network_kw():
    from airgym_tpu.rl import runner as rmod
    params = {"network": {"mlp": {"units": [64], "activation": "relu"},
                          "cnn": {"output_dim": 30}}}
    kw = rmod.network_kw_from_params(params)
    assert kw["image_encoder"] == "cnn" and kw["image_feature_dim"] == 30
    params = {"network": {"vae": {"latent_dims": 64}}}
    kw = rmod.network_kw_from_params(params)
    assert kw["image_encoder"] == "vae" and kw["vae_latent_dim"] == 64


def test_train_and_play_roundtrip(tmp_path):
    from airgym_tpu.rl.runner import Runner
    runner = Runner().load(tiny_cfg())
    ts, result = runner.run({"train": True, "task": "hovering",
                             "ctl_mode": "rate", "num_envs": 16,
                             "seed": 3, "run_root": str(tmp_path)})
    assert result["epochs"] == 3
    run_dir = result["run_dir"]
    last = os.path.join(run_dir, "nn", "last_ppo_hovering.ckpt")
    assert os.path.exists(last)
    assert os.path.exists(last.replace(".ckpt", ".pth"))
    # events were logged
    assert os.path.getsize(os.path.join(run_dir, "events.jsonl")) > 0

    out = Runner().load(tiny_cfg()).run(
        {"train": False, "task": "hovering", "ctl_mode": "rate",
         "num_envs": 8, "checkpoint": last, "max_steps": 100, "seed": 0})
    assert np.isfinite(out["mean_reward"])


def test_in_training_viz_dump(tmp_path):
    """config.viz_every_epochs: periodic headless episode dumps mid-run
    (the reference viewer's function, base_task.py:84-95, without a
    display)."""
    from airgym_tpu.rl.runner import Runner
    cfg = tiny_cfg(viz_every_epochs=2, max_epochs=4)
    runner = Runner().load(cfg)
    ts, result = runner.run({"train": True, "task": "hovering",
                             "ctl_mode": "rate", "num_envs": 16,
                             "seed": 3, "run_root": str(tmp_path),
                             "log_every": 1})
    viz = os.path.join(result["run_dir"], "viz")
    dumps = sorted(os.listdir(viz))
    assert dumps == ["epoch_000002", "epoch_000004"], dumps
    for d in dumps:
        assert os.path.exists(os.path.join(viz, d, "trajectory.png"))
        assert os.path.exists(os.path.join(viz, d, "episode.npz"))


def test_cli_parses_reference_flags():
    import scripts.runner as sr
    args = sr.get_args(["--task", "hovering", "--ctl_mode", "rate",
                        "--train", "--num_envs", "64", "--seed", "7"])
    assert args.task == "hovering" and args.num_envs == 64
    cfg = tiny_cfg()
    cfg = sr.update_config(cfg, args)
    assert cfg["params"]["config"]["num_actors"] == 64
    assert cfg["params"]["seed"] == 7


def test_fused_rollout_flag_selects_trainer(monkeypatch):
    import types

    from airgym_tpu.rl import runner as runner_mod
    from airgym_tpu.rl.runner import Runner
    from airgym_tpu.rl.fused_ppo import FusedHoveringPPO
    # the fused kernel is single-device only; fake a 1-device mesh (the
    # conftest backend exposes 8 virtual devices)
    monkeypatch.setattr(
        runner_mod.pmesh, "make_mesh",
        lambda: types.SimpleNamespace(devices=np.zeros((1,))))
    cfg = tiny_cfg()
    cfg["params"]["config"]["use_fused_rollout"] = True
    r = Runner().load(cfg)
    _, trainer, _ = r._build({"task": "hovering", "ctl_mode": "rate",
                              "num_envs": 1024})
    assert isinstance(trainer, FusedHoveringPPO)
    # falls back to the standard trainer when preconditions don't hold
    _, trainer, _ = r._build({"task": "hovering", "ctl_mode": "rate",
                              "num_envs": 48})
    assert not isinstance(trainer, FusedHoveringPPO)


def test_shipped_yamls_engage_fused_trainer(monkeypatch):
    """VERDICT r4 next #3: the packaged hovering/tracking/balloon YAMLs
    ship use_fused_rollout on, so the default install trains on the
    fused-kernel fast path whenever every mesh shard gets a whole number
    of kernel tiles; otherwise the runner falls back to the XLA rollout
    (which shards at any batch size)."""
    import os
    import types

    import numpy as np
    import yaml

    from airgym_tpu.rl import fused_ppo
    from airgym_tpu.rl import runner as runner_mod
    from airgym_tpu.rl.runner import Runner
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = {"ppo_hovering.yaml": fused_ppo.FusedHoveringPPO,
                "ppo_tracking.yaml": fused_ppo.FusedTrackingPPO,
                "ppo_balloon.yaml": fused_ppo.FusedBalloonPPO}
    for name, cls in expected.items():
        cfg = yaml.safe_load(open(os.path.join(
            repo, "airgym_tpu", "configs", name)))
        r = Runner().load(cfg)
        # conftest backend = 8 virtual devices: 1024 envs cannot give
        # every shard a whole tile -> XLA fallback ...
        _, trainer, _ = r._build({"ctl_mode": "rate", "num_envs": 1024})
        assert not isinstance(trainer, cls), (
            f"{name}: 1024 envs / 8 devices must fall back")
        # ... while 8x1024 engages the shard_map-wrapped kernel
        _, trainer, _ = r._build({"ctl_mode": "rate", "num_envs": 8192})
        assert isinstance(trainer, cls), f"{name} @ 8192/8dev"
        # single-device mesh -> engages at 1024
        monkeypatch.setattr(
            runner_mod.pmesh, "make_mesh",
            lambda: types.SimpleNamespace(devices=np.zeros((1,))))
        _, trainer, _ = r._build({"ctl_mode": "rate", "num_envs": 1024})
        assert isinstance(trainer, cls), name
        monkeypatch.undo()


def test_train_play_dispatch_matches_reference():
    """torch_runner.py:95-101: --train -> train; --play -> play; NO flag
    -> train (the reference's else branch); both -> train wins."""
    import scripts.runner as sr
    base = ["--task", "hovering", "--ctl_mode", "rate"]
    assert sr.resolve_train(sr.get_args(base + ["--train"]))
    assert not sr.resolve_train(sr.get_args(base + ["--play"]))
    assert sr.resolve_train(sr.get_args(base))
    assert sr.resolve_train(sr.get_args(base + ["--train", "--play"]))


def test_player_games_num_early_stop():
    """Reference players.py:204-290 plays n_games episodes then stops;
    the batched evaluator counts episode completions via reset flags and
    stops at the chunk boundary after reaching games_num."""
    import airgym_tpu.envs as envs
    from airgym_tpu.rl import ppo as ppo_mod
    from airgym_tpu.rl.runner import Player

    task = envs.make_task("hovering", ctl_mode="rate", num_envs=8)
    trainer = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,
                                                  minibatch_size=16))
    player = Player(task, trainer)
    # random policy crashes fast: with chunk=50 the first chunks already
    # complete episodes, so games_num=1 must stop well before 1000 steps
    out = player.run(max_steps=1000, seed=0, chunk=50, games_num=1)
    assert out["games"] >= 1
    assert out["steps"] < 1000


def test_env_config_passthrough_and_use_image_check():
    """YAML config.env_config kwargs reach env construction like the
    reference (a2c_base.py:134-139 create_vec_env(**env_config));
    use_image must agree with the task's obs structure (vecenv.py:72,93)."""
    from airgym_tpu.rl.runner import Runner
    cfg = tiny_cfg()
    cfg["params"]["config"]["env_config"] = {
        "use_image": False, "seed": 5, "episode_length_s": 12.0}
    task, _, _ = Runner().load(cfg)._build(
        {"task": "hovering", "ctl_mode": "rate", "num_envs": 16})
    assert task.cfg.episode_length_s == 12.0

    cfg["params"]["config"]["env_config"] = {"use_image": True}
    with pytest.raises(ValueError, match="use_image"):
        Runner().load(cfg)._build(
            {"task": "hovering", "ctl_mode": "rate", "num_envs": 16})

    # unknown env kwargs fail loudly, not silently
    cfg["params"]["config"]["env_config"] = {"no_such_field": 1}
    with pytest.raises(TypeError):
        Runner().load(cfg)._build(
            {"task": "hovering", "ctl_mode": "rate", "num_envs": 16})


def test_separate_and_nonfixed_sigma(tmp_path):
    """network.separate (reference model :38-50) and
    space.continuous.fixed_sigma: False (:60-62) train and round-trip
    through the .pth bridge with the reference key layout."""
    import torch
    from airgym_tpu.rl import runner as rmod
    cfg = tiny_cfg()
    net = cfg["params"]["network"]
    net["separate"] = True
    net["space"]["continuous"]["fixed_sigma"] = False
    kw = rmod.network_kw_from_params(cfg["params"])
    assert kw["separate"] is True and kw["fixed_sigma"] is False

    runner = rmod.Runner().load(cfg)
    ts, result = runner.run({"train": True, "task": "hovering",
                             "ctl_mode": "rate", "num_envs": 16,
                             "seed": 3, "run_root": str(tmp_path)})
    assert result["epochs"] == 3
    pth = os.path.join(result["run_dir"], "nn", "last_ppo_hovering.pth")
    sd = torch.load(pth, map_location="cpu", weights_only=False)["model"]
    assert "critic_mlp.layers.0.weight" in sd
    assert "logstd.weight" in sd and "logstd.bias" in sd
    assert "logstd" not in sd
    # same-architecture reload through the torch bridge
    out = rmod.Runner().load(cfg).run(
        {"train": False, "task": "hovering", "ctl_mode": "rate",
         "num_envs": 8, "checkpoint": pth, "max_steps": 100, "seed": 0})
    assert np.isfinite(out["mean_reward"])


def test_separate_vision_rejected():
    """The reference's separate+vision branch is broken (model :85-95);
    we refuse it loudly instead."""
    import airgym_tpu.envs as envs
    from airgym_tpu.rl import ppo as ppo_mod
    task = envs.make_task("planning", ctl_mode="rate", num_envs=4,
                          num_trees=6, cam_width=64, cam_height=32)
    trainer = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,
                                                  minibatch_size=8),
                          network_kw={"image_encoder": "cnn",
                                      "separate": True})
    with pytest.raises(ValueError, match="separate"):
        trainer.init(jax.random.PRNGKey(0))


def test_experiment_name_overrides_run_name():
    """reference runner.py:24-25: --experiment_name -> config.name."""
    import scripts.runner as sr
    args = sr.get_args(["--task", "hovering", "--ctl_mode", "rate",
                        "--experiment_name", "myexp"])
    cfg = sr.update_config(tiny_cfg(), args)
    assert cfg["params"]["config"]["name"] == "myexp"


def test_best_success_checkpoint(tmp_path, monkeypatch):
    """has_success tasks keep a best-by-success ckpt alongside the
    best-by-reward one: the reward optimum can drift away from the
    task-achievement optimum (survive-vs-reach), so the highest-success
    policy must survive the best-reward overwrite."""
    from airgym_tpu.rl import ppo as ppo_mod
    from airgym_tpu.rl.runner import Runner

    rates = iter([0.0, 0.6, 0.3])   # peak at epoch 2, decay after
    orig = ppo_mod.PPO.make_train_epoch

    def wrapped(self, donate=None):
        step = orig(self, donate=donate)

        def step_with_success(ts):
            ts, m = step(ts)
            m = dict(m)
            m["success_rate"] = jax.numpy.asarray(next(rates))
            return ts, m
        return step_with_success

    monkeypatch.setattr(ppo_mod.PPO, "make_train_epoch", wrapped)
    runner = Runner().load(tiny_cfg(save_best_after=1))
    ts, result = runner.run({"train": True, "task": "hovering",
                             "ctl_mode": "rate", "num_envs": 16,
                             "seed": 3, "run_root": str(tmp_path)})
    assert abs(result["best_success"] - 0.6) < 1e-6
    best = os.path.join(result["run_dir"], "nn",
                        "ppo_hovering_best_success.ckpt")
    assert os.path.exists(best)
