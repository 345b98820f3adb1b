"""Vec-env adaptation layer (reference: lib/utils/vecenv.py +
env_configurations.py + ivecenv.py).

Purpose-for-purpose port of the glue between the RL algorithm and the
task layer:
  * a configurations registry mapping env names to creators
    (env_configurations.py:1-33; every task auto-registers like
    vecenv.py:109-120),
  * ``create_vec_env(name, num_actors, **kwargs)`` (vecenv.py:17-19),
  * ``AirGymVecEnv`` with the IVecEnv surface: step / reset /
    get_env_info / get/set_env_state (ivecenv.py:1-35, vecenv.py:69-105),
  * ``ExtractObsWrapper`` dropping privileged obs (vecenv.py:50-67),
  * obs-space synthesis: Dict{image, observation} when the task carries a
    camera, Box otherwise (vecenv.py:90-105); actions are [-1, 1]^n.

Spaces are small local classes (no gym dependency in this image) with the
``.shape`` / ``.low`` / ``.high`` / ``.spaces`` attributes the trainer
consumes.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np

import airgym_tpu.envs as envs


class Box:
    def __init__(self, low, high, shape):
        self.shape = tuple(shape)
        self.low = np.broadcast_to(np.asarray(low, np.float32), self.shape)
        self.high = np.broadcast_to(np.asarray(high, np.float32), self.shape)


class DictSpace:
    def __init__(self, spaces: Dict[str, Any]):
        self.spaces = spaces

    def __getitem__(self, k):
        return self.spaces[k]


configurations: Dict[str, Dict[str, Any]] = {}


def register(name: str, config: Dict[str, Any]) -> None:
    """(env_configurations.py:register)"""
    configurations[name] = config


class ExtractObsWrapper:
    """Drops privileged observations from the step/reset tuples
    (vecenv.py:50-67)."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, item):
        return getattr(self.env, item)

    def reset(self):
        obs, _priv = self.env.reset()
        return obs

    def step(self, actions):
        obs, _priv, rew, reset, extras = self.env.step(actions)
        return obs, rew, reset, extras


class AirGymVecEnv:
    """IVecEnv implementation over a TaskWrapper (vecenv.py:69-105)."""

    def __init__(self, config_name: str, num_actors: int, **kwargs):
        creator = configurations[config_name]["env_creator"]
        self.env = ExtractObsWrapper(creator(num_envs=num_actors, **kwargs))

    def step(self, actions):
        return self.env.step(actions)

    def reset(self):
        return self.env.reset()

    def get_number_of_agents(self) -> int:
        task = self.env.task
        return getattr(task.cfg, "num_agents", 1)

    def get_env_info(self) -> Dict[str, Any]:
        """(vecenv.py:21-47,90-105)"""
        task = self.env.task
        n_act = task.cfg.num_actions
        action_space = Box(-1.0, 1.0, (n_act,))
        if getattr(task, "obs_is_dict", False):
            spec = task.obs_spec
            obs_space = DictSpace({
                "image": Box(-np.inf, np.inf, spec["image"][1:]),
                "observation": Box(-np.inf, np.inf, spec["observation"][1:]),
            })
        else:
            obs_space = Box(-np.inf, np.inf, (task.num_obs,))
        return {
            "observation_space": obs_space,
            "action_space": action_space,
            "agents": self.get_number_of_agents(),
            "value_size": 1,
        }

    def get_env_state(self):
        return None

    def set_env_state(self, state):
        pass


def create_vec_env(name: str, num_actors: int, **kwargs) -> AirGymVecEnv:
    """(vecenv.py:17-19)"""
    return AirGymVecEnv(name, num_actors, **kwargs)


# auto-register every task (vecenv.py:109-120)
for _name in envs.registered_tasks():
    register(_name, {
        "vecenv_type": "AIRGYM",
        "env_creator": (lambda name: (
            lambda **kw: envs.make_env(name, **kw)))(_name),
    })
