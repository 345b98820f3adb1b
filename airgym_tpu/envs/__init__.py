"""Task registry (reference: airgym/utils/task_registry.py + envs/__init__.py).

``make_env(name, ...)`` returns a stateful reference-API wrapper;
``make_task(name, ...)`` returns the functional task object whose pure
``step`` the PPO trainer jits directly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple, Type

import jax

_REGISTRY: Dict[str, Tuple[type, type]] = {}


def register(name: str, task_cls: type, cfg_cls: type) -> None:
    _REGISTRY[name] = (task_cls, cfg_cls)


def registered_tasks():
    return sorted(_REGISTRY)


def get_cfg(name: str, **overrides):
    _, cfg_cls = _REGISTRY[name]
    return dataclasses.replace(cfg_cls(), **overrides)


def make_task(name: str, ctl_mode: str = "rate", num_envs: int | None = None,
              **overrides):
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; have {registered_tasks()}")
    task_cls, cfg_cls = _REGISTRY[name]
    kw = dict(ctl_mode=ctl_mode, **overrides)
    if num_envs is not None:
        kw["num_envs"] = num_envs
    cfg = dataclasses.replace(cfg_cls(), **kw)
    return task_cls(cfg)


def make_env(name: str, seed: int = 0, **kw):
    from airgym_tpu.envs.base import TaskWrapper
    return TaskWrapper(make_task(name, **kw), seed=seed)


# --- register built-in tasks ------------------------------------------------

from airgym_tpu.envs.hovering import Hovering, HoveringCfg  # noqa: E402

register("hovering", Hovering, HoveringCfg)


def _optional(name, module, cls, cfg):
    try:
        mod = __import__(f"airgym_tpu.envs.{module}", fromlist=[cls, cfg])
        register(name, getattr(mod, cls), getattr(mod, cfg))
    except ImportError:
        pass


_optional("balloon", "balloon", "Balloon", "BalloonCfg")
_optional("tracking", "tracking", "Tracking", "TrackingCfg")
_optional("avoid", "avoid", "Avoid", "AvoidCfg")
_optional("planning", "planning", "Planning", "PlanningCfg")
_optional("maplanning", "maplanning", "MAPlanning", "MAPlanningCfg")
_optional("depthgen", "depthgen", "DepthGen", "DepthGenCfg")
_optional("customized", "customized", "Customized", "CustomizedCfg")
