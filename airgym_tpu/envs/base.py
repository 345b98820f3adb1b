"""Functional env framework: the TPU-native BaseTask.

Reference counterpart: airgym/envs/base/base_task.py + the tensor plumbing
at the top of every task (hovering.py:42-152). Differences, by design:

  * The env is a **pure function**: ``step(state, actions, key) ->
    (state', StepOutput)``. All mutable buffers of the reference
    (root_states, progress_buf, reset_buf, pre_actions, controller
    integrators, RNG) live in one ``EnvState`` pytree shaped ``[N, ...]``,
    so the whole step jits, vmaps, shards with pjit over the env axis, and
    scans over the rollout horizon.
  * Physics + controller + reward + termination + randomized reset are all
    inside the step — no host round-trip (the reference crosses
    GPU->CPU->C++ every step, hovering.py:217-254).
  * Resets are branch-free ``jnp.where`` merges (same trick the reference
    uses tensor-wise, minus the Python ``nonzero`` indexing).

Reset semantics match the reference:
  * termination computed after physics; terminated envs are re-randomized
    at the END of the same step; the returned obs is the pre-reset one.
  * the first step after a reset applies ZERO rotor thrust
    (reference hovering.py:268 zeroes thrusts for envs being reset).
  * ``reset()`` = reset-all + zero-action step (base_task.py:107-111).

A thin stateful ``TaskWrapper`` reproduces the reference's
``step(actions) -> (obs, priv_obs, rew, reset, extras)`` API for scripts
and for the vecenv glue.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.control import px4
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import quadrotor as qd


class StepOutput(NamedTuple):
    obs: Any                      # [N, obs] array or {'image','observation'}
    priv_obs: Any                 # env-asset root states or None
    reward: jnp.ndarray           # [N]
    reset: jnp.ndarray            # [N] bool — done flags
    timeout: jnp.ndarray          # [N] bool — episode-length truncation
    info: Dict[str, jnp.ndarray]  # item_reward_info terms, each [N]


class EnvState(NamedTuple):
    """Common per-env state; tasks embed this as ``.core`` in their own
    state tuples (alongside targets / obstacle states / camera caches)."""
    root: jnp.ndarray            # [N,13] robot root states (IsaacGym layout)
    ctrl: px4.CascadeState       # controller integrators
    progress: jnp.ndarray        # [N] int32 steps since reset
    pre_actions: jnp.ndarray     # [N,A] previous post-remap actions
    reset_buf: jnp.ndarray       # [N] bool — envs reset at end of last step
    rng: jnp.ndarray             # PRNG key
    rotors: jnp.ndarray = None   # [N,4] actual rotor thrusts (motor lag)


@dataclasses.dataclass(frozen=True)
class BaseEnvCfg:
    """Static task configuration (mirrors the reference's class-tree config,
    base_config.py). Frozen dataclass -> hashable -> jit-static."""
    num_envs: int = 256
    ctl_mode: str = "rate"
    episode_length_s: float = 24.0
    dt: float = 0.01
    num_control_steps_per_env_step: int = 1
    get_privileged_obs: bool = True
    reset_on_collision: bool = False
    obs_noise: bool = True
    # first-order rotor-response time constant [s]; 0 = instantaneous
    # thrust like the reference (see physics.quadrotor.rotor_lag)
    motor_tau: float = 0.0
    dtype: Any = jnp.float32

    @property
    def max_episode_length(self) -> int:
        return int(self.episode_length_s / self.dt)

    @property
    def num_actions(self) -> int:
        return px4.num_actions(self.ctl_mode)


# Narrowed rate limits of the vision-task lineage (reference
# customized.py:109-114: body rates +-1 rad/s instead of hovering's +-6).
NARROW_RATE_LIMITS = ((-1.0, -1.0, -1.0, 0.0), (1.0, 1.0, 1.0, 1.0))


class QuadEnvCore:
    """Shared machinery: action remap, controller + physics stepping,
    state-vector observations with sensor noise, common reset randomization.

    Subclasses (tasks) implement observations / rewards / resets on top.
    """

    task_name = "base"

    # Per-task action-limit deltas, keyed by ctl_mode -> (lower, upper).
    # Kept on the task like the reference (hovering.py:93-121 builds the
    # tables in the task; customized.py:109-114 narrows rate; tracking.py
    # widens pos) so the controller module stays task-agnostic.
    action_limit_overrides: Dict[str, Tuple[Any, Any]] = {}

    def __init__(self, cfg: BaseEnvCfg,
                 params: Optional[qd.QuadrotorParams] = None,
                 gains: Optional[px4.CascadeGains] = None):
        self.cfg = cfg
        self.params = params or qd.x152b_params(
            dt=cfg.dt, motor_tau=getattr(cfg, "motor_tau", 0.0))
        self.gains = gains or px4.CascadeGains()
        lo, hi = self.action_limits(cfg.ctl_mode)
        self._act_lo = jnp.asarray(lo, dtype=cfg.dtype)
        self._act_hi = jnp.asarray(hi, dtype=cfg.dtype)

    def action_limits(self, mode: str):
        """(lower, upper) for this task: the per-mode default from the
        controller library, unless the task overrides that mode."""
        ov = self.action_limit_overrides.get(mode)
        if ov is not None:
            return np.asarray(ov[0], np.float64), np.asarray(ov[1], np.float64)
        return px4.action_limits(mode)

    # -- actions ----------------------------------------------------------

    def remap_actions(self, actions: jnp.ndarray) -> jnp.ndarray:
        """Policy [-1,1] actions -> controller units: thrust channel mapped
        0.5+0.5a for rate/atti (reference hovering.py:214-215), then clamp
        to the per-mode limits (hovering.py:216)."""
        if self.cfg.ctl_mode in ("rate", "atti"):
            thrust = 0.5 + 0.5 * actions[..., -1:]
            actions = jnp.concatenate([actions[..., :-1], thrust], axis=-1)
        return jnp.clip(actions, self._act_lo, self._act_hi)

    # -- physics ----------------------------------------------------------

    def run_controller(self, state: EnvState, actions: jnp.ndarray):
        """Remapped actions -> rotor commands; thrust zeroed for envs on
        their first post-reset step (reference hovering.py:268)."""
        cmds, ctrl = px4.run(self.cfg.ctl_mode, self.gains, state.ctrl,
                             state.root, actions, self.cfg.dt)
        cmds = jnp.where(state.reset_buf[:, None], 0.0, cmds)
        return cmds, ctrl

    def physics_step(self, core: EnvState, cmds: jnp.ndarray):
        """Rotor commands -> next root state, threading the first-order
        motor-lag filter when ``params.motor_tau > 0`` (qd.rotor_lag).
        Returns (root', rotors') — rotors' is the ACTUAL normalized rotor
        thrust applied this step (equal to cmds when lag is off)."""
        if self.params.motor_tau > 0.0:
            if core.rotors is None:
                raise ValueError(
                    "motor_tau > 0 requires EnvState.rotors; build states "
                    "via init_core (old checkpoints carry no rotor state)")
            rotors = qd.rotor_lag(self.params, core.rotors, cmds)
            return qd.step(self.params, core.root, rotors), rotors
        rotors = cmds if core.rotors is not None else None
        return qd.step(self.params, core.root, cmds), rotors

    # -- observations -----------------------------------------------------

    def state_obs18(self, root: jnp.ndarray, key) -> jnp.ndarray:
        """18-dim state obs: rot-matrix(9) + pos(3) + linvel(3) + angvel(3)
        with per-channel sensor noise (reference hovering.py:337-358)."""
        n = root.shape[0]
        mat = rot.quat_to_matrix(root[:, 3:7]).reshape(n, 9)
        obs = jnp.concatenate([mat, root[:, 0:3], root[:, 7:10],
                               root[:, 10:13]], axis=-1)
        if self.cfg.obs_noise:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            noise = jnp.concatenate([
                1e-3 * jax.random.normal(k1, (n, 9)),
                5e-3 * jax.random.normal(k2, (n, 3)),
                2e-2 * jax.random.normal(k3, (n, 3)),
                4e-1 * jax.random.normal(k4, (n, 3)),
            ], axis=-1)
            obs = obs + noise.astype(obs.dtype)
        return obs

    # -- resets -----------------------------------------------------------

    def randomize_hover_reset(self, key, n: int):
        """Hovering-style reset randomization (reference hovering.py:315-329):
        pos ~ U(-1,1)^3, small random tilt + yaw, v ~ 0.5*U, w ~ 0.2*U."""
        kp, ka, kv, kw = jax.random.split(key, 4)
        pos = jax.random.uniform(kp, (n, 3), minval=-1.0, maxval=1.0)
        ang = jnp.concatenate([
            0.01 * jax.random.uniform(ka, (n, 2), minval=-np.pi, maxval=np.pi),
            0.05 * jax.random.uniform(jax.random.fold_in(ka, 1), (n, 1),
                                      minval=-np.pi, maxval=np.pi)], axis=-1)
        quat = rot.quat_from_euler_xyz(ang)
        linvel = 0.5 * jax.random.uniform(kv, (n, 3), minval=-1.0, maxval=1.0)
        angvel = 0.2 * jax.random.uniform(kw, (n, 3), minval=-1.0, maxval=1.0)
        return qd.pack_state(pos, quat, linvel, angvel).astype(self.cfg.dtype)

    def apply_reset(self, state: EnvState, reset_mask: jnp.ndarray,
                    new_root: jnp.ndarray) -> EnvState:
        """Branch-free merge of re-randomized states for done envs."""
        m = reset_mask[:, None]
        root = jnp.where(m, new_root, state.root)
        ctrl = px4.reset_state(state.ctrl, reset_mask, root[:, 3:7])
        return state._replace(
            root=root,
            ctrl=ctrl,
            progress=jnp.where(reset_mask, 0, state.progress),
            pre_actions=jnp.where(m, 0.0, state.pre_actions),
            reset_buf=reset_mask,
            rotors=(None if state.rotors is None
                    else jnp.where(m, 0.0, state.rotors)),
        )

    def init_core(self, key, root: Optional[jnp.ndarray] = None) -> EnvState:
        n = self.cfg.num_envs
        if root is None:
            root = jnp.zeros((n, 13), dtype=self.cfg.dtype).at[:, 6].set(1.0)
        return EnvState(
            root=root,
            ctrl=px4.init_state(n, dtype=self.cfg.dtype),
            progress=jnp.zeros((n,), dtype=jnp.int32),
            pre_actions=jnp.zeros((n, self.cfg.num_actions),
                                  dtype=self.cfg.dtype),
            reset_buf=jnp.ones((n,), dtype=bool),
            rng=key,
            rotors=jnp.zeros((n, 4), dtype=self.cfg.dtype),
        )


# --------------------------------------------------------------------------
# common reward pieces (reference hovering.py:371-459) shared by tasks


def effort_reward(cmd_thrusts: jnp.ndarray) -> jnp.ndarray:
    t = jnp.clip(cmd_thrusts, 0.0, 1.0)
    return 0.1 * jnp.sum(1.0 - t, axis=-1) / 4.0


def continuity_rewards(ctl_mode: str, actions, pre_actions):
    """Returns (continuity_reward, thrust_reward-or-None)."""
    diff = actions - pre_actions
    if ctl_mode in ("pos", "vel", "prop"):
        return 0.2 * jnp.exp(-jnp.linalg.norm(diff, axis=-1)), None
    cont = (0.2 * jnp.exp(-jnp.linalg.norm(diff[..., :-1], axis=-1))
            + 0.5 / (1.0 + jnp.square(3.0 * diff[..., -1])))
    thrust = actions[..., -1]
    thrust_r = 0.1 * (1.0 - jnp.abs(0.1533 - thrust))
    return cont, thrust_r


def pos_reward_terms(root: jnp.ndarray, target_pos: jnp.ndarray):
    """(pos_reward, vel_direction_reward, relative_positions)."""
    rel = target_pos - root[:, 0:3]
    dist = jnp.linalg.norm(rel, axis=-1)
    pos_r = 0.7 / (1.0 + jnp.square(1.6 * dist))
    tar_dir = rel / jnp.maximum(dist[:, None], 1e-6)
    v = root[:, 7:10]
    v_dir = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
    dot = jnp.clip(jnp.sum(tar_dir * v_dir, axis=-1), -1.0, 1.0)
    angle = jnp.abs(jnp.arccos(dot))
    vel_dir_r = 0.1 * jnp.exp(-angle / jnp.pi)
    return pos_r, vel_dir_r, rel


def attitude_reward_terms(root: jnp.ndarray, target_yaw: jnp.ndarray):
    """(yaw_reward, spin_reward, ups_reward, ups_z)."""
    q = root[:, 3:7]
    euler = rot.quat_to_euler_xyz(q)
    ydiff = rot.yaw_diff(target_yaw, euler[..., 2]) / jnp.pi
    yaw_r = 1.0 / (1.0 + jnp.square(3.0 * ydiff))
    spin = jnp.square(root[:, 12])
    spin_r = 1.0 / (1.0 + jnp.square(3.0 * spin))
    ups = rot.quat_axis(q, 2)[:, 2]
    ups_r = jnp.square((ups + 1.0) / 2.0)
    return yaw_r, spin_r, ups_r, ups


# --------------------------------------------------------------------------
# stateful wrapper with the reference env API


class TaskWrapper:
    """Reference-compatible stateful facade over a functional task.

    ``step(actions)`` returns (obs, priv_obs, rew, reset, extras) with
    extras = {'time_outs', 'item_reward_info'} exactly like the reference
    (hovering.py:304-308); ``reset()`` = reset-all + zero-action step
    (base_task.py:107-111).
    """

    def __init__(self, task, seed: int = 0):
        self.task = task
        self.cfg = task.cfg
        self.num_envs = task.cfg.num_envs
        # actor rows: num_envs, or num_envs * num_robots for multi-agent
        # tasks that flatten the robot axis (reference vecenv contract)
        self.num_rows = getattr(task, "flat_n", task.cfg.num_envs)
        self.num_actions = task.cfg.num_actions
        self.num_obs = task.num_obs
        self.state = task.initial_state(jax.random.PRNGKey(seed))
        self._step = jax.jit(task.step)

    def step(self, actions):
        actions = jnp.asarray(actions)
        self.state, out = self._step(self.state, actions)
        extras = {"time_outs": out.timeout,
                  "item_reward_info": out.info}
        return out.obs, out.priv_obs, out.reward, out.reset, extras

    def reset(self):
        self.state = self.task.initial_state(self.state.core.rng)
        zero = jnp.zeros((self.num_rows, self.num_actions))
        obs, priv, _, _, _ = self.step(zero)
        return obs, priv
