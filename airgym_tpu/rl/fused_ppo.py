"""PPO with the policy+env rollout fused into one Pallas kernel.

``FusedHoveringPPO`` is a drop-in PPO subclass for the Hovering task in
rate mode: the data-collection phase (policy forward, Gaussian sampling,
PX4 cascade, physics, reward, reset — ops/fused_rollout.py) runs as a
single kernel with env state resident in VMEM for the whole horizon,
~4x the XLA rollout end-to-end (~24x at the kernel level, dispatch RTT
excluded). GAE, normalization, and the minibatch updates are unchanged
(rl/ppo.py), so training semantics match the standard trainer to MXU
rounding — the test suite checks both optimize the same objective.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from airgym_tpu.ops import fused_hovering as fh
from airgym_tpu.ops import fused_rollout as fr
from airgym_tpu.rl import ppo as ppo_mod


class FusedHoveringPPO(ppo_mod.PPO):
    """PPO whose rollout phase is ops/fused_rollout.rollout_fused_policy.

    Requirements: hovering task (or a subclass-declared fused task),
    ctl_mode='rate', num_envs % 1024 == 0, default [64,128,64] elu
    network, normalize_input on.
    """

    fused_task = "hovering"

    # set by the runner for multi-chip runs: a 1-D device mesh whose
    # single axis shards the env batch (parallel/mesh.py). None or a
    # 1-device mesh = plain single-device kernel call.
    mesh = None

    # fused UPDATE phase (ops/fused_update.py): all mini-epoch x
    # minibatch Adam steps in one kernel with weights resident in VMEM.
    # Single-device only (data parallelism needs per-minibatch gradient
    # psums the kernel cannot issue); update() falls back to the XLA
    # minibatch scan whenever the config leaves the kernel's supported
    # surface.
    use_fused_update = True

    def __init__(self, task, cfg=ppo_mod.PPOConfig(), network_kw=None):
        assert task.task_name == self.fused_task \
            and task.cfg.ctl_mode == "rate"
        assert task.cfg.num_envs % fr.TILE == 0
        # first-order motor lag threads through the kernel (exact discrete
        # form, physics/quadrotor.rotor_lag); 0.0 = instantaneous thrust
        import numpy as np
        tau = float(task.params.motor_tau)
        self._motor_alpha = (float(np.exp(-task.params.dt / tau))
                             if tau > 0.0 else 0.0)
        super().__init__(task, cfg, network_kw=network_kw)

    # -- task hooks (overridden by fused variants) -------------------------

    def _pack_env(self, env_state):
        return fh.pack_state(env_state.core)

    def _unpack_env(self, env_state, packed_out, core):
        return env_state._replace(core=core)

    def _last_obs(self, env_state, root, key):
        return self.task.state_obs18(root, key) - self.task.target

    def rollout(self, ts: ppo_mod.TrainState):
        cfg = self.cfg
        rng, k_seed, k_last = jax.random.split(ts.rng, 3)
        seed = jax.random.randint(k_seed, (1,), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)

        pack = fr.pack_policy(ts.params, ts.obs_rms)
        packed = self._pack_env(ts.env_state)
        packed_out, rec = self._rollout_kernel(packed, pack, seed,
                                               cfg.horizon)

        # unpack the trajectory record [H, rec_len, N]
        k = fr._TASK_OBS[self.fused_task]
        tp = lambda a: jnp.swapaxes(a, 1, 2)        # -> [H, N, k]
        obs = tp(rec[:, 0:k])
        actions = tp(rec[:, k:k + 4])
        neglogp = rec[:, k + 4]
        values = rec[:, k + 5]
        mus = tp(rec[:, k + 6:k + 10])
        rewards = rec[:, k + 10]
        dones = rec[:, k + 11] > 0.5
        timeouts = rec[:, k + 12] > 0.5
        sigma = jnp.exp(ts.params["params"]["logstd"])
        sigmas = jnp.broadcast_to(sigma, mus.shape)

        traj = ppo_mod.Rollout(obs=obs, prenorm=obs, actions=actions,
                               neglogp=neglogp, values=values, mus=mus,
                               sigmas=sigmas, rewards=rewards,
                               dones=dones, timeouts=timeouts)

        # per-step task-success flags (None unless the fused task reports
        # them — must agree with the task's has_success declaration)
        successes = self._fused_success(obs, rewards, dones)
        if (successes is None) != (ts.last_ep_success is None):
            raise ValueError(
                f"{type(self).__name__}._fused_success and "
                f"{type(self.task).__name__}.has_success disagree — a "
                f"has_success task on the fused path must derive per-step "
                f"success flags from the kernel record")

        # episode stats (same bookkeeping as the scan rollout)
        def stat_step(carry, inp):
            ep_ret, ep_len, last_ret, last_len, last_suc = carry
            r, d, s = inp
            ep_ret = ep_ret + r
            ep_len = ep_len + 1.0
            last_ret = jnp.where(d, ep_ret, last_ret)
            last_len = jnp.where(d, ep_len, last_len)
            if last_suc is not None:
                last_suc = jnp.where(d, s.astype(ep_ret.dtype), last_suc)
            alive = 1.0 - d.astype(ep_ret.dtype)
            return (ep_ret * alive, ep_len * alive, last_ret, last_len,
                    last_suc), None

        (ep_ret, ep_len, last_ret, last_len, last_suc), _ = jax.lax.scan(
            stat_step, (ts.ep_return, ts.ep_length, ts.last_ep_return,
                        ts.last_ep_length, ts.last_ep_success),
            (rewards, dones, successes))

        # rebuild the env state (vel-loop fields are untouched in rate mode)
        old = ts.env_state.core
        root = fh.unpack_root(packed_out)
        ctrl = old.ctrl._replace(rate_int=packed_out[13:16].T,
                                 prev_rate=packed_out[16:19].T)
        core = old._replace(
            root=root, ctrl=ctrl,
            progress=packed_out[19].astype(jnp.int32),
            reset_buf=packed_out[20] > 0.5,
            pre_actions=packed_out[21:25].T,
            rotors=(packed_out[25:29].T if old.rotors is not None
                    else None),
            rng=rng)
        env_state = self._unpack_env(ts.env_state, packed_out, core)

        # bootstrap value from the post-rollout observation (fresh noise;
        # for done envs GAE zeroes the bootstrap term, so the post-reset
        # state is never consumed)
        last_obs = self._last_obs(env_state, root, k_last)
        _, _, _, _, last_value, _ = self._policy(
            ts.params, ts.obs_rms, last_obs, jax.random.PRNGKey(0))

        ts = ts._replace(env_state=env_state, obs=last_obs,
                         ep_return=ep_ret, ep_length=ep_len,
                         last_ep_return=last_ret, last_ep_length=last_len,
                         last_ep_success=last_suc, rng=rng)
        infos = {"reward": jnp.mean(rewards)}
        return ts, traj, last_value, infos

    def _fused_success(self, obs, rewards, dones):
        """Per-step task-success flags [H, N], or None when the task has
        no success notion.  Fused variants of has_success tasks must
        override this (the kernel record carries no separate flag)."""
        return None

    def _can_fuse_update(self, dataset) -> bool:
        cfg = self.cfg
        return (self.use_fused_update
                and self.mesh is None
                and not isinstance(dataset["obs"], dict)
                and not cfg.clip_value
                and not cfg.use_smooth_clamp
                and cfg.lr_schedule in ("adaptive", "fixed", "linear")
                and cfg.normalize_input
                and self.model.fixed_sigma
                and not self.model.separate
                and tuple(self.model.units) == (64, 128, 64)
                and self.batch_size % self.num_minibatches == 0
                # the mu/sigma write-back scratch is 8 rows x batch f32
                # in VMEM; cap it at 8 MB so weights + data blocks fit
                # the 16 MB VMEM budget at any env count
                and self.batch_size <= 262144)

    def update(self, ts: ppo_mod.TrainState, dataset):
        if not self._can_fuse_update(dataset):
            return super().update(ts, dataset)
        from airgym_tpu.ops import fused_update as fu
        cfg = self.cfg

        if cfg.lr_schedule == "linear":
            mul = jnp.maximum(0.0, 1.0 - ts.epoch / cfg.max_epochs)
            ts = ts._replace(lr=jnp.maximum(
                cfg.min_lr, cfg.learning_rate * mul).astype(jnp.float32))

        obs_n = ts.obs_rms.normalize(dataset["obs"])
        pack = fu.pack_update(ts.params)
        adam_state = ts.opt_state[0]
        m_pack = fu.pack_update({"params": adam_state.mu["params"]})
        v_pack = fu.pack_update({"params": adam_state.nu["params"]})
        kcfg = dict(e_clip=cfg.e_clip, critic_coef=cfg.critic_coef,
                    bounds_coef=cfg.bounds_loss_coef,
                    entropy_coef=cfg.entropy_coef,
                    truncate_grads=cfg.truncate_grads,
                    grad_norm=cfg.grad_norm,
                    adaptive_lr=cfg.lr_schedule == "adaptive",
                    kl_threshold=cfg.kl_threshold,
                    min_lr=cfg.min_lr, max_lr=cfg.max_lr)
        w2, m2, v2, lr2, t2, metrics = fu.fused_update(
            obs_n, dataset["actions"], dataset["adv"],
            dataset["returns"], dataset["neglogp"], dataset["mus_init"],
            dataset["sigmas_init"][0].reshape(-1, 1),
            pack, m_pack, v_pack,
            ts.lr.reshape(1).astype(jnp.float32),
            adam_state.count.reshape(1).astype(jnp.float32),
            nmb=self.num_minibatches, mini_epochs=cfg.mini_epochs,
            cfg=kcfg)

        new_params = fu.unpack_update(w2, ts.params)
        new_adam = adam_state._replace(
            count=t2[0].astype(adam_state.count.dtype).reshape(
                adam_state.count.shape),
            mu=fu.unpack_update(m2, ts.params),
            nu=fu.unpack_update(v2, ts.params))
        ts = ts._replace(params=new_params,
                         opt_state=(new_adam,) + tuple(ts.opt_state[1:]),
                         lr=lr2[0])
        return ts, metrics

    def _rollout_kernel(self, packed, pack, seed, horizon):
        """Dispatch the Pallas rollout kernel, shard_map-wrapped over the
        mesh's env axis when one is set.

        Per-shard seeding reproduces the single-device call EXACTLY: the
        kernel derives each tile's RNG stream as
        ``seed + tile_id * 0x01000193`` (fused_rollout._kernel), so shard
        d's seed is offset by ``d * tiles_per_shard * 0x01000193`` (mod
        2^32 — int32 wraparound matches the kernel's uint32 cast) and its
        local tiles 0..t-1 become global tiles d*t..(d+1)*t-1. Sharded
        and unsharded rollouts are therefore the same computation, which
        tests/test_multichip.py asserts numerically.
        """
        kw = dict(obs_noise=self.task.cfg.obs_noise, task=self.fused_task,
                  motor_alpha=self._motor_alpha)
        mesh = self.mesh
        if mesh is None or mesh.devices.size <= 1:
            return fr.rollout_fused_policy(packed, pack, seed, horizon,
                                           **kw)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        ndev = int(mesh.devices.size)
        n_shard = self.num_envs // ndev
        assert n_shard % fr.TILE == 0, (
            f"{self.num_envs} envs over {ndev} devices leaves {n_shard} "
            f"per shard — not a multiple of the kernel tile {fr.TILE}")
        tiles_per_shard = n_shard // fr.TILE
        off = (tiles_per_shard * 0x01000193) & 0xFFFFFFFF
        if off >= 2 ** 31:                     # two's-complement int32
            off -= 2 ** 32

        def body(seed_s, packed_s, pack_s):
            d = jax.lax.axis_index(axis).astype(jnp.int32)
            return fr.rollout_fused_policy(
                packed_s, pack_s, seed_s + d * jnp.int32(off), horizon,
                **kw)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis), P()),
            out_specs=(P(None, axis), P(None, None, axis)),
            check_rep=False,
        )(seed, packed, pack)


class FusedBalloonPPO(FusedHoveringPPO):
    """Fused rollout for the Balloon task (rate mode): same kernel
    skeleton with the balloon position + pre_root_pos threaded through
    the packed state and the balloon reward/kill/reset rules in-kernel
    (ops/fused_rollout.py task='balloon'; reference balloon.py:85-215)."""

    fused_task = "balloon"

    def _pack_env(self, env_state):
        return fr.pack_state_balloon(env_state.core, env_state.balloon,
                                     env_state.pre_root_pos)

    def _unpack_env(self, env_state, packed_out, core):
        balloon = env_state.balloon.at[:, 0:3].set(packed_out[29:32].T)
        return env_state._replace(core=core, balloon=balloon,
                                  pre_root_pos=packed_out[32:35].T)

    def _last_obs(self, env_state, root, key):
        return self.task._observations(root, env_state.balloon, key)

    def _fused_success(self, obs, rewards, dones):
        # the hit bonus (+800 within 0.1 m, reference balloon.py:154-157)
        # dominates every other reward term (their sum is bounded well
        # under 40 in magnitude, see envs/balloon._reward), so a step with
        # reward > 400 is exactly a balloon hit; the fused kernel record
        # carries no separate flag (parity with the standard path is
        # asserted in tests/test_fused_balloon.py)
        return dones & (rewards > 400.0)


class FusedTrackingPPO(FusedHoveringPPO):
    """Fused rollout for the Tracking task (rate mode): the 10-point
    lemniscate reference window is synthesized in-kernel from the env's
    progress counter (closed form), so the 48-dim observation never
    round-trips through HBM (ops/fused_rollout.py task='tracking';
    reference tracking.py:168-296)."""

    fused_task = "tracking"

    def _unpack_env(self, env_state, packed_out, core):
        pre = jnp.where((packed_out[20] > 0.5)[:, None], 0.0,
                        packed_out[0:3].T)
        return env_state._replace(core=core, pre_root_pos=pre)

    def _last_obs(self, env_state, root, key):
        task = self.task
        obs18 = task.state_obs18(root, key)
        ref = task.ref_trajectory(env_state.core.progress)
        rel = (ref - root[:, None, 0:3]).reshape(root.shape[0], -1)
        return jnp.concatenate([obs18, rel], axis=-1)
