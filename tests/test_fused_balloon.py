"""Fused balloon rollout (ops/fused_rollout task='balloon') vs the XLA
Balloon task — CPU interpret mode."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.ops import fused_hovering as fh
from airgym_tpu.ops import fused_rollout as fr
from airgym_tpu.rl import ppo as ppo_mod
from airgym_tpu.rl.fused_ppo import FusedBalloonPPO

N = fr.TILE


def make(cls=ppo_mod.PPO, horizon=4, **kw):
    task = envs.make_task("balloon", ctl_mode="rate", num_envs=N, **kw)
    return cls(task, ppo_mod.PPOConfig(horizon=horizon,
                                       minibatch_size=1024))


def test_fused_balloon_one_step_matches_task():
    """Deterministic (sigma ~ 0, no obs noise) single step: the kernel's
    reward and next root state must match the XLA Balloon.step driven by
    the same policy mean."""
    tr = make(obs_noise=False)
    ts = tr.init(jax.random.PRNGKey(0))
    # make the policy deterministic: action == mu
    params = jax.tree.map(lambda x: x, ts.params)
    params["params"]["logstd"] = jnp.full_like(
        params["params"]["logstd"], -20.0)
    ts = ts._replace(params=params)

    env_state = ts.env_state
    pack = fr.pack_policy(ts.params, ts.obs_rms)
    packed = fr.pack_state_balloon(env_state.core, env_state.balloon,
                                   env_state.pre_root_pos)
    out, rec = fr.rollout_fused_policy(packed, pack,
                                       jnp.array([5], jnp.int32), 1,
                                       obs_noise=False, interpret=True,
                                       task="balloon")

    # reference path: model -> clamp -> task.step
    obs = tr.task._observations(env_state.core.root,
                                env_state.balloon, jax.random.PRNGKey(1))
    mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)
    action = jnp.clip(mu, -1.0, 1.0)
    ns, step_out = tr.task.step(env_state, action)

    kept = ~np.array(step_out.reset)        # resets draw different RNGs
    assert kept.mean() > 0.5
    # guidance term is 30x a distance difference: transcendental
    # approximations (ops/transcendental atan2) leave ~3e-3 residue
    np.testing.assert_allclose(np.array(rec[0, 28])[kept],
                               np.array(step_out.reward)[kept],
                               rtol=1e-3, atol=5e-3)
    root_f = np.array(out[0:13].T)[kept]
    root_s = np.array(ns.core.root)[kept]
    # quats are a double cover: canonicalize the sign before comparing
    sign = np.sign(np.sum(root_f[:, 3:7] * root_s[:, 3:7], axis=1,
                          keepdims=True))
    root_f[:, 3:7] *= sign
    # policy mean differs by MXU-vs-XLA rounding (~2e-4), which the
    # dynamics amplify slightly over the step
    np.testing.assert_allclose(root_f, root_s, atol=2e-3)
    # pre_root_pos threads through (zeroed on reset, else current pos)
    np.testing.assert_allclose(np.array(out[32:35].T)[kept],
                               np.array(ns.pre_root_pos)[kept], atol=1e-4)


def test_fused_balloon_ppo_epoch_runs():
    tr = make(FusedBalloonPPO, horizon=4)
    orig = fr.rollout_fused_policy
    fr.rollout_fused_policy = functools.partial(orig, interpret=True)
    try:
        ts = tr.init(jax.random.PRNGKey(0))
        step = tr.make_train_epoch(donate=False)
        ts, m = step(ts)
        ts, m = step(ts)
    finally:
        fr.rollout_fused_policy = orig
    for k in ("loss", "kl", "mean_reward", "reward_raw_per_step"):
        assert np.isfinite(float(m[k])), k
    # balloon is a has_success task: the fused path must track per-episode
    # hit rate (derived from the +800 hit bonus in the kernel record)
    assert "success_rate" in m
    assert 0.0 <= float(m["success_rate"]) <= 1.0
    assert ts.last_ep_success is not None
    qn = jnp.linalg.norm(ts.env_state.core.root[:, 3:7], axis=1)
    np.testing.assert_allclose(np.array(qn), 1.0, atol=1e-3)
    # balloon positions stay in the reset distribution's range
    b = np.array(ts.env_state.balloon[:, 0:3])
    assert (b[:, 0] > 1.9).all() and (b[:, 0] < 3.1).all()
    assert (b[:, 2] > 0.6).all() and (b[:, 2] < 1.4).all()
