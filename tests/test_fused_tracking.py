"""Fused tracking rollout (ops/fused_rollout task='tracking') vs the XLA
Tracking task — CPU interpret mode."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.ops import fused_hovering as fh
from airgym_tpu.ops import fused_rollout as fr
from airgym_tpu.rl import ppo as ppo_mod
from airgym_tpu.rl.fused_ppo import FusedTrackingPPO

N = fr.TILE


def make(cls=ppo_mod.PPO, horizon=4, **kw):
    task = envs.make_task("tracking", ctl_mode="rate", num_envs=N, **kw)
    return cls(task, ppo_mod.PPOConfig(horizon=horizon,
                                       minibatch_size=1024))


def test_fused_tracking_one_step_matches_task():
    tr = make(obs_noise=False)
    ts = tr.init(jax.random.PRNGKey(0))
    params = ts.params
    params["params"]["logstd"] = jnp.full_like(
        params["params"]["logstd"], -20.0)
    ts = ts._replace(params=params)

    env_state = ts.env_state
    pack = fr.pack_policy(ts.params, ts.obs_rms)
    packed = fh.pack_state(env_state.core)
    out, rec = fr.rollout_fused_policy(packed, pack,
                                       jnp.array([5], jnp.int32), 1,
                                       obs_noise=False, interpret=True,
                                       task="tracking")
    assert rec.shape == (1, fr.rec_len("tracking"), N)

    # reference path: build the 48-dim obs exactly like Tracking.step
    obs18 = tr.task.state_obs18(env_state.core.root, jax.random.PRNGKey(1))
    ref = tr.task.ref_trajectory(env_state.core.progress)
    rel = (ref - env_state.core.root[:, None, 0:3]).reshape(N, -1)
    obs = jnp.concatenate([obs18, rel], axis=-1)
    np.testing.assert_allclose(np.array(rec[0, 0:48].T), np.array(obs),
                               atol=2e-4)

    mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)
    action = jnp.clip(mu, -1.0, 1.0)
    ns, step_out = tr.task.step(env_state, action)

    kept = ~np.array(step_out.reset)
    assert kept.mean() > 0.5
    np.testing.assert_allclose(np.array(rec[0, 58])[kept],
                               np.array(step_out.reward)[kept],
                               rtol=1e-3, atol=5e-3)
    root_f = np.array(out[0:13].T)[kept]
    root_s = np.array(ns.core.root)[kept]
    sign = np.sign(np.sum(root_f[:, 3:7] * root_s[:, 3:7], axis=1,
                          keepdims=True))
    root_f[:, 3:7] *= sign
    np.testing.assert_allclose(root_f, root_s, atol=2e-3)


def test_fused_tracking_ppo_epoch_runs():
    tr = make(FusedTrackingPPO, horizon=4)
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
    qn = jnp.linalg.norm(ts.env_state.core.root[:, 3:7], axis=1)
    np.testing.assert_allclose(np.array(qn), 1.0, atol=1e-3)
