"""Fused PPO update kernel (ops/fused_update.py) vs the XLA minibatch
scan — CPU interpret mode. The kernel must reproduce rl/ppo.update's
semantics (losses, grad clip, optax Adam, mu/sigma write-back, adaptive
lr, last-mini-epoch metrics) end to end."""
import jax
import jax.numpy as jnp
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.ops import fused_update as fu
from airgym_tpu.rl import ppo as ppo_mod
from airgym_tpu.rl.fused_ppo import FusedHoveringPPO


def build_dataset(tr, ts):
    """Mirror train_epoch's dataset prep up to update()."""
    cfg = tr.cfg
    ts = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))
    ts, traj, last_value, _ = jax.jit(tr.rollout)(ts)
    values, adv, returns = tr.compute_gae(ts, traj, last_value)
    ts = ts._replace(obs_rms=ts.obs_rms.update(traj.prenorm))
    vr = ts.value_rms.update(values).update(returns)
    ts = ts._replace(value_rms=vr)
    values_m, returns_m = vr.normalize(values), vr.normalize(returns)
    adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
    flat = lambda x: jnp.swapaxes(x, 0, 1).reshape(
        (tr.batch_size,) + x.shape[2:])
    return ts, {"obs": flat(traj.obs), "actions": flat(traj.actions),
                "neglogp": flat(traj.neglogp), "values": flat(values_m),
                "returns": flat(returns_m), "adv": flat(adv),
                "mus_init": flat(traj.mus),
                "sigmas_init": flat(traj.sigmas)}


def make(**kw):
    from airgym_tpu.ops import fused_rollout as fr
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=fr.TILE)
    cfg = ppo_mod.PPOConfig(horizon=4, minibatch_size=512,
                            mini_epochs=3, **kw)
    return ppo_mod.PPO(task, cfg), task


def test_fused_update_matches_xla_update():
    tr, task = make()
    ts0 = tr.init(jax.random.PRNGKey(0))
    ts, dataset = build_dataset(tr, ts0)

    ts_ref, m_ref = jax.jit(tr.update)(ts, dict(dataset))

    # drive the kernel through the fused trainer's update override
    ftr = FusedHoveringPPO(task, tr.cfg)
    ts_f, m_f = jax.jit(ftr.update)(ts, dict(dataset))

    ref = fu.pack_update(ts_ref.params)
    got = fu.pack_update(ts_f.params)
    for f in fu._FIELDS:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() < 2e-3 * scale + 1e-5, (
            f, np.abs(a - b).max())
    # optimizer state round-trips: count advanced, moments close
    assert int(ts_f.opt_state[0].count) == int(ts_ref.opt_state[0].count)
    np.testing.assert_allclose(float(ts_f.lr), float(ts_ref.lr),
                               rtol=1e-6)
    for k in ("loss", "kl", "a_loss", "c_loss", "b_loss", "entropy",
              "clip_frac"):
        np.testing.assert_allclose(float(m_f[k]), float(m_ref[k]),
                                   rtol=5e-3, atol=5e-4, err_msg=k)


def test_fused_update_chained_epochs_stay_close():
    """Two chained updates (opt-state round-trip through the kernel's
    pack/unpack) keep tracking the XLA trainer."""
    tr, task = make()
    ftr = FusedHoveringPPO(task, tr.cfg)
    ts0 = tr.init(jax.random.PRNGKey(1))

    ts_a, ds = build_dataset(tr, ts0)
    ts_b = ts_a
    for _ in range(2):
        ts_a, _ = jax.jit(tr.update)(ts_a, dict(ds))
        ts_b, _ = jax.jit(ftr.update)(ts_b, dict(ds))
    ref = fu.pack_update(ts_a.params)
    got = fu.pack_update(ts_b.params)
    for f in fu._FIELDS:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() < 5e-3 * scale + 1e-5, (
            f, np.abs(a - b).max())


def test_fused_update_fallback_on_unsupported_config():
    """clip_value / smooth clamp / multi-device push update() back to
    the XLA scan."""
    from airgym_tpu.ops import fused_rollout as fr
    task = envs.make_task("hovering", ctl_mode="rate",
                          num_envs=fr.TILE)
    cfg = ppo_mod.PPOConfig(horizon=4, minibatch_size=512,
                            mini_epochs=2, clip_value=True)
    ftr = FusedHoveringPPO(task, cfg)
    ds = {"obs": jnp.zeros((1, 18))}
    assert not ftr._can_fuse_update(ds)
    cfg2 = ppo_mod.PPOConfig(horizon=4, minibatch_size=512)
    ftr2 = FusedHoveringPPO(task, cfg2)
    assert ftr2._can_fuse_update(ds)
    ftr2.mesh = object()
    assert not ftr2._can_fuse_update(ds)
    ftr2.mesh = None


def test_fused_trainer_epoch_end_to_end_with_fused_update():
    """Full fused train epoch (fused rollout interpret + fused update
    interpret): finite metrics, reward improves over a few epochs."""
    import functools

    from airgym_tpu.ops import fused_rollout as fr
    task = envs.make_task("hovering", ctl_mode="rate",
                          num_envs=fr.TILE)
    tr = FusedHoveringPPO(task, ppo_mod.PPOConfig(horizon=4,
                                                  minibatch_size=1024))
    orig = fr.rollout_fused_policy
    fr.rollout_fused_policy = functools.partial(orig, interpret=True)
    try:
        ts = tr.init(jax.random.PRNGKey(0))
        step = tr.make_train_epoch(donate=False)
        ts, m = step(ts)
        ts, m = step(ts)
        for k in ("loss", "kl", "mean_reward", "reward_raw_per_step"):
            assert np.isfinite(float(m[k])), k
    finally:
        fr.rollout_fused_policy = orig


def test_fused_update_single_minibatch_and_fixed_lr():
    """Edge configs: one minibatch spanning the whole batch (nmb=1) and
    lr_schedule='fixed' (the kernel's adaptive branch off)."""
    from airgym_tpu.ops import fused_rollout as fr
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=fr.TILE)
    cfg = ppo_mod.PPOConfig(horizon=4, minibatch_size=fr.TILE * 4,
                            mini_epochs=2, lr_schedule="fixed")
    tr = ppo_mod.PPO(task, cfg)
    ftr = FusedHoveringPPO(task, cfg)
    ts0 = tr.init(jax.random.PRNGKey(2))
    ts, ds = build_dataset(tr, ts0)
    assert tr.num_minibatches == 1

    ts_ref, m_ref = jax.jit(tr.update)(ts, dict(ds))
    ts_f, m_f = jax.jit(ftr.update)(ts, dict(ds))
    # fixed schedule: lr untouched by both paths
    np.testing.assert_allclose(float(ts_f.lr), float(ts.lr))
    np.testing.assert_allclose(float(ts_ref.lr), float(ts.lr))
    ref, got = fu.pack_update(ts_ref.params), fu.pack_update(ts_f.params)
    for f in fu._FIELDS:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() < 2e-3 * scale + 1e-5, (
            f, np.abs(a - b).max())
    np.testing.assert_allclose(float(m_f["kl"]), float(m_ref["kl"]),
                               rtol=5e-3, atol=5e-4)
