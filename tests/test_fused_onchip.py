"""On-chip (Mosaic-compiled) parity for the fused ROLLOUT kernel family
vs the standard XLA step (VERDICT r4 next #2).

The interpret-mode tests (test_fused_hovering/test_fused_ppo/
test_fused_balloon/test_fused_tracking) pin the kernel MATH; Mosaic
compilation is exactly the boundary where the polynomial transcendentals
(ops/transcendental.py), rsqrt/sin lowerings, and revisited-accumulation
patterns can drift — and these kernels back the bench's headline numbers.
Each test runs a fresh child WITHOUT conftest's CPU forcing and compares
the compiled kernel against the XLA task path ON THE SAME CHIP. Counted
in scripts/preflight_tpu.PARITY_TESTS -> bench.py onchip_parity.

Tolerances are the interpret-mode bounds widened ~2x for hardware
rsqrt/approx-transcendental lowerings; a real lowering bug (wrong rotor
geometry, swapped lanes, bad accumulation) shows up orders of magnitude
above them.
"""
import pytest

from _tpu_probe import TPU_GATE, run_tpu_child

# shared setup: a no-reset fixed-action window on Hovering (mirrors
# tests/test_fused_hovering.py:test_fused_matches_standard_no_reset_window)
_HOVER_COMMON = TPU_GATE + (
    "import airgym_tpu.envs as envs\n"
    "from airgym_tpu.ops import fused_hovering as fh\n"
    "from airgym_tpu.physics import quadrotor as qd\n"
    "N = fh.TILE\n"
    "def setup(motor_tau=None):\n"
    "    kw = dict(obs_noise=False)\n"
    "    if motor_tau is not None:\n"
    "        kw['motor_tau'] = motor_tau\n"
    "    task = envs.make_task('hovering', ctl_mode='rate', num_envs=N,\n"
    "                          **kw)\n"
    "    s0 = task.initial_state(jax.random.PRNGKey(0))\n"
    "    s0 = s0._replace(core=s0.core._replace(\n"
    "        reset_buf=jnp.zeros(N, bool)))\n"
    "    hov = qd.hover_command(task.params)\n"
    "    act = jnp.tile(jnp.array([0.05, -0.05, 0.02, 2 * hov - 1.0]),\n"
    "                   (N, 1))\n"
    "    return task, s0, act\n"
    "def std_rollout(task, s0, act, steps=20):\n"
    "    def body(st, _):\n"
    "        st, out = task.step(st, act)\n"
    "        return st, out.reward\n"
    "    st, rews = jax.jit(lambda s: jax.lax.scan(\n"
    "        body, s, None, length=steps))(s0)\n"
    "    assert not bool(st.core.reset_buf.any())\n"
    "    return st, jnp.sum(rews, axis=0)\n"
    "def compare(root_f, root_s, rew_f, rew_s, atol_root, atol_rew):\n"
    "    root_f, root_s = np.array(root_f), np.array(root_s)\n"
    "    sign = np.sign(np.sum(root_f[:, 3:7] * root_s[:, 3:7], axis=1,\n"
    "                          keepdims=True))\n"
    "    root_f[:, 3:7] *= sign\n"
    "    dr = np.abs(root_f - root_s).max()\n"
    "    dw = np.abs(np.array(rew_f) - np.array(rew_s)).max()\n"
    "    print('root diff', dr, 'reward diff', dw)\n"
    "    assert dr < atol_root, dr\n"
    "    assert dw < atol_rew, dw\n"
)


@pytest.mark.slow
def test_fused_hovering_rollout_parity_on_real_tpu():
    """Compiled fused env-only rollout vs jitted XLA step, 20 steps."""
    code = _HOVER_COMMON + (
        "task, s0, act = setup()\n"
        "st, rew_s = std_rollout(task, s0, act)\n"
        "packed = fh.pack_state(s0.core)\n"
        "ar = task.remap_actions(act)[0]\n"
        "out, rew_f = fh.rollout_fused(packed, ar,\n"
        "                              jnp.array([3], jnp.int32), 20)\n"
        "compare(fh.unpack_root(out), st.core.root, rew_f, rew_s,\n"
        "        2e-4 * 20 * 2, 2e-3 * 2)\n"
        "print('ONCHIP_FUSED_HOVERING OK')\n"
    )
    run_tpu_child(code, "ONCHIP_FUSED_HOVERING OK")


@pytest.mark.slow
def test_fused_hovering_motor_lag_parity_on_real_tpu():
    """motor_alpha > 0: the in-VMEM rotor-lag state must track the XLA
    first-order lag on hardware too (the lag feeds the force lanes the
    Mosaic scheduler reorders most aggressively)."""
    code = _HOVER_COMMON + (
        "tau = 0.05\n"
        "task, s0, act = setup(motor_tau=tau)\n"
        "st, rew_s = std_rollout(task, s0, act)\n"
        "alpha = float(np.exp(-task.params.dt / tau))\n"
        "packed = fh.pack_state(s0.core)\n"
        "ar = task.remap_actions(act)[0]\n"
        "out, rew_f = fh.rollout_fused(packed, ar,\n"
        "                              jnp.array([3], jnp.int32), 20,\n"
        "                              motor_alpha=alpha)\n"
        "compare(fh.unpack_root(out), st.core.root, rew_f, rew_s,\n"
        "        2e-4 * 20 * 2, 2e-3 * 2)\n"
        "dro = np.abs(np.array(out[25:29].T)\n"
        "             - np.array(st.core.rotors)).max()\n"
        "print('rotor diff', dro)\n"
        "assert dro < 2e-4, dro\n"
        "print('ONCHIP_FUSED_MOTORLAG OK')\n"
    )
    run_tpu_child(code, "ONCHIP_FUSED_MOTORLAG OK")


@pytest.mark.slow
def test_fused_policy_rollout_parity_on_real_tpu():
    """Policy-IN-kernel rollout (ops/fused_rollout): the stored
    mu/value/neglogp must match the flax model evaluated on the stored
    observations, compiled (mirrors test_fused_ppo.py:23-44)."""
    code = TPU_GATE + (
        "import airgym_tpu.envs as envs\n"
        "from airgym_tpu.models import actor_critic as ac\n"
        "from airgym_tpu.ops import fused_hovering as fh\n"
        "from airgym_tpu.ops import fused_rollout as fr\n"
        "from airgym_tpu.rl import ppo as ppo_mod\n"
        "N = fr.TILE\n"
        "task = envs.make_task('hovering', ctl_mode='rate', num_envs=N)\n"
        "tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,\n"
        "                                         minibatch_size=1024))\n"
        "ts = tr.init(jax.random.PRNGKey(0))\n"
        "pack = fr.pack_policy(ts.params, ts.obs_rms)\n"
        "packed = fh.pack_state(ts.env_state.core)\n"
        "out, rec = fr.rollout_fused_policy(packed, pack,\n"
        "                                   jnp.array([3], jnp.int32), 4)\n"
        "assert bool(jnp.all(jnp.isfinite(rec)))\n"
        "obs = rec[1, 0:18].T\n"
        "mu, sigma, value = tr.model.apply(ts.params, obs, ts.obs_rms)\n"
        "dmu = np.abs(np.array(mu) - np.array(rec[1, 24:28].T)).max()\n"
        "dv = np.abs(np.array(value[:, 0]) - np.array(rec[1, 23])).max()\n"
        "act = rec[1, 18:22].T\n"
        "nlp = ac.neglogp(act, mu, sigma, jnp.log(sigma))\n"
        "dn = np.abs(np.array(nlp) - np.array(rec[1, 22])).max()\n"
        "print('mu diff', dmu, 'value diff', dv, 'neglogp diff', dn)\n"
        "assert dmu < 5e-4, dmu\n"
        "assert dv < 5e-4, dv\n"
        "assert dn < 2e-3, dn\n"
        "print('ONCHIP_FUSED_POLICY OK')\n"
    )
    run_tpu_child(code, "ONCHIP_FUSED_POLICY OK")


def _onestep_variant_code(task_name: str, pack_expr: str, obs_expr: str,
                          rew_row: int, token: str) -> str:
    """One deterministic (sigma ~ 0) compiled kernel step vs the XLA task
    driven by the same policy mean (mirrors the balloon/tracking
    interpret tests)."""
    return TPU_GATE + (
        "import airgym_tpu.envs as envs\n"
        "from airgym_tpu.ops import fused_hovering as fh\n"
        "from airgym_tpu.ops import fused_rollout as fr\n"
        "from airgym_tpu.rl import ppo as ppo_mod\n"
        "N = fr.TILE\n"
        f"task_name = '{task_name}'\n"
        "task = envs.make_task(task_name, ctl_mode='rate', num_envs=N,\n"
        "                      obs_noise=False)\n"
        "tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4,\n"
        "                                         minibatch_size=1024))\n"
        "ts = tr.init(jax.random.PRNGKey(0))\n"
        "params = jax.tree.map(lambda x: x, ts.params)\n"
        "params['params']['logstd'] = jnp.full_like(\n"
        "    params['params']['logstd'], -20.0)\n"
        "ts = ts._replace(params=params)\n"
        "env_state = ts.env_state\n"
        "pack = fr.pack_policy(ts.params, ts.obs_rms)\n"
        f"packed = {pack_expr}\n"
        "out, rec = fr.rollout_fused_policy(packed, pack,\n"
        "                                   jnp.array([5], jnp.int32), 1,\n"
        "                                   obs_noise=False,\n"
        "                                   task=task_name)\n"
        f"obs = {obs_expr}\n"
        "mu, _, _ = tr.model.apply(ts.params, obs, ts.obs_rms)\n"
        "action = jnp.clip(mu, -1.0, 1.0)\n"
        "ns, step_out = jax.jit(task.step)(env_state, action)\n"
        "kept = ~np.array(step_out.reset)\n"
        "assert kept.mean() > 0.5\n"
        f"drew = np.abs(np.array(rec[0, {rew_row}])[kept]\n"
        "              - np.array(step_out.reward)[kept]).max()\n"
        "root_f = np.array(out[0:13].T)[kept]\n"
        "root_s = np.array(ns.core.root)[kept]\n"
        "sign = np.sign(np.sum(root_f[:, 3:7] * root_s[:, 3:7], axis=1,\n"
        "                      keepdims=True))\n"
        "root_f[:, 3:7] *= sign\n"
        "droot = np.abs(root_f - root_s).max()\n"
        "print('reward diff', drew, 'root diff', droot)\n"
        "assert drew < 1e-2, drew\n"
        "assert droot < 4e-3, droot\n"
        f"print('{token}')\n"
    )


@pytest.mark.slow
def test_fused_balloon_onestep_parity_on_real_tpu():
    code = _onestep_variant_code(
        "balloon",
        "fr.pack_state_balloon(env_state.core, env_state.balloon, "
        "env_state.pre_root_pos)",
        "tr.task._observations(env_state.core.root, env_state.balloon, "
        "jax.random.PRNGKey(1))",
        rew_row=28, token="ONCHIP_FUSED_BALLOON OK")
    run_tpu_child(code, "ONCHIP_FUSED_BALLOON OK")


@pytest.mark.slow
def test_fused_tracking_onestep_parity_on_real_tpu():
    obs_expr = (
        "jnp.concatenate(["
        "task.state_obs18(env_state.core.root, jax.random.PRNGKey(1)), "
        "(task.ref_trajectory(env_state.core.progress) "
        "- env_state.core.root[:, None, 0:3]).reshape(N, -1)], axis=-1)")
    code = _onestep_variant_code(
        "tracking", "fh.pack_state(env_state.core)", obs_expr,
        rew_row=58, token="ONCHIP_FUSED_TRACKING OK")
    run_tpu_child(code, "ONCHIP_FUSED_TRACKING OK")


@pytest.mark.slow
def test_fused_update_parity_on_real_tpu():
    """Mosaic-compiled fused UPDATE kernel vs the XLA minibatch scan on
    the same chip: one full update phase over a real rollout dataset
    (mirrors tests/test_fused_update.py's interpret check)."""
    code = TPU_GATE + (
        "import airgym_tpu.envs as envs\n"
        "from airgym_tpu.ops import fused_update as fu\n"
        "from airgym_tpu.ops import fused_rollout as fr\n"
        "from airgym_tpu.rl import ppo as ppo_mod\n"
        "from airgym_tpu.rl.fused_ppo import FusedHoveringPPO\n"
        "task = envs.make_task('hovering', ctl_mode='rate',\n"
        "                      num_envs=fr.TILE)\n"
        "cfg = ppo_mod.PPOConfig(horizon=4, minibatch_size=512,\n"
        "                        mini_epochs=3)\n"
        "tr = ppo_mod.PPO(task, cfg)\n"
        "ts = tr.init(jax.random.PRNGKey(0))\n"
        "ts = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))\n"
        "ts, traj, last_value, _ = jax.jit(tr.rollout)(ts)\n"
        "values, adv, returns = tr.compute_gae(ts, traj, last_value)\n"
        "ts = ts._replace(obs_rms=ts.obs_rms.update(traj.prenorm))\n"
        "vr = ts.value_rms.update(values).update(returns)\n"
        "ts = ts._replace(value_rms=vr)\n"
        "vm, rm = vr.normalize(values), vr.normalize(returns)\n"
        "adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)\n"
        "flat = lambda x: jnp.swapaxes(x, 0, 1).reshape(\n"
        "    (tr.batch_size,) + x.shape[2:])\n"
        "ds = {'obs': flat(traj.obs), 'actions': flat(traj.actions),\n"
        "      'neglogp': flat(traj.neglogp), 'values': flat(vm),\n"
        "      'returns': flat(rm), 'adv': flat(adv),\n"
        "      'mus_init': flat(traj.mus),\n"
        "      'sigmas_init': flat(traj.sigmas)}\n"
        "ts_ref, m_ref = jax.jit(tr.update)(ts, dict(ds))\n"
        "ftr = FusedHoveringPPO(task, cfg)\n"
        "ts_f, m_f = jax.jit(ftr.update)(ts, dict(ds))\n"
        "ref = fu.pack_update(ts_ref.params)\n"
        "got = fu.pack_update(ts_f.params)\n"
        "worst = 0.0\n"
        "for f in fu._FIELDS:\n"
        "    a = np.asarray(getattr(ref, f)); b = np.asarray(\n"
        "        getattr(got, f))\n"
        "    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-3)\n"
        "    worst = max(worst, float(rel))\n"
        "    print(f, 'rel diff', rel)\n"
        "assert worst < 5e-3, worst\n"
        "import numpy as _np\n"
        "_np.testing.assert_allclose(float(ts_f.lr), float(ts_ref.lr),\n"
        "                            rtol=1e-6)\n"
        "for k in ('loss', 'kl', 'a_loss', 'c_loss', 'clip_frac'):\n"
        "    _np.testing.assert_allclose(float(m_f[k]), float(m_ref[k]),\n"
        "                                rtol=2e-2, atol=1e-3, err_msg=k)\n"
        "print('ONCHIP_FUSED_UPDATE OK')\n"
    )
    run_tpu_child(code, "ONCHIP_FUSED_UPDATE OK")
