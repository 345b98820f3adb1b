"""Buffer-donation regression tests (VERDICT r1 weak #3).

Two failure modes are pinned here:
  * double donation — obs["image"] and env_state.camera were the SAME
    buffer carried twice in the TrainState ("Attempt to donate the same
    buffer twice"); the TrainState now stores dict obs WITHOUT the image
    and train_epoch re-joins it from env_state.camera in-graph,
  * layout-mismatched aliasing — XLA gives conv-consumed image params a
    non-default layout, which broke input/output aliasing at execute time
    on the TPU runtime; make_train_epoch pins default layouts on every
    >=3D TrainState leaf.
"""
import jax
import jax.numpy as jnp
import pytest

import airgym_tpu.envs as envs
from airgym_tpu.rl import ppo as ppo_mod


def _trainer(name, ctl, n=16, full_cam=False):
    """Donation/dedup semantics don't depend on forest size or camera
    resolution, and on the 1-CPU suite host the 212x120 conv work + the
    40-tree render chain dominate wall-clock; default to a small scene
    and camera, with full_cam=True for the one full-size driver guard."""
    kw = {}
    if name == "planning":
        kw["num_trees"] = 6
        if not full_cam:
            kw.update(cam_width=64, cam_height=32)
    task = envs.make_task(name, ctl_mode=ctl, num_envs=n, **kw)
    return ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=8, minibatch_size=2 * n, mini_epochs=2))


def test_dict_obs_donation_runs():
    # full-size camera: this is THE driver-config guard — the first call
    # creates the donated buffers, the second consumes them. n=8: the
    # guard is about the 212x120 conv-consumed buffer layout, not the
    # env count; 8 envs halve the 1-CPU conv wall-clock.
    tr = _trainer("planning", "vel", n=8, full_cam=True)
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch()            # donation ON by default
    for _ in range(2):
        ts, m = step(ts)
    assert jnp.isfinite(m["mean_reward"])
    assert jnp.isfinite(m["a_loss"])


def test_state_obs_donation_runs():
    tr = _trainer("hovering", "rate", n=32)
    ts = tr.init(jax.random.PRNGKey(0))
    step = tr.make_train_epoch()
    for _ in range(3):
        ts, m = step(ts)
    assert jnp.isfinite(m["mean_reward"])


def test_trainstate_obs_carries_no_image():
    """The stored TrainState must not alias env_state.camera in obs."""
    tr = _trainer("planning", "vel")
    ts = tr.init(jax.random.PRNGKey(0))
    assert isinstance(ts.obs, dict) and "image" not in ts.obs
    # donate=True: same HLO as test_dict_obs_donation_runs -> compile
    # cache hit (donate=False would be a second heavy unique compile);
    # ts is consumed but all asserts are on ts2
    step = tr.make_train_epoch()
    ts2, _ = step(ts)
    assert "image" not in ts2.obs


@pytest.mark.slow
def test_donation_matches_no_donation():
    """Donation is an aliasing optimization — numerics must be identical.

    slow: compiles the planning train epoch TWICE (donate on/off) — the
    donate=True driver guard itself stays in the fast tier above."""
    tr = _trainer("planning", "vel")
    ts_a = tr.init(jax.random.PRNGKey(7))
    ts_b = tr.init(jax.random.PRNGKey(7))
    step_d = tr.make_train_epoch(donate=True)
    step_n = tr.make_train_epoch(donate=False)
    for _ in range(2):
        ts_a, ma = step_d(ts_a)
        ts_b, mb = step_n(ts_b)
    assert jnp.allclose(ma["mean_reward"], mb["mean_reward"])
    assert jnp.allclose(ma["a_loss"], mb["a_loss"], rtol=1e-5,
                        atol=1e-6)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: jnp.allclose(a, b, rtol=1e-5, atol=1e-6),
        ts_a.params, ts_b.params))


def test_rollout_images_stored_bf16():
    """compress_image_obs stores rollout frames as bfloat16 (halves the
    dominant vision-task HBM buffer)."""
    tr = _trainer("planning", "vel")
    assert tr.frame_dedup                       # cam_every=4 divides 8
    ts = tr.init(jax.random.PRNGKey(0))
    ts = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))
    _, traj, _, _ = tr.rollout(ts)
    assert "image" not in traj.obs              # deduped out of the scan
    assert traj.frames.dtype == jnp.bfloat16
    assert traj.frames.shape[0] == tr.num_frames
    assert traj.obs["observation"].dtype == jnp.float32


@pytest.mark.slow
def test_frame_dedup_reconstructs_full_rollout():
    """frames[frame_idx[h], n] must equal the naive per-step image store
    for every (h, n) — the dedup is exact, not an approximation.

    slow: compiles two full rollouts (dedup + naive image store)."""
    task = envs.make_task("planning", ctl_mode="vel", num_envs=8,
                          num_trees=6, cam_width=64, cam_height=32)
    cfg = ppo_mod.PPOConfig(horizon=8, minibatch_size=16, mini_epochs=1)
    import dataclasses
    tr_d = ppo_mod.PPO(task, cfg)
    tr_n = ppo_mod.PPO(task, dataclasses.replace(
        cfg, dedup_image_frames=False))
    ts = tr_d.init(jax.random.PRNGKey(3))
    ts = ts._replace(obs=tr_d._join_obs(ts.obs, ts.env_state))
    _, traj_d, _, _ = tr_d.rollout(ts)
    _, traj_n, _, _ = tr_n.rollout(ts)
    recon = traj_d.frames[traj_d.frame_idx]     # [H, N, 1, W, H]
    assert jnp.array_equal(recon, traj_n.obs["image"])
    # and the minibatch gather path sees the same samples env-major
    H, N = 8, 8
    dataset = {"frames": traj_d.frames, "frame_idx": traj_d.frame_idx}
    naive = jnp.swapaxes(traj_n.obs["image"], 0, 1).reshape(
        (H * N,) + traj_n.obs["image"].shape[2:])
    frames, frame_idx = dataset["frames"], dataset["frame_idx"]
    for k in range(H * N // 16):
        j = k * 16 + jnp.arange(16)
        got = frames[frame_idx[j % H], j // H]
        assert jnp.array_equal(got, naive[k * 16:(k + 1) * 16])


def test_scan_layout_minibatch_extraction_exact():
    """update()'s env-major image minibatches must equal the naive
    full-transpose path, including spans that cut mid-trajectory."""
    task = envs.make_task("planning", ctl_mode="vel", num_envs=16,
                          num_trees=6, cam_width=64, cam_height=32)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=12, minibatch_size=16, mini_epochs=1))
    H, N = 12, 16
    img = jnp.arange(H * N * 3, dtype=jnp.float32).reshape(H, N, 3)
    flat = jnp.swapaxes(img, 0, 1).reshape(H * N, 3)
    for k in range(H * N // 16):
        got = tr._mb_from_scan_layout(img, jnp.asarray(k), 16)
        assert jnp.array_equal(got, flat[k * 16:(k + 1) * 16])


@pytest.mark.slow
def test_feature_dedup_loss_matches_full_image_path():
    """Encoding unique frames + gathering features must give the same
    loss and gradients as running the encoder per sample on the gathered
    full-image minibatch.

    slow: f32-conv loss gradients both ways — two heavy autodiff
    compiles. The dedup path's basic liveness stays fast-tier via
    test_dict_obs_donation_runs."""
    task = envs.make_task("planning", ctl_mode="vel", num_envs=8,
                          num_trees=6, cam_width=64, cam_height=32)
    # f32 convs for the comparison: in bf16 the conv BIAS grads (100k-term
    # sums with heavy cancellation) carry accumulation noise larger than
    # their net value, masking real wiring bugs
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=8, minibatch_size=16, mini_epochs=1),
        network_kw={"cnn_compute_dtype": None})
    ts = tr.init(jax.random.PRNGKey(5))
    ts = ts._replace(obs=tr._join_obs(ts.obs, ts.env_state))
    _, traj, _, _ = tr.rollout(ts)
    H, N, mb = 8, 8, 16
    me = -(-mb // H) + 1

    k = 2
    start = k * mb
    e0 = min(start // H, N - me)
    win = traj.frames[:, e0:e0 + me]
    img_u = win.reshape((win.shape[0] * me,) + win.shape[2:])
    j = start + jnp.arange(mb)
    feat_idx = traj.frame_idx[j % H] * me + (j // H - e0)
    naive_img = traj.frames[traj.frame_idx[j % H], j // H]

    obs_vec = jnp.swapaxes(traj.obs["observation"], 0, 1).reshape(
        N * H, -1)[start:start + mb]
    mb_common = {
        "actions": jnp.zeros((mb, tr.num_actions)),
        "neglogp": jnp.zeros((mb,)), "adv": jnp.ones((mb,)),
        "values": jnp.zeros((mb,)), "returns": jnp.ones((mb,)),
        "mus": jnp.zeros((mb, tr.num_actions)),
        "sigmas": jnp.ones((mb, tr.num_actions)),
    }
    mb_dedup = dict(mb_common, obs={
        "observation": obs_vec, "image_unique": img_u,
        "feat_index": feat_idx})
    mb_naive = dict(mb_common, obs={
        "observation": obs_vec, "image": naive_img})

    def loss(params, mbx):
        return tr._loss_fn(params, ts.obs_rms, ts.value_rms, mbx)[0]

    (la, ga) = jax.value_and_grad(loss)(ts.params, mb_dedup)
    (lb, gb) = jax.value_and_grad(loss)(ts.params, mb_naive)
    assert jnp.allclose(la, lb, rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        assert jnp.allclose(a, b, rtol=1e-4, atol=1e-6)


def test_frame_dedup_phase_guard_rejects_misaligned_counter():
    """make_train_epoch's phase check must reject an env counter that is
    not a multiple of cam_every (the dedup rollout's block alignment
    contract) and accept an aligned one."""
    task = envs.make_task("planning", ctl_mode="vel", num_envs=8,
                          num_trees=6, cam_width=64, cam_height=32)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(
        horizon=8, minibatch_size=16, mini_epochs=1))
    ts = tr.init(jax.random.PRNGKey(0))
    assert int(ts.env_state.counter) % task.cfg.cam_every == 0

    seen = []
    checked = tr._check_phase(lambda t: seen.append(True))
    bad = ts._replace(env_state=ts.env_state._replace(
        counter=ts.env_state.counter + 1))
    with pytest.raises(ValueError, match="cam_every"):
        checked(bad)
    checked(ts)
    assert seen == [True]
