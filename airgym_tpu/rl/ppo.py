"""Fully-jitted PPO trainer (reference: lib/agent/a2c_base.py +
a2c_continuous.py + lib/core/*).

One ``train_epoch`` call = the reference's play_steps + prepare_dataset +
mini-epoch SGD loop, as a single jitted function:

  * rollout: ``lax.scan`` over the horizon — policy forward, env step,
    experience collected as stacked [H, N, ...] arrays
    (reference play_steps, a2c_base.py:651-711),
  * GAE with the reference's discount (a2c_base.py:463-478), reward
    shaping x0.1 (tr_helpers.py:16-42) and value bootstrap on time-outs
    (a2c_base.py:675-676),
  * input/value running-mean-std normalization (running_mean_std.py),
  * mini-epochs x contiguous minibatches (the reference's PPODataset does
    NOT shuffle — datasets.py:6-44; we flatten env-major so minibatch
    slices stay aligned with the sharded env axis),
  * clipped PPO actor loss, critic loss, bounds loss, grad-norm clip
    (a2c_continuous.py:299-369, common_losses.py),
  * per-mini-epoch adaptive-KL learning rate x/÷1.5 against
    kl_threshold (schedulers.py:81-94) with the reference's mu/sigma
    write-back between mini-epochs (datasets.py update_mu_sigma),

Multi-chip: the env axis of every [N, ...] array is sharded over the mesh;
parameters/optimizer state are replicated. Loss means over the sharded
batch make XLA insert the psum — the explicit NCCL plumbing of the
reference (a2c_base.py:293-316) has no analogue here by construction.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from airgym_tpu.models import actor_critic as ac
from airgym_tpu.rl import losses as losses_mod
from airgym_tpu.rl import moving_stats as mstats
from airgym_tpu.rl.running_stats import RunningMeanStd


# --------------------------------------------------------------------------
# 64-bit-safe frame counter. int32 overflows at 2.1B frames (an afternoon at
# the demonstrated 8M steps/s) and int64 needs global x64, which would flip
# default dtypes everywhere. A [lo, hi] uint32 pair keeps the counter inside
# the jitted pytree with exact 64-bit range.


def frame_from_int(n: int) -> jnp.ndarray:
    return jnp.asarray([n & 0xFFFFFFFF, (n >> 32) & 0xFFFFFFFF], jnp.uint32)


def frame_to_int(frame) -> int:
    arr = np.asarray(frame).reshape(-1)
    if arr.shape[0] == 1:          # legacy scalar checkpoints
        return int(arr[0])
    return int(arr[0]) + (int(arr[1]) << 32)


def frame_add(frame: jnp.ndarray, n: int) -> jnp.ndarray:
    lo = frame[0] + jnp.uint32(n & 0xFFFFFFFF)
    carry = (lo < frame[0]).astype(jnp.uint32)
    return jnp.stack([lo, frame[1] + jnp.uint32(n >> 32) + carry])


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters; defaults = ppo_hovering.yaml:29-76."""
    horizon: int = 24
    minibatch_size: int = 2048
    mini_epochs: int = 5
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    lr_schedule: str = "adaptive"          # adaptive | fixed | linear
    kl_threshold: float = 0.008
    min_lr: float = 1e-6
    max_lr: float = 1e-2
    e_clip: float = 0.2
    use_smooth_clamp: bool = False  # smoothed_actor_loss (a2c_base.py:270-274)
    clip_value: bool = False
    critic_coef: float = 2.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 1e-4
    grad_norm: float = 1.5
    truncate_grads: bool = True
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    # moving-stats advantage normalization (reference a2c_base.py:277-279,
    # GeneralizedMovingStats); overrides per-batch normalization when on
    normalize_rms_advantage: bool = False
    rms_advantage_decay: float = 0.995
    value_bootstrap: bool = True
    # bf16 storage for rollout image observations (see rollout()); halves
    # the dominant vision-task HBM buffer, input noise floor unaffected
    compress_image_obs: bool = True
    # store only the UNIQUE camera frames of a rollout (cameras render
    # every task.cam_every steps off a global counter, so consecutive
    # steps repeat the same frame — reference customized.py:399-404
    # renders on the same cadence). Cuts the dominant vision buffer by
    # cam_every x; minibatches gather (frame, env) pairs on the fly.
    dedup_image_frames: bool = True
    reward_shaper_scale: float = 0.1
    max_epochs: int = 200
    save_frequency: int = 100
    save_best_after: int = 10
    score_to_win: float = 1e5


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    obs_rms: Any                    # RunningMeanStd pytree (or dict) / None
    value_rms: Optional[RunningMeanStd]
    adv_ms: Any                     # MovingStats or None (rms-advantage)
    env_state: Any
    obs: Any                        # last obs (raw)
    lr: jnp.ndarray                 # scalar, adapted by KL
    epoch: jnp.ndarray              # scalar int
    frame: jnp.ndarray              # total env steps
    ep_return: jnp.ndarray          # [N] running episodic return (shaped x10)
    ep_length: jnp.ndarray          # [N] running episode length
    last_ep_return: jnp.ndarray     # [N] return of last finished episode
    last_ep_length: jnp.ndarray     # [N]
    rng: jnp.ndarray
    # [N] 1.0 iff the last finished episode ended by task success (tasks
    # with has_success, e.g. Planning goal reach); None otherwise
    last_ep_success: Any = None
    # [N] 1.0 iff the last finished ENV-level episode ended by env success
    # (tasks with has_env_success, e.g. MAPlanning: ANY robot reached the
    # goal before the any-robot env reset — reference maplanning.py:581-584
    # resets the whole env on any robot event, so the per-robot success
    # above is structurally capped near 1/num_robots and cannot gate
    # best-checkpointing on the task's actual win condition); None otherwise
    last_ep_env_success: Any = None


class Rollout(NamedTuple):
    obs: Any
    prenorm: jnp.ndarray           # pre-normalization mlp-input vector
    actions: jnp.ndarray
    neglogp: jnp.ndarray
    values: jnp.ndarray             # normalized (model-space) values
    mus: jnp.ndarray
    sigmas: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    timeouts: jnp.ndarray
    # frame-dedup fields (vision tasks with cam_every > 1, see rollout):
    # frame_idx [H] — which unique frame each step observed; frames
    # [F, N, 1, W, H] — the unique frames themselves (carried, not
    # scan-stacked; attached to the Rollout after the scan).
    frame_idx: Any = None
    frames: Any = None


class PPO:
    """Builder: binds a functional task + model into jitted train/play fns."""

    def __init__(self, task, cfg: PPOConfig = PPOConfig(),
                 network_kw: Optional[dict] = None):
        self.task = task
        self.cfg = cfg
        # actor count: num_envs, or num_envs * num_agents for multi-agent
        # tasks that flatten the robot axis (reference a2c_base.py:196)
        self.num_envs = getattr(task, "flat_n", task.cfg.num_envs)
        self.num_actions = task.cfg.num_actions
        nkw = dict(network_kw or {})
        self.model = ac.ActorCritic(num_actions=self.num_actions, **nkw)
        self.optimizer = optax.adam(
            learning_rate=1.0, b1=0.9, b2=0.999, eps=1e-8)
        # lr is folded in manually (scale by -lr after adam) so the adaptive
        # schedule can change it inside jit.

        self.batch_size = self.num_envs * cfg.horizon
        # config validation is deferred to the TRAIN paths: a player
        # evaluating with few envs under a large-scale training YAML never
        # touches minibatches and must not be rejected at init
        self._minibatch_error = None
        if cfg.minibatch_size > self.batch_size:
            self._minibatch_error = (
                f"minibatch_size ({cfg.minibatch_size}) exceeds the rollout "
                f"batch ({self.num_envs} envs x {cfg.horizon} horizon = "
                f"{self.batch_size}) — lower minibatch_size or raise "
                f"num_envs/horizon_length")
        self.num_minibatches = max(1, self.batch_size // cfg.minibatch_size)
        if self.batch_size % self.num_minibatches:
            self._minibatch_error = (
                f"minibatch_size ({cfg.minibatch_size}) must divide the "
                f"rollout batch ({self.batch_size}) into equal minibatches")

        # frame dedup (see PPOConfig.dedup_image_frames): exact only when
        # cam_every divides the horizon — then every rollout contains
        # exactly horizon/cam_every renders regardless of counter phase,
        # so the [F, N, ...] buffer is fully used with F below.
        self.cam_every = int(getattr(
            task, "cam_every", getattr(task.cfg, "cam_every", 1)))
        self.frame_dedup = (
            cfg.dedup_image_frames
            and getattr(task, "obs_is_dict", False)
            and self.cam_every > 1
            and cfg.horizon % self.cam_every == 0)
        self.num_frames = cfg.horizon // self.cam_every + 1

    # ------------------------------------------------------------------ init

    def _obs_spec(self):
        """Shape/dtype spec of a single-env observation."""
        if getattr(self.task, "obs_is_dict", False):
            return {k: v for k, v in self.task.obs_spec.items()}
        return (self.task.num_obs,)

    # Dict-obs tasks return obs["image"] as the SAME device buffer as
    # env_state.camera (the task steps cache the last rendered frame).
    # Carrying both in the TrainState would donate one buffer twice at the
    # jit call boundary ("Attempt to donate the same buffer twice"), so the
    # stored TrainState keeps obs WITHOUT the image; train_epoch re-joins
    # it from env_state.camera inside the graph (pure aliasing, free).

    def _strip_obs(self, obs):
        if isinstance(obs, dict) and "image" in obs:
            return {k: v for k, v in obs.items() if k != "image"}
        return obs

    def _join_obs(self, obs, env_state):
        if isinstance(obs, dict) and "image" not in obs:
            return {**obs, "image": env_state.camera}
        return obs

    def init(self, key) -> TrainState:
        k_env, k_model, k_rng = jax.random.split(key, 3)

        def env_warmup(k):
            env_state = self.task.initial_state(k)
            # reset() semantics: zero-action step to get first obs
            env_state, out0 = self.task.step(
                env_state, jnp.zeros((self.num_envs, self.num_actions)))
            if self.frame_dedup:
                # phase-align the render cadence to the rollout blocks:
                # with counter % cam_every == 0 at rollout start, every
                # camera render lands on the LAST step of a cam_every
                # block, so the nested rollout scan encodes features
                # exactly once per block (see rollout()). A few
                # zero-action warmup steps — same spirit as IsaacGym's
                # sim warmup on reset.
                for _ in range(self.cam_every - 1):
                    env_state, out0 = self.task.step(
                        env_state,
                        jnp.zeros((self.num_envs, self.num_actions)))
            return env_state, out0

        # One compiled call instead of thousands of eager dispatches.
        # Over a tunneled TPU every eager op is a host<->device round
        # trip; un-jitted, this warmup dominated cold-start wall-clock
        # (minutes of device-queue drain BEHIND the dispatch, stalling
        # the first train-epoch lowering when it fetched constants).
        env_state, out0 = jax.jit(env_warmup)(k_env)
        obs = out0.obs

        sample = jax.tree.map(lambda x: x[:1], obs)
        params = jax.jit(self.model.init)(k_model, sample)

        obs_rms = None
        if self.cfg.normalize_input:
            if isinstance(obs, dict):
                # 'observation' stats cover [obs ++ encoder features];
                # only the SHAPE is needed — eval_shape runs no device op
                prenorm = jax.eval_shape(
                    lambda p, s: self.model.apply(
                        p, s, None, return_prenorm=True),
                    params, sample)[3]
                obs_rms = {
                    "image": RunningMeanStd.create(
                        obs["image"].shape[1:]),
                    "observation": RunningMeanStd.create(
                        prenorm.shape[1:]),
                }
            else:
                obs_rms = RunningMeanStd.create(obs.shape[1:])
        value_rms = (RunningMeanStd.create(()) if self.cfg.normalize_value
                     else None)

        n = self.num_envs
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            obs_rms=obs_rms,
            value_rms=value_rms,
            adv_ms=(mstats.MovingStats.create(())
                    if self.cfg.normalize_rms_advantage else None),
            env_state=env_state,
            obs=self._strip_obs(obs),
            lr=jnp.asarray(self.cfg.learning_rate, jnp.float32),
            epoch=jnp.asarray(0, jnp.int32),
            frame=frame_from_int(0),
            ep_return=jnp.zeros((n,)),
            ep_length=jnp.zeros((n,)),
            last_ep_return=jnp.zeros((n,)),
            last_ep_length=jnp.zeros((n,)),
            last_ep_success=(jnp.zeros((n,)) if getattr(
                self.task, "has_success", False) else None),
            last_ep_env_success=(jnp.zeros((n,)) if getattr(
                self.task, "has_env_success", False) else None),
            rng=k_rng,
        )

    # --------------------------------------------------------------- rollout

    def _encode_frames(self, params, obs_rms, imgs):
        """Apply the model's image-encoder submodule directly to a batch
        of camera frames -> features [B, feature_dim].

        Same parameters and normalization as ActorCritic.encode's image
        branch; used by the frame-dedup fast paths to encode each UNIQUE
        frame once instead of once per (env, step) sample."""
        if obs_rms is not None:
            imgs = obs_rms["image"].normalize(imgs)
        m = self.model
        if m.image_encoder == "vae":
            from airgym_tpu.models.vae import VAEEncoder
            mod, name = VAEEncoder(latent_dim=m.vae_latent_dim), "actor_enc"
        elif m.image_encoder == "resnet":
            from airgym_tpu.models.resnet import ResNet18Encoder
            mod = ResNet18Encoder(output_dim=m.image_feature_dim)
            name = "actor_resnet"
        else:
            mod = ac.CNNEncoder(feature_dim=m.image_feature_dim,
                                compute_dtype=m.cnn_compute_dtype,
                                impl=getattr(m, "cnn_impl", "auto"))
            name = "actor_cnn"
        return mod.apply({"params": params["params"][name]}, imgs)

    def _policy(self, params, obs_rms, obs, key):
        mu, sigma, value, prenorm = self.model.apply(
            params, obs, obs_rms, return_prenorm=True)
        noise = jax.random.normal(key, mu.shape)
        action = mu + sigma * noise
        nlp = ac.neglogp(action, mu, sigma, jnp.log(sigma))
        return action, nlp, mu, sigma, value[..., 0], prenorm

    def rollout(self, ts: TrainState) -> Tuple[TrainState, Rollout, jnp.ndarray]:
        cfg = self.cfg
        dedup = self.frame_dedup
        store_t = jnp.bfloat16 if cfg.compress_image_obs else None

        def step_fn(carry, _, render=None):
            (env_state, obs, ep_ret, ep_len, last_ret, last_len, last_suc,
             last_env_suc, rng, feat) = carry
            rng, k_act = jax.random.split(rng)
            # frame dedup: the camera only changes every cam_every steps,
            # so the encoder features are cached in the carry and
            # recomputed only on render ticks (4x less conv work)
            obs_pol = obs
            if dedup:
                obs_pol = {"observation": obs["observation"],
                           "features": feat}
            action, nlp, mu, sigma, value, prenorm = self._policy(
                ts.params, ts.obs_rms, obs_pol, k_act)
            clamped = jnp.clip(action, -1.0, 1.0)
            if render is None:
                env_state, out = self.task.step(env_state, clamped)
            else:
                # STATIC render decision (valid because init() phase-
                # aligns the cadence): a traced lax.cond inside the
                # rollout scan executes its render branch every step on
                # this backend — 4x the render work and the dominant
                # rollout cost before this was made static
                env_state, out = self.task.step(env_state, clamped,
                                                render=render)

            # episode stats (reference a2c_base.py:680-695)
            ep_ret = ep_ret + out.reward
            ep_len = ep_len + 1.0
            done_f = out.reset.astype(ep_ret.dtype)
            last_ret = jnp.where(out.reset, ep_ret, last_ret)
            last_len = jnp.where(out.reset, ep_len, last_len)
            ep_ret = ep_ret * (1.0 - done_f)
            ep_len = ep_len * (1.0 - done_f)
            info = dict(out.info)
            success = info.pop("success", None)
            if last_suc is not None:
                if success is None:
                    raise ValueError(
                        f"{type(self.task).__name__} sets has_success=True "
                        f"but its step info has no 'success' entry — every "
                        f"step must emit info['success'] when the flag is "
                        f"set")
                # per-EPISODE success: on each env's reset, record whether
                # the ending step was a task success (e.g. goal reach)
                last_suc = jnp.where(out.reset,
                                     success.astype(ep_ret.dtype), last_suc)
            env_success = info.pop("env_success", None)
            env_done = info.pop("env_done", None)
            if last_env_suc is not None:
                if env_success is None or env_done is None:
                    raise ValueError(
                        f"{type(self.task).__name__} sets has_env_success="
                        f"True but its step info lacks 'env_success'/"
                        f"'env_done' entries — every step must emit both "
                        f"when the flag is set")
                # per ENV-level episode: on each whole-env reset, record
                # whether any robot's ending step was a task success
                last_env_suc = jnp.where(
                    env_done, env_success.astype(ep_ret.dtype), last_env_suc)

            # store images bfloat16: the CNN consumes bf16 anyway (MXU),
            # and f32 rollout storage doubled the dominant HBM buffer
            store_obs = obs
            if isinstance(obs, dict):
                if dedup:
                    # unique frames are emitted once per block by the
                    # outer scan below — nothing image-sized per step.
                    # Features stay constant through the block (phase
                    # alignment puts renders on block-final steps); the
                    # block_fn recomputes them. NOT a lax.cond: on this
                    # backend a cond inside scan pays the branch cost
                    # every iteration (measured 64x the 16 real renders).
                    store_obs = {k: v for k, v in obs.items()
                                 if k != "image"}
                elif cfg.compress_image_obs:
                    store_obs = {**obs,
                                 "image": obs["image"].astype(jnp.bfloat16)}
            data = Rollout(obs=store_obs, prenorm=prenorm, actions=action,
                           neglogp=nlp,
                           values=value, mus=mu, sigmas=sigma,
                           rewards=out.reward, dones=out.reset,
                           timeouts=out.timeout)
            info_means = {k: jnp.mean(v) for k, v in info.items()}
            return ((env_state, out.obs, ep_ret, ep_len, last_ret, last_len,
                     last_suc, last_env_suc, rng, feat), (data, info_means))

        feat0 = None
        if dedup:
            feat0 = self._encode_frames(ts.params, ts.obs_rms,
                                        ts.obs["image"])
        carry0 = (ts.env_state, ts.obs, ts.ep_return, ts.ep_length,
                  ts.last_ep_return, ts.last_ep_length, ts.last_ep_success,
                  ts.last_ep_env_success, ts.rng, feat0)

        if dedup:
            # Nested scan: the outer loop EMITS one camera frame per
            # cam_every-step block, so the unique-frame buffer is built
            # by scan's write-only output stacking. (A [F, N, W, H]
            # dynamic_update_slice carried through the step scan copies
            # the whole buffer every iteration on this backend — ~11
            # ms/step at avoid scale, 50x the cost of the write itself.)
            # init() phase-aligns the counter so each block's single
            # render lands on its LAST step: the end-of-block camera is
            # render #(b+1), features are block-constant, and the
            # per-step frame pointer is floor((c0+h)/ce) - floor(c0/ce)
            # (= h // ce when aligned).
            ce = self.cam_every
            c0 = ts.env_state.counter

            def block_fn(carry, _):
                carry, ys1 = jax.lax.scan(
                    functools.partial(step_fn, render=False),
                    carry, None, length=ce - 1)
                carry, ys_last = step_fn(carry, None, render=True)
                ys = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b[None]], axis=0),
                    ys1, ys_last)
                img = carry[1]["image"]            # just-rendered frame
                feat = self._encode_frames(ts.params, ts.obs_rms, img)
                carry = carry[:-1] + (feat,)       # features for block b+1
                if store_t is not None:
                    img = img.astype(store_t)
                return carry, (ys, img)

            carry, (ys, frames_rest) = jax.lax.scan(
                block_fn, carry0, None, length=cfg.horizon // ce)
            traj, infos = jax.tree.map(
                lambda x: x.reshape((cfg.horizon,) + x.shape[2:]), ys)
            img0 = ts.obs["image"]
            if store_t is not None:
                img0 = img0.astype(store_t)
            frames = jnp.concatenate([img0[None], frames_rest], axis=0)
            h = jnp.arange(cfg.horizon, dtype=jnp.int32)
            traj = traj._replace(
                frames=frames, frame_idx=(c0 + h) // ce - c0 // ce)
        else:
            carry, (traj, infos) = jax.lax.scan(step_fn, carry0, None,
                                                length=cfg.horizon)
        (env_state, obs, ep_ret, ep_len, last_ret, last_len, last_suc,
         last_env_suc, rng, _) = carry

        # value of the final observation for bootstrapping
        _, _, _, _, last_value, _ = self._policy(
            ts.params, ts.obs_rms, obs, jax.random.PRNGKey(0))

        ts = ts._replace(env_state=env_state, obs=obs, ep_return=ep_ret,
                         ep_length=ep_len, last_ep_return=last_ret,
                         last_ep_length=last_len, last_ep_success=last_suc,
                         last_ep_env_success=last_env_suc, rng=rng)
        return ts, traj, last_value, infos

    # ------------------------------------------------------------------- GAE

    def compute_gae(self, ts: TrainState, traj: Rollout, last_value):
        cfg = self.cfg
        denorm = (ts.value_rms.denormalize if cfg.normalize_value
                  else (lambda v: v))
        values = denorm(traj.values)          # [H, N]
        last_v = denorm(last_value)           # [N]

        rew = traj.rewards * cfg.reward_shaper_scale
        if cfg.value_bootstrap:
            # reference bootstraps with V(s_t) on time-outs
            # (a2c_base.py:675-676)
            rew = rew + cfg.gamma * values * traj.timeouts.astype(rew.dtype)

        nonterminal = 1.0 - traj.dones.astype(rew.dtype)

        def gae_step(carry, inp):
            lastgaelam, next_value = carry
            r, v, nt = inp
            delta = r + cfg.gamma * next_value * nt - v
            lastgaelam = delta + cfg.gamma * cfg.tau * nt * lastgaelam
            return (lastgaelam, v), lastgaelam

        (_, _), adv = jax.lax.scan(
            gae_step, (jnp.zeros_like(last_v), last_v),
            (rew, values, nonterminal), reverse=True)
        returns = adv + values
        return values, adv, returns

    # ---------------------------------------------------------------- update

    def _loss_fn(self, params, obs_rms, value_rms, mb):
        cfg = self.cfg
        obs = mb["obs"]
        if isinstance(obs, dict) and "image_unique" in obs:
            # frame dedup: encode each unique camera frame once, gather
            # the per-sample features (identical numerics, ~3.5x fewer
            # conv FLOPs — see update().unique_window)
            feat_u = self._encode_frames(params, obs_rms,
                                         obs["image_unique"])
            obs = {"observation": obs["observation"],
                   "features": feat_u[obs["feat_index"]]}
        mu, sigma, value = self.model.apply(params, obs, obs_rms)
        value = value[..., 0]
        logstd = jnp.log(sigma)
        nlp = ac.neglogp(mb["actions"], mu, sigma, logstd)

        # clipped surrogate (common_losses.py:39-48); use_smooth_clamp swaps
        # in the sigmoid-smoothed clamp variant (a2c_base.py:270-274)
        ratio = jnp.exp(mb["neglogp"] - nlp)
        surr1 = mb["adv"] * ratio
        if cfg.use_smooth_clamp:
            clamped = losses_mod.smooth_clamp(
                ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        else:
            clamped = jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        surr2 = mb["adv"] * clamped
        a_loss = jnp.maximum(-surr1, -surr2)

        # critic (common_losses.py:6-20); clip_value False in all YAMLs
        if cfg.clip_value:
            v_pred_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -cfg.e_clip, cfg.e_clip)
            c_loss = jnp.maximum(jnp.square(value - mb["returns"]),
                                 jnp.square(v_pred_clipped - mb["returns"]))
        else:
            c_loss = jnp.square(value - mb["returns"])

        # bounds loss (a2c_continuous.py:382-390)
        soft_bound = 1.1
        b_loss = jnp.sum(
            jnp.square(jnp.maximum(mu - soft_bound, 0.0))
            + jnp.square(jnp.minimum(mu + soft_bound, 0.0)), axis=-1)

        ent = ac.entropy(logstd)

        total = (jnp.mean(a_loss)
                 + 0.5 * cfg.critic_coef * jnp.mean(c_loss)
                 - cfg.entropy_coef * jnp.mean(ent)
                 + cfg.bounds_loss_coef * jnp.mean(b_loss))

        # diagnostics + adaptive-lr KL (torch_ext.policy_kl :27-36)
        kl = _policy_kl(mb["mus"], mb["sigmas"], mu, sigma)
        clip_frac = jnp.mean(
            (jnp.abs(ratio - 1.0) > cfg.e_clip).astype(jnp.float32))
        aux = {"a_loss": jnp.mean(a_loss), "c_loss": jnp.mean(c_loss),
               "b_loss": jnp.mean(b_loss), "entropy": jnp.mean(ent),
               "kl": kl, "clip_frac": clip_frac,
               "mu": mu, "sigma": sigma}
        return total, aux

    def _mb_from_scan_layout(self, img, k, mb_size):
        """Env-major minibatch [mb, ...] out of a scan-layout [H, N, ...]
        image buffer, without ever transposing the whole buffer.

        Env-major flat index i = n * H + h. A contiguous span of mb
        samples touches at most ceil(mb/H) + 1 consecutive envs: slice
        that env window, transpose the small block, and cut the span."""
        H = self.cfg.horizon
        N = self.num_envs
        me = -(-mb_size // H) + 1
        start = k * mb_size
        e0 = jnp.minimum(start // H, N - me)
        win = jax.lax.dynamic_slice_in_dim(img, e0, me, axis=1)
        win = jnp.swapaxes(win, 0, 1)             # [me, H, ...]
        win = win.reshape((me * H,) + win.shape[2:])
        return jax.lax.dynamic_slice_in_dim(win, start - e0 * H,
                                            mb_size, axis=0)

    def update(self, ts: TrainState, dataset: Dict[str, Any]):
        cfg = self.cfg
        nmb = self.num_minibatches
        mb_size = self.batch_size // nmb

        if cfg.lr_schedule == "linear":
            # LinearScheduler by epochs (reference schedulers.py:97-119;
            # kl-independent, so once per epoch equals the reference's
            # per-minibatch application)
            mul = jnp.maximum(0.0, 1.0 - ts.epoch / cfg.max_epochs)
            ts = ts._replace(lr=jnp.maximum(
                cfg.min_lr, cfg.learning_rate * mul).astype(jnp.float32))

        # reshape flat [B, ...] -> [nmb, mb, ...]; the image leaf stays in
        # scan layout [H, N, ...] (see train_epoch) and is extracted per
        # minibatch by _mb_from_scan_layout
        def split_mb(x):
            return x.reshape((nmb, mb_size) + x.shape[1:])

        dataset = dict(dataset)
        frames = dataset.pop("frames", None)        # [F, N, ...] (dedup)
        frame_idx = dataset.pop("frame_idx", None)  # [H]
        batched = {}
        scan_img = None
        for key, v in dataset.items():
            if key == "obs" and isinstance(v, dict):
                v = dict(v)
                scan_img = v.pop("image", None)
                batched[key] = {kk: split_mb(a) for kk, a in v.items()}
            else:
                batched[key] = jax.tree.map(split_mb, v)

        H = cfg.horizon

        def unique_window(k):
            """Unique images + per-sample feature pointers for minibatch
            k. The env-major span [k*mb, (k+1)*mb) touches at most
            me = ceil(mb/H)+1 consecutive envs; its unique images are the
            F frames of those envs — [F*me] images for mb samples
            (~3.5x fewer encoder runs). Sample j = n*H + h points at
            window image f*me + (n - e0) with f = frame_idx[h]."""
            # clamp: a minibatch spanning ALL envs needs no +1 overlap env
            me = min(-(-mb_size // H) + 1, self.num_envs)
            start = k * mb_size
            e0 = jnp.minimum(start // H, self.num_envs - me)
            win = jax.lax.dynamic_slice_in_dim(frames, e0, me, axis=1)
            img_u = win.reshape((win.shape[0] * me,) + win.shape[2:])
            j = start + jnp.arange(mb_size)
            n_loc = j // H - e0
            return img_u, frame_idx[j % H] * me + n_loc

        def minibatch_step(carry, idx):
            params, opt_state, lr, mus, sigmas = carry
            mb = {k: jax.tree.map(lambda a: a[idx], v)
                  for k, v in batched.items()}
            if frames is not None:
                # optimization_barrier: keep the conv's preferred layout
                # from propagating into the full frames buffer (XLA would
                # otherwise hoist a relayout copy of all ~GBs of it)
                img_u, feat_idx = unique_window(idx)
                mb["obs"] = dict(mb["obs"])
                mb["obs"]["image_unique"] = jax.lax.optimization_barrier(
                    img_u)
                mb["obs"]["feat_index"] = feat_idx
            elif scan_img is not None:
                mb["obs"] = dict(mb["obs"])
                mb["obs"]["image"] = jax.lax.optimization_barrier(
                    self._mb_from_scan_layout(scan_img, idx, mb_size))
            mb["mus"] = mus[idx]
            mb["sigmas"] = sigmas[idx]
            (loss, aux), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(params, ts.obs_rms,
                                             ts.value_rms, mb)
            if cfg.truncate_grads:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, cfg.grad_norm /
                                    jnp.maximum(gnorm, 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            # mu/sigma write-back (reference datasets.py update_mu_sigma)
            mus = mus.at[idx].set(aux.pop("mu"))
            sigmas = sigmas.at[idx].set(aux.pop("sigma"))
            return (params, opt_state, lr, mus, sigmas), (loss, aux)

        def mini_epoch(carry, _):
            params, opt_state, lr, mus, sigmas = carry
            (params, opt_state, lr, mus, sigmas), (losses, auxs) = \
                jax.lax.scan(minibatch_step,
                             (params, opt_state, lr, mus, sigmas),
                             jnp.arange(nmb))
            av_kl = jnp.mean(auxs["kl"])
            if cfg.lr_schedule == "adaptive":
                # AdaptiveScheduler (schedulers.py:81-94)
                lr = jnp.where(av_kl > 2.0 * cfg.kl_threshold,
                               jnp.maximum(lr / 1.5, cfg.min_lr), lr)
                lr = jnp.where(av_kl < 0.5 * cfg.kl_threshold,
                               jnp.minimum(lr * 1.5, cfg.max_lr), lr)
            return (params, opt_state, lr, mus, sigmas), \
                {"loss": jnp.mean(losses), "kl": av_kl,
                 "a_loss": jnp.mean(auxs["a_loss"]),
                 "c_loss": jnp.mean(auxs["c_loss"]),
                 "b_loss": jnp.mean(auxs["b_loss"]),
                 "entropy": jnp.mean(auxs["entropy"]),
                 "clip_frac": jnp.mean(auxs["clip_frac"])}

        mus0 = batched["mus_init"]
        sigmas0 = batched["sigmas_init"]
        carry0 = (ts.params, ts.opt_state, ts.lr, mus0, sigmas0)
        (params, opt_state, lr, _, _), metrics = jax.lax.scan(
            mini_epoch, carry0, None, length=cfg.mini_epochs)
        metrics = jax.tree.map(lambda x: x[-1], metrics)
        ts = ts._replace(params=params, opt_state=opt_state, lr=lr)
        return ts, metrics

    # ------------------------------------------------------------ train step

    def train_epoch(self, ts: TrainState):
        """play_steps + prepare_dataset + mini-epoch updates, one jit."""
        if self._minibatch_error:
            raise ValueError(self._minibatch_error)
        cfg = self.cfg
        ts = ts._replace(obs=self._join_obs(ts.obs, ts.env_state))
        ts, traj, last_value, infos = self.rollout(ts)
        values, adv, returns = self.compute_gae(ts, traj, last_value)

        # running-stat updates from this epoch's batch. For dict obs the
        # 'observation' stats cover the concatenated [obs ++ features]
        # vector (reference model norm placement); the image stats are
        # per-pixel.
        if cfg.normalize_input:
            if isinstance(ts.obs_rms, dict):
                obs_rms = dict(ts.obs_rms)
                # with frame dedup the per-pixel stats update runs over the
                # unique frames (each observed cam_every steps; equal
                # per-frame weighting, same limit stats)
                imgs = (traj.frames if self.frame_dedup
                        else traj.obs["image"])
                obs_rms["image"] = obs_rms["image"].update(imgs)
                obs_rms["observation"] = obs_rms["observation"].update(
                    traj.prenorm)
                ts = ts._replace(obs_rms=obs_rms)
            else:
                ts = ts._replace(obs_rms=ts.obs_rms.update(traj.prenorm))
        if cfg.normalize_value:
            vr = ts.value_rms.update(values).update(returns)
            ts = ts._replace(value_rms=vr)
            norm = ts.value_rms.normalize
            values_m, returns_m = norm(values), norm(returns)
        else:
            values_m, returns_m = values, returns

        if cfg.normalize_rms_advantage:
            adv_ms = mstats.update_mean_std(ts.adv_ms, adv,
                                            decay=cfg.rms_advantage_decay)
            ts = ts._replace(adv_ms=adv_ms)
            adv = mstats.normalize(adv_ms, adv)
        elif cfg.normalize_advantage:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        # flatten [H, N, ...] env-major -> [N*H, ...] so minibatches group
        # trajectories like the reference's PPODataset (datasets.py:6-44,
        # contiguous slices, no shuffling). Time-major grouping (all envs
        # at one timestep) measurably slows learning — samples within a
        # minibatch are then maximally correlated. The IMAGE leaf is the
        # exception: transposing it would materialize a second copy of
        # the [H, N, 1, 212, 120] buffer (~10 GB at 4096 envs), so it
        # stays in scan layout and update() extracts env-major minibatch
        # windows from it on the fly (see _mb_from_scan_layout).
        def flat(x):
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape((self.batch_size,) + x.shape[2:])

        obs_flat = traj.obs
        if isinstance(obs_flat, dict):
            obs_flat = {k: (v if k == "image" else flat(v))
                        for k, v in obs_flat.items()}
        else:
            obs_flat = flat(obs_flat)

        dataset = {
            "obs": obs_flat,
            "actions": flat(traj.actions),
            "neglogp": flat(traj.neglogp),
            "values": flat(values_m),
            "returns": flat(returns_m),
            "adv": flat(adv),
            "mus_init": flat(traj.mus),
            "sigmas_init": flat(traj.sigmas),
        }
        if self.frame_dedup:
            # unique frames + per-step frame pointers; update() gathers
            # the (frame, env) pairs of each minibatch on the fly
            dataset["frames"] = traj.frames          # [F, N, 1, W, H]
            dataset["frame_idx"] = traj.frame_idx    # [H]

        ts, metrics = self.update(ts, dataset)
        ts = ts._replace(epoch=ts.epoch + 1,
                         frame=frame_add(ts.frame, self.batch_size))
        metrics = dict(metrics)
        metrics["lr"] = ts.lr
        metrics["mean_reward"] = jnp.mean(ts.last_ep_return)
        metrics["mean_ep_length"] = jnp.mean(ts.last_ep_length)
        if ts.last_ep_success is not None:
            # fraction of (most recent per-env) episodes ending in task
            # success — e.g. Planning's goal-ball reach, the number the
            # task exists to drive up (reference planning.py:254-267)
            metrics["success_rate"] = jnp.mean(ts.last_ep_success)
        if ts.last_ep_env_success is not None:
            # ENV-level win rate for multi-agent tasks: the fraction of
            # (most recent per-actor) whole-env episodes where ANY robot
            # reached the goal before the any-robot reset — the task's
            # actual win condition (reference maplanning.py:581-584)
            metrics["env_success_rate"] = jnp.mean(ts.last_ep_env_success)
        metrics["reward_raw_per_step"] = jnp.mean(traj.rewards)
        # diagnostics: explained variance of the value function
        # (reference dignostics.py / torch_ext.explained_variance)
        var_ret = jnp.var(returns)
        metrics["explained_variance"] = 1.0 - jnp.var(
            returns - values) / (var_ret + 1e-8)
        # per-term Episode/ means (reference RLGPUAlgoObserver)
        for k, v in infos.items():
            metrics[f"Episode/{k}"] = jnp.mean(v)
        return ts._replace(obs=self._strip_obs(ts.obs)), metrics

    def make_train_epoch(self, donate: Optional[bool] = None):
        """Jitted train epoch with buffer donation (halves peak memory for
        the big env-state/obs arrays).

        Donation requires each donated input buffer's layout to equal the
        aliased output's layout. XLA's layout assignment gives
        conv-consumed image parameters a non-default layout (e.g.
        ``{2,0,3,1}`` for the [N,1,W,H] camera buffer) while the epoch's
        output keeps the default — the mismatched aliasing pair then fails
        at execute time with ``INVALID_ARGUMENT`` on the TPU runtime. Fix:
        pin every >=3D leaf's layout to the major_to_minor the incoming
        TrainState ACTUALLY has on device (in AND out), so aliasing is
        valid by construction and XLA re-layouts at the conv internally
        (a fused transpose, ~free, vs. 2x peak memory). Layouts need
        concrete shardings, so the jit is built lazily at the first call
        from the actual input placement — this keeps the sharded
        multi-chip path working unchanged.

        Pinning row-major instead (and relayouting mismatched inputs)
        does NOT work here: PPO.init()'s eager warm-up can leave leaves
        committed in conv-preferred layouts with custom tilings (which
        executable produced them depends on compilation-cache state), and
        on this TPU runtime BOTH a raw ``device_put`` layout-move and a
        jitted identity out of such a tiling fail to compile with
        ``INVALID_ARGUMENT``. Deriving the pin from the actual layouts
        sidesteps the move entirely; measured end-to-end throughput is
        identical to the row-major pin (93.2k vs 94.0k planning steps/s,
        within run-to-run noise)."""
        if donate is None:
            donate = True
        if not donate:
            return self._check_phase(jax.jit(self.train_epoch))

        from jax.experimental.layout import Format, Layout

        cache: Dict[int, Any] = {}

        def fmt(x):
            actual = getattr(x, "format", None)
            if (hasattr(x, "ndim") and x.ndim >= 3 and actual is not None
                    and actual.layout is not None):
                return Format(Layout(actual.layout.major_to_minor),
                              x.sharding)
            return Format(None, x.sharding)

        def step(ts: TrainState):
            if 0 not in cache:
                in_fmts = jax.tree.map(fmt, ts)
                cache[0] = jax.jit(self.train_epoch, donate_argnums=(0,),
                                   in_shardings=(in_fmts,),
                                   out_shardings=(in_fmts, None))
            return cache[0](ts)

        return self._check_phase(step)

    def _check_phase(self, step_fn):
        """Frame dedup requires the render cadence phase-aligned to the
        rollout blocks (init() establishes it; train epochs preserve it
        because cam_every divides the horizon). Checked once, on the
        concrete counter between epochs — a misaligned state would make
        the block-cached policy features silently lag the camera."""
        if not self.frame_dedup:
            return step_fn
        checked = [False]

        def checked_step(ts: TrainState):
            if not checked[0]:
                c = int(jax.device_get(ts.env_state.counter))
                if c % self.cam_every != 0:
                    raise ValueError(
                        f"frame-dedup rollout needs env counter ({c}) "
                        f"aligned to cam_every ({self.cam_every}); "
                        "initialize the TrainState via PPO.init() or "
                        "step the env to a multiple of cam_every first")
                checked[0] = True
            return step_fn(ts)

        return checked_step

    # ------------------------------------------------------------------ play

    def play_step(self, ts_or_params, obs_rms, env_state, obs,
                  deterministic: bool = True, key=None):
        """One eval step (reference players.py get_action: deterministic=mu)."""
        params = ts_or_params
        mu, sigma, _ = self.model.apply(params, obs, obs_rms)
        if deterministic or key is None:
            action = mu
        else:
            action = mu + sigma * jax.random.normal(key, mu.shape)
        action = jnp.clip(action, -1.0, 1.0)
        env_state, out = self.task.step(env_state, action)
        return env_state, out


def _policy_kl(mu0, sigma0, mu1, sigma1):
    """Mean KL(N(mu0,s0) || N(mu1,s1)) (reference torch_ext.policy_kl)."""
    c = (jnp.log(sigma1 / sigma0 + 1e-7)
         + (jnp.square(sigma0) + jnp.square(mu1 - mu0))
         / (2.0 * jnp.square(sigma1) + 1e-7) - 0.5)
    return jnp.mean(jnp.sum(c, axis=-1))
