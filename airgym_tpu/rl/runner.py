"""Training/eval runner (reference: lib/torch_runner.py + scripts/runner.py
host loop + lib/agent/players.py).

``Runner.load(yaml_cfg)`` consumes the reference's YAML schema
(airgym_tpu/configs/ppo_<task>.yaml — params.config.* hyperparameters,
params.network.* architecture incl. the cnn/vae blocks) and ``run(args)``
dispatches train/play. The training host loop only logs, checkpoints, and
prints the fps line (reference a2c_continuous.py:204-294 +
print_statistics :19-33); every numeric step is inside the jitted
train_epoch.

Multi-host: per-process seed offset like the reference's rank offset
(torch_runner.py:44); rank-0-only logging/saving via
parallel.mesh.is_main_process.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.parallel import mesh as pmesh
from airgym_tpu.rl import checkpoint as ckpt
from airgym_tpu.rl import metrics as metrics_mod
from airgym_tpu.rl import ppo as ppo_mod


def network_kw_from_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """reference network YAML block -> ActorCritic kwargs
    (model ``load``, a2c_continuous_logstd_model.py:200-227)."""
    net = params.get("network", {})
    mlp = net.get("mlp", {})
    kw: Dict[str, Any] = {}
    if "units" in mlp:
        kw["units"] = tuple(mlp["units"])
    if "activation" in mlp:
        kw["activation"] = mlp["activation"]
    if net.get("separate"):
        kw["separate"] = True
    space = net.get("space", {}).get("continuous", {})
    if "fixed_sigma" in space and not space["fixed_sigma"]:
        kw["fixed_sigma"] = False
    # encoder priority matches the reference model build order
    # (a2c_continuous_logstd_model.py:26-33: resnet elif cnn elif vae)
    if "resnet" in net:
        kw["image_encoder"] = "resnet"
        kw["image_feature_dim"] = int(net["resnet"].get("output_dim", 30))
        rtype = net["resnet"].get("type", "resnet18")
        if rtype != "resnet18":
            raise ValueError(f"resnet type {rtype!r} unsupported "
                             "(the reference uses resnet18)")
    elif "cnn" in net:
        kw["image_encoder"] = "cnn"
        kw["image_feature_dim"] = int(net["cnn"].get("output_dim", 30))
    elif "vae" in net:
        kw["image_encoder"] = "vae"
        kw["vae_latent_dim"] = int(net["vae"].get("latent_dims", 64))
        if net["vae"].get("return_sampled_latent"):
            raise NotImplementedError(
                "return_sampled_latent: True is not supported; the policy "
                "encoder returns deterministic means like the shipped "
                "reference configs (return_sampled_latent: False)")
    return kw


def ppo_config_from_params(params: Dict[str, Any]) -> ppo_mod.PPOConfig:
    c = params.get("config", {})
    g = lambda k, d: c.get(k, d)
    return ppo_mod.PPOConfig(
        horizon=int(g("horizon_length", 24)),
        minibatch_size=int(g("minibatch_size", 2048)),
        mini_epochs=int(g("mini_epochs", 5)),
        gamma=float(g("gamma", 0.99)),
        tau=float(g("tau", 0.95)),
        learning_rate=float(g("learning_rate", 3e-4)),
        lr_schedule=g("lr_schedule", "adaptive"),
        kl_threshold=float(g("kl_threshold", 0.008)),
        e_clip=float(g("e_clip", 0.2)),
        use_smooth_clamp=bool(g("use_smooth_clamp", False)),
        clip_value=bool(g("clip_value", False)),
        critic_coef=float(g("critic_coef", 2.0)),
        entropy_coef=float(g("entropy_coef", 0.0)),
        bounds_loss_coef=float(g("bounds_loss_coef", 1e-4)),
        grad_norm=float(g("grad_norm", 1.5)),
        truncate_grads=bool(g("truncate_grads", True)),
        normalize_input=bool(g("normalize_input", True)),
        normalize_value=bool(g("normalize_value", True)),
        normalize_advantage=bool(g("normalize_advantage", True)),
        value_bootstrap=bool(g("value_bootstrap", True)),
        reward_shaper_scale=float(
            g("reward_shaper", {}).get("scale_value", 1.0)
            if isinstance(g("reward_shaper", {}), dict) else 1.0),
        max_epochs=int(g("max_epochs", 200)),
        save_frequency=int(g("save_frequency", 100)),
        save_best_after=int(g("save_best_after", 10)),
        score_to_win=float(g("score_to_win", 1e5)),
    )


class Runner:
    """reference lib/torch_runner.py Runner."""

    def __init__(self, observer=None):
        self.observer = observer
        self.params: Dict[str, Any] = {}

    def load(self, yaml_cfg: Dict[str, Any]):
        self.params = yaml_cfg.get("params", yaml_cfg)
        return self

    # -- construction ------------------------------------------------------

    def _build(self, args: Dict[str, Any]):
        cfg = self.params.get("config", {})
        task_name = args.get("task") or cfg.get("env_name", "hovering")
        num_envs = int(args.get("num_envs") or cfg.get("num_actors", 256))
        ctl_mode = args.get("ctl_mode", "rate")
        seed = int(args.get("seed") or self.params.get("seed", 42) or 42)
        if seed == -1:
            seed = int(np.random.randint(0, 2 ** 31 - 1))
        # per-process seed offset (reference torch_runner.py:44)
        seed += jax.process_index()

        # YAML config.env_config kwargs flow to env construction like the
        # reference (a2c_base.py:134-139 -> create_vec_env(**env_config)).
        # 'seed' is the run seed the reference injects (torch_runner.py:61-66)
        # -- here it already flows via PRNGKey(seed); 'use_image' only shapes
        # the synthesized obs space in the reference vecenv (vecenv.py:72,93)
        # and must agree with the task's own obs structure.
        env_kw = dict(cfg.get("env_config", {}) or {})
        env_kw.pop("seed", None)
        use_image = env_kw.pop("use_image", None)
        task = envs.make_task(task_name, ctl_mode=ctl_mode,
                              num_envs=num_envs, **env_kw)
        if use_image is not None and bool(use_image) != bool(
                getattr(task, "obs_is_dict", False)):
            raise ValueError(
                f"env_config.use_image={use_image} contradicts task "
                f"{task_name!r} (obs_is_dict="
                f"{getattr(task, 'obs_is_dict', False)})")
        trainer_cls = ppo_mod.PPO
        network_kw = network_kw_from_params(self.params)
        # fused policy+env rollout kernel (config: use_fused_rollout, ON
        # in the shipped hovering/balloon/tracking YAMLs) — hand-written
        # for the default shared-trunk fixed-sigma model. On a multi-chip
        # mesh the kernel runs shard_map-wrapped over the env axis
        # (fused_ppo._rollout_kernel; sharded == unsharded exactly,
        # tests/test_multichip.py), which needs each shard's env count to
        # be a multiple of the kernel tile; otherwise fall back to the
        # XLA rollout, which shards transparently at any batch size.
        n_dev = len(pmesh.make_mesh().devices.flat)
        if (cfg.get("use_fused_rollout") and ctl_mode == "rate"
                and num_envs % (1024 * n_dev) == 0
                and not network_kw.get("separate")
                and network_kw.get("fixed_sigma", True)):
            from airgym_tpu.rl import fused_ppo
            trainer_cls = {
                "hovering": fused_ppo.FusedHoveringPPO,
                "balloon": fused_ppo.FusedBalloonPPO,
                "tracking": fused_ppo.FusedTrackingPPO,
            }.get(task_name, ppo_mod.PPO)
        trainer = trainer_cls(task, ppo_config_from_params(self.params),
                              network_kw=network_kw)
        return task, trainer, seed

    def _maybe_load_pretrained_vae(self, ts):
        """Graft pretrained frozen encoder weights into the model params.

        ``vae: {model_folder, model_file}`` — the reference loads
        ``vae_model.pth`` at VAEImageEncoder construction
        (vae_image_encoder.py:17-31); here construction is ``trainer.init``
        so the graft happens right after.  Only the encoder subtree is
        grafted: the RL model never runs the decoder, so flax never
        materializes its params.

        ``resnet: {model_file}`` — the reference constructs a pretrained
        torchvision resnet18 (lib/network/resnet.py:5-24); air-gapped
        hosts pass the torchvision weights file here instead.

        A later ``--checkpoint`` restore overwrites these like the
        reference's ``set_full_state_weights`` (the encoder travels inside
        the model state dict in both frameworks)."""
        net = self.params.get("network", {})
        vae_cfg = net.get("vae") or {}
        resnet_cfg = net.get("resnet") or {}

        def load_sd(cfg):
            import torch
            path = os.path.join(cfg.get("model_folder", "."),
                                cfg["model_file"])
            sd = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            return sd

        if vae_cfg.get("model_file"):
            from airgym_tpu.models import vae as vae_mod
            imported = vae_mod.import_torch_state_dict(
                load_sd(vae_cfg),
                latent_dim=int(vae_cfg.get("latent_dims", 64)))
            params = jax.tree.map(lambda x: x, ts.params)  # fresh containers
            for tower in ("actor_enc", "critic_enc"):
                if tower in params["params"]:
                    params["params"][tower]["vae"]["encoder"] = jax.tree.map(
                        jnp.asarray, imported["params"]["encoder"])
            return ts._replace(params=params)

        if resnet_cfg.get("model_file"):
            # torchvision resnet18 weights file (the reference downloads
            # pretrained=True; air-gapped hosts supply the file instead)
            from airgym_tpu.models import resnet as resnet_mod
            imported = resnet_mod.import_torchvision_state_dict(
                load_sd(resnet_cfg),
                output_dim=int(resnet_cfg.get("output_dim", 30)))
            params = jax.tree.map(lambda x: x, ts.params)
            for tower in ("actor_resnet", "critic_resnet"):
                if tower in params["params"]:
                    fc = params["params"][tower]["fc"]   # keep model's init
                    grafted = dict(jax.tree.map(jnp.asarray,
                                                imported["params"]))
                    grafted["fc"] = fc
                    params["params"][tower] = grafted
            return ts._replace(params=params)

        return ts

    # -- train -------------------------------------------------------------

    def run_train(self, args: Dict[str, Any]):
        pmesh.maybe_init_distributed()
        task, trainer, seed = self._build(args)
        cfg = trainer.cfg
        name = self.params.get("config", {}).get("name", task.task_name)
        run_dir = os.path.join(
            args.get("run_root", "runs"),
            f"{name}_{time.strftime('%d-%H-%M-%S')}")
        writer = (metrics_mod.MetricsWriter(run_dir)
                  if pmesh.is_main_process() else None)

        ts = trainer.init(jax.random.PRNGKey(seed))
        ts = self._maybe_load_pretrained_vae(ts)
        if args.get("checkpoint"):
            ts = self.restore(trainer, ts, args["checkpoint"])
        elif args.get("transfer_checkpoint"):
            # warm-start across observation widths (robot-count
            # curriculum, checkpoint.transfer_obs_width): caller states
            # the SOURCE obs-vector width; the target width is this
            # task's own
            loaded, _ = ckpt.load(args["transfer_checkpoint"])
            ts = ckpt.transfer_obs_width(
                trainer, ts, loaded,
                int(args["transfer_old_obs_dim"]), task.num_obs)

        mesh = pmesh.make_mesh()
        if len(mesh.devices.flat) > 1:
            ts = pmesh.shard_env_batch(ts, mesh, trainer.num_envs)
            # fused trainers shard_map their kernel over this mesh
            trainer.mesh = mesh
        step = trainer.make_train_epoch()

        best_reward = -1e9
        best_success = 0.0   # save only once the task actually succeeds
        had_success_metric = False
        pending_best = None          # on-device snapshots, see below
        pending_best_success = None
        start = time.time()
        epoch = int(ts.epoch)
        # periodic in-training episode dumps (rank-0): the headless
        # replacement for the reference's interactive viewer
        # (base_task.py:84-95) — watch whether the policy is sane without
        # stopping the run. config.viz_every_epochs = 0 (default) = off.
        viz_every = int(self.params.get("config", {}).get(
            "viz_every_epochs", 0) or 0)
        if writer is None:
            viz_every = 0
        # Only sync with the device at the logging cadence: per-epoch
        # host round-trips (scalar fetches, TB writes, best-ckpt saves)
        # dominate wall-clock over a tunneled TPU link.
        log_every = max(1, int(args.get("log_every")
                               or max(1, cfg.max_epochs // 50)))
        t_last = time.time()
        frames_since = 0
        while epoch < cfg.max_epochs:
            ts, m = step(ts)
            epoch += 1
            frames_since += trainer.batch_size
            if epoch % log_every != 0 and epoch < cfg.max_epochs:
                continue

            jax.block_until_ready(ts.lr)
            m_host = jax.device_get(m)
            now = time.time()
            frame = epoch * trainer.batch_size
            mean_rew = float(m_host["mean_reward"])
            fps = frames_since / max(now - t_last, 1e-9)
            t_last, frames_since = now, 0

            if writer is not None:
                scalars = {
                    "losses/a_loss": float(m_host["a_loss"]),
                    "losses/c_loss": float(m_host["c_loss"]),
                    "losses/bounds_loss": float(m_host["b_loss"]),
                    "losses/entropy": float(m_host["entropy"]),
                    "info/last_lr": float(m_host["lr"]),
                    "info/kl": float(m_host["kl"]),
                    "info/epochs": epoch,
                    "performance/step_inference_rl_update_fps": fps,
                    "rewards/frame": mean_rew,
                    "rewards/iter": mean_rew,
                    "episode_lengths/frame": float(m_host["mean_ep_length"]),
                    "diagnostics/clip_frac": float(m_host["clip_frac"]),
                    "diagnostics/explained_variance":
                        float(m_host["explained_variance"]),
                }
                for k, v in m_host.items():
                    if k.startswith("Episode/"):
                        scalars[k] = float(v)
                succ = ""
                if "success_rate" in m_host:
                    scalars["info/success_rate"] = float(
                        m_host["success_rate"])
                    succ = f" success_rate: {scalars['info/success_rate']:.3f}"
                if "env_success_rate" in m_host:
                    scalars["info/env_success_rate"] = float(
                        m_host["env_success_rate"])
                    succ += (" env_success_rate: "
                             f"{scalars['info/env_success_rate']:.3f}")
                writer.add_scalars(scalars, frame)
                print(f"fps total: {fps:.0f} epoch: {epoch}/"
                      f"{cfg.max_epochs} frames: {frame} "
                      f"mean_reward: {mean_rew:.2f} "
                      f"lr: {float(m_host['lr']):.2e}{succ}", flush=True)

            if pmesh.is_main_process():
                ck_dir = os.path.join(run_dir, "nn")
                if epoch >= cfg.save_best_after and mean_rew > best_reward:
                    best_reward = mean_rew
                    # snapshot ON DEVICE (jnp.copy per leaf — the train
                    # epoch donates ts buffers, so a bare reference would
                    # die next epoch) and defer the disk write: each
                    # ckpt.save device_gets every leaf over the tunneled
                    # chip (~1 s), which dominated short runs when the
                    # reward improved at most logged epochs. Flushed at
                    # save_frequency cadence, on score_to_win, and at
                    # run end — same checkpoints, amortized transfers.
                    pending_best = jax.tree.map(jnp.copy,
                                                self._resume_state(ts))
                # has_success tasks also keep a best-by-SUCCESS ckpt: the
                # reward optimum can drift from the task-achievement
                # optimum (survive-vs-reach — reward keeps rising from
                # survival terms while goal-reach rate falls), so the
                # highest-success policy would otherwise be lost to the
                # best-reward overwrite. Multi-agent tasks gate on the
                # ENV-level rate (any-robot goal reach, the actual win
                # condition) when the trainer emits it; the per-robot rate
                # is structurally capped near 1/num_robots. NOTE: success
                # is sampled at the log_every cadence like every other
                # host-visible metric (per-epoch host syncs throttle
                # training over the tunneled chip), so this preserves the
                # highest success among LOGGED epochs, not a peak that
                # falls between them.
                gate_key = ("env_success_rate"
                            if "env_success_rate" in m_host
                            else "success_rate")
                if gate_key in m_host:
                    had_success_metric = True
                if (gate_key in m_host
                        and epoch >= cfg.save_best_after
                        and float(m_host[gate_key]) > best_success):
                    best_success = float(m_host[gate_key])
                    pending_best_success = jax.tree.map(
                        jnp.copy, self._resume_state(ts))
                if cfg.save_frequency and epoch % cfg.save_frequency == 0:
                    self.save(trainer, ts, os.path.join(
                        ck_dir, f"last_{name}_ep_{epoch}"))
                    pending_best, pending_best_success = self._flush_best(
                        ck_dir, name, pending_best, pending_best_success)
                if viz_every and epoch % viz_every == 0:
                    self._dump_training_viz(task, trainer, ts, run_dir,
                                            epoch)
                if mean_rew > cfg.score_to_win:
                    break

        if pmesh.is_main_process():
            ck_dir = os.path.join(run_dir, "nn")
            self._flush_best(ck_dir, name, pending_best,
                             pending_best_success)
            self.save(trainer, ts, os.path.join(ck_dir, f"last_{name}"))
        if writer is not None:
            writer.close()
        total = time.time() - start
        # best_success is reported whenever the task HAS a success metric
        # (even at 0.0) so callers can tell "no success metric" apart from
        # "success never exceeded 0"
        return ts, {"best_reward": best_reward, "epochs": epoch,
                    "wall_time_s": total, "run_dir": run_dir,
                    **({"best_success": best_success}
                       if had_success_metric else {})}

    def _flush_best(self, ck_dir: str, name: str, pending_best,
                    pending_best_success):
        """Write any pending on-device best snapshots to disk; returns
        (None, None) so callers clear their pending state."""
        if pending_best is not None:
            ckpt.save(os.path.join(ck_dir, name) + ".ckpt", pending_best)
        if pending_best_success is not None:
            ckpt.save(os.path.join(ck_dir, name) + "_best_success.ckpt",
                      pending_best_success)
        return None, None

    def _dump_training_viz(self, task, trainer, ts, run_dir: str,
                           epoch: int, steps: int = 200,
                           k_rec: int = 4) -> None:
        """Short deterministic rollout with the CURRENT params on a fresh
        env batch, dumped to run_dir/viz/epoch_* (trajectory panels +
        depth gif). Replaces the reference viewer's actual function —
        checking the policy is doing something sane mid-run — without a
        display or stopping training. The training env state is not
        touched."""
        from airgym_tpu.utils.episode_viz import dump_episode
        n_rows = getattr(task, "flat_n", task.cfg.num_envs)
        k = min(k_rec, n_rows)

        if getattr(self, "_viz_fn", None) is None:
            def run(params, obs_rms, key):
                def body(carry, _):
                    env_state, obs = carry
                    mu, _, _ = trainer.model.apply(params, obs, obs_rms)
                    env_state, out = task.step(env_state,
                                               jnp.clip(mu, -1.0, 1.0))
                    core = getattr(env_state, "core", env_state)
                    rec = {"reward": out.reward[:k],
                           "reset": out.reset[:k],
                           "root": core.root[:k, :13]}
                    if hasattr(env_state, "camera"):
                        rec["camera"] = env_state.camera[0, 0]
                    return (env_state, out.obs), rec

                env_state = task.initial_state(key)
                env_state, out = task.step(
                    env_state,
                    jnp.zeros((n_rows, task.cfg.num_actions)))
                (_, _), recs = jax.lax.scan(body, (env_state, out.obs),
                                            None, length=steps)
                return recs

            self._viz_fn = jax.jit(run)

        recs = self._viz_fn(ts.params, ts.obs_rms,
                            jax.random.PRNGKey(epoch))
        out_dir = os.path.join(run_dir, "viz", f"epoch_{epoch:06d}")
        dump_episode(out_dir, jax.tree.map(np.asarray, recs))

    # -- play --------------------------------------------------------------

    def run_play(self, args: Dict[str, Any]):
        task, trainer, seed = self._build(args)
        player = Player(task, trainer)
        player.ts = self._maybe_load_pretrained_vae(player.ts)
        if args.get("checkpoint"):
            player.restore(args["checkpoint"])
        games = int(self.params.get("config", {}).get(
            "player", {}).get("games_num", 10))
        record_dir = args.get("record_dir")
        return player.run(max_steps=int(args.get("max_steps", 1000)),
                          seed=seed, record_dir=record_dir,
                          games_num=games)

    def run(self, args: Dict[str, Any]):
        if args.get("train"):
            return self.run_train(args)
        return self.run_play(args)

    # -- checkpoints -------------------------------------------------------

    @staticmethod
    def _resume_state(ts):
        """What the native .ckpt persists: everything EXCEPT the env
        buffers. env_state carries the camera images and per-env scene
        (~1 GB at 4096 vision envs) — device_getting it over the remote
        tunnel on every best-reward save throttled training 8x. Like the
        reference (torch_runner saves model/optim/stats only), resume
        re-initializes the envs; restore() fills them from the fresh
        TrainState."""
        return ts._replace(env_state=None, obs=None)

    def save(self, trainer, ts, path_no_ext: str):
        ckpt.save(path_no_ext + ".ckpt", self._resume_state(ts))
        ckpt.export_pth(path_no_ext + ".pth", ts)

    def restore(self, trainer, ts, path: str):
        if path.endswith(".pth"):
            params, obs_rms, value_rms, meta = ckpt.import_pth(
                path, ts.params, ts.obs_rms, ts.value_rms)
            return ts._replace(
                params=jax.tree.map(jnp.asarray, params),
                obs_rms=obs_rms, value_rms=value_rms,
                epoch=jnp.asarray(meta["epoch"], jnp.int32),
                frame=ppo_mod.frame_from_int(meta["frame"]))
        loaded, _ = ckpt.load(path)
        if loaded.env_state is None:       # env-stripped resume ckpt
            loaded = loaded._replace(env_state=ts.env_state, obs=ts.obs)
        if loaded.last_ep_success is None and ts.last_ep_success is not None:
            loaded = loaded._replace(
                last_ep_success=jnp.zeros_like(ts.last_ep_success))
        elif loaded.last_ep_success is not None \
                and ts.last_ep_success is None:
            # checkpoint from a has_success task loaded into one without
            loaded = loaded._replace(last_ep_success=None)
        # same for the env-level tracker (and for checkpoints written
        # before the field existed, which unpickle with its default None)
        if (loaded.last_ep_env_success is None
                and ts.last_ep_env_success is not None):
            loaded = loaded._replace(
                last_ep_env_success=jnp.zeros_like(ts.last_ep_env_success))
        elif (loaded.last_ep_env_success is not None
                and ts.last_ep_env_success is None):
            loaded = loaded._replace(last_ep_env_success=None)
        try:
            return jax.tree.map(lambda t, l: jnp.asarray(l), ts, loaded)
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"incompatible checkpoint {path!r}: its TrainState tree "
                f"does not match this task/config (e.g. saved before a "
                f"state-layout change, or from a different task). "
                f"Underlying error: {e}") from e


class Player:
    """Deterministic evaluator (reference lib/agent/players.py:204-290,
    339-362: action = mu, clamped)."""

    def __init__(self, task, trainer: ppo_mod.PPO):
        self.task = task
        self.trainer = trainer
        self.ts = trainer.init(jax.random.PRNGKey(0))

    def restore(self, path: str):
        runner = Runner()
        self.ts = runner.restore(self.trainer, self.ts, path)

    def run(self, max_steps: int = 1000, seed: int = 0,
            chunk: int = 100, record_dir: Optional[str] = None,
            record_envs: int = 4, games_num: int = 10 ** 9):
        """Evaluate; when record_dir is set, dump headless episode
        visualization (trajectory panels + depth gif — replaces the
        reference viewer/cv2 debug, base_task.py:116-141,
        customized.py:429-432).  Stops early once ``games_num`` episodes
        have finished (the reference player's n_games loop,
        players.py:204-290, adapted to the batched evaluator: episodes
        are counted across all envs via reset flags)."""
        ts = self.ts
        n_rows = getattr(self.task, "flat_n", self.task.cfg.num_envs)

        def boot(k):
            # jitted: eager per-op dispatch over a tunneled TPU makes an
            # un-jitted reset take minutes at large env counts
            st = self.task.initial_state(k)
            return self.task.step(
                st, jnp.zeros((n_rows, self.task.cfg.num_actions)))

        env_state, out = jax.jit(boot)(jax.random.PRNGKey(seed))
        obs = out.obs
        k_rec = min(record_envs, n_rows)

        def body(carry, _):
            env_state, obs = carry
            mu, _, _ = self.trainer.model.apply(ts.params, obs, ts.obs_rms)
            action = jnp.clip(mu, -1.0, 1.0)
            env_state, out = self.task.step(env_state, action)
            rec = {"reward": out.reward, "reset": out.reset}
            if "success" in out.info:
                rec["success"] = out.info["success"] & out.reset
            if record_dir is not None:
                core = getattr(env_state, "core", env_state)
                rec["root"] = core.root[:k_rec, :13]
                if hasattr(env_state, "camera"):
                    rec["camera"] = env_state.camera[0, 0]
            return (env_state, out.obs), rec

        run_chunk = jax.jit(lambda c: jax.lax.scan(body, c, None,
                                                   length=chunk))
        recs = []
        carry = (env_state, obs)
        done_games = 0
        for _ in range(max(1, max_steps // chunk)):
            carry, r = run_chunk(carry)
            recs.append(jax.tree.map(np.asarray, r))
            done_games += int(recs[-1]["reset"].sum())
            if done_games >= games_num:
                break
        rec = {k: np.concatenate([r[k] for r in recs], 0) for k in recs[0]}
        rewards, resets = rec["reward"], rec["reset"]
        games = max(1, int(resets.sum()))
        mean_reward = float(rewards.sum() / games)
        result = {"mean_reward": mean_reward, "games": games,
                  "steps": rewards.shape[0]}
        line = f"av reward: {mean_reward:.2f} games played: {games}"
        if "success" in rec:
            # fraction of finished episodes that ended by goal reach
            result["success_rate"] = float(rec["success"].sum()) / games
            line += f" success_rate: {result['success_rate']:.3f}"
        print(line)
        if record_dir is not None:
            from airgym_tpu.utils.episode_viz import dump_episode
            dump_episode(record_dir, rec)
            print(f"episode visualization -> {record_dir}")
        return result
