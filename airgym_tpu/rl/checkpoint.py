"""Checkpointing: native format + reference-.pth bridge (AirGym-Real).

Reference counterparts:
  * full train state = {model, epoch, frame, optimizer, last_mean_rewards,
    env_state} (a2c_base.py:528-557), saved via torch_ext.save_checkpoint
    with retrying filesystem ops (torch_ext.py:51-81),
  * model dict keys: logstd, actor_mlp.layers.N.{weight,bias},
    mu.*, value_head.*, value_mean_std.*, running_mean_std.* (flat for
    vector obs; running_mean_std.running_mean_std.{image,observation}.*
    for dict obs), plus actor_cnn.features.{0,3,6}/{2,5,8}/fc for CNN
    models — verified against the shipped trained/planning_cnn_rate.pth,
  * the MLP-only -> CNN partial loader used to warm-start vision policies
    from state-based checkpoints (a2c_continuous.py:423-471).

Native format: a pickled pytree of numpy arrays (host-side, works for any
TrainState including optimizer/optax state). ``export_pth``/``import_pth``
convert to/from the torch layout so AirGym-Real onboard inference loads
our checkpoints unchanged; torch (CPU) is used only at the file boundary.
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.rl.ppo import frame_to_int as ppo_frame_to_int
from airgym_tpu.rl.running_stats import RunningMeanStd


def safe_filesystem_op(fn, *args, attempts: int = 10, **kwargs):
    """Retry filesystem ops (reference torch_ext.safe_filesystem_op,
    lib/core/torch_ext.py:51-66) to ride out NFS hiccups."""
    last = None
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except OSError as e:           # pragma: no cover - fault path
            last = e
            time.sleep(0.1 * (i + 1))
    raise last


def to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, train_state, extra: Optional[Dict[str, Any]] = None):
    """Native checkpoint: whole TrainState pytree + metadata."""
    payload = {"train_state": to_numpy(train_state),
               "extra": extra or {}, "format": 1}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _write():
        with open(path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    safe_filesystem_op(_write)


def load(path: str):
    def _read():
        with open(path, "rb") as f:
            return pickle.load(f)

    payload = safe_filesystem_op(_read)
    # checkpoints written before the compensated running stats carry
    # 3-field RunningMeanStd tuples; fill zero carries so the restored
    # pytree structure matches what the jitted train epoch expects
    is_rms = lambda x: isinstance(x, RunningMeanStd)
    ts = jax.tree.map(
        lambda x: x._with_carries() if is_rms(x) else x,
        payload["train_state"], is_leaf=is_rms)
    return ts, payload.get("extra", {})


def transfer_obs_width(trainer, ts, loaded, old_obs_dim: int,
                       new_obs_dim: int):
    """Warm-start a policy across observation-VECTOR widths.

    MAPlanning's obs vector is 16 + 2*num_robots channels (reference
    maplanning_config.py:13) where the per-robot relative channels are
    ZEROED by the reference (maplanning.py:505-514) — so a policy trained
    at one robot count transfers EXACTLY to another: inserted first-layer
    rows only ever see zeros (their obs_rms channels start mean 0 / var 1,
    normalizing 0 -> 0), and removed rows only ever saw zeros. Used by the
    robot-count curriculum (scripts/curriculum_ma_robots.py).

    The MLP input is [obs_vec ++ image features] (ActorCritic.encode), so
    resizing = re-indexing the first old_obs_dim rows of actor_mlp/Dense_0
    and of the 'observation' running stats, then shifting the feature rows.
    Model params, image stats, value stats and lr carry over; the optimizer
    restarts fresh (Adam moments are shaped by the old input — same policy
    as the reference's MLP->CNN partial loader, a2c_continuous.py:423-471)
    and epoch/frame restart at 0 (it is a new task shape).

    ``ts`` must be a fresh trainer.init() state for the TARGET task;
    ``loaded`` is the source checkpoint's TrainState.
    """
    def resize_rows(arr, pad_like=None):
        """Re-index axis 0: [old_obs ++ rest] -> [new_obs ++ rest]."""
        arr = np.asarray(arr)
        keep = min(old_obs_dim, new_obs_dim)
        pad_n = new_obs_dim - keep
        parts = [arr[:keep]]
        if pad_n > 0:
            parts.append(np.zeros((pad_n,) + arr.shape[1:], arr.dtype)
                         if pad_like is None else
                         np.broadcast_to(pad_like, (pad_n,) + arr.shape[1:]
                                         ).astype(arr.dtype))
        parts.append(arr[old_obs_dim:])
        return np.concatenate(parts, axis=0)

    params = jax.tree.map(np.asarray, loaded.params)
    d0 = params["params"]["actor_mlp"]["Dense_0"]
    d0["kernel"] = resize_rows(d0["kernel"])
    if "critic_mlp" in params["params"]:       # separate: True twin trunk
        c0 = params["params"]["critic_mlp"]["Dense_0"]
        c0["kernel"] = resize_rows(c0["kernel"])

    obs_rms = loaded.obs_rms
    if (isinstance(obs_rms, dict) and isinstance(ts.obs_rms, dict)
            and "image" in obs_rms and "image" in ts.obs_rms
            and obs_rms["image"].mean.shape
            != ts.obs_rms["image"].mean.shape):
        raise ValueError(
            f"transfer_obs_width only resizes the obs VECTOR; the image "
            f"stats differ in shape ({obs_rms['image'].mean.shape} vs "
            f"{ts.obs_rms['image'].mean.shape}) — source and target must "
            f"use the same camera resolution")
    if isinstance(obs_rms, dict) and "observation" in obs_rms:
        r = obs_rms["observation"]
        obs_rms = dict(obs_rms)
        obs_rms["observation"] = RunningMeanStd(
            mean=resize_rows(r.mean),
            var=resize_rows(r.var, pad_like=np.ones(())),
            count=np.asarray(r.count),
            mean_c=resize_rows(r.mean_c),
            var_c=resize_rows(r.var_c),
            count_c=np.asarray(r.count_c),
        )

    params = jax.tree.map(jnp.asarray, params)
    obs_rms = jax.tree.map(jnp.asarray, obs_rms)
    return ts._replace(
        params=params,
        opt_state=trainer.optimizer.init(params),
        obs_rms=obs_rms,
        value_rms=jax.tree.map(jnp.asarray, loaded.value_rms),
        lr=jnp.asarray(loaded.lr),
    )


# --------------------------------------------------------------------------
# torch .pth bridge


def _mlp_to_torch(mlp_params, out, prefix="actor_mlp"):
    for i in range(len(mlp_params)):
        d = mlp_params[f"Dense_{i}"]
        out[f"{prefix}.layers.{i}.weight"] = np.asarray(d["kernel"]).T
        out[f"{prefix}.layers.{i}.bias"] = np.asarray(d["bias"])


def _cnn_to_torch(cnn, out):
    conv_idx = {0: 0, 1: 3, 2: 6}
    bn_idx = {0: 2, 1: 5, 2: 8}
    for i in range(3):
        c = cnn[f"conv{i}"]
        # flax HWIO -> torch OIHW
        out[f"actor_cnn.features.{conv_idx[i]}.weight"] = np.transpose(
            np.asarray(c["kernel"]), (3, 2, 0, 1))
        out[f"actor_cnn.features.{conv_idx[i]}.bias"] = np.asarray(c["bias"])
        b = cnn[f"bn{i}"]
        out[f"actor_cnn.features.{bn_idx[i]}.weight"] = np.asarray(b["scale"])
        out[f"actor_cnn.features.{bn_idx[i]}.bias"] = np.asarray(b["bias"])
        out[f"actor_cnn.features.{bn_idx[i]}.running_mean"] = np.asarray(
            b["mean"])
        out[f"actor_cnn.features.{bn_idx[i]}.running_var"] = np.asarray(
            b["var"])
        out[f"actor_cnn.features.{bn_idx[i]}.num_batches_tracked"] = \
            np.asarray(0, np.int64)
    out["actor_cnn.fc.weight"] = np.asarray(cnn["fc"]["kernel"]).T
    out["actor_cnn.fc.bias"] = np.asarray(cnn["fc"]["bias"])


def _rms_to_torch(rms, prefix, out):
    # fold the Neumaier carries back in: field + field_c IS the stat at
    # f64 precision (running_stats.py) — the reference stores f64 buffers
    def full(v, c):
        v = np.asarray(v, np.float64)
        if c is not None:
            # np.asarray: a 0-d + 0-d sum is a numpy SCALAR, which would
            # dodge export_pth's from_numpy/ascontiguousarray branch (the
            # one that promotes 0-d to the [1] shape torch expects)
            v = np.asarray(v + np.asarray(c, np.float64))
        return v

    out[f"{prefix}.running_mean"] = full(rms.mean, rms.mean_c)
    out[f"{prefix}.running_var"] = full(rms.var, rms.var_c)
    out[f"{prefix}.count"] = full(rms.count, rms.count_c)


def model_state_dict(params, obs_rms=None, value_rms=None) -> Dict[str, Any]:
    """flax ActorCritic params (+ running stats) -> reference model dict."""
    p = params["params"]
    out: Dict[str, Any] = {}
    if "logstd" in p:
        out["logstd"] = np.asarray(p["logstd"])
    else:
        # fixed_sigma: False -> linear logstd head (reference model :60-62)
        out["logstd.weight"] = np.asarray(p["logstd_head"]["kernel"]).T
        out["logstd.bias"] = np.asarray(p["logstd_head"]["bias"])
    if "actor_cnn" in p:
        _cnn_to_torch(p["actor_cnn"], out)
    _mlp_to_torch(p["actor_mlp"], out)
    if "critic_mlp" in p:     # separate: True (reference model :38-50)
        _mlp_to_torch(p["critic_mlp"], out, prefix="critic_mlp")
    out["mu.weight"] = np.asarray(p["mu"]["kernel"]).T
    out["mu.bias"] = np.asarray(p["mu"]["bias"])
    out["value_head.weight"] = np.asarray(p["value"]["kernel"]).T
    out["value_head.bias"] = np.asarray(p["value"]["bias"])
    if value_rms is not None:
        _rms_to_torch(value_rms, "value_mean_std", out)
    if obs_rms is not None:
        if isinstance(obs_rms, dict):
            for key, rms in obs_rms.items():
                _rms_to_torch(
                    rms, f"running_mean_std.running_mean_std.{key}", out)
        else:
            _rms_to_torch(obs_rms, "running_mean_std", out)
    return out


def export_pth(path: str, train_state, last_mean_rewards: float = -1e9,
               env_state=None):
    """Write a reference-layout .pth loadable by AirGym-Real / the
    reference player (torch_ext.load_checkpoint)."""
    import torch
    model = {k: torch.from_numpy(np.ascontiguousarray(v))
             if isinstance(v, np.ndarray) else torch.tensor(v)
             for k, v in model_state_dict(
                 train_state.params, train_state.obs_rms,
                 train_state.value_rms).items()}
    state = {
        "model": model,
        "epoch": int(train_state.epoch),
        "frame": ppo_frame_to_int(train_state.frame),
        # inference consumers read only 'model'; resume-in-framework uses
        # the native format (optax state does not map onto torch.optim)
        "optimizer": {"state": {}, "param_groups": []},
        "last_mean_rewards": float(last_mean_rewards),
        "env_state": env_state,
    }
    safe_filesystem_op(torch.save, state, path)


def _torch_mlp_to_flax(sd, n_layers, prefix="actor_mlp"):
    return {f"Dense_{i}": {
        "kernel": np.asarray(sd[f"{prefix}.layers.{i}.weight"]).T,
        "bias": np.asarray(sd[f"{prefix}.layers.{i}.bias"])}
        for i in range(n_layers)}


def _torch_cnn_to_flax(sd):
    conv_idx = {0: 0, 1: 3, 2: 6}
    bn_idx = {0: 2, 1: 5, 2: 8}
    cnn = {}
    for i in range(3):
        w = np.asarray(sd[f"actor_cnn.features.{conv_idx[i]}.weight"])
        cnn[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"actor_cnn.features.{conv_idx[i]}.bias"])}
        j = bn_idx[i]
        cnn[f"bn{i}"] = {
            "scale": np.asarray(sd[f"actor_cnn.features.{j}.weight"]),
            "bias": np.asarray(sd[f"actor_cnn.features.{j}.bias"]),
            "mean": np.asarray(sd[f"actor_cnn.features.{j}.running_mean"]),
            "var": np.asarray(sd[f"actor_cnn.features.{j}.running_var"])}
    cnn["fc"] = {"kernel": np.asarray(sd["actor_cnn.fc.weight"]).T,
                 "bias": np.asarray(sd["actor_cnn.fc.bias"])}
    return cnn


def _torch_rms(sd, prefix, template: RunningMeanStd) -> RunningMeanStd:
    # split the torch f64 buffers into f32 value + f32 Neumaier carry so
    # no precision is lost round-tripping through the compensated stats
    def split(v64):
        v32 = v64.astype(np.float32)
        return (jnp.asarray(v32),
                jnp.asarray((v64 - v32.astype(np.float64)).astype(
                    np.float32)))

    mean, mean_c = split(np.asarray(sd[f"{prefix}.running_mean"],
                                    np.float64))
    var, var_c = split(np.asarray(sd[f"{prefix}.running_var"], np.float64))
    count, count_c = split(np.asarray(
        sd[f"{prefix}.count"], np.float64).reshape(-1)[0].reshape(()))
    return RunningMeanStd(mean=mean, var=var, count=count, mean_c=mean_c,
                          var_c=var_c, count_c=count_c)


def import_pth(path: str, params_template, obs_rms_template=None,
               value_rms_template=None):
    """Load a reference .pth into flax params / running stats.

    Supports the MLP-only -> CNN warm start (reference
    a2c_continuous.py:423-471): when the checkpoint lacks actor_cnn keys
    but the template has them, the CNN (and the first MLP layer, whose
    input width differs) keeps its fresh initialization while logstd,
    matching MLP layers, mu, value head, and the stats transfer.
    """
    import torch
    ck = safe_filesystem_op(torch.load, path, map_location="cpu",
                            weights_only=False)
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in ck["model"].items()}

    p = jax.tree.map(np.asarray, params_template["params"])
    want_cnn = "actor_cnn" in p
    have_cnn = any(k.startswith("actor_cnn.") for k in sd)

    n_layers = len(p["actor_mlp"])
    new_mlp = _torch_mlp_to_flax(sd, n_layers)
    if want_cnn and not have_cnn:
        # partial transfer: first MLP layer width differs (state-only vs
        # state+features input) -> keep fresh init for mismatched shapes
        for i in range(n_layers):
            if new_mlp[f"Dense_{i}"]["kernel"].shape != \
                    p["actor_mlp"][f"Dense_{i}"]["kernel"].shape:
                new_mlp[f"Dense_{i}"] = p["actor_mlp"][f"Dense_{i}"]
    p["actor_mlp"] = new_mlp
    if want_cnn and have_cnn:
        p["actor_cnn"] = _torch_cnn_to_flax(sd)
    if "critic_mlp" in p and "critic_mlp.layers.0.weight" in sd:
        p["critic_mlp"] = _torch_mlp_to_flax(sd, len(p["critic_mlp"]),
                                             prefix="critic_mlp")
    if "logstd_head" in p:
        # fixed_sigma: False checkpoints carry a linear logstd head
        p["logstd_head"] = {"kernel": np.asarray(sd["logstd.weight"]).T,
                            "bias": np.asarray(sd["logstd.bias"])}
    else:
        p["logstd"] = np.asarray(sd["logstd"])
    p["mu"] = {"kernel": np.asarray(sd["mu.weight"]).T,
               "bias": np.asarray(sd["mu.bias"])}
    p["value"] = {"kernel": np.asarray(sd["value_head.weight"]).T,
                  "bias": np.asarray(sd["value_head.bias"])}

    obs_rms = obs_rms_template
    if obs_rms_template is not None:
        if isinstance(obs_rms_template, dict):
            obs_rms = {}
            for key, tmpl in obs_rms_template.items():
                pref = f"running_mean_std.running_mean_std.{key}"
                if f"{pref}.running_mean" in sd:
                    obs_rms[key] = _torch_rms(sd, pref, tmpl)
                elif key == "observation" and \
                        "running_mean_std.running_mean" in sd:
                    # MLP ckpt flat stats -> dict obs 'observation' slot
                    obs_rms[key] = _torch_rms(sd, "running_mean_std", tmpl)
                else:
                    obs_rms[key] = tmpl
        elif "running_mean_std.running_mean" in sd:
            obs_rms = _torch_rms(sd, "running_mean_std", obs_rms_template)

    value_rms = value_rms_template
    if value_rms_template is not None and \
            "value_mean_std.running_mean" in sd:
        value_rms = _torch_rms(sd, "value_mean_std", value_rms_template)
        value_rms = value_rms._replace(
            mean=value_rms.mean.reshape(()),
            var=value_rms.var.reshape(()),
            mean_c=value_rms.mean_c.reshape(()),
            var_c=value_rms.var_c.reshape(()))

    meta = {"epoch": int(ck.get("epoch", 0)),
            "frame": int(ck.get("frame", 0)),
            "last_mean_rewards": float(ck.get("last_mean_rewards", -1e9))}
    return {"params": p}, obs_rms, value_rms, meta
