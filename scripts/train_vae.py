#!/usr/bin/env python3
"""Train the depth VAE on DepthGen output.

The reference ships only a pretrained ``vae_model.pth`` (trained outside
the repo); this closes the loop: DepthGen scenes -> depth frames -> VAE
(models/vae.py, reference-architecture) -> torch-layout ``vae_model.pth``
that both this framework's VAEEncoder and the reference's
VAEImageEncoder loader (vae_image_encoder.py:6-31) can consume.

Frames are generated on the fly (device-resident, no .npy round-trip) —
pass --data_dir to train from saved DepthGen .npy frames instead.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import airgym_tpu.envs as envs
from airgym_tpu.models import vae as jvae


def make_batcher(args):
    if args.data_dir:
        files = sorted(os.path.join(args.data_dir, f)
                       for f in os.listdir(args.data_dir)
                       if f.endswith(".npy"))
        data = np.stack([np.load(f) for f in files])       # [K, 120, 212]
        data = data[:, None].transpose(0, 1, 3, 2)         # [K, 1, 212, 120]

        def batches(key):
            idx = jax.random.randint(key, (args.batch,), 0, data.shape[0])
            return jnp.asarray(data[np.asarray(idx)])

        return batches

    task = envs.make_task("depthgen", ctl_mode="rate", num_envs=args.batch)
    state = {"s": task.initial_state(jax.random.PRNGKey(0))}
    step = jax.jit(task.step)
    act = jnp.zeros((args.batch, 4))

    def batches(key):
        for _ in range(task.cfg.cam_every):
            state["s"], _ = step(state["s"], act)
        return state["s"].camera                            # [B, 1, 212, 120]

    return batches


def main():
    from airgym_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--latent", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kl_weight", type=float, default=1e-3)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--out", default="trained/vae_model.pth")
    args = p.parse_args()

    model = jvae.VAE(latent_dim=args.latent)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 1, 212, 120)))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    batches = make_batcher(args)

    @jax.jit
    def train_step(params, opt_state, img, key):
        def loss_fn(p):
            recon, mean, logvar, _ = model.apply(p, img, key=key)
            target = jnp.transpose(jvae._to_image_res(img), (0, 2, 3, 1))
            return jvae.vae_loss(recon, target, mean, logvar,
                                 kl_weight=args.kl_weight)

        (loss, parts), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    t0 = time.time()
    for i in range(1, args.steps + 1):
        key, k1, k2 = jax.random.split(key, 3)
        img = batches(k1)
        params, opt_state, loss, parts = train_step(params, opt_state,
                                                    img, k2)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i}: loss={float(loss):.2f} "
                  f"recon={float(parts['recon']):.2f} "
                  f"kl={float(parts['kl']):.2f} t={time.time() - t0:.0f}s",
                  flush=True)

    # export to the reference's torch layout
    export_vae_pth(params, args.out, latent=args.latent)
    print(f"saved {args.out}")


def export_vae_pth(params, path, latent=64):
    """flax VAE params -> torch state_dict file (inverse of
    models/vae.import_torch_state_dict)."""
    import torch
    p = params["params"]
    sd = {}
    for name in jvae._ENC_CONVS:
        c = p["encoder"][name]
        sd[f"encoder.{name}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(c["kernel"]), (3, 2, 0, 1)).copy())
        sd[f"encoder.{name}.bias"] = torch.from_numpy(
            np.asarray(c["bias"]).copy())
    for name in ["dense0", "dense1"]:
        d = p["encoder"][name]
        sd[f"encoder.{name}.weight"] = torch.from_numpy(
            np.asarray(d["kernel"]).T.copy())
        sd[f"encoder.{name}.bias"] = torch.from_numpy(
            np.asarray(d["bias"]).copy())
    for name in ["dense", "dense1"]:
        d = p["img_decoder"][name]
        sd[f"img_decoder.{name}.weight"] = torch.from_numpy(
            np.asarray(d["kernel"]).T.copy())
        sd[f"img_decoder.{name}.bias"] = torch.from_numpy(
            np.asarray(d["bias"]).copy())
    for name in jvae._DEC_DECONVS:
        d = p["img_decoder"][name]
        sd[f"img_decoder.{name}.weight"] = torch.from_numpy(
            np.asarray(d["kernel"]).copy())
        sd[f"img_decoder.{name}.bias"] = torch.from_numpy(
            np.asarray(d["bias"]).copy())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(sd, path)


if __name__ == "__main__":
    main()
