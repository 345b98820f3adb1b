"""Depth-image VAE (reference: lib/network/VAE.py + vae_image_encoder.py).

ResNet8-style encoder with two skip branches -> 2*latent (mean ++ logvar),
dense+5-deconv decoder, wrapped for RL use like the reference's
VAEImageEncoder (interpolate input to (120, 212) bilinear, return means or
sampled z, frozen weights). Layer geometry, paddings, and even the
reference's center-crop quirk are replicated exactly so that torch
``vae_model.pth`` checkpoints import losslessly (see
``import_torch_state_dict``): with a (120, 212) input the second skip
branch crops to width 1 (VAE.py center_crop with a negative offset under
torch slice semantics) and broadcast-adds across the feature map.

Interface note: images arrive in the env's [N, 1, 212, 120] (C, W, H)
layout (customized.py:402); like the reference wrapper the encoder first
"interpolates" them to image_res (120, 212) — i.e. a resize across the
spatial dims exactly as torch F.interpolate does, distortion included.

Internally NCHW is converted to NHWC for TPU-friendly convolutions.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGE_RES = (120, 212)   # reference YAML vae.image_res (README.md:199-213)


def _center_crop_torch(x, th, tw):
    """Reference ImgEncoder.center_crop under torch slice semantics,
    including the negative-offset quirk (x: NHWC)."""
    h, w = x.shape[1], x.shape[2]
    dh, dw = (h - th) // 2, (w - tw) // 2

    def slc(size, start, want):
        if start < 0:
            start = size + start          # torch negative index
        stop = min(start + want, size)
        return start, stop

    h0, h1 = slc(h, dh, th)
    w0, w1 = slc(w, dw, tw)
    return x[:, h0:h1, w0:w1, :]


class ImgEncoder(nn.Module):
    """VAE.py ImgEncoder: conv ladder + 2 skip convs -> dense 512 ->
    2*latent."""
    latent_dim: int = 64

    @nn.compact
    def __call__(self, x):  # x: [N, H, W, 1] at (120, 212)
        conv = lambda ch, k, s, p, name: nn.Conv(
            ch, (k, k), strides=(s, s),
            padding=((p, p), (p, p)) if isinstance(p, int) else p,
            name=name)
        x0_0 = conv(32, 5, 2, 2, "conv0")(x)
        x0_1 = nn.elu(conv(32, 3, 2, 2, "conv0_1")(x0_0))

        x1_0 = conv(32, 5, 2, 1, "conv1_0")(x0_1)
        x1_1 = conv(64, 3, 1, 1, "conv1_1")(x1_0)
        j2 = conv(64, 4, 2, 1, "conv0_jump_2")(x0_1)
        j2 = _center_crop_torch(j2, x1_1.shape[1], x1_1.shape[2])
        x1_1 = nn.elu(x1_1 + j2)

        x2_0 = conv(64, 5, 2, 2, "conv2_0")(x1_1)
        x2_1 = nn.Conv(128, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), name="conv2_1")(x2_0)
        j3 = nn.Conv(128, (5, 5), strides=(4, 4),
                     padding=((2, 2), (1, 1)), name="conv1_jump_3")(x1_1)
        j3 = _center_crop_torch(j3, x2_1.shape[1], x2_1.shape[2])
        x2_1 = nn.elu(x2_1 + j3)       # broadcast add when j3 is 1 wide

        x3_0 = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv3_0")(x2_1)
        # torch flattens NCHW: [N, 128, 4, 7] -> transpose back before
        # flattening so dense weights stay importable
        x_nchw = jnp.transpose(x3_0, (0, 3, 1, 2))
        flat = x_nchw.reshape(x_nchw.shape[0], -1)
        h = nn.elu(nn.Dense(512, name="dense0")(flat))
        return nn.Dense(2 * self.latent_dim, name="dense1")(h)


class ImgDecoder(nn.Module):
    """VAE.py ImgDecoder: dense -> [128,13,7] -> 5 transposed convs ->
    sigmoid -> bilinear resize to (120, 212)."""
    latent_dim: int = 64
    with_logits: bool = False

    @nn.compact
    def __call__(self, z):
        x = nn.relu(nn.Dense(512, name="dense")(z))
        x = nn.Dense(128 * 13 * 7, name="dense1")(x)
        x = x.reshape(-1, 128, 13, 7)               # NCHW like torch
        x = jnp.transpose(x, (0, 2, 3, 1))          # NHWC

        def deconv(x, ch, k, s, p, name):
            # torch ConvTranspose2d(k, s, p): equivalent forward conv on an
            # lhs-dilated input with padding (k-1-p) and flipped kernels.
            return _ConvTranspose(ch, k, s, p, name=name)(x)

        x = nn.relu(deconv(x, 128, 3, 1, 1, "deconv1"))
        x = nn.relu(deconv(x, 64, 4, 2, 1, "deconv2"))
        x = nn.relu(deconv(x, 32, 4, 2, 1, "deconv3"))
        x = nn.relu(deconv(x, 16, 4, 2, 1, "deconv4"))
        x = deconv(x, 1, 4, 2, 1, "deconv5")
        if not self.with_logits:
            x = nn.sigmoid(x)
        x = jax.image.resize(x, (x.shape[0],) + IMAGE_RES + (x.shape[-1],),
                             method="bilinear")
        return x


class _ConvTranspose(nn.Module):
    """Torch-semantics ConvTranspose2d with importable [I, O, kh, kw]
    parameter layout."""
    features: int
    kernel: int
    stride: int
    pad: int

    @nn.compact
    def __call__(self, x):  # NHWC
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_ch, self.features, k, k))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # forward conv on dilated input with flipped kernel
        w_flip = w[:, :, ::-1, ::-1]
        w_hwio = jnp.transpose(w_flip, (2, 3, 0, 1))   # [kh, kw, I, O]
        p = k - 1 - self.pad
        y = jax.lax.conv_general_dilated(
            x, w_hwio, window_strides=(1, 1),
            padding=((p, p), (p, p)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class VAE(nn.Module):
    """VAE.py VAE: encode -> reparametrize -> decode."""
    latent_dim: int = 64
    with_logits: bool = False

    def setup(self):
        self.encoder = ImgEncoder(latent_dim=self.latent_dim)
        self.img_decoder = ImgDecoder(latent_dim=self.latent_dim,
                                      with_logits=self.with_logits)

    def __call__(self, img_nchw, key=None):
        z = self.encode_params(img_nchw)
        mean, logvar = z[:, :self.latent_dim], z[:, self.latent_dim:]
        std = jnp.exp(0.5 * logvar)
        eps = (jax.random.normal(key, std.shape) if key is not None
               else jnp.zeros_like(std))
        z_sampled = mean + eps * std
        recon = self.img_decoder(z_sampled)
        return recon, mean, logvar, z_sampled

    def encode_params(self, img_nchw):
        """[N, 1, W=212, H=120] env layout -> resized (120, 212) -> raw
        2*latent output."""
        img = _to_image_res(img_nchw)
        x = jnp.transpose(img, (0, 2, 3, 1))        # NHWC
        return self.encoder(x)

    def decode(self, z):
        recon = self.img_decoder(z)
        if self.with_logits:
            recon = nn.sigmoid(recon)
        return jnp.transpose(recon, (0, 3, 1, 2))


def _to_image_res(img_nchw):
    """torch F.interpolate(..., (120, 212), bilinear, align_corners=False)
    equivalent (vae_image_encoder.py:40-47)."""
    n, c = img_nchw.shape[0], img_nchw.shape[1]
    if img_nchw.shape[2:] == IMAGE_RES:
        return img_nchw
    return jax.image.resize(img_nchw, (n, c) + IMAGE_RES, method="bilinear")


class VAEEncoder(nn.Module):
    """RL-side frozen encoder (reference VAEImageEncoder.encode): returns
    means (return_sampled_latent False in the shipped YAML)."""
    latent_dim: int = 64
    deterministic: bool = True

    @nn.compact
    def __call__(self, img_nchw):
        z = VAE(latent_dim=self.latent_dim, name="vae").encode_params(
            jax.lax.stop_gradient(img_nchw))
        mean = z[:, :self.latent_dim]
        return jax.lax.stop_gradient(mean)


# --------------------------------------------------------------------------
# torch checkpoint import (AirGym-Real / trained-VAE compatibility)


_ENC_CONVS = ["conv0", "conv0_1", "conv1_0", "conv1_1", "conv2_0",
              "conv2_1", "conv3_0", "conv0_jump_2", "conv1_jump_3"]
_DEC_DECONVS = ["deconv1", "deconv2", "deconv3", "deconv4", "deconv5"]


def clean_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Strip 'module.' and rename 'dronet.' -> 'encoder.' like the
    reference loader (vae_image_encoder.py:6-14)."""
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        k = k.replace("dronet.", "encoder.")
        out[k] = v
    return out


def import_torch_state_dict(sd: Dict[str, Any], latent_dim: int = 64):
    """torch VAE state_dict -> flax params pytree for VAE above."""
    import numpy as np
    sd = clean_state_dict(sd)
    t = lambda k: np.asarray(sd[k].detach().cpu().numpy()
                             if hasattr(sd[k], "detach") else sd[k])

    enc = {}
    for name in _ENC_CONVS:
        w = t(f"encoder.{name}.weight")              # [O, I, kh, kw]
        enc[name] = {"kernel": np.transpose(w, (2, 3, 1, 0)),
                     "bias": t(f"encoder.{name}.bias")}
    for name in ["dense0", "dense1"]:
        enc[name] = {"kernel": t(f"encoder.{name}.weight").T,
                     "bias": t(f"encoder.{name}.bias")}

    dec = {}
    for name in ["dense", "dense1"]:
        dec[name] = {"kernel": t(f"img_decoder.{name}.weight").T,
                     "bias": t(f"img_decoder.{name}.bias")}
    for name in _DEC_DECONVS:
        dec[name] = {"kernel": t(f"img_decoder.{name}.weight"),  # [I,O,k,k]
                     "bias": t(f"img_decoder.{name}.bias")}

    return {"params": {"encoder": enc, "img_decoder": dec}}


def vae_loss(recon, target, mean, logvar, kl_weight: float = 1.0):
    """Standard VAE objective for training on DepthGen data: pixel MSE +
    KL(q || N(0, I)). (The reference ships only a pretrained vae_model.pth;
    this utility closes the loop for training one from DepthGen output.)"""
    rec = jnp.mean(jnp.sum(jnp.square(recon - target), axis=(1, 2, 3)))
    kl = -0.5 * jnp.mean(jnp.sum(1 + logvar - jnp.square(mean)
                                 - jnp.exp(logvar), axis=-1))
    return rec + kl_weight * kl, {"recon": rec, "kl": kl}
