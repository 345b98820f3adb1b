"""ResNet-18 depth-image feature extractor (reference:
lib/network/resnet.py:5-24 — frozen torchvision resnet18 with a
1-channel conv1 and a trainable fc head).

Flax implementation of the standard ResNet-18 topology (BasicBlock x
[2,2,2,2]) with the reference's modifications: single-channel stem and an
``fc`` projection to ``output_dim``. The backbone runs under
``stop_gradient`` (frozen, like the reference's requires_grad=False);
only ``fc`` trains. ``import_torchvision_state_dict`` maps a torchvision
``resnet18`` checkpoint into the params (pretrained weights cannot be
downloaded in an air-gapped environment, so they are supplied as a file).
BatchNorms run in eval mode with imported running stats (same rationale
as models/actor_critic.FrozenBatchNorm).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.models.actor_critic import FrozenBatchNorm


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.features,
                                       name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet18Encoder(nn.Module):
    """[B, 1, W, H] depth image -> [B, output_dim] features."""
    output_dim: int = 30
    frozen: bool = True

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))          # NHWC
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (feat, stride) in enumerate(
                [(64, 1), (64, 1), (128, 2), (128, 1),
                 (256, 2), (256, 1), (512, 2), (512, 1)]):
            x = BasicBlock(feat, stride, name=f"block{i}")(x)
        x = jnp.mean(x, axis=(1, 2))                # global avg pool
        if self.frozen:
            # backbone frozen like the reference (requires_grad_(False));
            # only the fc head below trains
            x = jax.lax.stop_gradient(x)
        return nn.Dense(self.output_dim, name="fc")(x)


def import_torchvision_state_dict(sd: Dict[str, Any],
                                  output_dim: int = 30,
                                  rng_key=None) -> Dict[str, Any]:
    """torchvision resnet18 state_dict -> ResNet18Encoder params.

    conv1 weights are summed over RGB to a single channel (the standard
    gray-input adaptation; the reference instead re-initializes conv1 —
    summing preserves pretrained edge filters for depth input). The fc
    head is freshly initialized.
    """
    t = lambda k: np.asarray(sd[k].detach().cpu().numpy()
                             if hasattr(sd[k], "detach") else sd[k])

    def conv(k):
        return {"kernel": np.transpose(t(k + ".weight"), (2, 3, 1, 0))}

    def bn(k):
        return {"scale": t(k + ".weight"), "bias": t(k + ".bias"),
                "mean": t(k + ".running_mean"),
                "var": t(k + ".running_var")}

    params: Dict[str, Any] = {}
    w1 = np.transpose(t("conv1.weight"), (2, 3, 1, 0))   # [7,7,3,64]
    params["conv1"] = {"kernel": w1.sum(axis=2, keepdims=True)}
    params["bn1"] = bn("bn1")

    layers = [("layer1", 0), ("layer1", 1), ("layer2", 0), ("layer2", 1),
              ("layer3", 0), ("layer3", 1), ("layer4", 0), ("layer4", 1)]
    for i, (layer, j) in enumerate(layers):
        pre = f"{layer}.{j}"
        blk = {"conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
               "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2")}
        if f"{pre}.downsample.0.weight" in sd:
            blk["downsample_conv"] = conv(f"{pre}.downsample.0")
            blk["downsample_bn"] = bn(f"{pre}.downsample.1")
        params[f"block{i}"] = blk

    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    init = nn.initializers.lecun_normal()
    params["fc"] = {"kernel": np.asarray(init(key, (512, output_dim))),
                    "bias": np.zeros((output_dim,), np.float32)}
    return {"params": params}
