"""ResNet-18 encoder tests (shapes, frozen backbone, torchvision import)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airgym_tpu.models.resnet import (ResNet18Encoder,
                                      import_torchvision_state_dict)


def test_resnet_shapes_and_frozen_backbone():
    enc = ResNet18Encoder(output_dim=30)
    img = jnp.ones((2, 1, 212, 120))
    params = enc.init(jax.random.PRNGKey(0), img)
    out = enc.apply(params, img)
    assert out.shape == (2, 30)
    # backbone frozen: gradients flow only into fc
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, img) ** 2))(params)
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        total = float(jnp.sum(jnp.abs(leaf)))
        if "'fc'" in key:
            assert total > 0.0, key
        else:
            assert total == 0.0, key


def _torch_resnet18():
    """Plain-torch resnet18 with torchvision's exact state_dict key layout
    (conv1/bn1/layer{1..4}.{0,1}.../downsample.{0,1}) so the importer can
    be validated without torchvision in the image. Weights, BN affine
    params and running stats are all randomized for a strong check."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = (nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
                if stride != 1 or cin != cout else None)

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return F.relu(y + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(Block(64, 64), Block(64, 64))
            self.layer2 = nn.Sequential(Block(64, 128, 2), Block(128, 128))
            self.layer3 = nn.Sequential(Block(128, 256, 2), Block(256, 256))
            self.layer4 = nn.Sequential(Block(256, 512, 2), Block(512, 512))
            self.avgpool = nn.AdaptiveAvgPool2d(1)

        def backbone(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.avgpool(x)[:, :, 0, 0]

    torch.manual_seed(7)
    net = Net()
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "bn" in name or "downsample.1" in name:
                p.copy_(torch.rand_like(p) + 0.5)   # affine scale/bias
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn_like(b) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand_like(b) + 0.5)
    net.eval()
    return net


def test_state_dict_import_numeric_parity():
    """Importer + encoder reproduce a torch resnet18 backbone bitwise-ish
    (replaces the torchvision-gated test when torchvision is absent)."""
    import torch
    net = _torch_resnet18()
    params = import_torchvision_state_dict(net.state_dict(), output_dim=30)

    rng = np.random.RandomState(3)
    gray = rng.rand(2, 1, 212, 120).astype(np.float32)
    with torch.no_grad():
        # sum-over-RGB conv1 on 1-channel input == torch conv1 fed the
        # channel replicated to RGB
        feats = net.backbone(
            torch.from_numpy(np.repeat(gray, 3, axis=1))).numpy()

    # the encoder is fc(backbone(x)) with a known fc — comparing its
    # output against feats @ W + b checks the whole imported backbone
    enc = ResNet18Encoder(output_dim=30)
    out = np.array(enc.apply(params, jnp.asarray(gray)))
    w = np.asarray(params["params"]["fc"]["kernel"])
    b = np.asarray(params["params"]["fc"]["bias"])
    np.testing.assert_allclose(out, feats @ w + b, rtol=2e-3, atol=2e-3)


def test_torchvision_import():
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision")
    # random-weight torchvision resnet18 (no download in this image)
    model = tv.models.resnet18(weights=None)
    params = import_torchvision_state_dict(model.state_dict(),
                                           output_dim=30)
    enc = ResNet18Encoder(output_dim=30)
    img = jnp.ones((1, 1, 212, 120)) * 0.5
    out = enc.apply(params, img)
    assert out.shape == (1, 30)
    assert bool(jnp.all(jnp.isfinite(out)))

    # cross-check backbone features against torch (exclude fc):
    # sum-over-RGB conv1 on single-channel input == torch conv1 fed with
    # the channel replicated
    import torch.nn.functional as F
    with torch.no_grad():
        model.eval()
        x = torch.full((1, 3, 212, 120), 0.5)
        feats = model.avgpool(model.layer4(model.layer3(model.layer2(
            model.layer1(model.maxpool(model.relu(model.bn1(
                model.conv1(x)))))))))[:, :, 0, 0].numpy()

    import flax
    # features before fc from our model: rebuild by applying without fc
    class Backbone(ResNet18Encoder):
        def __call__(self, img):
            import jax.numpy as jnp
            from airgym_tpu.models.actor_critic import FrozenBatchNorm
            import flax.linen as nn
            x = jnp.transpose(img, (0, 2, 3, 1))
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        name="conv1")(x)
            x = FrozenBatchNorm(64, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            from airgym_tpu.models.resnet import BasicBlock
            for i, (feat, stride) in enumerate(
                    [(64, 1), (64, 1), (128, 2), (128, 1),
                     (256, 2), (256, 1), (512, 2), (512, 1)]):
                x = BasicBlock(feat, stride, name=f"block{i}")(x)
            return jnp.mean(x, axis=(1, 2))

    bb = Backbone(output_dim=30)
    ours = np.array(bb.apply(params, img))
    np.testing.assert_allclose(ours, feats, atol=2e-3)
