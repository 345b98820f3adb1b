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
