"""CNNEncoder path equivalence: the MXU-friendly folded/space-to-depth
forms must match a direct dense conv stack computed from the SAME
reference-shaped parameters (lib/network/cnn.py:3-34 architecture)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airgym_tpu.models import actor_critic as ac


def _randomize(params, seed=0):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(size=l.shape, scale=0.3) + (1.0 if l.ndim == 1 else 0.0),
                       l.dtype) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def _direct_forward(params, x_nchw):
    """Dense f32 reference: conv(16,5,s2) relu bn, conv(32,3,s2) relu bn,
    conv(64,3,s2) relu bn, avgpool, fc — straight lax.conv calls."""
    p = params["params"]
    x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(jnp.float32)
    specs = [("conv0", "bn0", 5), ("conv1", "bn1", 3), ("conv2", "bn2", 3)]
    for conv_name, bn_name, k in specs:
        kern = p[conv_name]["kernel"].astype(jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, kern, (2, 2), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p[conv_name]["bias"]
        x = jax.nn.relu(x)
        bn = p[bn_name]
        x = ((x - bn["mean"]) * bn["scale"]
             * jax.lax.rsqrt(bn["var"] + 1e-5) + bn["bias"])
    x = jnp.mean(x, axis=(1, 2))
    return x @ p["fc"]["kernel"] + p["fc"]["bias"]


@pytest.mark.parametrize("hw", [(212, 120),   # %4: folded path
                                (210, 118),   # %2 only: s2d path
                                (211, 119)])  # odd: plain nn.Conv path
def test_encoder_paths_match_direct_f32(hw):
    h, w = hw
    enc = ac.CNNEncoder(feature_dim=30, compute_dtype=None)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 1, h, w)),
                    jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    params = _randomize(params)
    got = enc.apply(params, x)
    want = _direct_forward(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_folded_param_tree_matches_other_paths():
    """Checkpoint contract: every path declares the identical parameter
    tree (conv{0,1,2} kernel/bias at reference shapes, bn{0,1,2}, fc)."""
    shapes = {}
    for h, w in [(212, 120), (210, 118), (211, 119)]:
        enc = ac.CNNEncoder(feature_dim=30, compute_dtype=None)
        x = jnp.zeros((1, 1, h, w), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)
        s = jax.tree_util.tree_map(lambda a: a.shape, params)
        shapes[(h, w)] = jax.tree_util.tree_structure(params), s
    (t0, s0), (t1, s1), (t2, s2) = shapes.values()
    assert t0 == t1 == t2
    assert s0 == s1 == s2
    assert s0["params"]["conv0"]["kernel"] == (5, 5, 1, 16)
    assert s0["params"]["conv1"]["kernel"] == (3, 3, 16, 32)
    assert s0["params"]["conv2"]["kernel"] == (3, 3, 32, 64)


def test_folded_bf16_close_to_f32():
    enc16 = ac.CNNEncoder(feature_dim=30)                  # bf16 folded
    enc32 = ac.CNNEncoder(feature_dim=30, compute_dtype=None)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 1, 212, 120)),
                    jnp.float32)
    params = enc32.init(jax.random.PRNGKey(0), x)
    params = _randomize(params)
    a = enc16.apply(params, x)
    b = enc32.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-2, rtol=5e-2)
