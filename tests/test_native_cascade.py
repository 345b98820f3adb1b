"""Golden cross-validation: C++ cascade vs JAX cascade, every mode."""
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airgym_tpu.control import px4
from airgym_tpu.math import rotations as rot

g_pp = shutil.which("g++")
pytestmark = pytest.mark.skipif(g_pp is None, reason="no g++ toolchain")

N = 32
DT = 0.01
G = px4.CascadeGains()


def random_states(key):
    kp, kq, kv, kw = jax.random.split(key, 4)
    pos = jax.random.uniform(kp, (N, 3), minval=-2, maxval=2)
    quat = rot.quat_normalize(jax.random.normal(kq, (N, 4)))
    vel = jax.random.uniform(kv, (N, 3), minval=-3, maxval=3)
    angvel = jax.random.uniform(kw, (N, 3), minval=-3, maxval=3)
    return jnp.concatenate([pos, quat, vel, angvel], axis=-1)


def random_actions(key, mode):
    a = jax.random.uniform(key, (N, px4.num_actions(mode)),
                           minval=-1.0, maxval=1.0)
    if mode in ("rate", "atti", "prop"):
        a = a.at[..., -1].set(jnp.abs(a[..., -1]))
    return a


@pytest.mark.parametrize("mode", ["prop", "rate", "atti", "vel", "pos"])
def test_cpp_matches_jax(mode):
    from airgym_tpu.control import native

    ctl = native.ParallelControl(mode, N)
    cs = px4.init_state(N)

    key = jax.random.PRNGKey(hash(mode) % 2 ** 31)
    for step in range(5):
        key, k1, k2 = jax.random.split(key, 3)
        root = random_states(k1)
        act = random_actions(k2, mode)

        cmds_jax, cs = px4.run(mode, G, cs, root, act, DT)
        cmds_cpp = ctl.update(np.asarray(root), np.asarray(act), DT)

        np.testing.assert_allclose(cmds_cpp, np.asarray(cmds_jax),
                                   atol=2e-4,
                                   err_msg=f"mode={mode} step={step}")
    # internal state agrees too
    st = ctl.state_as_pytree()
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(cs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_reset_matches():
    from airgym_tpu.control import native

    ctl = native.ParallelControl("vel", N)
    cs = px4.init_state(N)
    key = jax.random.PRNGKey(0)
    root = random_states(key)
    act = random_actions(jax.random.PRNGKey(1), "vel")
    cmds_jax, cs = px4.run("vel", G, cs, root, act, DT)
    ctl.update(np.asarray(root), np.asarray(act), DT)

    mask = np.zeros(N, bool)
    mask[::2] = True
    quats = np.asarray(root[:, 3:7])
    ctl.reset(mask, quats)
    cs2 = px4.reset_state(cs, jnp.asarray(mask), jnp.asarray(quats))
    st = ctl.state_as_pytree()
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(cs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
