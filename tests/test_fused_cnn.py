"""Parity tests for the fused Pallas CNN-encoder stack (ops/fused_cnn.py)
against the XLA folded path — same parameters, same math.

Run in Pallas interpret mode on CPU (conftest forces the CPU backend).
The f32 comparisons pin exact layer math (summation-order differences
only); a bf16 smoke run checks the production dtype end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airgym_tpu.models.actor_critic import CNNEncoder

B, H, W = 3, 212, 120


def _make(impl, dtype):
    return CNNEncoder(feature_dim=30, compute_dtype=dtype, impl=impl)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    img = jax.random.normal(key, (B, 1, H, W), jnp.float32)
    params = _make("xla", None).init(jax.random.PRNGKey(1), img)
    # non-trivial BN statistics so eff scale/bias really test the fold
    p = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy ok
    for i, ch in enumerate((16, 32, 64)):
        bn = dict(p["params"][f"bn{i}"])
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(10 + i), 4)
        bn["mean"] = 0.3 * jax.random.normal(k1, (ch,))
        bn["var"] = jnp.exp(0.5 * jax.random.normal(k2, (ch,)))
        bn["scale"] = 1.0 + 0.2 * jax.random.normal(k3, (ch,))
        bn["bias"] = 0.2 * jax.random.normal(k4, (ch,))
        p["params"][f"bn{i}"] = bn
    return img, p


def test_forward_parity_f32(setup):
    img, params = setup
    ref = _make("xla", None).apply(params, img)
    out = _make("pallas_interpret", None).apply(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_grad_parity_f32(setup):
    img, params = setup
    probe = jax.random.normal(jax.random.PRNGKey(3), (B, 30))

    def loss(p, impl):
        return jnp.sum(_make(impl, None).apply(p, img) * probe)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_out = jax.grad(lambda p: loss(p, "pallas_interpret"))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_out)}
    for k, vref in flat_ref:
        name = jax.tree_util.keystr(k)
        vout = flat_out[name]
        scale = max(float(jnp.max(jnp.abs(vref))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(vout), np.asarray(vref),
            rtol=5e-4, atol=5e-4 * scale, err_msg=name)
    # BN running stats stay frozen through the fused path too
    for i in range(3):
        assert float(jnp.abs(g_out["params"][f"bn{i}"]["mean"]).max()) == 0
        assert float(jnp.abs(g_out["params"][f"bn{i}"]["var"]).max()) == 0


def test_forward_parity_bf16(setup):
    img, params = setup
    ref = _make("xla", jnp.bfloat16).apply(params, img)
    out = _make("pallas_interpret", jnp.bfloat16).apply(params, img)
    # bf16 summation-order differences only
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_grad_parity_bf16(setup):
    img, params = setup
    probe = jax.random.normal(jax.random.PRNGKey(3), (B, 30))

    def loss(p, impl):
        return jnp.sum(_make(impl, jnp.bfloat16).apply(p, img) * probe)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_out = jax.grad(lambda p: loss(p, "pallas_interpret"))(params)
    for name in ("conv0", "conv1", "conv2"):
        vref = g_ref["params"][name]["kernel"]
        vout = g_out["params"][name]["kernel"]
        scale = max(float(jnp.max(jnp.abs(vref))), 1e-6)
        np.testing.assert_allclose(np.asarray(vout), np.asarray(vref),
                                   rtol=0.1, atol=0.1 * scale,
                                   err_msg=name)


def test_image_cotangent_not_needed(setup):
    """jit-compiling a params-only grad through the fused path works (the
    image cotangent placeholder is dead code, DCE'd by XLA)."""
    img, params = setup

    @jax.jit
    def g(p):
        return jax.grad(
            lambda q: jnp.sum(_make("pallas_interpret", None)
                              .apply(q, img)))(p)

    out = g(params)
    assert jnp.isfinite(out["params"]["fc"]["kernel"]).all()


@pytest.mark.slow
def test_pallas_vs_xla_parity_on_real_tpu():
    """Mosaic-lowering parity on real hardware (ADVICE r2 #4): interpret
    mode cannot exercise dynamic_rotate lowering, revisited constant-index
    output accumulation, or lane-axis concat alignment. Runs in a
    subprocess WITHOUT conftest's CPU forcing; skips when the host has no
    TPU backend."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    code = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        "try:\n"
        "    ok = jax.default_backend() == 'tpu'\n"
        "except Exception:\n"   # tunneled plugin init crash = environment
        "    ok = False\n"
        "if not ok:\n"
        "    print('NO_TPU'); raise SystemExit(0)\n"
        "from airgym_tpu.models.actor_critic import CNNEncoder\n"
        "img = jax.random.normal(jax.random.PRNGKey(0),\n"
        "                        (64, 1, 212, 120), jnp.float32)\n"
        "mk = lambda impl: CNNEncoder(feature_dim=30, impl=impl)\n"
        "params = mk('xla').init(jax.random.PRNGKey(1), img[:2])\n"
        "probe = jax.random.normal(jax.random.PRNGKey(2), (64, 30))\n"
        "outs = {}\n"
        "for impl in ('xla', 'pallas'):\n"
        "    f = jax.jit(lambda p, im: mk(impl).apply(p, im))\n"
        "    g = jax.jit(jax.grad(lambda p: jnp.sum(\n"
        "        mk(impl).apply(p, img) * probe)))\n"
        "    outs[impl] = (np.asarray(f(params, img)),\n"
        "                  np.asarray(g(params)['params']['conv1']['kernel']))\n"
        "fd = float(np.abs(outs['xla'][0] - outs['pallas'][0]).max())\n"
        "gd = float(np.abs(outs['xla'][1] - outs['pallas'][1]).max())\n"
        "gs = float(np.abs(outs['xla'][1]).max())\n"
        "print('fwd diff', fd, 'grad diff', gd, 'grad scale', gs)\n"
        "assert fd < 0.05, fd\n"           # bf16 summation-order only
        "assert gd < 0.1 * max(gs, 1e-6), (gd, gs)\n"
        "print('TPU_PARITY OK')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=repo, capture_output=True, text=True,
                              timeout=1500)
    except subprocess.TimeoutExpired:
        # A training run owning the single tunneled chip starves the
        # child indefinitely — contention, not a parity failure. But a
        # genuine kernel hang must NOT present as a skip (ADVICE r4 #1):
        # prove contention with a trivial-op probe child before skipping.
        from _tpu_probe import chip_contended
        if chip_contended(env, repo):
            pytest.skip("TPU busy: parity child starved past 1500s and "
                        "a trivial-op probe also stalled (counted "
                        "coverage: bench.py onchip_parity)")
        pytest.fail("parity child timed out while a trivial-op probe "
                    "ran fine — kernel hang, not chip contention")
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU backend on this host")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TPU_PARITY OK" in proc.stdout, proc.stdout


def test_group_padding_parity(setup):
    """group > 1 with a non-divisible batch: zero-pad rows must not leak
    into outputs or parameter gradients (pad rows get zero cotangents
    through the output slice's adjoint)."""
    img, params = setup   # B = 3
    from airgym_tpu.experiments import fused_cnn

    probe = jax.random.normal(jax.random.PRNGKey(5), (3, 30))

    def run(group):
        class Enc(CNNEncoder):
            pass
        # drive encode_pooled directly at the chosen group
        import airgym_tpu.models.actor_critic as ac

        def apply(p):
            x = jnp.transpose(img, (0, 2, 3, 1))
            w0, b0 = ac._FoldedConv0(features=16, name="conv0").apply(
                {"params": p["params"]["conv0"]}, None, return_matrix=True)
            s0, t0 = ac.FrozenBatchNorm(16, name="bn0").apply(
                {"params": p["params"]["bn0"]})
            w1, b1 = ac._CellConv1(features=32, in_features=16).apply(
                {"params": p["params"]["conv1"]}, None, return_matrix=True)
            s1, t1 = ac.FrozenBatchNorm(32).apply(
                {"params": p["params"]["bn1"]})
            k2 = p["params"]["conv2"]["kernel"]
            b2 = p["params"]["conv2"]["bias"]
            s2, t2 = ac.FrozenBatchNorm(64).apply(
                {"params": p["params"]["bn2"]})
            ws = {"w0": w0, "b0": b0, "s0": jnp.tile(s0, (4,)),
                  "t0": jnp.tile(t0, (4,)), "w1": w1, "b1": b1,
                  "s1": s1, "t1": t1, "w2": k2.reshape(288, 64),
                  "b2": b2, "s2": s2, "t2": t2}
            pooled = fused_cnn.encode_pooled(x, ws, interpret=True,
                                             group=group)
            return jnp.sum(pooled[:, :30] * probe)

        return apply(params), jax.grad(
            lambda p: apply(p))(params)["params"]["conv1"]["kernel"]

    v2, g2 = run(2)       # batch 3, group 2 -> padded to 4
    v1, g1 = run(1)       # no padding baseline
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)
