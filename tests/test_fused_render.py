"""Fused render+postprocess kernel (render_process_pallas) checks.

Exact parity: the fused kernel in interpret mode must match the plain-jnp
mirror postprocess_hash applied to the XLA renderer's raw depth — same
hash RNG, same draw order, same rotate-based blur (the mirror IS the spec
of the fused pipeline).

Distribution parity: the hash RNG noise must match the threefry reference
pipeline (render/depth.postprocess, customized.py:399-427) statistically:
uniform taps in {0..255}/256, N(0,1) Box-Muller normals, and matching
final-image moments.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr
from airgym_tpu.render import pallas_raycast as pr

SMALL_CAM = dr.CameraCfg(width=32, height=16)


def make_scene(n=2):
    key = jax.random.PRNGKey(0)
    kc, _ = jax.random.split(key)
    t = 6
    pos = jax.random.uniform(kc, (n, t, 2), minval=1.0, maxval=4.0)
    cyl = sc.Cylinders(
        center=jnp.concatenate([pos, jnp.full((n, t, 1), 1.5)], axis=-1),
        axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, t, 3)),
        half_len=jnp.full((n, t), 1.5),
        radius=jnp.full((n, t), 0.3),
        valid=jnp.ones((n, t), bool).at[:, -1].set(False))
    box = sc.Boxes(center=jnp.array([[[2.0, -1.0, 0.5]]] * n),
                   yaw=jnp.full((n, 1), 0.3),
                   half_extents=jnp.full((n, 1, 3), 0.5),
                   valid=jnp.ones((n, 1), bool))
    return dr.SceneForRender(cylinders=cyl, boxes=box, ground=True)


def roots(n=2):
    r = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(1.0)
    return r.at[1, 3:7].set(
        jnp.array([0.0, 0.0, np.sin(0.2), np.cos(0.2)]))


def test_fused_matches_hash_mirror():
    scene = make_scene()
    root = roots()
    key = jax.random.PRNGKey(7)
    fused = np.array(pr.render_process_pallas(
        SMALL_CAM, root, scene, key, interpret=True))
    raw = dr.render_depth(SMALL_CAM, root, scene)
    mirror = np.array(pr.postprocess_hash(SMALL_CAM, raw, key))
    assert fused.shape == mirror.shape == (2, 1, 32, 16)
    np.testing.assert_allclose(fused, mirror, rtol=1e-5, atol=1e-5)
    # different keys give different images; same key is deterministic
    fused2 = np.array(pr.render_process_pallas(
        SMALL_CAM, root, scene, jax.random.PRNGKey(8), interpret=True))
    assert np.abs(fused2 - fused).max() > 1e-3
    fused3 = np.array(pr.render_process_pallas(
        SMALL_CAM, root, scene, key, interpret=True))
    np.testing.assert_array_equal(fused, fused3)


def test_fused_culled_matches_uncull_mirror():
    """Culling may only remove provably post-clamp-invisible work: with a
    big all-around primitive table the guarded/culled fused kernel must
    still equal the unculled mirror pipeline exactly."""
    n = 3
    rng = np.random.default_rng(3)
    t = 24
    pos = rng.uniform(-6.0, 6.0, size=(n, t, 2))
    cyl = sc.Cylinders(
        center=jnp.asarray(np.concatenate(
            [pos, np.full((n, t, 1), 1.5)], axis=-1), jnp.float32),
        axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, t, 3)),
        half_len=jnp.full((n, t), 1.5),
        radius=jnp.full((n, t), 0.3),
        valid=jnp.ones((n, t), bool))
    scene = dr.SceneForRender(cylinders=cyl, ground=True)
    root = roots(n)
    key = jax.random.PRNGKey(11)
    fused = np.array(pr.render_process_pallas(
        SMALL_CAM, root, scene, key, interpret=True,
        cull_far_z=SMALL_CAM.depth_clamp))
    raw = dr.render_depth(SMALL_CAM, root, scene)
    mirror = np.array(pr.postprocess_hash(SMALL_CAM, raw, key))
    np.testing.assert_allclose(fused, mirror, rtol=1e-5, atol=1e-5)


def test_hash_noise_distribution():
    """Hash-RNG taps and normals match the threefry reference pipeline's
    distributions (customized.py:416-423 quirks preserved)."""
    seeds = pr._env_seeds(jnp.uint32(123), 4096)
    taps = np.array(pr._hash_kernel_taps(seeds))[:, 0, :25].ravel()
    # randint(0, 256)/256 twin: support and moments
    assert taps.min() >= 0.0 and taps.max() <= 255.0 / 256.0
    assert abs(taps.mean() - 127.5 / 256.0) < 3e-3
    assert abs(taps.std() - np.sqrt((256**2 - 1) / 12.0) / 256.0) < 3e-3
    kq = np.round(taps * 256.0)
    np.testing.assert_allclose(kq / 256.0, taps)   # exactly k/256

    # final-image moments: hash pipeline vs threefry pipeline on the same
    # raw depth (64 envs x 32x16 pixels averages out the per-env taps)
    raw = jax.random.uniform(jax.random.PRNGKey(0), (64, 32, 16),
                             minval=0.0, maxval=6.0)
    a = np.array(dr.postprocess(SMALL_CAM, raw, jax.random.PRNGKey(1)))
    b = np.array(pr.postprocess_hash(SMALL_CAM, raw, jax.random.PRNGKey(1)))
    assert abs(a.mean() - b.mean()) / a.mean() < 0.03, (a.mean(), b.mean())
    assert abs(a.std() - b.std()) / a.std() < 0.06, (a.std(), b.std())


def test_render_and_process_cpu_path_unchanged():
    """Off-TPU, render_and_process stays the XLA threefry oracle."""
    scene = make_scene()
    root = roots()
    key = jax.random.PRNGKey(5)
    out = dr.render_and_process(SMALL_CAM, root, scene, key)
    ref = dr.postprocess(SMALL_CAM, dr.render_depth(SMALL_CAM, root, scene),
                         key)
    np.testing.assert_allclose(np.array(out), np.array(ref))


@pytest.mark.slow
def test_fused_render_parity_on_real_tpu():
    """Mosaic-lowering parity on real hardware: interpret mode cannot
    exercise pltpu.roll lowering, the SMEM guard branches, or the VMEM
    whole-image block tiling at the full 212x120 resolution. Compares
    the fused kernel against the postprocess_hash mirror applied to the
    XLA renderer's raw depth (same contract as the interpret-mode test,
    on the chip, full camera). Runs in a subprocess WITHOUT conftest's
    CPU forcing; skips when the host has no TPU backend."""
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
        "import tests.test_fused_render as tf\n"
        "from airgym_tpu.render import depth as dr\n"
        "from airgym_tpu.render import pallas_raycast as pr\n"
        "cam = dr.CameraCfg()\n"
        "scene = tf.make_scene(4)\n"
        "root = tf.roots(4)\n"
        "key = jax.random.PRNGKey(7)\n"
        "for cull in (None, cam.depth_clamp):\n"
        "    fused = np.array(pr.render_process_pallas(\n"
        "        cam, root, scene, key, interpret=False, cull_far_z=cull))\n"
        "    raw = dr.render_depth(cam, root, scene)\n"
        "    mirror = np.array(pr.postprocess_hash(cam, raw, key))\n"
        "    d = float(np.abs(fused - mirror).max())\n"
        "    print('cull', cull, 'max diff', d)\n"
        "    assert d < 1e-4, d\n"
        "print('TPU_RENDER_PARITY OK')\n"
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
    assert "TPU_RENDER_PARITY OK" in proc.stdout, proc.stdout
