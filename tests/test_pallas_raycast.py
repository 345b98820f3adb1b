"""Pallas ray-cast kernel vs XLA renderer agreement (interpret mode on
CPU; a small camera keeps interpretation fast)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr
from airgym_tpu.render import pallas_raycast as pr

SMALL_CAM = dr.CameraCfg(width=32, height=16)


def make_scene(n=2):
    key = jax.random.PRNGKey(0)
    kc, ky = jax.random.split(key)
    t = 6
    pos = jax.random.uniform(kc, (n, t, 2), minval=1.0, maxval=4.0)
    cyl = sc.Cylinders(
        center=jnp.concatenate([pos, jnp.full((n, t, 1), 1.5)], axis=-1),
        axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, t, 3)),
        half_len=jnp.full((n, t), 1.5),
        radius=jnp.full((n, t), 0.3),
        valid=jnp.ones((n, t), bool).at[:, -1].set(False))
    sph = sc.Spheres(center=jnp.array([[[3.0, 0.0, 1.0]]] * n),
                     radius=jnp.full((n, 1), 0.4),
                     valid=jnp.ones((n, 1), bool))
    box = sc.Boxes(center=jnp.array([[[2.0, -1.0, 0.5]]] * n),
                   yaw=jnp.full((n, 1), 0.3),
                   half_extents=jnp.full((n, 1, 3), 0.5),
                   valid=jnp.ones((n, 1), bool))
    return dr.SceneForRender(cylinders=cyl, spheres=sph, boxes=box,
                             ground=True)


def roots(n=2):
    r = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(1.0)
    return r.at[1, 3:7].set(
        jnp.array([0.0, 0.0, np.sin(0.2), np.cos(0.2)]))


def test_pallas_matches_xla_renderer():
    scene = make_scene()
    root = roots()
    a = np.array(dr.render_depth(SMALL_CAM, root, scene))
    b = np.array(pr.render_depth_pallas(SMALL_CAM, root, scene,
                                        interpret=True))
    assert b.shape == a.shape == (2, 32, 16)
    ac, bc = np.minimum(a, 10.0), np.minimum(b, 10.0)
    # identical geometry: all but (possibly) silhouette-edge pixels agree
    close = np.abs(ac - bc) < 1e-2
    assert close.mean() > 0.995, close.mean()
    both_hit = (a < 1e8) & (b < 1e8) & close
    np.testing.assert_allclose(a[both_hit], b[both_hit], atol=1e-2)


def test_pack_scene_layout():
    scene = make_scene()
    table, counts = pr.pack_scene(2, scene)
    assert counts == (6, 1, 1, 0)
    assert table.shape[1] % 8 == 0
    # cylinder records first, with type flag 1 where valid
    np.testing.assert_allclose(np.array(table[:, 0, 0]), 1.0)
    np.testing.assert_allclose(np.array(table[:, 5, 0]), 0.0)  # invalid
    np.testing.assert_allclose(np.array(table[:, 6, 0]), 2.0)  # sphere
    np.testing.assert_allclose(np.array(table[:, 7, 0]), 3.0)  # box


def test_pallas_culling_stress():
    """Frustum-culling stress: primitives behind the camera, far off to
    the sides, straddling wedge boundaries, plus annuli — under several
    camera orientations the kernel must still agree with the XLA
    renderer exactly (culling may only skip provably unhittable work)."""
    n = 4
    rng = np.random.default_rng(3)
    t = 24
    pos = rng.uniform(-6.0, 6.0, size=(n, t, 2))   # all around the camera
    cyl = sc.Cylinders(
        center=jnp.asarray(np.concatenate(
            [pos, np.full((n, t, 1), 1.2)], axis=-1), jnp.float32),
        axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, t, 3)),
        half_len=jnp.full((n, t), 1.2),
        radius=jnp.full((n, t), 0.25),
        valid=jnp.ones((n, t), bool))
    sph_pos = rng.uniform(-5.0, 5.0, size=(n, 3, 3))
    sph_pos[..., 2] = np.abs(sph_pos[..., 2])
    sph = sc.Spheres(center=jnp.asarray(sph_pos, jnp.float32),
                     radius=jnp.full((n, 3), 0.5),
                     valid=jnp.ones((n, 3), bool))
    box = sc.Boxes(
        center=jnp.asarray(rng.uniform(-4, 4, size=(n, 2, 3)), jnp.float32),
        yaw=jnp.asarray(rng.uniform(0, 6.3, size=(n, 2)), jnp.float32),
        half_extents=jnp.full((n, 2, 3), 0.4),
        valid=jnp.ones((n, 2), bool))
    ann = sc.Annuli(
        center=jnp.asarray([[[2.5, 0.0, 1.5]]] * n, jnp.float32),
        normal=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 1, 3)),
        r_in=jnp.full((n, 1), 0.6), r_out=jnp.full((n, 1), 1.2),
        half_thick=jnp.full((n, 1), 0.05),
        valid=jnp.ones((n, 1), bool))
    scene = dr.SceneForRender(cylinders=cyl, spheres=sph, boxes=box,
                              annuli=ann, ground=True)
    # camera yaws 0, 90, 180, 270 degrees — prims land in every wedge
    # relation (ahead / beside / behind)
    root = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(1.5)
    for i, yaw in enumerate([0.0, np.pi / 2, np.pi, -np.pi / 2]):
        root = root.at[i, 3:7].set(
            jnp.array([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]))
    a = np.array(dr.render_depth(SMALL_CAM, root, scene))
    b = np.array(pr.render_depth_pallas(SMALL_CAM, root, scene,
                                        interpret=True))
    ac, bc = np.minimum(a, 10.0), np.minimum(b, 10.0)
    close = np.abs(ac - bc) < 1e-2
    assert close.mean() > 0.995, close.mean()


def make_spread_scene(n=2):
    """Scene with primitives inside and far outside the view frustum:
    behind the camera, beyond the clamp distance, and visible."""
    t = 5
    centers = jnp.broadcast_to(jnp.array([
        [2.0, 0.5, 1.2],      # visible ahead
        [-6.0, 0.0, 1.2],     # behind the camera
        [30.0, 0.0, 1.2],     # far beyond any clamp
        [2.5, -0.8, 1.0],     # visible ahead
        [0.0, 25.0, 1.2],     # far off to the side
    ]), (n, t, 3))
    cyl = sc.Cylinders(
        center=centers,
        axis=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, t, 3)),
        half_len=jnp.full((n, t), 1.2),
        radius=jnp.full((n, t), 0.25),
        valid=jnp.ones((n, t), bool))
    sph = sc.Spheres(
        center=jnp.broadcast_to(jnp.array([[3.0, 0.0, 1.0],
                                           [-9.0, 2.0, 1.0]]), (n, 2, 3)),
        radius=jnp.full((n, 2), 0.4),
        valid=jnp.ones((n, 2), bool))
    return dr.SceneForRender(cylinders=cyl, spheres=sph, ground=True)


def test_culled_render_matches_unculled_after_clip():
    """cull_far_z is exact for the clip(depth, 0, far_z) image: survivors
    compacted per env, skipped records provably past the clamp or outside
    the all-rays cone."""
    scene = make_spread_scene()
    root = roots()
    far = 4.5
    a = np.array(pr.render_depth_pallas(SMALL_CAM, root, scene,
                                        interpret=True))
    b = np.array(pr.render_depth_pallas(SMALL_CAM, root, scene,
                                        interpret=True, cull_far_z=far))
    np.testing.assert_allclose(np.minimum(a, far), np.minimum(b, far),
                               atol=0.0)


def test_cull_compaction_drops_invisible():
    scene = make_spread_scene()
    root = roots()
    table, counts = pr.pack_scene(2, scene)
    from airgym_tpu.math import rotations as rot
    q = root[:, 3:7]
    m = rot.quat_to_matrix(q).reshape(2, 9)
    origin = root[:, 0:3] + rot.quat_rotate(
        q, jnp.asarray(SMALL_CAM.mount_pos, root.dtype))
    compacted, dyn = pr.cull_and_compact(
        table, counts, origin.astype(jnp.float32),
        m[:, [0, 3, 6]].astype(jnp.float32), 4.5,
        pr._corner_tan(SMALL_CAM))
    dyn = np.asarray(dyn)
    # env 0 looks straight down +x: of the 5 cylinders only the two ahead
    # survive; of the 2 spheres only the one ahead
    np.testing.assert_array_equal(dyn[0], [2, 1, 0, 0])
    # compaction puts the survivors first: both lead cylinder records and
    # the lead sphere record sit ahead of the camera (x > 0)
    c = np.asarray(compacted)
    assert (c[0, :2, 1] > 0).all(), c[0, :2, 1]
    assert c[0, 5, 1] > 0, c[0, 5, 1]
