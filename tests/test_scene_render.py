"""Scene primitive + depth renderer tests (analytic cases)."""
import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr


def one_cylinder(center, axis, half_len, radius):
    return sc.Cylinders(center=jnp.array([[center]]),
                        axis=jnp.array([[axis]]),
                        half_len=jnp.array([[half_len]]),
                        radius=jnp.array([[radius]]),
                        valid=jnp.ones((1, 1), bool))


def test_dist_to_cylinder():
    cyl = one_cylinder([0, 0, 1.5], [0, 0, 1.0], 1.5, 0.1)
    p = jnp.array([[1.0, 0.0, 1.0]])
    d = sc.dist_to_cylinders(p, cyl)
    np.testing.assert_allclose(d[0, 0], 0.9, atol=1e-5)
    # above the cap
    p = jnp.array([[0.0, 0.0, 4.0]])
    d = sc.dist_to_cylinders(p, cyl)
    np.testing.assert_allclose(d[0, 0], 1.0, atol=1e-5)


def test_ray_cylinder_head_on():
    cyl = one_cylinder([2, 0, 1], [0, 0, 1.0], 1.5, 0.25)
    o = jnp.array([[[0.0, 0.0, 1.0]]])
    v = jnp.array([[[1.0, 0.0, 0.0]]])
    t = sc.ray_cylinders(o, v, cyl)
    np.testing.assert_allclose(t[0, 0], 1.75, atol=1e-5)
    # ray passing above the trunk misses
    o = jnp.array([[[0.0, 0.0, 3.0]]])
    t = sc.ray_cylinders(o, v, cyl)
    assert float(t[0, 0]) > 1e8


def test_ray_sphere_and_box_and_ground():
    sph = sc.Spheres(center=jnp.array([[[3.0, 0, 1]]]),
                     radius=jnp.array([[0.5]]),
                     valid=jnp.ones((1, 1), bool))
    o = jnp.array([[[0.0, 0.0, 1.0]]])
    v = jnp.array([[[1.0, 0.0, 0.0]]])
    np.testing.assert_allclose(sc.ray_spheres(o, v, sph)[0, 0], 2.5,
                               atol=1e-5)
    box = sc.Boxes(center=jnp.array([[[2.0, 0, 1]]]),
                   yaw=jnp.array([[0.0]]),
                   half_extents=jnp.array([[[0.5, 0.5, 0.5]]]),
                   valid=jnp.ones((1, 1), bool))
    np.testing.assert_allclose(sc.ray_boxes(o, v, box)[0, 0], 1.5,
                               atol=1e-5)
    vdown = jnp.array([[[0.0, 0.0, -1.0]]])
    np.testing.assert_allclose(sc.ray_ground(o, vdown)[0, 0], 1.0,
                               atol=1e-5)


def test_tree_table_and_placement():
    tbl = assets.thin_tree_table()
    assert tbl.shape == (100, 8)
    assert 0.03 <= tbl[:, 0].mean() <= 0.08      # radii
    cyl = assets.sample_tree_scene(jax.random.PRNGKey(0), 4, 10, 8.0, 4.0)
    assert cyl.center.shape == (4, 10, 3)
    # axes are unit and mostly vertical (pitch <= ~0.56 rad)
    norms = jnp.linalg.norm(cyl.axis, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert float(cyl.axis[..., 2].min()) > 0.7


def test_render_depth_wall_of_trees():
    cfg = dr.CameraCfg()
    # a single fat trunk right in front of the camera
    cyl = one_cylinder([2.0, 0.0, 1.5], [0, 0, 1.0], 5.0, 0.5)
    root = jnp.zeros((1, 13)).at[:, 6].set(1.0).at[:, 2].set(1.5)
    depth = dr.render_depth(cfg, root,
                            dr.SceneForRender(cylinders=cyl, ground=True))
    assert depth.shape == (1, cfg.width, cfg.height)
    # center pixel: camera at x=0.15 -> depth to x=1.5 face ~ 1.35
    c = float(depth[0, cfg.width // 2, cfg.height // 2])
    np.testing.assert_allclose(c, 1.35, atol=0.02)
    # edge columns miss the trunk; ground or nothing -> much deeper
    assert float(depth[0, 0, cfg.height // 2]) > 3.0


def test_postprocess_shapes_and_range():
    cfg = dr.CameraCfg()
    depth = jnp.full((2, cfg.width, cfg.height), 2.25)
    img = dr.postprocess(cfg, depth, jax.random.PRNGKey(0))
    assert img.shape == (2, 1, cfg.width, cfg.height)
    # raw normalized value is 0.5; the unnormalized random 5x5 kernel
    # scales by ~12.5 on average (reference dump_images quirk)
    m = float(img.mean())
    assert 2.0 < m < 11.0, m


def test_renderer_sees_ground_below():
    cfg = dr.CameraCfg()
    root = jnp.zeros((1, 13)).at[:, 6].set(1.0).at[:, 2].set(1.0)
    depth = dr.render_depth(cfg, root, dr.SceneForRender(ground=True))
    # bottom rows of the image look downward at the ground
    bottom = float(depth[0, cfg.width // 2, -1])
    assert bottom < sc.BIG
    top = float(depth[0, cfg.width // 2, 0])
    assert top > 1e8  # sky
